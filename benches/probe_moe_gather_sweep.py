"""Sweep (depth, n_chunks, bm) of the MoE expert-gather kernel on TPU.

Round-3 evidence run: the depth-2 gather schedule measured 73 GB/s (9%
of HBM roofline) at the Qwen3-30B-A3B gate/up decode shape — per-visit
DMA-issue and dequant overhead, not bandwidth. This probe measures the
depth-D rewrite across its tuning grid and prints one JSON line so the
winning point can be defaulted with evidence.

Usage: python benches/probe_moe_gather_sweep.py [json_out] [grid_idx ...]
(re-running with an existing json_out appends the newly selected points)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.kernels.moe_matmul import _gqmm_gather_pallas
from tiny_llm_tpu.ops.quantize import quantize_stacked

ITERS = 50
HBM_GBS = 819.0

E, N, K, T = 128, 768, 2048, 64  # 30B-A3B gate/up decode


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(E, N, K)).astype(np.float32) * 0.1)
    qt = jax.jit(
        quantize_stacked, static_argnames=("group_size", "bits", "layout")
    )(w, layout="magic_t")
    ids = np.sort(rng.integers(0, E, size=T))
    counts = np.bincount(ids, minlength=E)
    sizes = jnp.asarray(counts, jnp.int32)
    x = jnp.asarray(rng.normal(size=(T, qt.k_padded)), jnp.bfloat16)
    nonempty = int((counts > 0).sum())
    touched = nonempty * (N * K // 2 + 2 * N * (K // qt.group_size) * 2)
    print(f"routed={nonempty} touched={touched/1e6:.1f} MB", flush=True)

    def run_for(depth, n_chunks, bm, matdeq=False):
        def call(xx, ss):
            return _gqmm_gather_pallas(
                xx, qt.packed, qt.scales, qt.biases, ss,
                group_size=qt.group_size, bits=qt.bits,
                depth=depth, n_chunks=n_chunks, bm=bm, matdeq=matdeq,
            )

        @jax.jit
        def run(x0):
            def body(i, x):
                y = call(x, sizes)
                return x + (jnp.sum(y[:1, :1]) * 1e-6).astype(x.dtype)

            return jax.lax.fori_loop(0, ITERS, body, x0)

        jax.block_until_ready(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best

    grid = [
        (2, 8, 16, False),   # 0: round-2 config (baseline)
        (4, 4, 16, False),   # 1
        (8, 2, 16, False),   # 2
        (8, 4, 16, False),   # 3
        (8, 1, 16, False),   # 4
        (8, 2, 64, False),   # 5
        (8, 2, 16, True),    # 6: materialize-dequant + one dot
        (8, 2, 64, True),    # 7
        (8, 1, 64, True),    # 8
        (16, 1, 64, True),   # 9
        (16, 1, 16, False),  # 10
        (16, 1, 64, False),  # 11
    ]
    picks = [int(a) for a in sys.argv[2:]] or list(range(len(grid)))
    results = []
    if out_path:
        import os

        if os.path.exists(out_path):
            with open(out_path) as f:
                results = json.load(f).get("results", [])
            done = {(r["depth"], r["n_chunks"], r["bm"],
                     r.get("matdeq", False)) for r in results}
            picks = [i for i in picks if grid[i] not in done]
            print(f"resuming; {len(done)} points already measured", flush=True)
    for depth, nc, bm, matdeq in [grid[i] for i in picks]:
        tag = f"D={depth:2d} NC={nc} bm={bm:2d} matdeq={int(matdeq)}"
        try:
            dt = run_for(depth, nc, bm, matdeq)
        except Exception as e:  # VMEM overflow etc. — record and move on
            print(f"{tag}: FAILED {type(e).__name__}", flush=True)
            results.append({"depth": depth, "n_chunks": nc, "bm": bm,
                            "matdeq": matdeq, "error": type(e).__name__})
            continue
        gbs = touched / dt / 1e9
        results.append({"depth": depth, "n_chunks": nc, "bm": bm,
                        "matdeq": matdeq,
                        "us": round(dt * 1e6, 1), "gbs": round(gbs, 1),
                        "roofline_frac": round(gbs / HBM_GBS, 3)})
        print(f"{tag}: {dt*1e6:8.1f} us {gbs:6.1f} GB/s "
              f"({100*gbs/HBM_GBS:.0f}%)", flush=True)
    doc = {"bench": "moe_gather_sweep", "shape": {"E": E, "N": N, "K": K, "T": T},
           "routed_experts": nonempty, "touched_bytes": touched,
           "iters": ITERS, "results": results}
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
