"""A/B of the MoE decode-regime expert-gather schedule vs alternatives.

Round-2 wired `_gqmm_gather_pallas` in as the decode default (T <= 256,
kernels/moe_matmul.py) without recording its achieved bandwidth.  This
bench closes that evidence gap: at the Qwen3-30B-A3B decode shapes it
measures, schedule-by-schedule,

  * gather   — `_gqmm_gather_pallas` (manual multi-buffered expert DMA)
  * walk     — `_gqmm_magic_pallas` (pipelined logical-tile BlockSpec walk)
  * xla      — dequantize full expert stack + `lax.ragged_dot`

and reports us/call, effective GB/s over the weights actually touched,
and the fraction of the single-chip HBM roofline.  Writes a JSON line
per config plus a summary file under benchmark_results/.

TWO-POINT SLOPE methodology: the chained fori_loop harness carries a
~480 us per-iteration floor on this relay (measured with a pure-XLA
control body and an empty Pallas copy kernel — both ~480 us; see
PERFORMANCE.md "MoE" section). A single-call-per-iteration total
therefore swamps sub-100-us kernels. Each config is timed with 1 and 3
calls per loop body; per-call cost = (t3 - t1) / 2, which cancels the
floor exactly — the same discipline as the quant_matmul per-op ledger.

Usage: python benches/bench_moe_gather_ab.py [out.json] [config_idx ...]
(each config costs ~2 min of remote kernel compile; default runs 0 1)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.kernels.moe_matmul import (
    GATHER_MAX_T,
    _gqmm_gather_pallas,
    _gqmm_magic_pallas,
)
from tiny_llm_tpu.ops.quantize import dequantize, quantize_stacked

ITERS = 50
# v5e HBM read bandwidth (measured ceiling used across PERFORMANCE.md).
HBM_GBS = 819.0


def stack_experts(E, N, K, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(E, N, K)).astype(np.float32) * 0.1)
    return jax.jit(
        quantize_stacked, static_argnames=("group_size", "bits", "layout")
    )(w, layout="magic_t")


def xla_grouped(x, qt, group_sizes):
    w = dequantize(qt, jnp.bfloat16)
    return jax.lax.ragged_dot(
        x,
        jnp.swapaxes(w[..., : qt.in_features], 1, 2),
        group_sizes,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def kernel_call(fn, qt):
    def call(x, group_sizes):
        return fn(
            x,
            qt.packed,
            qt.scales,
            qt.biases,
            group_sizes,
            group_size=qt.group_size,
            bits=qt.bits,
        )

    return call


def timed(call, x, sizes):
    """Per-call cost by two-point slope: (t[3 calls] - t[1 call]) / 2."""

    def make_run(ncalls):
        @jax.jit
        def run(x0):
            def body(i, xx):
                for _ in range(ncalls):
                    y = call(xx, sizes)
                    xx = xx + (jnp.sum(y[:1, :1]) * 1e-6).astype(xx.dtype)
                return xx

            return jax.lax.fori_loop(0, ITERS, body, x0)

        return run

    t = {}
    for n in (1, 3):
        run = make_run(n)
        jax.block_until_ready(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        t[n] = best
    return max((t[3] - t[1]) / 2, 1e-9)


CONFIGS = [
    # (E, N, K, T, label)
    (128, 768, 2048, 64, "gate_up_decode_T64"),
    (128, 2048, 768, 64, "down_decode_T64"),
    (128, 768, 2048, 8, "gate_up_decode_T8"),
    (128, 768, 2048, 256, "gate_up_boundary_T256"),
]


def main():
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    picks = [int(a) for a in sys.argv[2:]] or [0, 1]
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}", flush=True)
    results = []
    if out_path and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f).get("results", [])
        done = {r["label"] for r in results}
        print(f"resuming; already have {sorted(done)}", flush=True)
        picks = [i for i in picks if CONFIGS[i][4] not in done]
    for E, N, K, T, label in [CONFIGS[i] for i in picks]:
        qt = stack_experts(E, N, K)
        rng = np.random.default_rng(1)
        ids = np.sort(rng.integers(0, E, size=T))
        counts = np.bincount(ids, minlength=E)
        sizes = jnp.asarray(counts, jnp.int32)
        x = jnp.asarray(rng.normal(size=(T, qt.k_padded)), jnp.bfloat16)
        nonempty = int((counts > 0).sum())
        # bytes the schedule must move: packed nibbles + scales/biases of
        # every routed expert (the gather schedule's lower bound).
        touched = nonempty * (N * K // 2 + 2 * N * (K // qt.group_size) * 2)
        row = {
            "label": label,
            "E": E,
            "N": N,
            "K": K,
            "T": T,
            "routed_experts": nonempty,
            "touched_bytes": touched,
        }
        print(f"\n[{label}] routed={nonempty} touched={touched/1e6:.1f} MB",
              flush=True)
        for name, call in [
            ("gather", kernel_call(_gqmm_gather_pallas, qt)),
            ("walk", kernel_call(_gqmm_magic_pallas, qt)),
            # XLA path takes logical-K activations; kernels take padded.
            ("xla", lambda xx, ss: xla_grouped(xx[:, :K], qt, ss)),
        ]:
            dt = timed(call, x, sizes)
            # XLA reads the FULL stack (dequant of all E experts).
            moved = E * (N * K // 2) if name == "xla" else touched
            gbs = moved / dt / 1e9
            row[name + "_us"] = round(dt * 1e6, 1)
            row[name + "_gbs"] = round(gbs, 1)
            row[name + "_roofline_frac"] = round(gbs / HBM_GBS, 3)
            print(f"  {name:8s} {dt*1e6:9.1f} us  {gbs:7.1f} GB/s "
                  f"({100*gbs/HBM_GBS:.0f}% roofline)", flush=True)
        row["gather_vs_walk"] = round(row["walk_us"] / row["gather_us"], 2)
        row["gather_vs_xla"] = round(row["xla_us"] / row["gather_us"], 2)
        print(f"  gather vs walk {row['gather_vs_walk']}x, "
              f"vs xla {row['gather_vs_xla']}x", flush=True)
        results.append(row)
    doc = {
        "bench": "moe_gather_ab",
        "device": dev.device_kind,
        "backend": jax.default_backend(),
        "gather_max_t": GATHER_MAX_T,
        "iters": ITERS,
        "hbm_gbs_assumed": HBM_GBS,
        "results": results,
    }
    print("\n" + json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
