"""bn sweep for the magic-walk MoE kernel (round-5 whole-expert blocks).

The round-5 chooser prefers bn = N (whole-expert blocks). Same-session
A/B showed that helps gate/up (N=768: 374 -> 482 GB/s) but HURTS the
down projection (N=2048: bn=512 measured 42.9 us in round 3's session
vs 93.9 us for bn=2048 today). This probe sweeps forced bn per shape in
ONE session so the chooser rule is picked from same-noise numbers.

Usage: python benches/probe_moe_bn_sweep.py [out.json]
"""

from __future__ import annotations

import json
import sys

import jax
import numpy as np
import jax.numpy as jnp

from tiny_llm_tpu.kernels.moe_matmul import _gqmm_gather_pallas, _gqmm_magic_pallas

sys.path.insert(0, "benches")
from bench_moe_gather_ab import HBM_GBS, stack_experts, timed  # noqa: E402


def main():
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}", flush=True)
    E, T = 128, 64
    rows = []
    for N, K, bns in [
        (768, 2048, [256, 384, 768]),
        (2048, 768, [256, 512, 1024, 2048]),
    ]:
        qt = stack_experts(E, N, K)
        rng = np.random.default_rng(1)
        ids = np.sort(rng.integers(0, E, size=T))
        counts = np.bincount(ids, minlength=E)
        sizes = jnp.asarray(counts, jnp.int32)
        x = jnp.asarray(rng.normal(size=(T, qt.k_padded)), jnp.bfloat16)
        nonempty = int((counts > 0).sum())
        touched = nonempty * (N * K // 2 + 2 * N * (K // qt.group_size) * 2)
        row = {"N": N, "K": K, "T": T, "routed": nonempty,
               "touched_mb": round(touched / 1e6, 1)}
        print(f"\n[N={N} K={K}] routed={nonempty}", flush=True)

        def walk_call(bn):
            def call(xx, ss):
                return _gqmm_magic_pallas(
                    xx, qt.packed, qt.scales, qt.biases, ss,
                    group_size=qt.group_size, bits=qt.bits, bn=bn,
                )
            return call

        def gather_call(xx, ss):
            return _gqmm_gather_pallas(
                xx, qt.packed, qt.scales, qt.biases, ss,
                group_size=qt.group_size, bits=qt.bits,
            )

        for bn in bns:
            dt = timed(walk_call(bn), x, sizes)
            gbs = touched / dt / 1e9
            row[f"walk_bn{bn}_us"] = round(dt * 1e6, 1)
            row[f"walk_bn{bn}_gbs"] = round(gbs, 1)
            print(f"  walk bn={bn:5d} {dt*1e6:8.1f} us {gbs:7.1f} GB/s "
                  f"({100*gbs/HBM_GBS:.0f}%)", flush=True)
        dt = timed(gather_call, x, sizes)
        row["gather_us"] = round(dt * 1e6, 1)
        row["gather_gbs"] = round(touched / dt / 1e9, 1)
        print(f"  gather      {dt*1e6:8.1f} us {touched/dt/1e9:7.1f} GB/s",
              flush=True)
        rows.append(row)
    doc = {"bench": "moe_bn_sweep", "device": dev.device_kind,
           "hbm_gbs_assumed": HBM_GBS, "results": rows}
    print("\n" + json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
