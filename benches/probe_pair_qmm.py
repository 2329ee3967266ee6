"""A/B the decode quant-matmul paths: magic W4A16 vs pair_t W4A16 vs
pair_t W4A8 (round-5 int8 nibble-pair kernel) at Qwen3-4B decode shapes.

The weight-stream diagnostic (benchmark_results/v5e-weight-stream-*.json)
predicted the magic path is VPU-bound and int8-pair extraction runs at
stream speed; this probe measures the production kernels end to end per
projection shape. Harness rules learned in round 5: vary the activation
each call (defeats CSE/hoisting), two-point slope inside one jit
(amortizes the ~25 ms relay round trip), sync via jax.device_get (NOT
block_until_ready — probe_sync.py), record raw t1/t5.

KNOWN-INVALID for small shapes (kept as the incident record): with
8-24 MB weight streams the extra timed calls execute inside the relay's
~24 ms round-trip slack, so the slope reads ~zero whatever the kernel
costs. The instrument that answered the question is
benches/probe_mxu_rate.py; the valid e2e numbers live in
benchmark_results/v5e-pair-qmm-2026-08-22.json's e2e_ab block.

Usage: python benches/probe_pair_qmm.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# Qwen3-4B decode projections: (label, K, N). M = 8 (serving decode rows).
SHAPES = [
    ("qkv", 2560, 6144),
    ("o_proj", 4096, 2560),
    ("gate_up", 2560, 19456),
    ("down", 9728, 2560),
]
M = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.kernels.quant_matmul import quantized_matmul
    from tiny_llm_tpu.ops.quantize import convert_layout, quantize
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)

    rows = []
    for label, K, N in SHAPES:
        w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.05)
        qm = quantize(w)  # magic_t
        qp = convert_layout(qm, "pair_t")
        x0 = jnp.asarray(
            rng.standard_normal((M, K)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wbytes = int(qm.packed.size) * 4  # identical for both layouts

        def timed(qt, act):
            def make(ncalls):
                @jax.jit
                def run(x):
                    def body(t, carry):
                        s, xx = carry
                        for c in range(ncalls):
                            y = quantized_matmul(
                                xx, qt, impl="pallas", act=act
                            )
                            s = s + jnp.sum(y.astype(jnp.float32)) * 1e-6
                            xx = xx + (s * 1e-9).astype(xx.dtype)
                        return s, xx
                    s, _ = jax.lax.fori_loop(
                        0, 8, body, (jnp.float32(0), x)
                    )
                    return s

                return run

            # (2, 10) x 8 outer: the 64-extra-call delta puts the slope
            # well above the relay's ~100 us jitter (the first cut used
            # (1, 5) and every fast shape's t1 == t5 within noise).
            t = {}
            for n in (2, 10):
                run = make(n)
                jax.device_get(run(x0))  # compile + warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.device_get(run(x0))
                    best = min(best, (time.perf_counter() - t0) / 8)
                t[n] = best
            return max((t[10] - t[2]) / 8, 1e-9), t[2], t[10]

        for arm, qt, act in (
            ("magic_a16", qm, "bf16"),
            ("pair_a16", qp, "bf16"),
            ("pair_a8", qp, "int8"),
        ):
            dt, t1, t5 = timed(qt, act)
            gbs = wbytes / dt / 1e9
            rows.append(
                {
                    "shape": label,
                    "K": K,
                    "N": N,
                    "arm": arm,
                    "us": round(dt * 1e6, 2),
                    "weight_gb_s": round(gbs, 0),
                    "raw_t2_us": round(t1 * 1e6, 1),
                    "raw_t10_us": round(t5 * 1e6, 1),
                }
            )
            print(
                f"{label:8s} {arm:10s} {dt*1e6:8.2f} us  {gbs:7.0f} GB/s"
                f"  (t2 {t1*1e6:.0f}, t10 {t5*1e6:.0f})",
                flush=True,
            )

    doc = {"probe": "pair_qmm", "M": M, "rows": rows}
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
