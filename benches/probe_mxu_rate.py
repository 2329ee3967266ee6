"""Measure the MXU weight-consumption rate law at decode M.

Round-5 W4A8 follow-up: the pair kernel removed ~4x of the dequant VPU
work yet the model ceiling moved only ~5%. Hypothesis: at M = 8 a
[8, 128] x [128, 128] bf16 MXU tile costs ~M cycles, so the matmul
consumes 128*128 weights per ~8 cycles ~= 1 KB(W4)/cycle ~= 960 GB/s at
the v5e clock — the observed "920 GB/s floor" is the MXU ISSUE RATE at
small M, not HBM and not the VPU. If true: (a) the rate should scale
with M up to ~128; (b) s8 x s8 dots lift it 2x ONLY if Mosaic emits
native int8 MXU ops rather than converting.

All arms run on VMEM-RESIDENT weights (one [Kb, bn] block re-dotted
ITER times inside the kernel) — zero HBM traffic in the timed loop, so
the measured rate is pure issue rate. Two-point slope on the inner
iteration count cancels kernel launch + relay overheads.

Usage: python benches/probe_mxu_rate.py [out.json]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

Kb, BN = 512, 1024  # VMEM-resident weight tile: 512x1024


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None

    def make_kernel(m, dtype, iters, depth):
        """x [m, Kb] . w [Kb, BN] as depth-`depth` chunked dots, `iters`
        times, accumulating f32/int32; weights stay in VMEM."""

        def kern(x_ref, w_ref, seed_ref, o_ref, acc_ref):
            acc_ref[:] = jnp.full_like(acc_ref, seed_ref[0, 0])

            def body(t, carry):
                s = carry
                for lo in range(0, Kb, depth):
                    if dtype == "int8":
                        d = jax.lax.dot_general(
                            x_ref[:, lo : lo + depth],
                            w_ref[lo : lo + depth, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32)
                    else:
                        d = jax.lax.dot_general(
                            x_ref[:, lo : lo + depth],
                            w_ref[lo : lo + depth, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    # Fold with a t-dependent scalar so no iteration is
                    # CSE-able; one mul+add per chunk mirrors the
                    # production per-group scale fold.
                    s = s + d * (1e-9 * (t + 1).astype(jnp.float32))
                return s

            acc_ref[:] += jax.lax.fori_loop(
                0, iters, body, jnp.zeros((m, BN), jnp.float32)
            )
            o_ref[:] = acc_ref[:]

        return kern

    def timed(m, dtype, depth):
        jdt = jnp.int8 if dtype == "int8" else jnp.bfloat16
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.integers(-4, 5, size=(m, Kb)).astype(np.float32)
        ).astype(jdt)
        w = jnp.asarray(
            rng.integers(-4, 5, size=(Kb, BN)).astype(np.float32)
        ).astype(jdt)

        def run_n(iters):
            kern = make_kernel(m, dtype, iters, depth)

            @jax.jit
            def go(x, w, seed):
                return pl.pallas_call(
                    kern,
                    in_specs=[
                        pl.BlockSpec((m, Kb), lambda: (0, 0)),
                        pl.BlockSpec((Kb, BN), lambda: (0, 0)),
                        pl.BlockSpec((1, 1), lambda: (0, 0)),
                    ],
                    out_specs=pl.BlockSpec((m, BN), lambda: (0, 0)),
                    out_shape=jax.ShapeDtypeStruct((m, BN), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((m, BN), jnp.float32)],
                )(x, w, seed.reshape(1, 1))

            jax.device_get(go(x, w, jnp.float32(0)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(go(x, w, jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            return best

        # Iteration counts sized so the hi arm's device compute is
        # multiple ms — the axon relay absorbs sub-ms compute deltas
        # inside its ~24 ms round trip (probe_pair_qmm first cut lost
        # every small shape to this), so the slope must dwarf it.
        iters_hi = max(2000, 3_000_000 // (4 * m))
        iters_lo = iters_hi // 5
        t_lo, t_hi = run_n(iters_lo), run_n(iters_hi)
        dt = max((t_hi - t_lo) / (iters_hi - iters_lo), 1e-12)
        macs = m * Kb * BN
        tiles = (Kb // 128) * (BN // 128)
        cyc_per_tile_940 = dt * 0.94e9 / tiles
        w4_gbs = (Kb * BN // 2) / dt / 1e9  # rate in W4-packed bytes
        return {
            "M": m,
            "dtype": dtype,
            "depth": depth,
            "ns_per_dot_pass": round(dt * 1e9, 1),
            "cycles_per_128x128_tile_at_940MHz": round(cyc_per_tile_940, 2),
            "equiv_w4_stream_gb_s": round(w4_gbs, 0),
            "tflops": round(2 * macs / dt / 1e12, 1),
        }

    rows = []
    for m, dtype, depth in [
        (8, "bf16", 128),
        (8, "bf16", 512),
        (8, "int8", 128),
        (8, "int8", 512),
        (16, "bf16", 128),
        (32, "bf16", 128),
        (64, "bf16", 128),
        (128, "bf16", 128),
        (128, "int8", 128),
    ]:
        r = timed(m, dtype, depth)
        rows.append(r)
        print(
            f"M={r['M']:<4d} {r['dtype']:5s} depth={r['depth']:<4d} "
            f"{r['ns_per_dot_pass']:>8.1f} ns/pass  "
            f"{r['cycles_per_128x128_tile_at_940MHz']:>6.2f} cyc/tile  "
            f"eqW4 {r['equiv_w4_stream_gb_s']:>6.0f} GB/s  "
            f"{r['tflops']:>5.1f} TFLOPs",
            flush=True,
        )

    doc = {"probe": "mxu_rate", "Kb": Kb, "BN": BN, "rows": rows}
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
