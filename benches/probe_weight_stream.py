"""Why does the W4A16 weight stream cap at ~920 GB/s on a chip whose
attention streams KV at 2.17 TB/s? (round-5 hardware-identity corollary)

Three arms, identical bytes (134 MB of packed uint32 per pass), two-point
slope inside one jit:

  A. strided  — blocks (512, 1024) cut from a [8, 512, 8192] row-major
     array: each block row is a 4 KiB strided segment (the production
     matmul's [Kp/8, bn] layout with bn < N);
  B. contig   — the same 2 MiB blocks stored block-major
     ([8, 8, 512, 1024]): one contiguous DMA per block;
  C. dequant  — arm B's blocks + the magic-bitcast nibble extraction
     (4 shift/and/or/bitcast chains per word, the production inner
     loop) into a throwaway accumulator.

A==B==2 TB/s, C slow  -> VPU-bound dequant (kernel redesign needed).
A~920, B~2 TB/s       -> DMA layout-bound (relayout the packed weights).
A==B~920              -> something else (descriptor rate / block size).

Usage: python benches/probe_weight_stream.py [out.json]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    M, W, N, BN = 32, 512, 8192, 1024
    NK = N // BN
    total_bytes = M * W * N * 4

    def consume_kernel(seed_ref, w_ref, o_ref, acc_ref, *, dequant: bool):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            # The varying seed makes every call distinct, defeating the
            # CSE/hoisting that zeroed the v2 measurements.
            acc_ref[:] = jnp.full_like(acc_ref, seed_ref[0, 0] * 1e-9)

        w = w_ref[...].reshape(W, BN)
        if dequant:
            mask = jnp.uint32(0x000F000F)
            magic = jnp.uint32(0x43004300)
            s = jnp.zeros((W, BN), jnp.float32)
            for sh in range(4):
                t = ((w >> (4 * sh)) & mask) | magic
                v = pltpu.bitcast(t, jnp.bfloat16)  # [2W, BN]
                s = s + v.astype(jnp.float32)[:W] + v.astype(jnp.float32)[W:]
            acc_ref[:] += jnp.sum(s.reshape(-1, 8, 128), axis=0)
        else:
            acc_ref[:] += jnp.sum(
                (w & jnp.uint32(0xFFFF)).astype(jnp.int32).reshape(-1, 8, 128),
                axis=0,
            ).astype(jnp.float32)

        @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
        def _():
            o_ref[:] = acc_ref[:]

    # Arrays are generated INSIDE the jit (random bits): a 536 MB closure
    # trips the relay's HTTP 413 payload cap, and layout — not values —
    # is what the experiment varies.
    strided_shape = (M, W, N)
    contig_shape = (M, NK, W, BN)

    def build(arr, blocked: bool, dequant: bool, seed):
        if blocked:
            spec = pl.BlockSpec((1, 1, W, BN), lambda i, j: (i, j, 0, 0))
        else:
            spec = pl.BlockSpec((1, W, BN), lambda i, j: (i, 0, j))
        return pl.pallas_call(
            functools.partial(consume_kernel, dequant=dequant),
            grid=(M, NK),
            in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0)), spec],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(seed.reshape(1, 1), arr)

    def timed(shape, blocked, dequant):
        def make_run(ncalls):
            @jax.jit
            def run(seed):
                arr = jax.random.bits(
                    jax.random.PRNGKey(0), shape, jnp.uint32
                )

                def body(t, carry):  # noqa
                    s = carry
                    for c in range(ncalls):
                        o = build(arr, blocked, dequant, s + t.astype(jnp.float32))
                        s = s + jnp.sum(o) * 1e-6
                    return s

                return jax.lax.fori_loop(0, 4, body, seed)

            return run

        t = {}
        for n in (1, 5):
            run = make_run(n)
            # device_get, NOT block_until_ready: the latter returns
            # before remote completion on this relay (probe_sync.py).
            jax.device_get(run(jnp.float32(0)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(run(jnp.float32(0)))
                best = min(best, (time.perf_counter() - t0) / 4)
            t[n] = best
        return max((t[5] - t[1]) / 4, 1e-9), t[1], t[5]

    doc = {"probe": "weight_stream", "bytes_per_pass": total_bytes}
    rows = []
    for label, shape, blocked, dequant in [
        ("strided_stream", strided_shape, False, False),
        ("contig_stream", contig_shape, True, False),
        ("contig_dequant", contig_shape, True, True),
        ("strided_dequant", strided_shape, False, True),
    ]:
        dt, t1, t3 = timed(shape, blocked, dequant)
        gbs = total_bytes / dt / 1e9
        rows.append({"arm": label, "us_per_pass": round(dt * 1e6, 1),
                     "gb_s": round(gbs, 0),
                     "raw_t1_us": round(t1 * 1e6, 1),
                     "raw_t5_us": round(t3 * 1e6, 1)})
        print(f"{label:16s} {dt*1e6:9.1f} us/pass  {gbs:7.0f} GB/s "
              f"(t1 {t1*1e6:.0f}, t5 {t3*1e6:.0f})", flush=True)
    doc["rows"] = rows
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
