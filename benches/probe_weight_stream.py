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

    def consume_kernel(seed_ref, w_ref, o_ref, acc_ref, *, mode: str):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            # The varying seed makes every call distinct, defeating the
            # CSE/hoisting that zeroed the v2 measurements.
            acc_ref[:] = jnp.full_like(acc_ref, seed_ref[0, 0] * 1e-9)

        w = w_ref[...].reshape(W, BN)
        if mode == "dequant":
            # The production magic extraction (~2 VPU ops/value) plus
            # an fp32 consume (~3 more) — the ~5 ops/value point.
            mask = jnp.uint32(0x000F000F)
            magic = jnp.uint32(0x43004300)
            s = jnp.zeros((W, BN), jnp.float32)
            for sh in range(4):
                t = ((w >> (4 * sh)) & mask) | magic
                v = pltpu.bitcast(t, jnp.bfloat16)  # [2W, BN]
                s = s + v.astype(jnp.float32)[:W] + v.astype(jnp.float32)[W:]
            acc_ref[:] += jnp.sum(s.reshape(-1, 8, 128), axis=0)
        elif mode == "stream":
            # ~1.25 VPU ops/value (mask + convert + reduce-add).
            acc_ref[:] += jnp.sum(
                (w & jnp.uint32(0xFFFF)).astype(jnp.int32).reshape(-1, 8, 128),
                axis=0,
            ).astype(jnp.float32)
        elif mode == "mxu":
            # ZERO elementwise passes: bitcast to bf16 and consume with
            # one MXU dot — the attention-style byte path.
            v = pltpu.bitcast(w, jnp.bfloat16)  # [2W, BN]
            ones = jnp.ones((8, 2 * W), jnp.bfloat16)
            acc_ref[:, :BN if BN <= 128 else 128] += jax.lax.dot_general(
                ones, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, :128]
        elif mode == "int8":
            # Nibble-PAIR extraction (~0.6 VPU ops/value incl. bitcasts)
            # + s8 MXU dots: next round's W4A8-style consumption.
            m4 = jnp.uint32(0x0F0F0F0F)
            e0 = pltpu.bitcast(w & m4, jnp.int8)  # [4W, BN]
            e1 = pltpu.bitcast((w >> 4) & m4, jnp.int8)
            ones = jnp.ones((8, 4 * W), jnp.int8)
            d0 = jax.lax.dot_general(
                ones, e0, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            d1 = jax.lax.dot_general(
                ones, e1, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc_ref[:, :128] += (d0 + d1)[:, :128].astype(jnp.float32)

        @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
        def _():
            o_ref[:] = acc_ref[:]

    # Arrays are generated INSIDE the jit (random bits): a 536 MB closure
    # trips the relay's HTTP 413 payload cap, and layout — not values —
    # is what the experiment varies.
    strided_shape = (M, W, N)
    contig_shape = (M, NK, W, BN)

    def build(arr, blocked: bool, mode: str, seed):
        if blocked:
            spec = pl.BlockSpec((1, 1, W, BN), lambda i, j: (i, j, 0, 0))
        else:
            spec = pl.BlockSpec((1, W, BN), lambda i, j: (i, 0, j))
        return pl.pallas_call(
            functools.partial(consume_kernel, mode=mode),
            grid=(M, NK),
            in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0)), spec],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(seed.reshape(1, 1), arr)

    def timed(shape, blocked, mode):
        def make_run(ncalls):
            @jax.jit
            def run(seed):
                arr = jax.random.bits(
                    jax.random.PRNGKey(0), shape, jnp.uint32
                )

                def body(t, carry):  # noqa
                    s = carry
                    for c in range(ncalls):
                        o = build(arr, blocked, mode, s + t.astype(jnp.float32))
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
    for label, shape, blocked, mode in [
        ("strided_stream", strided_shape, False, "stream"),
        ("contig_stream", contig_shape, True, "stream"),
        ("contig_dequant", contig_shape, True, "dequant"),
        ("strided_dequant", strided_shape, False, "dequant"),
        ("contig_mxu_consume", contig_shape, True, "mxu"),
        ("contig_int8_extract", contig_shape, True, "int8"),
    ]:
        dt, t1, t3 = timed(shape, blocked, mode)
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
