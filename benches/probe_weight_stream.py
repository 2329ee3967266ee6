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

    def consume_kernel(w_ref, o_ref, acc_ref, *, dequant: bool):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

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

    rng = np.random.default_rng(0)
    flat = rng.integers(0, 2**32, size=(M, W, N), dtype=np.uint32)
    w_strided = jnp.asarray(flat)
    w_contig = jnp.asarray(
        flat.reshape(M, W, NK, BN).transpose(0, 2, 1, 3).copy()
    )

    def build(arr, blocked: bool, dequant: bool):
        if blocked:
            spec = pl.BlockSpec((1, 1, W, BN), lambda i, j: (i, j, 0, 0))
        else:
            spec = pl.BlockSpec((1, W, BN), lambda i, j: (i, 0, j))
        return pl.pallas_call(
            functools.partial(consume_kernel, dequant=dequant),
            grid=(M, NK),
            in_specs=[spec],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(arr)

    def timed(arr, blocked, dequant):
        def make_run(ncalls):
            @jax.jit
            def run(seed):
                def body(t, carry):  # noqa
                    s = carry
                    for c in range(ncalls):
                        o = build(
                            arr if not blocked else arr, blocked, dequant
                        )
                        s = s + jnp.sum(o) * (t + c + 1).astype(jnp.float32)
                    return s

                return jax.lax.fori_loop(0, 4, body, seed)

            return run

        t = {}
        for n in (1, 5):
            run = make_run(n)
            jax.block_until_ready(run(jnp.float32(0)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(jnp.float32(0)))
                best = min(best, (time.perf_counter() - t0) / 4)
            t[n] = best
        return max((t[5] - t[1]) / 4, 1e-9), t[1], t[5]

    doc = {"probe": "weight_stream", "bytes_per_pass": total_bytes}
    rows = []
    for label, arr, blocked, dequant in [
        ("strided_stream", w_strided, False, False),
        ("contig_stream", w_contig, True, False),
        ("contig_dequant", w_contig, True, True),
        ("strided_dequant", w_strided, False, True),
    ]:
        dt, t1, t3 = timed(arr, blocked, dequant)
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
