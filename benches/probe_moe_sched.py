"""MoE ragged-kernel schedule probe (VERDICT round-1 item #2).

Decomposes the magic_t ragged kernel's per-visit cost at the
Qwen3-30B-A3B decode shape by running crippled variants of the SAME
schedule (grid, BlockSpecs, metadata walk):

  full    - the production kernel
  stream  - weight blocks are DMA'd but the body only folds a checksum
  dots    - extraction + MXU dots, no scale/bias fold, no row mask
  nofold  - extraction only (no dots, no fold)

If `stream` ~= `full`, the walk is DMA/pipeline-bound and the fix is
fetch structure (multi-expert gather tiles); if `stream` << `full`, the
fix is compute structure (staged dots, coarser accumulation).

Usage: PYTHONPATH=/root/repo python benches/probe_moe_sched.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_llm_tpu.kernels.moe_matmul import (
    _cdiv,
    _group_metadata,
    _gqmm_block_sizes,
)
from benches.bench_moe_gqmm import stack_experts

ITERS = 30


def _variant_kernel(
    gids_ref, mtids_ref, flags_ref, goffs_ref,
    x_ref, w_ref, s_ref, b_ref,
    out_ref,
    acc_ref,
    *, group_size: int, bm: int, mode: str,
):
    i = pl.program_id(1)
    flag = flags_ref[i]
    gs = group_size
    half = gs // 2
    num_sg = w_ref.shape[1] // half
    mask = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)

    @pl.when((flag >> 1) & 1 == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(flag & 1 == 1)
    def _():
        g = gids_ref[i]
        row0 = mtids_ref[i] * bm
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
        rmask = (rows >= goffs_ref[g]) & (rows < goffs_ref[g + 1])
        x = jnp.where(rmask, x_ref[:], jnp.zeros_like(x_ref))
        if mode == "stream":
            # touch the whole weight block so the DMA cannot be elided,
            # with near-zero compute
            w_i32 = pltpu.bitcast(w_ref[0, :, 0:128], jnp.int32)
            acc_ref[0:1, 0:1] += jnp.sum(w_i32).astype(jnp.float32) * 1e-30
            return
        for sg in range(num_sg):
            words = w_ref[0, sg * half : (sg + 1) * half, :]
            for j in range(4):
                gq = sg * 4 + j
                t = ((words >> (4 * j)) & mask) | magic
                v = pltpu.bitcast(t, jnp.bfloat16)
                if mode == "nofold":
                    acc_ref[0:1, :] += jnp.sum(
                        v.astype(jnp.float32), axis=0, keepdims=True
                    ) * 1e-30
                    continue
                xg = x[:, gq * gs : (gq + 1) * gs]
                d = jax.lax.dot_general(
                    xg, v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if mode == "dots":
                    acc_ref[:] += d
                else:  # full
                    xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                    s = s_ref[0, gq : gq + 1, :].astype(jnp.float32)
                    c = b_ref[0, gq : gq + 1, :].astype(jnp.float32) - 128.0 * s
                    acc_ref[:] += d * s + xs * c

    @pl.when((flag >> 2) & 1 == 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "mode", "bn_override"))
def variant_call(x_pad, packed, scales, biases, group_sizes,
                 group_size=128, mode="full", bn_override=0):
    T, K = x_pad.shape
    E, _, N = packed.shape
    G = scales.shape[1]
    bm, bn = _gqmm_block_sizes(T, N, K)
    if bn_override:
        bn = bn_override
    tiles_m = _cdiv(T, bm)
    tiles_n = _cdiv(N, bn)
    gids, mtids, flags, goffs = _group_metadata(group_sizes, T, bm, E, tiles_m)
    num_logical = jnp.sum(
        jnp.where(
            group_sizes > 0,
            (jnp.cumsum(group_sizes) + bm - 1) // bm
            - (jnp.cumsum(group_sizes) - group_sizes) // bm,
            0,
        )
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tiles_n, num_logical),
        in_specs=[
            pl.BlockSpec((bm, K), lambda n, i, *s: (s[1][i], 0)),
            pl.BlockSpec((1, K // 8, bn), lambda n, i, *s: (s[0][i], 0, n)),
            pl.BlockSpec((1, G, bn), lambda n, i, *s: (s[0][i], 0, n)),
            pl.BlockSpec((1, G, bn), lambda n, i, *s: (s[0][i], 0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, i, *s: (s[1][i], n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    kernel = functools.partial(
        _variant_kernel, group_size=group_size, bm=bm, mode=mode
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), x_pad.dtype),
    )(gids, mtids, flags, goffs, x_pad, packed, scales, biases)


def main():
    import sys

    E, N, K, T = 128, 768, 2048, 64
    modes = sys.argv[1:] or ["full", "stream"]
    qt = stack_experts(E, N, K, layout="magic_t")
    rng = np.random.default_rng(1)
    ids = np.sort(rng.integers(0, E, size=T))
    sizes = jnp.asarray(np.bincount(ids, minlength=E), jnp.int32)
    x = jnp.asarray(rng.normal(size=(T, qt.k_padded)), jnp.bfloat16)
    routed = int((np.bincount(ids, minlength=E) > 0).sum())
    touched = routed * (N * K // 2 + 2 * N * (K // 128) * 2)
    print(f"E={E} N={N} K={K} T={T} routed={routed} "
          f"touched={touched/1e6:.1f}MB min_us={touched/819e3:.1f}", flush=True)

    for mode in modes:
        bn_override = 0
        if ":" in mode:
            mode, bn_s = mode.split(":")
            bn_override = int(bn_s)

        @jax.jit
        def run(x0, mode=mode, bn_override=bn_override):
            def body(i, carry):
                s, xx = carry
                y = variant_call(xx, qt.packed, qt.scales, qt.biases, sizes,
                                 mode=mode, bn_override=bn_override)
                xx = xx + (jnp.sum(y[:1, :1]) * 1e-6).astype(xx.dtype)
                return (s + jnp.float32(1), xx)
            return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), x0))

        jax.device_get(run(x)[0])
        t0 = time.perf_counter()
        jax.device_get(run(x)[0])
        us = (time.perf_counter() - t0) / ITERS * 1e6
        print(f"{mode:10s} bn={bn_override or 'auto'} {us:9.1f} us "
              f"({touched/us/1e3:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
