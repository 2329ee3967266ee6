"""Fused decode-attention kernel cost probe (round-4).

The whole-model profile shows fused_decode_attention at ~10 us/call at
serving shapes (Qwen3-4B: Hkv=8, n_rep=4, window 1024, ctx ~130) where
the plain _flash_decode ran ~4.4 us. The fused kernel eliminates ~8-10 us
of XLA glue per layer so it still nets out ahead, but the fixed cost is
2x the old kernel's. This probe slope-measures the kernel against
_flash_decode at matched shapes and sweeps the tile size to localize the
overhead (DMA volume vs per-tile bookkeeping vs prologue recompute).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from tiny_llm_tpu.kernels.fused_decode_attention import fused_decode_attention
from tiny_llm_tpu.kernels.flash_attention_pallas import _flash_decode
from tiny_llm_tpu.ops.rope import rope_tables


def slope_us(call, x0, iters, chain):
    def make_loop(c):
        @jax.jit
        def loop(x0):
            def body(i, carry):
                s, xx = carry
                for _ in range(c):
                    o = call(xx)
                    upd = jnp.tanh(o.astype(jnp.float32).sum() * 1e-3)
                    xx = xx + upd.astype(xx.dtype) * 1e-6
                return (s + o.astype(jnp.float32).sum(), xx)

            return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))

        return loop

    times = {}
    for c in (chain, chain * 3):
        loop = make_loop(c)
        jax.device_get(loop(x0)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(loop(x0)[0])
            best = min(best, time.perf_counter() - t0)
        times[c] = best
    return (times[chain * 3] - times[chain]) / (iters * 2 * chain) * 1e6


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=130)
    p.add_argument("--window", type=int, default=1024)
    p.add_argument("--bss", type=int, nargs="*", default=[256, 512, 1024])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--chain", type=int, default=18)
    args = p.parse_args()

    B, Hkv, n_rep, D = 1, 8, 4, 128
    S = args.window
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    qkv = jax.random.normal(ks[0], (B, Hkv, n_rep + 2, D), jnp.bfloat16)
    keys = jax.random.normal(ks[1], (1, B, Hkv, S, D), jnp.bfloat16)
    values = jax.random.normal(ks[2], (1, B, Hkv, S, D), jnp.bfloat16)
    qw = jax.random.normal(ks[3], (D,), jnp.float32) * 0.1 + 1.0
    kw = jax.random.normal(ks[4], (D,), jnp.float32) * 0.1 + 1.0
    cos_t, sin_t = rope_tables(D, S)
    off = jnp.full((B,), args.ctx, jnp.int32)
    cos_r = jnp.take(cos_t, off, axis=0)
    sin_r = jnp.take(sin_t, off, axis=0)
    q = jax.random.normal(ks[5], (B, Hkv * n_rep, 1, D), jnp.bfloat16)
    rows = []

    # Baseline: the plain dense flash decode kernel at the same window.
    def flash_call(qq):
        return _flash_decode(
            qq, keys[0], values[0], off + 1, D ** -0.5, bs=2048
        ).reshape(B, -1)

    us = slope_us(flash_call, q, args.iters, args.chain)
    rows.append({"arm": "_flash_decode bs=2048", "us": round(us, 2)})
    print(json.dumps(rows[-1]), flush=True)

    for bs in args.bss:
        def fused_call(qq, bs=bs):
            a, kr, vr = fused_decode_attention(
                qq.reshape(B, Hkv, n_rep + 2, D)[:, :, : n_rep + 2],
                keys, values, off, cos_r, sin_r, qw, kw,
                layer_idx=0, scale=D ** -0.5, eps=1e-6,
                window=args.window, bs=bs,
            )
            return a.reshape(B, -1)

        x0 = jax.random.normal(ks[5], (B, Hkv, n_rep + 2, D), jnp.bfloat16)

        def call(xx, bs=bs):
            a, kr, vr = fused_decode_attention(
                xx, keys, values, off, cos_r, sin_r, qw, kw,
                layer_idx=0, scale=D ** -0.5, eps=1e-6,
                window=args.window, bs=bs,
            )
            return jnp.concatenate(
                [a.reshape(B, Hkv, n_rep, D),
                 kr.reshape(B, Hkv, 1, D), vr.reshape(B, Hkv, 1, D)],
                axis=2,
            )

        us = slope_us(call, x0, args.iters, args.chain)
        rows.append({"arm": f"fused bs={bs}", "us": round(us, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"metric": "fused_attn_probe", "ctx": args.ctx,
                      "window": args.window, "rows": rows}))


if __name__ == "__main__":
    main()
