"""Fat-N decode matmul probe (round-4 VERDICT item #1).

The per-op ledger shows the magic_t decode kernel at ~100% of the
weight-bandwidth roofline for qkv (N=6144, K=2560) and o_proj, but only
~81% for the two fat-N shapes (fused gate/up N=19456 and mlp-down
N=2560/K=9728) and 87% for the LM head (N=151936). Same kernel, same K
for qkv vs gate/up — so the loss is a function of N. Two hypotheses:

1. Block size: the bn heuristic clamps at 1024; fat-N shapes may want
   wider blocks (fewer grid steps). Swept via the `block_n` arg.
2. HBM stride: packed_t is [Kp/8, N] u32, so an n-block DMA reads
   Kp/8 rows of bn*4 contiguous bytes strided by N*4. For gate/up the
   row payload is 4 KB at a 77.8 KB stride; for qkv the stride is
   24.6 KB. If strided row gathers lose HBM efficiency at large
   stride, the fix is a tiled weight layout (contiguous n-blocks).
   Isolated by the `split` arm: k separate weight arrays of N/k lanes
   each — every call streams a (smaller-stride) weight at identical
   total traffic and identical kernel code.

Methodology: chained-dependency fori_loop, slope between two chain
lengths cancels the per-iteration dispatch floor (PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from tiny_llm_tpu.ops.quantize import quantize, dequantize
from tiny_llm_tpu.kernels.quant_matmul import _qmm_magic_pallas

SHAPES = {
    "qkv": (6144, 2560),
    "gate_up": (19456, 2560),
    "down": (2560, 9728),
    "lm_head": (151936, 2560),
}


def roofline_us(qt) -> float:
    b = qt.packed.size * 4 + qt.scales.size * qt.scales.dtype.itemsize * 2
    return b / 819e3


def slope_us(call, xp, iters, chain):
    """us per `call` application, slope between chain and 3*chain."""

    def make_loop(c):
        @jax.jit
        def loop(x0):
            def body(i, carry):
                s, xx = carry
                for _ in range(c):
                    o = call(xx)
                    # Depend on EVERY output column: a single-column feed
                    # lets XLA dead-code-eliminate whole kernels in the
                    # split arm (intermediate concatenate shards are dead).
                    upd = jnp.tanh(o.astype(jnp.float32).sum() * 1e-3)
                    xx = xx + upd.astype(jnp.bfloat16) * 1e-6
                return (s + o.astype(jnp.float32).sum(), xx)

            return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))

        return loop

    times = {}
    for c in (chain, chain * 3):
        loop = make_loop(c)
        jax.device_get(loop(xp)[0])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(loop(xp)[0])
            best = min(best, time.perf_counter() - t0)
        times[c] = best
    return (times[chain * 3] - times[chain]) / (iters * 2 * chain) * 1e6


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*", default=["gate_up", "down", "lm_head", "qkv"])
    p.add_argument("--bns", type=int, nargs="*", default=[512, 1024, 2048])
    p.add_argument("--splits", type=int, nargs="*", default=[1, 4])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--chain", type=int, default=36)
    args = p.parse_args()

    rows = []
    for name in args.shapes:
        N, K = SHAPES[name]
        w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32) * 0.05
        qt = quantize(w, group_size=128, bits=4, layout="magic_t")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (0, qt.k_padded - K))) if qt.k_padded != K else x
        ref = x.astype(jnp.float32) @ dequantize(qt, jnp.float32).T
        rl = roofline_us(qt)

        # Arm 1: bn sweep on the monolithic weight.
        for bn in args.bns:
            if bn > N:
                continue

            def call(xx, bn=bn):
                return _qmm_magic_pallas(
                    xx, qt.packed, qt.scales, qt.biases,
                    group_size=128, bits=4, block_n=bn)

            err = float(jnp.max(jnp.abs(call(xp).astype(jnp.float32) - ref)))
            us = slope_us(call, xp, args.iters, args.chain)
            rows.append({
                "shape": name, "arm": f"bn={bn}", "us": round(us, 2),
                "roofline_us": round(rl, 2),
                "eff_pct": round(100 * rl / us, 1), "maxerr": round(err, 4)})
            print(json.dumps(rows[-1]), flush=True)

        # Arm 2: split-N — ns separate weights of N/ns lanes (smaller HBM
        # row stride), same kernel, same total traffic, bn clamped to the
        # shard so grid-step count stays comparable.
        for ns in args.splits:
            if ns == 1 or N % ns or (N // ns) % 256:
                continue
            shard = N // ns
            qts = [
                quantize(w[i * shard : (i + 1) * shard], group_size=128,
                         bits=4, layout="magic_t")
                for i in range(ns)
            ]

            def call(xx, qts=qts):
                outs = [
                    _qmm_magic_pallas(
                        xx, q.packed, q.scales, q.biases,
                        group_size=128, bits=4)
                    for q in qts
                ]
                return jnp.concatenate(outs, axis=-1)

            err = float(jnp.max(jnp.abs(call(xp).astype(jnp.float32) - ref)))
            us = slope_us(call, xp, args.iters, args.chain)
            rows.append({
                "shape": name, "arm": f"split={ns}", "us": round(us, 2),
                "roofline_us": round(rl, 2),
                "eff_pct": round(100 * rl / us, 1), "maxerr": round(err, 4)})
            print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"metric": "fatn_probe", "rows": rows}))


if __name__ == "__main__":
    main()
