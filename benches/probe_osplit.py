"""K-split probe for the magic_t decode matmul (VERDICT round-1 item #4).

o_proj ([N=2560, K=4096]) ran at 59-75% of its weight-bandwidth roofline:
with bn=512 the kernel has only 5 sequential grid steps, so pipeline
fill/drain dominates. Splitting K multiplies the step count at identical
total traffic. This probe validates numerics on-device vs the XLA
dequant path and sweeps k_split at the decode shapes.
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
    "o_proj": (2560, 4096),
    "down": (2560, 9728),
    "qkv": (6144, 2560),
}


def roofline_us(qt) -> float:
    bytes_ = qt.packed.size * 4 + qt.scales.size * qt.scales.dtype.itemsize * 2
    return bytes_ / 819e3  # us at 819 GB/s


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*", default=["o_proj", "down"])
    p.add_argument("--splits", type=int, nargs="*", default=[1, 2, 4, 8])
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
        for nk in args.splits:
            out = _qmm_magic_pallas(
                xp, qt.packed, qt.scales, qt.biases,
                group_size=128, bits=4, k_split=nk)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            assert err < 0.5, (name, nk, err)

            def make_loop(chain):
                @jax.jit
                def loop(x0):
                    def body(i, carry):
                        s, xx = carry
                        for _ in range(chain):
                            o = _qmm_magic_pallas(
                                xx, qt.packed, qt.scales, qt.biases,
                                group_size=128, bits=4, k_split=nk)
                            # serial dependency: fold o back into x
                            upd = jnp.tanh(o[:, :1]).astype(jnp.bfloat16)
                            xx = xx + upd * 1e-6
                        return (s + o.astype(jnp.float32).sum(), xx)
                    return jax.lax.fori_loop(
                        0, args.iters, body, (jnp.float32(0), x0))
                return loop

            # Slope between two chain lengths cancels the per-iteration
            # dispatch floor (~1.25 ms) exactly (PERFORMANCE.md method).
            c1, c2 = args.chain, args.chain * 3
            times = {}
            for c in (c1, c2):
                loop = make_loop(c)
                jax.device_get(loop(xp)[0])
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    jax.device_get(loop(xp)[0])
                    best = min(best, time.perf_counter() - t0)
                times[c] = best
            us = (times[c2] - times[c1]) / (args.iters * (c2 - c1)) * 1e6
            rows.append({"shape": name, "k_split": nk,
                         "us": round(us, 2), "roofline_us": round(rl, 2),
                         "eff_pct": round(100 * rl / us, 1),
                         "maxerr": round(err, 4)})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "magic_qmm_k_split_probe", "rows": rows}))


if __name__ == "__main__":
    main()
