"""Grouped quantized matmul (MoE expert layer) microbenchmark.

Compares the fused Pallas ragged kernel (kernels/moe_matmul.py) against
the XLA fallback (dequantize full expert stack + ragged_dot) at
Qwen3-30B-A3B expert shapes. Chained-dependency methodology: ITERS calls
inside one jit, each iteration's input perturbed by the previous output so
XLA cannot CSE the chain; one device dispatch, one host fetch.

Usage: PYTHONPATH=/root/repo python benches/bench_moe_gqmm.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.ops.quantize import (
    QuantizedTensor,
    dequantize,
    quantize,
    quantize_stacked,
)
from tiny_llm_tpu.kernels.moe_matmul import grouped_quantized_matmul

ITERS = 50


def stack_experts(E, N, K, seed=0, layout="sg"):
    # One batched quantize over [E*N, K] — quantization groups are per
    # output row, so flattening experts is exact.
    rng = np.random.default_rng(seed)
    w = jnp.asarray(
        rng.normal(size=(E, N, K)).astype(np.float32) * 0.1, jnp.float32
    )
    return jax.jit(
        quantize_stacked, static_argnames=("group_size", "bits", "layout")
    )(w, layout=layout)


def xla_grouped(x, qt, group_sizes):
    w = dequantize(qt, jnp.bfloat16)
    return jax.lax.ragged_dot(
        x,
        jnp.swapaxes(w[..., : qt.in_features], 1, 2),
        group_sizes,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def chained(fn, x0, qt, group_sizes):
    @jax.jit
    def run(x0):
        def body(i, carry):
            s, x = carry
            y = fn(x, qt, group_sizes)
            # cheap dependency: fold a scalar of y back into x
            x = x + (jnp.sum(y[:1, :1]) * 1e-6).astype(x.dtype)
            return (s + jnp.float32(1), x)

        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), x0))

    return run


def bench(name, fn, x, qt, group_sizes, touched_bytes):
    run = chained(fn, x, qt, group_sizes)
    jax.block_until_ready(run(x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    dt = (time.perf_counter() - t0) / ITERS
    gbs = touched_bytes / dt / 1e9
    print(f"{name:26s} {dt*1e6:9.1f} us/call   {gbs:7.1f} GB/s effective",
          flush=True)
    return dt


# Qwen3-30B-A3B expert shapes: 128 experts, hidden 2048, moe_inter 768.
# Each config costs ~2 min of (remote) compile; select via argv indices.
CONFIGS = [
    (128, 768, 2048, 64, "30B-A3B gate/up decode"),
    (128, 2048, 768, 64, "30B-A3B down     decode"),
    (128, 768, 2048, 1024, "30B-A3B gate/up prefill"),
    (64, 768, 2048, 64, "64-expert gate/up decode"),
]


def main():
    import sys

    picks = [int(a) for a in sys.argv[1:]] or [0, 1]
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}",
          flush=True)
    for E, N, K, T, label in [CONFIGS[i] for i in picks]:
        qt = stack_experts(E, N, K)
        rng = np.random.default_rng(1)
        # uniform routing: T rows spread over experts (top-8 of E)
        ids = np.sort(rng.integers(0, E, size=T))
        sizes = jnp.asarray(np.bincount(ids, minlength=E), jnp.int32)
        x = jnp.asarray(rng.normal(size=(T, qt.k_padded)), jnp.bfloat16)
        x_logical = x[:, :K]
        nonempty = int((np.bincount(ids, minlength=E) > 0).sum())
        # weights actually touched: only routed experts' packed+scales
        touched = nonempty * (N * K // 2 + 2 * N * (K // 128) * 2)
        print(f"\n[{label}] E={E} N={N} K={K} T={T} routed_experts={nonempty}",
              flush=True)
        qt_m = stack_experts(E, N, K, layout="magic_t")
        t_m = bench("pallas magic_t ragged",
                    lambda x, q, s: grouped_quantized_matmul(x, q, s),
                    x_logical, qt_m, sizes, touched)
        t_p = bench("pallas sg ragged",
                    lambda x, q, s: grouped_quantized_matmul(x, q, s),
                    x_logical, qt, sizes, touched)
        t_x = bench("xla dequant+ragged_dot",
                    xla_grouped, x_logical, qt, sizes,
                    E * (N * K // 2))
        print(f"{'magic vs sg':26s} {t_p / t_m:9.2f}x   magic vs xla {t_x / t_m:.2f}x")


if __name__ == "__main__":
    main()
