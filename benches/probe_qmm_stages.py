"""Bisect the W4A16 kernel's time: stream / dequant / matmul stages.

Runs each stage variant ITERS times inside one jit (amortizes the remote
dispatch overhead of the axon tunnel) and reports effective weight
bandwidth. The operator-attribution spirit of the reference's
benches/profile_week2_kernels.py, applied to a single kernel's stages.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 2560, 2560
BM, BN = 8, 512
ITERS = 100


def timed(fn, *args):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.time()
    r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / ITERS


def loop(f, x):
    @jax.jit
    def run(x0):
        def body(i, carry):
            s, xx = carry
            y = f(xx)
            return (s + y.astype(jnp.float32).sum(), xx)
        return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), x0))
    return run


def stage_kernel(x_ref, w_ref, s_ref, b_ref, out_ref, wtile_ref, acc_ref, *, stage):
    group_size = 128
    vpw = 8
    num_sg = w_ref.shape[-1] // group_size
    sg_vals = 1024
    mask = jnp.uint32(0xF)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for sg in range(num_sg):
        words = w_ref[:, sg * group_size : (sg + 1) * group_size]
        if stage == "stream":
            # Touch the words so the DMA isn't elided; no dequant.
            acc_ref[:, :1] += jnp.sum(
                words.astype(jnp.int32), axis=1, keepdims=True
            ).astype(jnp.float32)[: acc_ref.shape[0]]
            continue
        for j in range(vpw):
            q = ((words >> (4 * j)) & mask).astype(jnp.int32).astype(jnp.bfloat16)
            g = sg * vpw + j
            if stage in ("dequant", "full"):
                s = s_ref[:, g : g + 1].astype(jnp.bfloat16)
                b = b_ref[:, g : g + 1].astype(jnp.bfloat16)
                wtile_ref[:, j * group_size : (j + 1) * group_size] = q * s + b
            else:  # "unpack": no scale application
                wtile_ref[:, j * group_size : (j + 1) * group_size] = q
        if stage in ("full",):
            x_sg = x_ref[:, sg * sg_vals : (sg + 1) * sg_vals]
            acc_ref[:] += jax.lax.dot_general(
                x_sg, wtile_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc_ref[:, :1] += jnp.sum(
                wtile_ref[:, :8].astype(jnp.float32), axis=1, keepdims=True
            )[: acc_ref.shape[0]]
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def make(stage, packed, scales, biases):
    G = scales.shape[1]
    Kp = packed.shape[1] * 8

    def f(x):
        return pl.pallas_call(
            functools.partial(stage_kernel, stage=stage),
            grid=(1, N // BN),
            in_specs=[
                pl.BlockSpec((BM, Kp), lambda m, n: (m, 0)),
                pl.BlockSpec((BN, Kp // 8), lambda m, n: (n, 0)),
                pl.BlockSpec((BN, G), lambda m, n: (n, 0)),
                pl.BlockSpec((BN, G), lambda m, n: (n, 0)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n: (m, n)),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BN, 1024), jnp.bfloat16),
                pltpu.VMEM((BM, BN), jnp.float32),
            ],
        )(x, packed, scales, biases)

    return f


def main():
    from tiny_llm_tpu.ops import quantize

    w = jax.random.normal(jax.random.key(0), (N, K), dtype=jnp.float32) * 0.05
    qt = quantize(w)
    x = jax.random.normal(jax.random.key(1), (BM, qt.k_padded), dtype=jnp.bfloat16)
    wbytes = qt.packed.size * 4

    for stage in ["stream", "unpack", "dequant", "full"]:
        f = loop(make(stage, qt.packed, qt.scales, qt.biases), x)
        f(x)[0].block_until_ready()
        t0 = time.time()
        r = f(x)
        r[0].block_until_ready()
        dt = (time.time() - t0) / ITERS
        print(
            f"{stage:8s} t={dt*1e6:7.1f}us  weightBW={wbytes/dt/1e9:6.1f}GB/s",
            flush=True,
        )

    # Reference: XLA bf16 dense matmul at the same logical shape.
    wd = jax.random.normal(jax.random.key(2), (N, K), dtype=jnp.bfloat16)
    f = loop(lambda xx: xx[:, :K] @ wd.T, x)
    f(x)[0].block_until_ready()
    t0 = time.time()
    r = f(x)
    r[0].block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"bf16mm   t={dt*1e6:7.1f}us  weightBW={N*K*2/dt/1e9:6.1f}GB/s (dense)")


if __name__ == "__main__":
    main()
