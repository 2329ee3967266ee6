"""Measure the chained-fori_loop harness's per-iteration floor.

Round-3 discovery: on this relay build, ONE iteration of a jitted
`lax.fori_loop` whose body is a tiny op costs ~480 us — for a pure-XLA
matmul control, a trivial Pallas copy kernel, and scalar-prefetch
variants alike. Any "total / ITERS" benchmark of a sub-100-us kernel
therefore reports mostly floor; per-op numbers must use the two-point
slope (1-call vs 3-call bodies), as bench_moe_gather_ab.py and the
quant_matmul ledger do. Keep this probe to re-check the floor when the
relay/toolchain updates.

Usage: python benches/probe_dispatch_floor.py
"""

import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ITERS = 50
T, K, N = 64, 2048, 768
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(T, K)), jnp.bfloat16)
wsmall = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

def timeit(name, mk_y):
    @jax.jit
    def run(x0):
        def body(i, xx):
            y = mk_y(xx)
            return xx + (jnp.sum(y[:1, :1]) * 1e-6).astype(xx.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter()-t0)/ITERS)
    print(f"{name:32s}: {best*1e6:8.1f} us/call", flush=True)

timeit("xla matmul body (control)", lambda xx: (xx @ wsmall))

def copy_kernel(x_ref, out_ref):
    out_ref[:] = x_ref[:, :N]
timeit("pallas plain grid=(1,)", lambda xx: pl.pallas_call(
    copy_kernel, grid=(1,),
    in_specs=[pl.BlockSpec((T, K), lambda g: (0, 0))],
    out_specs=pl.BlockSpec((T, N), lambda g: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, N), x.dtype))(xx))

def copy_kernel_p(s_ref, x_ref, out_ref):
    out_ref[:] = x_ref[:, :N]
s1 = jnp.arange(8, dtype=jnp.int32)
timeit("pallas prefetch1 short", lambda xx: pl.pallas_call(
    copy_kernel_p,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((T, K), lambda g, s: (0, 0))],
        out_specs=pl.BlockSpec((T, N), lambda g, s: (0, 0))),
    out_shape=jax.ShapeDtypeStruct((T, N), x.dtype))(s1, xx))

def copy_kernel_p5(a, b, c, d, e, x_ref, out_ref):
    out_ref[:] = x_ref[:, :N]
s5 = [jnp.arange(131, dtype=jnp.int32)] * 4 + [jnp.ones((1,), jnp.int32)]
timeit("pallas prefetch5 long", lambda xx: pl.pallas_call(
    copy_kernel_p5,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(1,),
        in_specs=[pl.BlockSpec((T, K), lambda g, *s: (0, 0))],
        out_specs=pl.BlockSpec((T, N), lambda g, *s: (0, 0))),
    out_shape=jax.ShapeDtypeStruct((T, N), x.dtype))(*s5, xx))
