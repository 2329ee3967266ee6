"""axpby — the "hello, Pallas" tutorial kernel.

Parity with the reference's student example op
(/root/reference/src/extensions/src/axpby.{h,cpp,metal}): the smallest
complete custom op, `out = alpha * x + beta * y`, used to teach the
kernel-extension workflow before the real kernels. On TPU the workflow the
reference spreads over ~300 lines of C++/Metal (primitive subclass, host
dispatch, shader, build system) collapses to one `pl.pallas_call`:

  1. Write the KERNEL — a Python function of *Refs* (VMEM views). It runs
     once per grid step; reads/writes are vector ops on the block that the
     pipeline DMA'd into VMEM for you.
  2. Describe the BLOCKS — `BlockSpec(block_shape, index_map)` says which
     tile of each operand a grid step touches. The Pallas pipeline
     double-buffers the DMAs so compute overlaps the stream.
  3. Call `pl.pallas_call(kernel, grid=..., in_specs=..., out_shape=...)`.
     There is no separate build step — Mosaic JIT-compiles for the TPU on
     first trace, and `interpret=True` runs the same kernel on CPU for
     tests.

Everything the production kernels add (quant_matmul.py, the flash/paged
attention family) is variations on these three parts: scratch accumulators
that persist across grid steps, scalar-prefetch args feeding index_maps,
and grids whose iteration order keeps the hot operand streaming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .dispatch import resolve


def _axpby_kernel(x_ref, y_ref, out_ref, *, alpha: float, beta: float):
    """One grid step: out block = alpha * x block + beta * y block.

    `x_ref`/`y_ref`/`out_ref` are VMEM refs of one [bm, bn] tile. `[:]`
    reads the whole tile as a jnp array; the arithmetic lowers to VPU
    vector ops; assigning `out_ref[:]` marks the tile for write-back.
    """
    out_ref[:] = alpha * x_ref[:] + beta * y_ref[:]


@functools.partial(
    jax.jit, static_argnames=("alpha", "beta", "interpret")
)
def _axpby_pallas(
    x: jax.Array, y: jax.Array, alpha: float, beta: float, interpret: bool
) -> jax.Array:
    M, N = x.shape
    # Block choice: elementwise ops are pure HBM streams, so any tile
    # comfortably inside VMEM works; (256, 1024) keeps tiles big enough
    # that DMA setup amortizes. cdiv grids handle ragged edges — Pallas
    # pads the last block and masks the write-back.
    bm, bn = min(256, M), min(1024, N)
    return pl.pallas_call(
        functools.partial(_axpby_kernel, alpha=alpha, beta=beta),
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn)),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(x, y)


def axpby(
    x: jax.Array,
    y: jax.Array,
    alpha: float = 1.0,
    beta: float = 1.0,
    impl: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """out = alpha * x + beta * y (2-D, same shape/dtype).

    The wrapper mirrors the production ops' dispatch contract: "pallas"
    on TPU, "xla" elsewhere (where the expression is a single fused VPU
    pass anyway — the tutorial point is the workflow, not a speedup).
    """
    assert x.shape == y.shape and x.ndim == 2, "tutorial op: 2-D, same shape"
    if resolve(impl) == "xla":
        return (alpha * x + beta * y).astype(x.dtype)
    return _axpby_pallas(x, y, float(alpha), float(beta), interpret)
