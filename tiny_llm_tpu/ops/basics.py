"""Basic numerics: softmax / linear / silu / swiglu.

Capability parity with the reference ops layer
(/root/reference/src/tiny_llm_ref/basics.py:5-26), re-expressed for TPU:
float32 accumulation for reductions, bf16-friendly casts, everything pure so
XLA fuses these into surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable softmax with float32 accumulation.

    Matches the reference's `precise=True` softmax semantics: the reduction
    runs in f32 regardless of input dtype, and the result is cast back.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    x32 = x32 - jax.lax.stop_gradient(jnp.max(x32, axis=axis, keepdims=True))
    e = jnp.exp(x32)
    out = e / jnp.sum(e, axis=axis, keepdims=True)
    return out.astype(dtype)


def linear(x: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """y = x @ w.T (+ bias); w is [out_features, in_features].

    Contraction runs on the MXU with f32 accumulation; output keeps x's dtype.
    """
    out = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    """x * sigmoid(x). jax.nn.sigmoid is numerically safe for large |x|."""
    return x * jax.nn.sigmoid(x)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """silu(gate) * up — the fused MLP activation.

    The reference implements this as a dedicated Metal kernel
    (week2_kernels.metal:107-117); on TPU XLA fuses the elementwise chain
    into the adjacent matmuls, so a plain expression is the fast path.
    """
    return silu(gate) * up
