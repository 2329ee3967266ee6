"""RMSNorm.

Parity: /root/reference/src/tiny_llm_ref/layer_norm.py:4-15 (readable) and the
fused Metal kernel week2_kernels.metal:6-48. On TPU the f32-accumulate +
rsqrt + scale chain is a single VPU fusion under XLA, so no Pallas kernel is
needed for the norm itself (confirmed by the reference's own profiling logic:
the Metal win came from launch overhead, not arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x / rms(x) * weight with float32 accumulation, cast back to x.dtype.

    The weight multiply happens in the original dtype, matching the
    reference's dtype contract (layer_norm.py:11-15).
    """
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = (x32 * jax.lax.rsqrt(ms + eps)).astype(x.dtype)
    return normed * weight.astype(x.dtype)


class RMSNorm:
    """Thin weight-holding wrapper mirroring the reference class API."""

    def __init__(self, dim: int, weight: jax.Array, eps: float = 1e-5):
        assert weight.shape == (dim,), f"weight shape {weight.shape} != ({dim},)"
        self.dim = dim
        self.weight = weight
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        return rms_norm(x, self.weight, self.eps)
