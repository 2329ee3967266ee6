"""Token embeddings, dense and quantized.

Parity: /root/reference/src/tiny_llm_ref/embedding.py:7-57. The quantized
gather dequantizes only the gathered rows (the reference's custom Metal
gather kernel, quantized_matmul.metal:58-89); on TPU this is a gather of the
packed rows + a fused VPU dequant, which XLA handles well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quantize import (
    QuantizedTensor,
    quantized_linear,
    unpack_magic_t,
    unpack_supergroup,
)


class Embedding:
    def __init__(self, vocab_size: int, embedding_dim: int, weight: jax.Array):
        assert weight.shape == (vocab_size, embedding_dim)
        self.vocab_size = vocab_size
        self.embedding_dim = embedding_dim
        self.weight = weight

    def __call__(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.weight, ids, axis=0)

    def as_linear(self, x: jax.Array) -> jax.Array:
        """Tied LM head: x @ weight.T."""
        out = jax.lax.dot_general(
            x,
            self.weight,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)


def quantized_embedding_gather(qt: QuantizedTensor, ids: jax.Array) -> jax.Array:
    """Gather + dequantize only the selected vocab rows."""
    flat = ids.reshape(-1)
    if qt.layout == "magic_t":
        # Transposed layout: vocab rows live on the LANE axis.
        packed_cols = jnp.take(qt.packed, flat, axis=1)  # [K/8, B]
        scales_rows = jnp.take(qt.scales, flat, axis=1).T.astype(jnp.float32)
        biases_rows = jnp.take(qt.biases, flat, axis=1).T.astype(jnp.float32)
        vals = unpack_magic_t(packed_cols, qt.k_padded, qt.group_size, qt.bits)
    else:
        packed_rows = jnp.take(qt.packed, flat, axis=0)
        scales_rows = jnp.take(qt.scales, flat, axis=0).astype(jnp.float32)
        biases_rows = jnp.take(qt.biases, flat, axis=0).astype(jnp.float32)
        vals = unpack_supergroup(packed_rows, qt.k_padded, qt.group_size, qt.bits)
    G = qt.k_padded // qt.group_size
    vg = vals.reshape(flat.shape[0], G, qt.group_size).astype(jnp.float32)
    w = (vg * scales_rows[..., None] + biases_rows[..., None]).reshape(
        flat.shape[0], qt.k_padded
    )[:, : qt.in_features]
    return w.reshape(*ids.shape, qt.in_features).astype(jnp.bfloat16)


class QuantizedEmbedding:
    def __init__(
        self, vocab_size: int, embedding_dim: int, weight: QuantizedTensor
    ):
        assert weight.shape == (vocab_size, embedding_dim)
        self.vocab_size = vocab_size
        self.embedding_dim = embedding_dim
        self.weight = weight

    def __call__(self, ids: jax.Array) -> jax.Array:
        return quantized_embedding_gather(self.weight, ids)

    def as_linear(self, x: jax.Array) -> jax.Array:
        """Tied LM head through the quantized matmul path."""
        return quantized_linear(x, self.weight)
