"""Flash attention (dense KV): prefill and decode entry points.

TPU replacement for the reference's decode-attention Metal kernel
(week2_kernels.metal:119-235, online-softmax flash decode) and the dense
prefill SDPA. The XLA path is the oracle / portable fallback; the Pallas
path is registered lazily (see flash_attention_pallas.py) so CPU-only test
runs never trace Mosaic code.

Conventions (match ops/attention.py):
  q: [B, H_q, L, D], k/v: [B, H_kv, S, D], GQA with n_rep = H_q // H_kv.
  `lens`: optional [B] int32 — per-row valid KV length (right-padded
  buffers, as produced by the preallocated KV cache). Queries are the last
  L valid positions: absolute position of query i = lens - L + i.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import scaled_dot_product_attention_grouped
from .dispatch import resolve


def normalize_mask(mask: jax.Array, B: int, L: int, S: int) -> jax.Array:
    """Canonicalize an explicit additive mask to [B, H-or-1, L, S].

    Accepted: [L, S] (shared), [B, L, S] (per row), [B, 1-or-H, L, S].
    A bare rank-3 mask under raw numpy broadcasting would silently align
    its batch axis with the HEAD axis of [B, H, L, S] scores — this
    contract removes that trap for every implementation."""
    if mask.ndim == 2:
        assert mask.shape == (L, S), (mask.shape, (L, S))
        return mask[None, None]
    if mask.ndim == 3:
        assert mask.shape == (B, L, S), (mask.shape, (B, L, S))
        return mask[:, None]
    assert mask.ndim == 4 and mask.shape[0] == B and mask.shape[2:] == (L, S)
    return mask


def _length_mask(
    L: int, S: int, lens: jax.Array, causal: bool, dtype=jnp.float32
) -> jax.Array:
    """[B, 1, L, S] additive mask combining per-row length and causality."""
    k_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    if causal:
        # query i's absolute position is lens - L + i
        q_pos = (
            lens[:, None, None, None]
            - L
            + jnp.arange(L, dtype=jnp.int32)[None, None, :, None]
        )
        ok = k_pos <= q_pos
    else:
        ok = k_pos < lens[:, None, None, None]
    return jnp.where(ok, jnp.zeros((), dtype), jnp.asarray(-jnp.inf, dtype))


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    mask: jax.Array | str | None = None,
    lens: jax.Array | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Prefill/general attention over a (possibly right-padded) KV buffer."""
    if impl is not None and not isinstance(impl, str):
        # Attention-strategy object (e.g. parallel.tp_kernels.TPAttention):
        # shard_map'd Pallas under TP, or any custom attention backend.
        return impl.flash(q, k, v, scale=scale, mask=mask, lens=lens)
    if resolve(impl) == "pallas":
        from .flash_attention_pallas import flash_attention_pallas

        return flash_attention_pallas(q, k, v, scale=scale, mask=mask, lens=lens)
    B, Hq, L, D = q.shape
    S = k.shape[2]
    if isinstance(mask, jax.Array):
        mask = normalize_mask(mask, B, L, S)
    if lens is not None:
        m = _length_mask(L, S, lens, causal=(mask == "causal"))
        if isinstance(mask, jax.Array):
            m = m + mask.astype(m.dtype)
        mask = m
    return scaled_dot_product_attention_grouped(q, k, v, scale=scale, mask=mask)


def flash_decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lens: jax.Array,
    scale: float | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Decode attention: small L (typically 1-8) against a padded KV buffer.

    Counterpart of the reference's decode_attention_custom
    (week2_kernels.py:98-147) with the context-length guard removed — the
    TPU kernel streams arbitrarily long contexts.
    """
    if impl is not None and not isinstance(impl, str):
        return impl.flash(q, k, v, scale=scale, mask="causal", lens=lens)
    if resolve(impl) == "pallas":
        from .flash_attention_pallas import flash_decode_attention_pallas

        return flash_decode_attention_pallas(q, k, v, lens, scale=scale)
    return flash_attention(q, k, v, scale=scale, mask="causal", lens=lens, impl="xla")
