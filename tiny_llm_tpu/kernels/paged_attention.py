"""Paged attention over a block-table-indexed page pool.

TPU replacement for the reference's flagship Metal kernels
(/root/reference/src/extensions_ref/src/paged_attention.metal:108-674:
paged_attention_decode + paged_attention_mma_bf16_d128 prefill). The XLA
path gathers the logical pages into a dense right-padded KV view and runs
grouped SDPA — it is the oracle and the CPU fallback. The Pallas path
(paged_attention_pallas.py) walks the block table with async page DMA.

Layout (one pool shared by every layer — block tables are layer-invariant
because appends touch all layers symmetrically; cf. the reference's
layer-local pools, paged_kv_cache.py:21-27, which this generalizes):
  key_pages / value_pages: [P, H_kv, page_size, D]
  block_table: int32 [B, max_pages], -1 padded
  context_lens: int32 [B] — total valid tokens (including current queries)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import scaled_dot_product_attention_grouped
from .dispatch import resolve


def gather_pages_dense(
    key_pages: jax.Array,
    value_pages: jax.Array,
    block_table: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Materialize the logical KV: -> [B, H_kv, max_pages * page_size, D].

    -1 page ids gather page 0; those positions are masked by context_lens
    downstream, so their contents never matter.
    """
    table = jnp.maximum(block_table, 0)
    k = jnp.take(key_pages, table, axis=0)  # [B, n_pages, H, ps, D]
    v = jnp.take(value_pages, table, axis=0)
    B, n_pages, H, ps, D = k.shape
    k = k.transpose(0, 2, 1, 3, 4).reshape(B, H, n_pages * ps, D)
    v = v.transpose(0, 2, 1, 3, 4).reshape(B, H, n_pages * ps, D)
    return k, v


def paged_attention(
    q: jax.Array,
    key_pages: jax.Array,
    value_pages: jax.Array,
    block_table: jax.Array,
    context_lens: jax.Array,
    scale: float | None = None,
    mask: jax.Array | str | None = "causal",
    impl: str | None = None,
) -> jax.Array:
    """q: [B, H_q, L, D] (the last L tokens of each context) -> same shape.

    Matches the reference wrapper's contract (attention.py:69-122): K/V for
    the current queries must already be written to the pages, and
    context_lens counts them.
    """
    B, Hq, L, D = q.shape
    if impl is not None and not isinstance(impl, str):
        # Attention-strategy object (e.g. parallel.tp_kernels.TPAttention).
        return impl.paged(
            q, key_pages, value_pages, block_table, context_lens,
            scale=scale, mask=mask,
        )
    if resolve(impl) == "pallas":
        from .paged_attention_pallas import paged_attention_pallas

        return paged_attention_pallas(
            q, key_pages, value_pages, block_table, context_lens,
            scale=scale, mask=mask,
        )
    k, v = gather_pages_dense(key_pages, value_pages, block_table)
    S = k.shape[2]
    k_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    if mask == "causal" or mask is None:
        q_pos = (
            context_lens[:, None, None, None]
            - L
            + jnp.arange(L, dtype=jnp.int32)[None, None, :, None]
        )
        if mask is None:
            # Non-causal: every query sees the full valid context.
            q_pos = jnp.broadcast_to(
                context_lens[:, None, None, None] - 1, q_pos.shape
            )
        m = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf)
    else:
        valid = k_pos < context_lens[:, None, None, None]
        m = jnp.where(valid, 0.0, -jnp.inf)
        # Additive user mask covers the query block's visible context.
        m = m + _place_user_mask(mask, B, L, S, context_lens)
    return scaled_dot_product_attention_grouped(q, k, v, scale=scale, mask=m)


def _place_user_mask(
    mask: jax.Array, B: int, L: int, S: int, context_lens: jax.Array
) -> jax.Array:
    """Broadcast an explicit [.., L, S_visible]-style additive mask into the
    padded [B, 1, L, S] frame, right-aligned at each row's context end."""
    m = mask.astype(jnp.float32)
    if m.ndim == 2:
        m = m[None, None]
    elif m.ndim == 3:
        m = m[:, None]
    s_vis = m.shape[-1]
    out = jnp.zeros((B, 1, L, S), jnp.float32)
    # Scatter columns [ctx - s_vis, ctx) per batch row.
    col = jnp.arange(S)[None, None, None, :]
    start = (context_lens - s_vis)[:, None, None, None]
    idx = jnp.clip(col - start, 0, s_vis - 1)
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(m, (B, 1, L, s_vis)), idx, axis=-1
    )
    inside = (col >= start) & (col < context_lens[:, None, None, None])
    return jnp.where(inside, gathered, out)
