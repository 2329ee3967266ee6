"""Split-attention chunked prefill: prefix ⊕ chunk softmax-state combine.

A prefill chunk at offset > 0 attends to (a) the already-cached prefix —
every prefix key visible to every chunk query, no causal structure — and
(b) its own tokens, causally. The reference computes both in one kernel
by walking ALL pages with a causal clamp (paged_attention.metal:250-506);
on TPU that forces page-granularity (128-token) KV tiles for the whole
computation, and per-tile bookkeeping dominates (see PERFORMANCE.md, the
offset-0 local fast path measured 2.3x for exactly this reason).

Here the two parts run as separate flash passes, each with the tiling
that suits it — the prefix streams pages without causal bookkeeping, the
chunk runs the dense kernel at large tiles — and merge with the same
online-softmax state algebra the Metal kernels use across simdgroups
(week2_kernels.metal:206-234):

    m = max(m_a, m_b);  w_x = l_x * exp(m_x - m)
    out = (w_a * o_a + w_b * o_b) / (w_a + w_b)

Exactness: softmax over a disjoint union of key sets decomposes exactly
into per-set states; the combine introduces only the usual flash-style
f32 rounding. Rows with an empty part (offset == 0, or a zero-length
chunk shard) contribute the identity state (o=0, m=-inf, l=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dispatch import resolve


def combine_state_pair(
    o1: jax.Array,  # [B, Hq, L, D]
    m1: jax.Array,  # [B, Hq, L] f32
    l1: jax.Array,  # [B, Hq, L] f32
    o2: jax.Array,
    m2: jax.Array,
    l2: jax.Array,
) -> jax.Array:
    """Merge two locally-normalized online-softmax states over disjoint
    key sets into the exact attention over their union."""
    m = jnp.maximum(m1, m2)
    w1 = l1 * jnp.exp(m1 - m)
    w2 = l2 * jnp.exp(m2 - m)
    num = w1[..., None] * o1.astype(jnp.float32) + w2[..., None] * o2.astype(
        jnp.float32
    )
    den = jnp.maximum(w1 + w2, 1e-30)
    return (num / den[..., None]).astype(o1.dtype)


def chunk_state_xla(
    q: jax.Array,  # [B, Hq, L, D]
    k: jax.Array,  # [B, Hkv, L, D] — the chunk's own keys
    v: jax.Array,
    scale: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Causal chunk-local (o, m, l) oracle (and CPU fallback)."""
    B, Hq, L, D = q.shape
    Hkv = k.shape[1]
    n_rep = Hq // Hkv
    qf = q.astype(jnp.float32) * scale
    qg = qf.reshape(B, Hkv, n_rep, L, D)
    s = jnp.einsum("bhrld,bhsd->bhrls", qg, k.astype(jnp.float32))
    k_pos = jnp.arange(L, dtype=jnp.int32)[None, None, None, None, :]
    q_pos = jnp.arange(L, dtype=jnp.int32)[None, None, None, :, None]
    s = jnp.where(k_pos <= q_pos, s, -jnp.inf)
    m = jnp.max(s, axis=-1)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhrls,bhsd->bhrld", p, v.astype(jnp.float32))
    o = o / jnp.maximum(l, 1e-30)[..., None]
    return (
        o.reshape(B, Hq, L, D).astype(q.dtype),
        m.reshape(B, Hq, L),
        l.reshape(B, Hq, L),
    )


def prefix_state_xla(
    q: jax.Array,  # [B, Hq, L, D]
    key_pages: jax.Array,
    value_pages: jax.Array,
    block_table: jax.Array,
    prefix_lens: jax.Array,  # [B] i32
    scale: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Non-causal prefix (o, m, l) oracle via a dense page gather."""
    from .paged_attention import gather_pages_dense

    B, Hq, L, D = q.shape
    k, v = gather_pages_dense(key_pages, value_pages, block_table)
    Hkv, S = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    qf = q.astype(jnp.float32) * scale
    qg = qf.reshape(B, Hkv, n_rep * L, D)
    s = jnp.einsum("bhrd,bhsd->bhrs", qg, k.astype(jnp.float32))
    k_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    s = jnp.where(k_pos < prefix_lens[:, None, None, None], s, -jnp.inf)
    m = jnp.max(s, axis=-1)  # -inf where prefix empty
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhrs,bhsd->bhrd", p, v.astype(jnp.float32))
    o = o / jnp.maximum(l, 1e-30)[..., None]
    return (
        o.reshape(B, Hq, L, D).astype(q.dtype),
        m.reshape(B, Hq, L),
        l.reshape(B, Hq, L),
    )


def split_paged_prefill(
    q: jax.Array,  # [B, Hq, L, D] — chunk queries (RoPE applied)
    k_chunk: jax.Array,  # [B, Hkv, L, D] — chunk keys (RoPE applied)
    v_chunk: jax.Array,
    key_pages: jax.Array,
    value_pages: jax.Array,
    block_table: jax.Array,
    prefix_lens: jax.Array,  # [B] i32 — row offsets (0 rows are fine)
    scale: float | None = None,
    impl: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Chunk attention over (prefix pages ⊕ chunk), combined exactly.

    The chunk's K/V may already be written into the pages (they are, in
    forward_step_paged) — the prefix pass masks them out by prefix_lens,
    so no page-alignment of offsets is required.
    """
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else float(scale)
    if resolve(impl) == "pallas":
        from .flash_attention_pallas import flash_prefill_state_pallas
        from .paged_attention_pallas import paged_prefix_state

        L = q.shape[2]
        lens_full = jnp.full((q.shape[0],), L, jnp.int32)
        o_c, m_c, l_c = flash_prefill_state_pallas(
            q, k_chunk, v_chunk, lens_full, scale=scale, causal=True,
            interpret=interpret,
        )
        o_p, m_p, l_p = paged_prefix_state(
            q, key_pages, value_pages, block_table, prefix_lens,
            scale=scale, interpret=interpret,
        )
    else:
        o_c, m_c, l_c = chunk_state_xla(q, k_chunk, v_chunk, scale)
        o_p, m_p, l_p = prefix_state_xla(
            q, key_pages, value_pages, block_table, prefix_lens, scale
        )
    return combine_state_pair(o_c, m_c, l_c, o_p, m_p, l_p)
