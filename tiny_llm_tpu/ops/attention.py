"""Attention: causal masks, simple SDPA, grouped (GQA) SDPA.

Parity: /root/reference/src/tiny_llm_ref/attention.py:6-66 and
week2_kernels.py:60-95. These XLA implementations are both the correctness
oracles for the Pallas kernels (tiny_llm_tpu.kernels) and the portable
fallback path on CPU. All softmax statistics run in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .basics import softmax


def causal_mask(L: int, S: int, dtype=jnp.float32) -> jax.Array:
    """[L, S] additive mask: query i attends to keys j <= i + (S - L).

    Matches the reference's right-aligned causal convention
    (attention.py:24-27): queries are the *last* L positions of an
    S-position context.
    """
    q_pos = jnp.arange(L)[:, None] + (S - L)
    k_pos = jnp.arange(S)[None, :]
    return jnp.where(k_pos <= q_pos, jnp.zeros((), dtype), jnp.asarray(-jnp.inf, dtype))


def scaled_dot_product_attention_simple(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """SDPA for equal head counts: q/k/v are [..., L|S, D]."""
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else scale
    scores = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((q.ndim - 1,), (k.ndim - 1,)), (tuple(range(q.ndim - 2)), tuple(range(k.ndim - 2)))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    # Readable/oracle path: full f32 softmax *and* PV matmul, matching the
    # reference's FP32 SDPA (attention.py:6-21). The Pallas flash kernels
    # keep f32 statistics with bf16 matmuls instead.
    weights = softmax(scores, axis=-1).astype(jnp.float32)
    out = jax.lax.dot_general(
        weights,
        v.astype(jnp.float32),
        dimension_numbers=(((weights.ndim - 1,), (v.ndim - 2,)), (tuple(range(weights.ndim - 2)), tuple(range(v.ndim - 2)))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def scaled_dot_product_attention_grouped(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    mask: jax.Array | str | None = None,
) -> jax.Array:
    """GQA attention. q: [..., H_q, L, D]; k/v: [..., H_kv, S, D].

    H_q must be a multiple of H_kv; each group of n_rep query heads shares
    one KV head. mask may be None, the string "causal", or an additive
    array broadcastable to [..., H_q, L, S].
    """
    *batch, Hq, L, D = q.shape
    Hkv, S = k.shape[-3], k.shape[-2]
    assert Hq % Hkv == 0, f"H_q {Hq} not a multiple of H_kv {Hkv}"
    n_rep = Hq // Hkv
    scale = (D**-0.5) if scale is None else scale

    qg = q.reshape(*batch, Hkv, n_rep, L, D)
    # scores: [..., Hkv, n_rep, L, S] — contraction over D with the kv-head
    # axis as a batch dim; f32 accumulation on the MXU.
    scores = jnp.einsum(
        "...hrld,...hsd->...hrls", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if isinstance(mask, str):
            assert mask == "causal", f"unknown mask kind {mask!r}"
            m = causal_mask(L, S, scores.dtype)
        else:
            m = mask.astype(scores.dtype)
            if m.ndim == q.ndim:
                # [..., H, L, S] with H in {1, Hq}: split the head axis into
                # the grouped (Hkv, n_rep) layout so batch dims stay aligned.
                if m.shape[-3] == Hq:
                    m = m.reshape(*m.shape[:-3], Hkv, n_rep, L, S)
                else:
                    m = m[..., None, :, :]  # broadcast over (Hkv, n_rep)
            # m.ndim <= 3 ([L, S]-style) right-aligns correctly as-is.
        scores = scores + m
    weights = softmax(scores, axis=-1).astype(jnp.float32)
    out = jnp.einsum(
        "...hrls,...hsd->...hrld",
        weights,
        v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(*batch, Hq, L, D).astype(q.dtype)
