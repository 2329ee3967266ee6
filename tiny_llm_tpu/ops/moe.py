"""Mixture-of-Experts: top-k routing + grouped expert matmul.

Parity: /root/reference/src/tiny_llm_ref/moe.py:7-89 (route_topk +
sort-and-gather_qmm grouped matmul). TPU-native design: tokens are sorted
by expert id and fed to `jax.lax.ragged_dot` (the megablox-style ragged
grouped matmul XLA lowers straight onto the MXU); off-TPU the fallback is a
dense per-expert matmul masked by segment membership (fine for the small
expert counts used in tests). Expert weights are stacked QuantizedTensors
([E, N, K] logical) dequantized on the fly — a dequant-fused ragged Pallas
kernel is the planned optimization for the serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .basics import silu, softmax
from .quantize import QuantizedTensor, dequantize


def _dense_weight(w, dtype) -> jax.Array:
    """Materialize [E?, N, K] weights from stacked QuantizedTensor or array."""
    if isinstance(w, QuantizedTensor):
        return dequantize(w, dtype=dtype)
    return w.astype(dtype)


def _linear_any(x: jax.Array, w) -> jax.Array:
    from .quantize import quantized_linear

    if isinstance(w, QuantizedTensor):
        return quantized_linear(x, w)
    out = jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def route_topk(
    x: jax.Array,
    w_router,
    top_k: int,
    norm_topk_prob: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Softmax router + top-k selection.

    Returns (router_probs [..., E], expert_ids [..., k], expert_scores
    [..., k]). Matches reference route_topk (moe.py:36-48); jax.lax.top_k
    returns ids sorted by descending probability, a valid tie-break of the
    reference's argpartition set.
    """
    router_logits = _linear_any(x, w_router)
    router_probs = softmax(router_logits.astype(jnp.float32), axis=-1)
    expert_scores, expert_ids = jax.lax.top_k(router_probs, top_k)
    if norm_topk_prob:
        expert_scores = expert_scores / jnp.sum(expert_scores, axis=-1, keepdims=True)
    return router_probs, expert_ids, expert_scores


def grouped_matmul(
    grouped_x: jax.Array,  # [T, K] — rows sorted by expert id
    w_stacked,  # QuantizedTensor [E, N, K] or array [E, N, K]
    group_sizes: jax.Array,  # [E] int32, sums to T
    use_ragged: bool | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Per-group matmul: rows of group e hit expert e's weight. -> [T, N]."""
    if isinstance(w_stacked, QuantizedTensor) and w_stacked.packed.ndim == 3:
        from ..kernels.dispatch import resolve
        from ..kernels.moe_matmul import grouped_quantized_matmul
        from ..kernels.quant_matmul import MAX_RESIDENT_K

        if resolve(impl) == "pallas" and w_stacked.k_padded <= MAX_RESIDENT_K:
            return grouped_quantized_matmul(grouped_x, w_stacked, group_sizes)
        if w_stacked.layout == "pair_t" and grouped_x.shape[0] <= 128:
            # Backend-invariant W4A8 semantics on the XLA fallback: the
            # pair_t Pallas walk quantizes decode-regime activations to
            # per-row absmax int8 (kernels/moe_matmul.py), so the
            # fallback applies the same x -> sx * round(x/sx) here
            # rather than silently computing exact W4A16 on CPU.
            xf = grouped_x.astype(jnp.float32)
            sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            sx = jnp.where(sx == 0, jnp.ones_like(sx), sx)
            grouped_x = (
                sx * jnp.clip(jnp.round(xf / sx), -127.0, 127.0)
            ).astype(grouped_x.dtype)
    dtype = grouped_x.dtype
    w = _dense_weight(w_stacked, dtype)  # [E, N, K]
    if use_ragged is None:
        use_ragged = jax.default_backend() in ("tpu", "axon")
    if use_ragged:
        return jax.lax.ragged_dot(
            grouped_x,
            jnp.swapaxes(w, 1, 2),  # [E, K, N]
            group_sizes.astype(jnp.int32),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    # Portable fallback: E dense matmuls + segment select.
    E = w.shape[0]
    T = grouped_x.shape[0]
    bounds = jnp.cumsum(group_sizes)
    starts = bounds - group_sizes
    row = jnp.arange(T)[:, None]
    member = (row >= starts[None, :]) & (row < bounds[None, :])  # [T, E]
    all_out = jnp.einsum(
        "tk,enk->ten", grouped_x, w, preferred_element_type=jnp.float32
    )  # [T, E, N]
    return jnp.sum(all_out * member[..., None], axis=1).astype(dtype)


def grouped_expert_linear(
    x: jax.Array,  # [..., K]
    w_experts,  # stacked [E, N, K]
    expert_ids: jax.Array,  # [...] int32 — one expert id per row of x
    use_ragged: bool | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Reference-parity wrapper (moe.py:7-33): sort rows by expert id, run
    the grouped matmul, inverse-permute the results."""
    *lead, K = x.shape
    flat_x = x.reshape(-1, K)
    flat_ids = expert_ids.reshape(-1)
    E = (w_experts.packed if isinstance(w_experts, QuantizedTensor) else w_experts).shape[0]
    sort_idx = jnp.argsort(flat_ids, stable=True)
    grouped_x = jnp.take(flat_x, sort_idx, axis=0)
    group_sizes = jnp.bincount(flat_ids, length=E)
    out = grouped_matmul(
        grouped_x, w_experts, group_sizes, use_ragged=use_ragged, impl=impl
    )
    inv = jnp.argsort(sort_idx)
    out = jnp.take(out, inv, axis=0)
    N = out.shape[-1]
    return out.reshape(*lead, N)


def moe_forward(
    x: jax.Array,  # [B, L, D]
    w_router,
    w_gate,
    w_up,
    w_down,
    num_experts_per_tok: int,
    norm_topk_prob: bool = False,
    use_ragged: bool | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Full sparse MLP (reference Moe.__call__, moe.py:68-89)."""
    B, L, D = x.shape
    k = num_experts_per_tok
    _, expert_ids, expert_scores = route_topk(
        x, w_router, top_k=k, norm_topk_prob=norm_topk_prob
    )
    expanded_x = jnp.broadcast_to(x[:, :, None, :], (B, L, k, D)).reshape(-1, D)
    flat_ids = expert_ids.reshape(-1)

    gate = grouped_expert_linear(expanded_x, w_gate, flat_ids, use_ragged, impl)
    up = grouped_expert_linear(expanded_x, w_up, flat_ids, use_ragged, impl)
    down = grouped_expert_linear(silu(gate) * up, w_down, flat_ids, use_ragged, impl)
    out = down.reshape(B, L, k, D) * expert_scores[..., None].astype(x.dtype)
    return jnp.sum(out, axis=-2).astype(x.dtype)
