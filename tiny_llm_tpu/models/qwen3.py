"""Qwen3 model — functional TPU-native implementation.

Capability parity with the reference's three model variants
(/root/reference/src/tiny_llm_ref/qwen3_week1.py, qwen3_week2.py,
qwen3_week3.py): BF16-dense or W4A16-quantized weights, GQA attention with
QK-RMSNorm and RoPE, SwiGLU or MoE MLP, pre-norm residual blocks, tied or
untied LM head. One implementation covers all three course stages via
config switches instead of three near-copies.

Architecture (TPU-first, deliberately unlike the reference):
  * Weights live in a params PYTREE (`Qwen3Params`); the forward pass is a
    pure function, so the whole step jits, shards under a Mesh, and donates
    KV buffers for in-place cache updates.
  * KV caches are preallocated slabs appended with dynamic_update_slice
    inside the jitted step (no concat-growth, cf. kv/cache.py docstring).
  * Attention windows are power-of-two buckets: one compiled program per
    (chunk_len, window) pair, chosen host-side by the wrapper.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import flash_attention
from ..kernels.dispatch import resolve
from ..kernels.fused_decode_attention import (
    fused_decode_attention,
    fused_qkv_prep,
)
from ..kv.cache import BatchingKVCache, DenseKVCache, KVCache, bucket_for
from ..ops.basics import swiglu
from ..ops.moe import moe_forward
from ..ops.norm import rms_norm
from ..ops.quantize import QuantizedTensor, permute_out_features, quantized_linear
from ..ops.embedding import quantized_embedding_gather
from ..ops.rope import apply_rope, rope_tables
from ..ops.sampler import make_sampler
from ..utils import pytree_dataclass, static_field


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    num_hidden_layers: int
    hidden_size: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    vocab_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = True
    # MoE (Qwen3-MoE family; reference qwen3_week3.py:210-215)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    decoder_sparse_step: int = 1
    mlp_only_layers: tuple[int, ...] = ()
    norm_topk_prob: bool = False

    def is_moe_layer(self, layer_idx: int) -> bool:
        """Per-layer sparse predicate (reference is_qwen3_moe_sparse_layer)."""
        return (
            self.num_experts > 0
            and layer_idx not in self.mlp_only_layers
            and (layer_idx + 1) % max(self.decoder_sparse_step, 1) == 0
        )

    @staticmethod
    def from_hf_dict(d: dict) -> "Qwen3Config":
        return Qwen3Config(
            num_hidden_layers=d["num_hidden_layers"],
            hidden_size=d["hidden_size"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d["num_key_value_heads"],
            head_dim=d.get("head_dim", d["hidden_size"] // d["num_attention_heads"]),
            intermediate_size=d["intermediate_size"],
            vocab_size=d["vocab_size"],
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 1_000_000.0),
            max_position_embeddings=d.get("max_position_embeddings", 32768),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            num_experts=d.get("num_experts", 0),
            num_experts_per_tok=d.get("num_experts_per_tok", 0),
            moe_intermediate_size=d.get("moe_intermediate_size", 0),
            decoder_sparse_step=d.get("decoder_sparse_step", 1),
            mlp_only_layers=tuple(d.get("mlp_only_layers", ())),
            norm_topk_prob=d.get("norm_topk_prob", False),
        )


# ---------------------------------------------------------------------------
# Param pytrees. Linear weights are either a dense jax.Array [N, K] or a
# QuantizedTensor; `_linear` dispatches.
# ---------------------------------------------------------------------------


@pytree_dataclass
class AttentionParams:
    wq: Any
    wk: Any
    wv: Any
    wo: Any
    q_norm: jax.Array
    k_norm: jax.Array
    # Optional fused [q; k; v] projection (out_features concatenated). When
    # set, wq/wk/wv are None and the forward pass issues ONE matmul kernel
    # for all three projections (see fuse_projections).
    wqkv: Any = None
    # Fused-qkv column order: when True, out_features are interleaved per
    # KV head as [q_{h*n_rep}..q_{(h+1)*n_rep-1}, k_h, v_h] blocks so the
    # fused decode-attention kernel's BlockSpec slices each head's rows
    # directly (kernels/fused_decode_attention.py).
    qkv_interleaved: bool = static_field(default=False)


@pytree_dataclass
class MLPParams:
    w_gate: Any
    w_up: Any
    w_down: Any
    # Optional fused [gate; up] projection — one kernel instead of two.
    w_gate_up: Any = None


@pytree_dataclass
class MoEParams:
    w_router: Any
    w_gate: Any  # stacked [E, I, D]
    w_up: Any  # stacked [E, I, D]
    w_down: Any  # stacked [E, D, I]


@pytree_dataclass
class BlockParams:
    input_layernorm: jax.Array
    post_attention_layernorm: jax.Array
    attn: AttentionParams
    mlp: Any  # MLPParams | MoEParams


@pytree_dataclass
class Qwen3Params:
    embedding: Any  # [V, D] array or QuantizedTensor
    layers: tuple
    final_norm: jax.Array
    lm_head: Any  # None when tied


def _linear(x: jax.Array, w, residual: jax.Array | None = None) -> jax.Array:
    """x @ w.T (+ residual) — the residual of a pre-norm block rides the
    quantized kernel's fused output write (one launch instead of
    matmul + XLA add; kernels/quant_matmul.py residual epilogue)."""
    if isinstance(w, QuantizedTensor):
        return quantized_linear(x, w, residual=residual)
    out = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out.astype(x.dtype)
    return out if residual is None else out + residual


def _embed(params: Qwen3Params, tokens: jax.Array) -> jax.Array:
    if isinstance(params.embedding, QuantizedTensor):
        return quantized_embedding_gather(params.embedding, tokens)
    # Dense embeddings keep their stored dtype (bf16 for serving loads,
    # f32 for oracle-mode loads) so the whole forward runs in that dtype.
    return jnp.take(params.embedding, tokens, axis=0)


def _lm_head(params: Qwen3Params, h: jax.Array) -> jax.Array:
    if params.lm_head is not None:
        return _linear(h, params.lm_head)
    if isinstance(params.embedding, QuantizedTensor):
        return quantized_linear(h, params.embedding)
    out = jax.lax.dot_general(
        h,
        params.embedding,
        dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(h.dtype)


# ---------------------------------------------------------------------------
# Core attention + block forward
# ---------------------------------------------------------------------------


def _norm_linear(
    x: jax.Array, w, norm_w: jax.Array | None, eps: float
) -> jax.Array:
    """rms_norm(x) @ w.T — the norm rides the quantized kernel's fused
    prologue when possible (one launch, no HBM round trip of the normed
    activations; cf. the reference's separate week2_rms_norm dispatch)."""
    if norm_w is None:
        return _linear(x, w)
    if isinstance(w, QuantizedTensor):
        return quantized_linear(x, w, norm_weight=norm_w, eps=eps)
    return _linear(rms_norm(x, norm_w, eps), w)


def _split_qkv_rope(
    cfg: Qwen3Config,
    p: AttentionParams,
    qkv: jax.Array,  # [B, L, F] — the fused qkv projection's activation
    positions: jax.Array,  # [B, L] int32
    rope_tabs: tuple[jax.Array, jax.Array],
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split a fused-qkv activation + QK-RMSNorm + RoPE -> q [B,Hq,L,D],
    k/v [B,Hkv,L,D]. Factored out of _qkv so callers that batch SEVERAL
    logical sequences through one projection matmul (the mixed
    prefill+decode step) can split each slice at its own positions."""
    B, L, _ = qkv.shape
    cos_t, sin_t = rope_tabs
    hd = cfg.head_dim
    dq = cfg.num_attention_heads * hd
    dkv = cfg.num_key_value_heads * hd
    if p.qkv_interleaved:
        nr = cfg.num_attention_heads // cfg.num_key_value_heads
        rows = qkv.reshape(B, L, cfg.num_key_value_heads, (nr + 2) * hd)
        q = rows[..., : nr * hd].reshape(B, L, cfg.num_attention_heads, hd)
        k = rows[..., nr * hd : (nr + 1) * hd]
        v = rows[..., (nr + 1) * hd :]
    else:
        q = qkv[..., :dq].reshape(B, L, cfg.num_attention_heads, hd)
        k = qkv[..., dq : dq + dkv].reshape(B, L, cfg.num_key_value_heads, hd)
        v = qkv[..., dq + dkv :].reshape(B, L, cfg.num_key_value_heads, hd)
    q = rms_norm(q, p.q_norm, cfg.rms_norm_eps)
    k = rms_norm(k, p.k_norm, cfg.rms_norm_eps)
    q = apply_rope(q, cos_t, sin_t, positions, hd)
    k = apply_rope(k, cos_t, sin_t, positions, hd)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


def _qkv(
    cfg: Qwen3Config,
    p: AttentionParams,
    x: jax.Array,
    positions: jax.Array,
    rope_tabs: tuple[jax.Array, jax.Array],
    norm_w: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[pre-norm +] projections + QK-RMSNorm + RoPE -> q [B,Hq,L,D],
    k/v [B,Hkv,L,D]. When norm_w is given, x is the RAW residual stream
    and the input layernorm fuses into the (quantized) projection."""
    B, L, _ = x.shape
    eps = cfg.rms_norm_eps
    cos_t, sin_t = rope_tabs
    if p.wqkv is not None:
        qkv = _norm_linear(x, p.wqkv, norm_w, eps)
        return _split_qkv_rope(cfg, p, qkv, positions, rope_tabs)
    if norm_w is not None:
        x = rms_norm(x, norm_w, eps)
    q = _linear(x, p.wq).reshape(B, L, cfg.num_attention_heads, cfg.head_dim)
    k = _linear(x, p.wk).reshape(B, L, cfg.num_key_value_heads, cfg.head_dim)
    v = _linear(x, p.wv).reshape(B, L, cfg.num_key_value_heads, cfg.head_dim)
    q = rms_norm(q, p.q_norm, cfg.rms_norm_eps)
    k = rms_norm(k, p.k_norm, cfg.rms_norm_eps)
    q = apply_rope(q, cos_t, sin_t, positions, cfg.head_dim)
    k = apply_rope(k, cos_t, sin_t, positions, cfg.head_dim)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


def _mlp(
    cfg: Qwen3Config, p, x: jax.Array, norm_w: jax.Array | None = None,
    residual: jax.Array | None = None,
) -> jax.Array:
    """[pre-norm +] MLP [+ residual]. When norm_w is given, x is the RAW
    residual stream and the post-attention layernorm fuses into the
    (quantized) projection; `residual` rides the down-projection's fused
    output write."""
    eps = cfg.rms_norm_eps
    if isinstance(p, MoEParams):
        if norm_w is not None:
            x = rms_norm(x, norm_w, eps)  # router + experts share the norm
        out = moe_forward(
            x,
            p.w_router,
            p.w_gate,
            p.w_up,
            p.w_down,
            num_experts_per_tok=cfg.num_experts_per_tok,
            norm_topk_prob=cfg.norm_topk_prob,
        )
        return out if residual is None else out + residual
    if p.w_gate_up is not None:
        gu = _norm_linear(x, p.w_gate_up, norm_w, eps)
        half = gu.shape[-1] // 2
        return _linear(
            swiglu(gu[..., :half], gu[..., half:]), p.w_down,
            residual=residual,
        )
    if norm_w is not None:
        x = rms_norm(x, norm_w, eps)
    return _linear(
        swiglu(_linear(x, p.w_gate), _linear(x, p.w_up)), p.w_down,
        residual=residual,
    )


def _fuse_linears(ws: list) -> Any:
    """Concatenate linear weights along out_features; None if not fusable."""
    from ..ops.quantize import concat_out_features

    if all(isinstance(w, QuantizedTensor) for w in ws):
        head = ws[0]
        if any(
            w.layout != head.layout
            or w.in_features != head.in_features
            or w.k_padded != head.k_padded
            or w.group_size != head.group_size
            or w.bits != head.bits
            or w.packed.ndim != 2
            for w in ws
        ):
            return None
        return concat_out_features(ws)
    if all(isinstance(w, jax.Array) and w.ndim == 2 for w in ws):
        if any(w.shape[1] != ws[0].shape[1] for w in ws):
            return None
        return jnp.concatenate(ws, axis=0)
    return None  # mixed quantized/dense — keep separate


def _qkv_interleave_perm(attn: AttentionParams) -> list | None:
    """Column order interleaving the fused [q; k; v] out_features per KV
    head: [q_{h*nr}..q_{(h+1)*nr-1}, k_h, v_h] blocks of (nr+2)*D columns.
    Lets the fused decode-attention kernel slice each head's q rows, k row
    and v row with one BlockSpec block (kernels/fused_decode_attention.py).
    Head counts are inferred from the weights (D from the QK-norm shape),
    so no config is needed at fuse time. Returns None if the shapes don't
    describe a clean GQA head structure."""

    def out_features(w):
        if isinstance(w, QuantizedTensor):
            return w.out_features
        return w.shape[0]

    if attn.q_norm is None:
        # No QK-norm -> no fused decode-attention kernel (it folds the
        # norm in), so interleaving would be pointless; skip fusion-time
        # crash for norm-less attention variants (ADVICE round 4).
        return None
    d = attn.q_norm.shape[-1]
    dq, dk, dv = (out_features(w) for w in (attn.wq, attn.wk, attn.wv))
    if dk != dv or dq % d or dk % d:
        return None
    hq, hkv = dq // d, dk // d
    if hkv == 0 or hq % hkv:
        return None
    nr = hq // hkv
    idx: list[int] = []
    for h in range(hkv):
        idx.extend(range(h * nr * d, (h + 1) * nr * d))
        idx.extend(range(dq + h * d, dq + (h + 1) * d))
        idx.extend(range(dq + dk + h * d, dq + dk + (h + 1) * d))
    return idx


def fuse_projections(params: Qwen3Params) -> Qwen3Params:
    """Fuse per-layer [q;k;v] and [gate;up] projections into single weights.

    EXACT relayout (quant groups run along K; concatenating out_features
    preserves every packed word/scale bit-for-bit). Cuts the per-step
    kernel-launch count from 7 to 4 matmuls per layer and replaces the
    small kv projections (worst fixed-overhead ratio at decode) with one
    large streamed weight. The reference dispatches all seven separately
    (qwen3_week2.py:74-91). Apply to UNSHARDED params only — TP would shard
    the concatenated N axis across q/k/v boundaries incorrectly
    (parallel/sharding.py rejects fused params).
    """
    new_layers = []
    for layer in params.layers:
        attn = layer.attn
        if attn.wqkv is None:
            fused = _fuse_linears([attn.wq, attn.wk, attn.wv])
            if fused is not None:
                perm = _qkv_interleave_perm(attn)
                interleaved = perm is not None
                if interleaved:
                    if isinstance(fused, QuantizedTensor):
                        fused = permute_out_features(fused, perm)
                    else:
                        fused = fused[jnp.asarray(perm)]
                attn = dataclasses.replace(
                    attn, wq=None, wk=None, wv=None, wqkv=fused,
                    qkv_interleaved=interleaved,
                )
        mlp = layer.mlp
        if isinstance(mlp, MLPParams) and mlp.w_gate_up is None:
            fused = _fuse_linears([mlp.w_gate, mlp.w_up])
            if fused is not None:
                mlp = dataclasses.replace(
                    mlp, w_gate=None, w_up=None, w_gate_up=fused
                )
        new_layers.append(dataclasses.replace(layer, attn=attn, mlp=mlp))
    return dataclasses.replace(params, layers=tuple(new_layers))


def convert_projection_layouts(
    params: Qwen3Params, layout: str = "pair_t"
) -> Qwen3Params:
    """Repack every per-layer 2-D projection weight into `layout` — EXACT
    (stored integer codes and scales preserved bit-for-bit;
    ops/quantize.py convert_layout).

    Used by act_quant="int8": pair_t routes decode-shape matmuls through
    the int8 nibble-pair W4A8 kernel (kernels/quant_matmul.py
    _pair_kernel) and prefill through the W4A16-exact staged pair kernel.
    The embedding / lm_head stay in magic_t deliberately: logits are the
    accuracy-critical projection and the LM head is one matvec per step,
    so it keeps full W4A16 numerics. Stacked (3-D) W4-g128 MoE expert
    tensors convert too (kernels/moe_matmul.py _gqmm_pair_kernel: int8
    walk, a8 at decode-regime T only)."""
    def conv(w):
        if isinstance(w, QuantizedTensor) and w.packed.ndim == 2:
            from ..ops.quantize import convert_layout

            return convert_layout(w, layout)
        if (
            isinstance(w, QuantizedTensor)
            and w.packed.ndim == 3
            and w.layout in ("magic_t", "pair_t")
            and w.bits == 4
            and w.group_size == 128
        ):
            from ..ops.quantize import convert_layout_stacked

            return convert_layout_stacked(w, layout)
        return w

    new_layers = []
    for layer in params.layers:
        attn = dataclasses.replace(
            layer.attn,
            wq=conv(layer.attn.wq),
            wk=conv(layer.attn.wk),
            wv=conv(layer.attn.wv),
            wqkv=conv(layer.attn.wqkv),
            wo=conv(layer.attn.wo),
        )
        mlp = layer.mlp
        if isinstance(mlp, MLPParams):
            mlp = dataclasses.replace(
                mlp,
                w_gate=conv(mlp.w_gate),
                w_up=conv(mlp.w_up),
                w_gate_up=conv(mlp.w_gate_up),
                w_down=conv(mlp.w_down),
            )
        elif isinstance(mlp, MoEParams):
            mlp = dataclasses.replace(
                mlp,
                w_gate=conv(mlp.w_gate),
                w_up=conv(mlp.w_up),
                w_down=conv(mlp.w_down),
            )
        new_layers.append(dataclasses.replace(layer, attn=attn, mlp=mlp))
    return dataclasses.replace(params, layers=tuple(new_layers))


def _is_multidevice(params: Qwen3Params) -> bool:
    for leaf in jax.tree.leaves(params):
        s = getattr(leaf, "sharding", None)
        if s is not None and len(s.device_set) > 1:
            return True
    return False


def forward_full(
    params: Qwen3Params, cfg: Qwen3Config, tokens: jax.Array
) -> jax.Array:
    """No-cache full-prefix forward (week-1 path): tokens [B, L] -> logits
    [B, L, V]. Causal attention over the whole prefix."""
    B, L = tokens.shape
    rope_tabs = rope_tables(cfg.head_dim, max(L, 16), base=cfg.rope_theta)
    positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    h = _embed(params, tokens)
    scale = cfg.head_dim**-0.5
    for layer in params.layers:
        q, k, v = _qkv(
            cfg, layer.attn, h, positions, rope_tabs,
            norm_w=layer.input_layernorm,
        )
        attn = flash_attention(q, k, v, scale=scale, mask="causal", impl="xla")
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, -1)
        h = _linear(attn, layer.attn.wo, residual=h)
        h = _mlp(cfg, layer.mlp, h, norm_w=layer.post_attention_layernorm,
                 residual=h)
    h = rms_norm(h, params.final_norm, cfg.rms_norm_eps)
    return _lm_head(params, h)


def forward_step(
    params: Qwen3Params,
    cfg: Qwen3Config,
    rope_tabs: tuple[jax.Array, jax.Array],
    tokens: jax.Array,  # [B, L]
    offsets: jax.Array,  # [B] int32 — context length before this chunk
    keys: jax.Array,  # [num_layers, B, H_kv, S_max, D] (donated)
    values: jax.Array,  # (donated)
    *,
    window: int,
    logits_to_keep: int | None,
    attn_impl: str | None = None,
    fused_attn: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One cached model step (prefill chunk or decode step).

    Writes this chunk's K/V into the slab at `offsets`, attends over the
    first `window` positions with per-row length masking, returns
    (logits [B, L_keep, V], keys, values).
    """
    B, L = tokens.shape
    positions = offsets[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    lens = offsets + L
    scale = cfg.head_dim**-0.5
    h = _embed(params, tokens)
    new_keys = keys
    new_values = values
    bidx = jnp.arange(B, dtype=jnp.int32)
    # Fused decode-attention fast path: one Pallas call per layer replaces
    # the qkv-split/QK-norm/RoPE/window-slice/flash chain (the per-layer
    # XLA glue was ~30% of the decode step — see PERFORMANCE.md round 4).
    # The RoPE row is gathered once here and shared by every layer.
    # (fused_attn is a construction-time knob baked into the jit partial —
    # never an env read at trace time, which the jit cache can't key on.)
    use_fused_attn = (
        L == 1
        and isinstance(attn_impl, (str, type(None)))
        and resolve(attn_impl) == "pallas"
        and fused_attn
        and all(
            layer.attn.wqkv is not None and layer.attn.qkv_interleaved
            for layer in params.layers
        )
    )
    if use_fused_attn:
        cos_row = jnp.take(rope_tabs[0], offsets, axis=0)
        sin_row = jnp.take(rope_tabs[1], offsets, axis=0)
        n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    for i, layer in enumerate(params.layers):
        if use_fused_attn:
            qkv = _norm_linear(
                h, layer.attn.wqkv, layer.input_layernorm, cfg.rms_norm_eps
            )
            qkv_rows = qkv.reshape(
                B, cfg.num_key_value_heads, n_rep + 2, cfg.head_dim
            )
            attn_rows, k_row, v_row = fused_decode_attention(
                qkv_rows, new_keys, new_values, offsets, cos_row, sin_row,
                layer.attn.q_norm, layer.attn.k_norm,
                layer_idx=i, scale=scale, eps=cfg.rms_norm_eps,
                window=window,
            )
            new_keys = _scatter_rows(new_keys, i, bidx, offsets, k_row)
            new_values = _scatter_rows(new_values, i, bidx, offsets, v_row)
            attn = attn_rows.reshape(B, L, -1)
        else:
            q, k, v = _qkv(
                cfg, layer.attn, h, positions, rope_tabs,
                norm_w=layer.input_layernorm,
            )
            # Append at the per-row offset. One batched scatter per layer.
            new_keys = _scatter_rows(new_keys, i, bidx, offsets, k)
            new_values = _scatter_rows(new_values, i, bidx, offsets, v)
            k_win = jax.lax.slice_in_dim(new_keys[i], 0, window, axis=2)
            v_win = jax.lax.slice_in_dim(new_values[i], 0, window, axis=2)
            attn = flash_attention(
                q, k_win, v_win, scale=scale, mask="causal", lens=lens,
                impl=attn_impl,
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, L, -1)
        h = _linear(attn, layer.attn.wo, residual=h)
        h = _mlp(cfg, layer.mlp, h, norm_w=layer.post_attention_layernorm,
                 residual=h)
    if logits_to_keep is not None:
        h = h[:, -logits_to_keep:, :]
    h = rms_norm(h, params.final_norm, cfg.rms_norm_eps)
    return _lm_head(params, h), new_keys, new_values


def forward_step_paged(
    params: Qwen3Params,
    cfg: Qwen3Config,
    rope_tabs: tuple[jax.Array, jax.Array],
    tokens: jax.Array,  # [B, L]
    offsets: jax.Array,  # [B] int32
    key_pages,  # tuple of per-layer [P, H_kv, ps, D] buffers (donated)
    value_pages,  # (donated)
    block_table: jax.Array,  # [B, max_pages] int32, -1 padded
    *,
    logits_to_keep: int | None,
    attn_impl: str | None = None,
    local_attention: bool = False,
    split_attention: bool = False,
    fused_attn: bool = True,
    fused_one: bool = True,
) -> tuple[jax.Array, tuple, tuple]:
    """One model step over the paged KV pool (week-3 serving path).

    Scatters this chunk's K/V into the pages named by the block table,
    then runs paged flash attention per layer. The pool tensors are
    donated, so the scatters compile to in-place writes — the aliasing
    trick of the reference's Metal paged_cache_update
    (paged_attention.cpp:44-49) comes for free from XLA buffer donation.

    `local_attention=True` (valid only when every row's offset is 0, i.e.
    the chunk IS the whole context) runs causal attention directly on the
    chunk's local K/V with the dense flash kernel, skipping the per-page
    KV walk entirely — the pages are still written for later decode. At
    8K static prefill this is 2.3x (page-tile bookkeeping dominates the
    paged prefill kernel; the reference's single-page fast path,
    paged_attention.metal:332-385, attacks the same cost).

    `split_attention=True` generalizes that to offset > 0 chunks: the
    chunk's causal self-attention runs on its local K/V at dense-kernel
    tiles, the prefix contribution streams pages WITHOUT causal
    bookkeeping, and the two merge with an exact online-softmax state
    combine (kernels/split_prefill.py). Valid for any per-row offsets —
    offset-0 rows contribute an identity prefix state."""
    from ..kernels import paged_attention
    from ..kernels.split_prefill import split_paged_prefill

    B, L = tokens.shape
    ps = key_pages[0].shape[2]
    positions = offsets[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    lens = offsets + L
    # Physical target of every appended token. -1 (idle slot) entries stay
    # raw here; the writer clamps them to a trash page — global page 0 on
    # the inline path, the replica-local trash page under a DP strategy.
    page_idx_raw = jnp.take_along_axis(
        block_table, jnp.minimum(positions // ps, block_table.shape[1] - 1), axis=1
    )
    page_idx = jnp.maximum(page_idx_raw, 0)  # [B, L]
    slot = positions % ps  # [B, L]
    # Strategy objects (parallel/dp.py DPPagedAttention) own the page
    # write when the pool's page axis is sharded: the scatter must run
    # shard-locally with stripe-relative indices.
    strategy_update = getattr(attn_impl, "paged_update", None)

    scale = cfg.head_dim**-0.5
    h = _embed(params, tokens)
    # The pool is a TUPLE of independent per-layer buffers (kv/paged.py):
    # layer i's write and read touch only buffer i, so the in-place DUS
    # chain and the attention kernel operand never alias across layers
    # and no kp[i] slice is ever materialized.
    kp, vp = list(key_pages), list(value_pages)
    # Fused decode-attention fast path (decode steps only): one Pallas
    # call per layer for qkv split + QK-norm + RoPE + the whole-page
    # walk — same glue elimination as the dense path, scan-safe
    # (BlockSpec-only, no manual DMA). See kernels/fused_decode_attention.
    # (fused_attn/fused_one are construction-time knobs baked into the
    # jit partial — never env reads at trace time.)
    use_fused_attn = (
        L == 1
        and strategy_update is None
        and not local_attention
        and not split_attention
        and isinstance(attn_impl, (str, type(None)))
        and resolve(attn_impl) == "pallas"
        and fused_attn
        and all(
            layer.attn.wqkv is not None and layer.attn.qkv_interleaved
            for layer in params.layers
        )
    )
    if use_fused_attn:
        cos_row = jnp.take(rope_tabs[0], offsets, axis=0)
        sin_row = jnp.take(rope_tabs[1], offsets, axis=0)
        n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    for i, layer in enumerate(params.layers):
        if use_fused_attn:
            # One Pallas call per layer replaces the per-layer XLA glue:
            # qkv split + QK-norm + RoPE + the whole-page walk, with the
            # current token's K/V folded in-kernel (so the page write
            # can happen AFTER attention, via per-row in-place DUS).
            # Idle rows (-1 pages, offset 0) attend their own token plus
            # clamped trash-page garbage — their outputs are discarded
            # and their writes land on the trash page, same contract as
            # the unfused path (exact garbage VALUES differ; an early
            # parity probe compared idle-slot garbage across paths and
            # mis-read that as corruption — install real requests when
            # comparing paths, see scripts/tpu_smoke.py).
            # TLT_PAGED_FUSED_ONE=0 falls back to the 3-launch variant
            # (prep kernel + DUS + pages-walk attention), kept as the
            # measured A/B (7.07 vs 5.69 ms/step on the serving burst).
            qkv = _norm_linear(
                h, layer.attn.wqkv, layer.input_layernorm, cfg.rms_norm_eps
            )
            qkv_rows = qkv.reshape(
                B, cfg.num_key_value_heads, n_rep + 2, cfg.head_dim
            )
            zero = jnp.int32(0)
            if fused_one:
                from ..kernels.fused_decode_attention import (
                    fused_paged_decode_attention,
                )

                attn_rows, k_row, v_row = fused_paged_decode_attention(
                    qkv_rows, kp[i], vp[i], block_table, offsets,
                    cos_row, sin_row,
                    layer.attn.q_norm, layer.attn.k_norm,
                    scale=scale, eps=cfg.rms_norm_eps,
                )
            else:
                q_rows, k_row, v_row = fused_qkv_prep(
                    qkv_rows, offsets, cos_row, sin_row,
                    layer.attn.q_norm, layer.attn.k_norm,
                    eps=cfg.rms_norm_eps,
                )
                attn_rows = None
            # Per-row dynamic_update_slice instead of the advanced-index
            # scatter: XLA keeps DUS chains on a donated buffer in-place
            # even when a Pallas call also reads the buffer, while
            # scatter + custom-call consumers forced whole-pool copies
            # (the _scatter_rows lesson, same hazard class).
            # Page-write cost is fully overlapped: a timing probe with the
            # DUS chain REMOVED measured 6.30 vs 6.43 ms/step (2026-08-21)
            # — the ~280 us of dynamic_update_slice in the trace hides
            # behind the weight stream, so deferred/pipelined page writes
            # are not worth their structural cost.
            for b in range(B):
                kp[i] = jax.lax.dynamic_update_slice(
                    kp[i], k_row[b][None].astype(kp[i].dtype),
                    (page_idx[b, 0], zero, slot[b, 0], zero))
                vp[i] = jax.lax.dynamic_update_slice(
                    vp[i], v_row[b][None].astype(vp[i].dtype),
                    (page_idx[b, 0], zero, slot[b, 0], zero))
            if attn_rows is None:
                q4 = q_rows.reshape(
                    B, cfg.num_attention_heads, L, cfg.head_dim
                )
                attn = paged_attention(
                    q4, kp[i], vp[i], block_table, lens, scale=scale,
                    mask="causal", impl=attn_impl,
                )
                attn = attn.transpose(0, 2, 1, 3).reshape(B, L, -1)
            else:
                attn = attn_rows.reshape(B, L, -1)
            h = _linear(attn, layer.attn.wo, residual=h)
            h = _mlp(cfg, layer.mlp, h,
                     norm_w=layer.post_attention_layernorm, residual=h)
            continue
        q, k, v = _qkv(
            cfg, layer.attn, h, positions, rope_tabs,
            norm_w=layer.input_layernorm,
        )
        if strategy_update is not None:
            kp[i], vp[i] = strategy_update(
                kp[i], vp[i], k, v, page_idx_raw, slot
            )
        else:
            # [B, H, L, D] -> [B, L, H, D] to match scatter index layout.
            kp[i] = kp[i].at[page_idx, :, slot, :].set(k.transpose(0, 2, 1, 3))
            vp[i] = vp[i].at[page_idx, :, slot, :].set(v.transpose(0, 2, 1, 3))
        if local_attention:
            attn = flash_attention(
                q, k, v, scale=scale, mask="causal", impl=attn_impl
            )
        elif split_attention:
            attn = split_paged_prefill(
                q, k, v, kp[i], vp[i], block_table, offsets,
                scale=scale, impl=attn_impl if isinstance(attn_impl, str) else None,
            )
        else:
            attn = paged_attention(
                q, kp[i], vp[i], block_table, lens, scale=scale,
                mask="causal", impl=attn_impl,
            )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, -1)
        h = _linear(attn, layer.attn.wo, residual=h)
        h = _mlp(cfg, layer.mlp, h, norm_w=layer.post_attention_layernorm,
                 residual=h)
    if logits_to_keep is not None:
        h = h[:, -logits_to_keep:, :]
    h = rms_norm(h, params.final_norm, cfg.rms_norm_eps)
    return _lm_head(params, h), tuple(kp), tuple(vp)


def forward_decode_burst_dense(
    params: Qwen3Params,
    cfg: Qwen3Config,
    rope_tabs: tuple[jax.Array, jax.Array],
    tokens0: jax.Array,  # [B] int32
    offsets0: jax.Array,  # [B] int32
    keys: jax.Array,  # (donated)
    values: jax.Array,  # (donated)
    *,
    window: int,
    steps: int,
    attn_impl: str | None = None,
    fused_attn: bool = True,
    temp: float = 0.0,
    top_k: int | None = None,
    top_p: float | None = None,
    rng0: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """K decode steps over the dense slab in one dispatch. Greedy when
    temp == 0; otherwise temperature/top-k/top-p sampling ON DEVICE
    (reference samplers run host-side per token, sampler.py:5-25 — here
    the whole burst including the categorical draw stays in the scan).
    `window` must cover offsets0 + steps."""
    sample = None if temp == 0 else make_sampler(temp, top_p, top_k)

    def body(carry, step_key):
        tokens, offsets, ks, vs = carry
        logits, ks, vs = forward_step(
            params, cfg, rope_tabs, tokens[:, None], offsets, ks, vs,
            window=window, logits_to_keep=1, attn_impl=attn_impl,
            fused_attn=fused_attn,
        )
        lp = logits[:, -1, :].astype(jnp.float32)
        if sample is None:
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        else:
            nxt = sample(jax.nn.log_softmax(lp, axis=-1), step_key)
        return (nxt, offsets + 1, ks, vs), nxt

    xs = None if sample is None else jax.random.split(rng0, steps)
    (_, _, keys, values), toks = jax.lax.scan(
        body, (tokens0, offsets0, keys, values), xs=xs, length=steps
    )
    return toks, keys, values


def forward_decode_burst_paged(
    params: Qwen3Params,
    cfg: Qwen3Config,
    rope_tabs: tuple[jax.Array, jax.Array],
    tokens0: jax.Array,  # [B] int32 — first token of the burst per row
    offsets0: jax.Array,  # [B] int32
    key_pages: jax.Array,  # (donated)
    value_pages: jax.Array,  # (donated)
    block_table: jax.Array,  # [B, width] — must cover offsets0 + steps
    *,
    steps: int,
    attn_impl: str | None = None,
    fused_attn: bool = True,
    fused_one: bool = True,
    temp: float = 0.0,
    top_k: int | None = None,
    top_p: float | None = None,
    rng0: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """K decode steps in ONE dispatch (lax.scan over the model step,
    argmax — or the temp/top-k/top-p sampler when temp > 0 — fed back
    on-device). Returns (tokens [steps, B], pages).

    The host-side dispatch-ahead loop this enables is what keeps the chip
    busy when every host<->device round trip costs ~70 ms (remote-tunnel
    serving; SURVEY.md §7 hard-part 5). EOS rows keep decoding garbage
    until the host inspects the burst — their tokens are discarded and
    their pages must have `steps` tokens of slack.
    """
    sample = None if temp == 0 else make_sampler(temp, top_p, top_k)

    def body(carry, step_key):
        tokens, offsets, kp, vp = carry
        logits, kp, vp = forward_step_paged(
            params, cfg, rope_tabs, tokens[:, None], offsets, kp, vp,
            block_table, logits_to_keep=1, attn_impl=attn_impl,
            fused_attn=fused_attn, fused_one=fused_one,
        )
        lp = logits[:, -1, :].astype(jnp.float32)
        if sample is None:
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        else:
            nxt = sample(jax.nn.log_softmax(lp, axis=-1), step_key)
        return (nxt, offsets + 1, kp, vp), nxt

    xs = None if sample is None else jax.random.split(rng0, steps)
    # scan_scope: paged-decode dispatch avoids the manual-DMA gather
    # kernel inside scan bodies (kernels/paged_attention_pallas.py — a
    # 2026-08-21 relay build faults the TPU worker on that combination).
    from ..kernels.paged_attention_pallas import scan_scope

    with scan_scope():
        (_, _, kp, vp), toks = jax.lax.scan(
            body, (tokens0, offsets0, key_pages, value_pages), xs=xs, length=steps
        )
    return toks, kp, vp


@dataclasses.dataclass
class MixedStep:
    """One scheduled prefill sub-chunk of a mixed burst step
    (Qwen3Model.mixed_burst): `cache` owns the request's pages, `tokens`
    are its 1..c real prompt tokens starting at context length `offset`
    (a multiple of the mixed chunk), `sample_key` seeds the completion
    draw when the sub-chunk ends the prompt under temp > 0."""

    cache: Any
    tokens: Any
    offset: int
    sample_key: Any = None


def forward_mixed_burst_paged(
    params: Qwen3Params,
    cfg: Qwen3Config,
    rope_tabs: tuple[jax.Array, jax.Array],
    tokens0: jax.Array,  # [B] int32 — first decode token per slot
    offsets0: jax.Array,  # [B] int32
    key_pages,  # tuple of per-layer page buffers (donated)
    value_pages,  # (donated)
    block_table: jax.Array,  # [B, W] — decode slots; must cover offsets0+steps
    p_chunks: jax.Array,  # [steps, c] int32 — per-step prefill sub-chunks
    p_offsets: jax.Array,  # [steps] int32 — context length before each sub-chunk
    p_tables: jax.Array,  # [steps, W] int32 — per-step block-table row (-1 rows = idle)
    p_last: jax.Array,  # [steps] int32 — index of the last REAL token per sub-chunk
    p_keys: jax.Array | None,  # [steps] PRNG keys for completion draws (sampled mode)
    *,
    steps: int,
    attn_impl: str | None = None,
    fused_attn: bool = True,
    fused_one: bool = True,
    temp: float = 0.0,
    top_k: int | None = None,
    top_p: float | None = None,
    rng0: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """K decode steps AND K prefill sub-chunks in ONE dispatch — the
    mixed prefill+decode step program (POD-style).

    Each scan step runs the batched decode rows (B tokens) and c prefill
    tokens through the SAME projection / MLP matmuls: the combined
    activation is [1, B + c, D], so every weight matrix streams from HBM
    once per step instead of once for decode plus once for prefill. On
    the v5e the MXU issues a [M<=32,128]x[128,128] tile in ~8 cycles
    regardless of M (benchmark_results/v5e-mxu-rate-2026-08-22.json), so
    the extra prefill rows ride the decode step's weight stream nearly
    free — this is what the serialized scheduler (at most one prefill
    chunk between bursts, reference batch.py:120-221) can never exploit,
    and why the serving campaign was admission-bound (docs/serving.md
    "operating curve").

    The per-step arrays form a SCHEDULE: step t prefills c tokens of
    whichever request the host assigned to it (p_tables[t] names its
    pages), so one burst streams several queued prompts back-to-back.
    A sub-chunk whose prompt ends mid-chunk carries garbage padding —
    p_last[t] marks the last real token; the garbage K/V lands in the
    request's own reserved final page at slots the request's decode
    overwrites before any read (write-then-read, same contract as idle
    decode slots). Steps with nothing to prefill carry an all -1 table
    row (clamped to the trash page) and are discarded. Attention stays
    per-logical-sequence: decode rows take the fused one-Pallas-call
    paged path (or its XLA twin off-TPU); the prefill slice writes its
    K/V as ONE in-place dynamic_update_slice per layer (c divides the
    page size and offsets are c-aligned, so a sub-chunk never straddles
    pages) and runs the paged causal kernel over its own table row.

    Returns (decode tokens [steps, B], completion tokens [steps] — step
    t's draw from the logits at its sub-chunk's last real token, valid
    exactly when that step completes a prompt — and the updated pools).
    """
    from ..kernels import paged_attention
    from ..kernels.dispatch import resolve
    from ..kernels.fused_decode_attention import fused_paged_decode_attention
    from ..kernels.paged_attention_pallas import scan_scope

    sample = None if temp == 0 else make_sampler(temp, top_p, top_k)
    B = tokens0.shape[0]
    c = p_chunks.shape[1]
    ps = key_pages[0].shape[2]
    scale = cfg.head_dim**-0.5
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    use_fused = (
        fused_attn
        and fused_one
        and isinstance(attn_impl, (str, type(None)))
        and resolve(attn_impl) == "pallas"
        and all(
            layer.attn.wqkv is not None and layer.attn.qkv_interleaved
            for layer in params.layers
        )
    )
    def body(carry, x):
        tokens, offsets, kp, vp = carry
        if sample is None:
            chunk, p_off, p_tab, last_idx = x
            step_key = p_key = None
        else:
            chunk, p_off, p_tab, last_idx, p_key, step_key = x
        kp, vp = list(kp), list(vp)
        maxw = block_table.shape[1] - 1
        # Decode rows' write targets (idle slots: -1 tables clamp to the
        # trash page — page 0 — same contract as forward_step_paged).
        d_pos = offsets[:, None]  # [B, 1]
        d_page = jnp.maximum(
            jnp.take_along_axis(
                block_table, jnp.minimum(d_pos // ps, maxw), axis=1
            ),
            0,
        )
        d_slot = d_pos % ps
        # Prefill sub-chunk positions + write target. c | ps and
        # p_off % c == 0 (asserted by mixed_burst / gated by the
        # scheduler), so the whole sub-chunk lives in ONE page: its K/V
        # lands as a single dynamic_update_slice per layer — the in-place
        # idiom the fused decode path uses. (The first cut scattered via
        # .at[p_page, :, p_slot].set(); with Pallas calls reading the
        # same scan-carried buffer, XLA resolved the hazard with
        # whole-pool copies per layer per step — the _scatter_rows
        # hazard class — and the mixed A/B LOST 120 vs 162 tok/s.)
        p_pos = (p_off + jnp.arange(c, dtype=jnp.int32))[None, :]  # [1, c]
        p_page0 = jnp.maximum(p_tab[jnp.minimum(p_off // ps, maxw)], 0)
        p_slot0 = p_off % ps
        p_len = (p_off + c).reshape(1)
        p_tab2 = p_tab[None, :]  # [1, W] — this step's request

        h = jnp.concatenate(
            [_embed(params, tokens[None, :]), _embed(params, chunk[None, :])],
            axis=1,
        )  # [1, B + c, D]
        if use_fused:
            cos_row = jnp.take(rope_tabs[0], offsets, axis=0)
            sin_row = jnp.take(rope_tabs[1], offsets, axis=0)
        zero = jnp.int32(0)
        for i, layer in enumerate(params.layers):
            qkv = _norm_linear(
                h, layer.attn.wqkv, layer.input_layernorm, cfg.rms_norm_eps
            )  # [1, B + c, F] — ONE weight stream for decode + prefill
            # Prefill slice: split + norm + rope at its own positions,
            # write K/V BEFORE attention (write-then-read, the unfused
            # chunk path's order) — one in-place DUS per layer.
            q_p, k_p, v_p = _split_qkv_rope(
                cfg, layer.attn, qkv[:, B:], p_pos, rope_tabs
            )
            kp[i] = jax.lax.dynamic_update_slice(
                kp[i], k_p.astype(kp[i].dtype), (p_page0, zero, p_slot0, zero)
            )
            vp[i] = jax.lax.dynamic_update_slice(
                vp[i], v_p.astype(vp[i].dtype), (p_page0, zero, p_slot0, zero)
            )
            # Decode slice.
            if use_fused:
                qkv_rows = qkv[0, :B].reshape(
                    B, cfg.num_key_value_heads, n_rep + 2, cfg.head_dim
                )
                attn_d, k_row, v_row = fused_paged_decode_attention(
                    qkv_rows, kp[i], vp[i], block_table, offsets,
                    cos_row, sin_row,
                    layer.attn.q_norm, layer.attn.k_norm,
                    scale=scale, eps=cfg.rms_norm_eps,
                )
                for b in range(B):
                    kp[i] = jax.lax.dynamic_update_slice(
                        kp[i], k_row[b][None].astype(kp[i].dtype),
                        (d_page[b, 0], zero, d_slot[b, 0], zero))
                    vp[i] = jax.lax.dynamic_update_slice(
                        vp[i], v_row[b][None].astype(vp[i].dtype),
                        (d_page[b, 0], zero, d_slot[b, 0], zero))
                attn_d = attn_d.reshape(1, B, -1)
            else:
                q_d, k_d, v_d = _split_qkv_rope(
                    cfg, layer.attn, qkv[0, :B][:, None, :],
                    offsets[:, None], rope_tabs,
                )
                kp[i] = kp[i].at[d_page, :, d_slot, :].set(
                    k_d.transpose(0, 2, 1, 3).astype(kp[i].dtype)
                )
                vp[i] = vp[i].at[d_page, :, d_slot, :].set(
                    v_d.transpose(0, 2, 1, 3).astype(vp[i].dtype)
                )
                a4 = paged_attention(
                    q_d, kp[i], vp[i], block_table, offsets + 1,
                    scale=scale, mask="causal", impl=attn_impl,
                )  # [B, Hq, 1, D]
                attn_d = a4.transpose(0, 2, 1, 3).reshape(1, B, -1)
            # Prefill attention over its own pages (its sub-chunk K/V is
            # already written; causal within the chunk via q_pos).
            a_p = paged_attention(
                q_p, kp[i], vp[i], p_tab2, p_len,
                scale=scale, mask="causal", impl=attn_impl,
            )  # [1, Hq, c, D]
            attn_p = a_p.transpose(0, 2, 1, 3).reshape(1, c, -1)
            attn = jnp.concatenate([attn_d, attn_p], axis=1)
            h = _linear(attn, layer.attn.wo, residual=h)
            h = _mlp(cfg, layer.mlp, h,
                     norm_w=layer.post_attention_layernorm, residual=h)
        # LM head over the decode rows + the sub-chunk's LAST REAL token
        # only (M = B+1: the other prefill rows would multiply the vocab
        # matmul's row count for logits nobody reads mid-chunk).
        h_p_last = jax.lax.dynamic_index_in_dim(
            h[0], B + last_idx, axis=0, keepdims=True
        )  # [1, D]
        h_sel = jnp.concatenate([h[0, :B], h_p_last], axis=0)
        h_sel = rms_norm(h_sel, params.final_norm, cfg.rms_norm_eps)
        logits = _lm_head(params, h_sel[None])[0]  # [B + 1, V]
        lp = logits[:B].astype(jnp.float32)
        cp = logits[B:].astype(jnp.float32)  # [1, V]
        if sample is None:
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            comp = jnp.argmax(cp, axis=-1).astype(jnp.int32)[0]
        else:
            nxt = sample(jax.nn.log_softmax(lp, axis=-1), step_key)
            comp = sample(jax.nn.log_softmax(cp, axis=-1), p_key)[0]
        return (nxt, offsets + 1, tuple(kp), tuple(vp)), (nxt, comp)

    if sample is None:
        xs = (p_chunks, p_offsets, p_tables, p_last)
    else:
        xs = (
            p_chunks, p_offsets, p_tables, p_last,
            p_keys, jax.random.split(rng0, steps),
        )
    with scan_scope():
        (_, _, kp, vp), (toks, comp_toks) = jax.lax.scan(
            body, (tokens0, offsets0, key_pages, value_pages),
            xs=xs, length=steps,
        )
    return toks, comp_toks, kp, vp


def _scatter_rows(
    buf: jax.Array,  # [num_layers, B, H, S_max, D]
    layer: int,
    bidx: jax.Array,  # [B]
    offsets: jax.Array,  # [B]
    chunk: jax.Array,  # [B, H, L, D]
) -> jax.Array:
    """Write chunk rows into buf[layer, b, :, offsets[b]:offsets[b]+L, :].

    A Python loop of scalar-offset dynamic_update_slices on the full 5-D
    slab: each compiles to an in-place write of just the [H, L, D] slice.
    (A vmapped DUS lowers to a scatter that XLA materializes as a loop
    fusion rewriting the whole 8 MB layer slab — measured at ~0.8 ms/step
    on v5e, dwarfing the actual 8 KB of new KV bytes.)"""
    B, H, L, D = chunk.shape
    zero = jnp.int32(0)
    lyr = jnp.int32(layer)
    out = buf
    for b in range(B):
        out = jax.lax.dynamic_update_slice(
            out, chunk[b][None, None], (lyr, jnp.int32(b), zero, offsets[b], zero)
        )
    return out


# ---------------------------------------------------------------------------
# Wrapper with reference-parity API:
#   model(inputs, offset, cache, logits_to_keep)  /  model.create_kv_cache()
# ---------------------------------------------------------------------------


class Qwen3Model:
    """Host-side wrapper owning params + per-shape jit caches.

    API parity with Qwen3ModelWeek2/3 (qwen3_week2.py:357, qwen3_week3.py:320):
    __call__(inputs, offset, cache, logits_to_keep) where cache is a list-like
    of per-layer handles in the reference; here a single cache object plays
    that role (it owns the stacked per-layer slab).
    """

    def __init__(
        self,
        params: Qwen3Params,
        cfg: Qwen3Config,
        max_seq_len: int | None = None,
        attn_impl: str | None = None,
        fuse: bool = True,
        act_quant: str | None = None,
    ):
        # Fusion is an eager relayout; on mesh-sharded params it would
        # concatenate across the TP axis and destroy the intended placement,
        # so it only applies to single-device (unsharded) params.
        if fuse and not _is_multidevice(params):
            params = fuse_projections(params)
        # act_quant="int8": repack projection weights into pair_t so
        # decode matmuls run the W4A8 int8 nibble-pair kernel (prefill
        # stays W4A16-exact; embedding/LM head stay magic_t). Default
        # "bf16" = full W4A16. Env knob read ONCE at construction
        # (construction-time config, not trace-time — ADVICE round 4).
        self.act_quant = (
            act_quant
            if act_quant is not None
            else os.environ.get("TLT_ACT_QUANT", "bf16")
        )
        if self.act_quant == "int8" and not _is_multidevice(params):
            params = convert_projection_layouts(params, "pair_t")
        self.params = params
        self.cfg = cfg
        self.num_hidden_layers = cfg.num_hidden_layers
        self.hidden_size = cfg.hidden_size
        self.vocab_size = cfg.vocab_size
        self.max_seq_len = max_seq_len or cfg.max_position_embeddings
        self.attn_impl = attn_impl
        # Activation dtype drives KV slab/page dtype: bf16 for serving
        # (quantized or bf16 weights), f32 in oracle mode (f32 dense load).
        emb = params.embedding
        self.dtype = (
            emb.dtype
            if not isinstance(emb, QuantizedTensor)
            else jnp.bfloat16
        )
        self._rope_tables = rope_tables(
            cfg.head_dim, self.max_seq_len, base=cfg.rope_theta
        )

        # Fused-path A/B knobs, read ONCE at construction and baked into
        # the jit partials (ADVICE round 4: a trace-time env read is not
        # part of the jit cache key, so toggling mid-process silently
        # kept the stale compiled path). In-process A/B = construct two
        # models; the env vars still work when set before construction.
        self.fused_attn = os.environ.get("TLT_FUSED_ATTN", "1") != "0"
        self.paged_fused_one = os.environ.get("TLT_PAGED_FUSED_ONE", "1") == "1"

        self._full_jit = jax.jit(functools.partial(forward_full, cfg=cfg))
        self._step_jit = jax.jit(
            functools.partial(
                forward_step, cfg=cfg, attn_impl=attn_impl,
                fused_attn=self.fused_attn,
            ),
            static_argnames=("window", "logits_to_keep"),
            donate_argnames=("keys", "values"),
        )
        self._paged_step_jit = jax.jit(
            functools.partial(
                forward_step_paged, cfg=cfg, attn_impl=attn_impl,
                fused_attn=self.fused_attn, fused_one=self.paged_fused_one,
            ),
            static_argnames=("logits_to_keep", "local_attention", "split_attention"),
            donate_argnames=("key_pages", "value_pages"),
        )
        # Split-attention chunked prefill (offset>0 chunks): exact softmax-
        # state combine of chunk-local dense attention with a non-causal
        # prefix page stream. Measured on the v5e (benches/
        # bench_chunked_prefill.py, 8K prompt): 1.13x at 1024-token chunks,
        # 1.21x at 2048, neutral at <=512 where whole-model projections
        # dominate — hence the min-chunk gate. Strategy attn_impl objects
        # (TP/SP) keep the plain paged path.
        self.split_prefill = isinstance(attn_impl, (str, type(None)))
        self.split_prefill_min_chunk = 1024
        self._paged_burst_jit = jax.jit(
            functools.partial(
                forward_decode_burst_paged, cfg=cfg, attn_impl=attn_impl,
                fused_attn=self.fused_attn, fused_one=self.paged_fused_one,
            ),
            static_argnames=("steps", "temp", "top_k", "top_p"),
            donate_argnames=("key_pages", "value_pages"),
        )
        self._dense_burst_jit = jax.jit(
            functools.partial(
                forward_decode_burst_dense, cfg=cfg, attn_impl=attn_impl,
                fused_attn=self.fused_attn,
            ),
            static_argnames=("window", "steps", "temp", "top_k", "top_p"),
            donate_argnames=("keys", "values"),
        )
        self._mixed_burst_jit = jax.jit(
            functools.partial(
                forward_mixed_burst_paged, cfg=cfg, attn_impl=attn_impl,
                fused_attn=self.fused_attn, fused_one=self.paged_fused_one,
            ),
            static_argnames=("steps", "temp", "top_k", "top_p"),
            donate_argnames=("key_pages", "value_pages"),
        )
        self.page_pool = None

    # -- week-1 style full forward ------------------------------------------
    def forward_full(self, tokens: jax.Array) -> jax.Array:
        return self._full_jit(self.params, tokens=tokens)

    # -- cache management ----------------------------------------------------
    def enable_paged_attention(
        self, num_pages: int | None = None, page_size: int = 128
    ) -> "Qwen3Model":
        """Attach a page pool; create_kv_cache() then returns paged handles
        (the week-2 -> week-3 model switch, qwen3_week3.py:231-234)."""
        from ..kv.paged import PagePool

        if num_pages is None:
            num_pages = max(self.max_seq_len // page_size * 4, 8) + 1
        self.page_pool = PagePool(
            num_layers=self.cfg.num_hidden_layers,
            num_kv_heads=self.cfg.num_key_value_heads,
            num_pages=num_pages,
            page_size=page_size,
            head_dim=self.cfg.head_dim,
            dtype=self.dtype,
        )
        # One FIXED block-table width for every step: over-provisioned
        # widths are nearly free (clamped index maps elide the DMA of dead
        # tiles), while per-width buckets would multiply the compiled-shape
        # ladder by ~4x on a remote-compile TPU.
        self._paged_width = bucket_for(
            -(-self.max_seq_len // page_size), minimum=2
        )
        return self

    def create_kv_cache(
        self, batch_size: int = 1, max_seq_len: int | None = None
    ) -> KVCache:
        if self.page_pool is not None:
            from ..kv.paged import PagedKVCache

            return PagedKVCache(self.page_pool)
        return DenseKVCache(
            num_layers=self.cfg.num_hidden_layers,
            batch_size=batch_size,
            num_kv_heads=self.cfg.num_key_value_heads,
            max_seq_len=max_seq_len or self.max_seq_len,
            head_dim=self.cfg.head_dim,
            dtype=self.dtype,
        )

    def create_batching_kv_cache(
        self, max_active_requests: int, max_seq_len: int | None = None
    ) -> KVCache:
        if self.page_pool is not None:
            from ..kv.paged import PagedBatchingKVCache

            return PagedBatchingKVCache(self.page_pool, max_active_requests)
        return BatchingKVCache(
            num_layers=self.cfg.num_hidden_layers,
            max_active_requests=max_active_requests,
            num_kv_heads=self.cfg.num_key_value_heads,
            max_seq_len=max_seq_len or self.max_seq_len,
            head_dim=self.cfg.head_dim,
            dtype=self.dtype,
        )

    # -- reference-parity call ----------------------------------------------
    def __call__(
        self,
        inputs: jax.Array,  # [B, L] token ids
        offset: int | list | np.ndarray | None = None,
        cache: KVCache | None = None,
        logits_to_keep: int | None = None,
    ) -> jax.Array:
        inputs = jnp.asarray(inputs, dtype=jnp.int32)
        if inputs.ndim == 1:
            inputs = inputs[None]
        B, L = inputs.shape
        if cache is None:
            logits = self.forward_full(inputs)
            if logits_to_keep is not None:
                logits = logits[:, -logits_to_keep:, :]
            return logits

        from ..kv.paged import PagedBatchingKVCache, PagedKVCache

        if isinstance(cache, (PagedKVCache, PagedBatchingKVCache)):
            return self._call_paged(inputs, offset, cache, logits_to_keep)

        if isinstance(cache, BatchingKVCache):
            offsets_np = np.asarray(cache.offsets, dtype=np.int32)
            if offset is not None:
                given = np.asarray(offset, dtype=np.int32).reshape(-1)
                # Idle slots decode garbage rows; their offsets stay put.
                offsets_np = np.where(cache.active, given, offsets_np)
        else:
            if offset is None:
                offset = cache.offset
            if isinstance(offset, int):
                offsets_np = np.full((B,), offset, dtype=np.int32)
            else:
                offsets_np = np.asarray(offset, dtype=np.int32).reshape(-1)
            assert int(offsets_np.max(initial=0)) == cache.offset, (
                f"offset {offsets_np} disagrees with cache offset {cache.offset}"
            )

        max_len = int(offsets_np.max(initial=0)) + L
        assert max_len <= cache.max_seq_len, (
            f"context {max_len} exceeds cache capacity {cache.max_seq_len}"
        )
        window = bucket_for(max_len, maximum=cache.max_seq_len)
        logits, keys, values = self._step_jit(
            self.params,
            rope_tabs=self._rope_tables,
            tokens=inputs,
            offsets=jnp.asarray(offsets_np),
            keys=cache.keys,
            values=cache.values,
            window=window,
            logits_to_keep=logits_to_keep,
        )
        if isinstance(cache, BatchingKVCache):
            new_offsets = np.where(cache.active, offsets_np + L, cache.offsets)
            cache.update_tensors(keys, values, new_offsets)
        else:
            cache.update_tensors(keys, values, int(offsets_np.max(initial=0)) + L)
        return logits

    def decode_burst_dense(
        self,
        cache: DenseKVCache,
        first_tokens: np.ndarray,  # [B] int32
        steps: int,
        *,
        temp: float = 0.0,
        top_k: int | None = None,
        top_p: float | None = None,
        rng: jax.Array | None = None,
    ) -> np.ndarray:
        """K decode steps over a dense cache in one dispatch; one fetch.
        Greedy by default; temp > 0 samples on-device (pass a PRNG `rng`).
        Returns int32 [steps, B]."""
        offset = cache.offset
        assert offset + steps <= cache.max_seq_len
        assert temp == 0 or rng is not None, "sampled burst needs rng"
        window = bucket_for(offset + steps, maximum=cache.max_seq_len)
        offsets = np.full((cache.batch_size,), offset, np.int32)
        toks, keys, values = self._dense_burst_jit(
            self.params,
            rope_tabs=self._rope_tables,
            tokens0=jnp.asarray(first_tokens, jnp.int32),
            offsets0=jnp.asarray(offsets),
            keys=cache.keys,
            values=cache.values,
            window=window,
            steps=steps,
            temp=temp,
            top_k=top_k,
            top_p=top_p,
            rng0=rng,
        )
        cache.update_tensors(keys, values, offset + steps)
        return np.asarray(jax.device_get(toks), np.int32)

    def decode_burst(
        self,
        cache,  # PagedBatchingKVCache
        first_tokens: np.ndarray,  # [B] int32 — next token per slot
        steps: int,
        *,
        temp: float = 0.0,
        top_k: int | None = None,
        top_p: float | None = None,
        rng: jax.Array | None = None,
    ) -> np.ndarray:
        """Decode `steps` tokens for every active slot in ONE device
        dispatch + ONE host fetch (greedy, or on-device temp/top-k/top-p
        sampling when temp > 0). Returns int32 [steps, B]. Idle slots
        produce garbage. Slots advance by `steps` (the scheduler truncates
        at EOS and rewinds or evicts afterwards)."""
        from ..kv.paged import PagedBatchingKVCache

        assert isinstance(cache, PagedBatchingKVCache)
        assert temp == 0 or rng is not None, "sampled burst needs rng"
        pool = cache.pool
        offsets_np = cache.offsets
        for c in cache.slots:
            if c is not None:
                c.ensure_capacity(c.offset + steps)
        table_np = cache.block_table(self._paged_width)
        toks, kp, vp = self._paged_burst_jit(
            self.params,
            rope_tabs=self._rope_tables,
            tokens0=jnp.asarray(first_tokens, jnp.int32),
            offsets0=jnp.asarray(offsets_np),
            key_pages=pool.key_pages,
            value_pages=pool.value_pages,
            block_table=jnp.asarray(table_np),
            steps=steps,
            temp=temp,
            top_k=top_k,
            top_p=top_p,
            rng0=rng,
        )
        pool.update_tensors(kp, vp)
        out = np.asarray(jax.device_get(toks), np.int32)
        for c in cache.slots:
            if c is not None:
                c.advance(steps)
        return out

    @property
    def supports_mixed(self) -> bool:
        """True when mixed prefill+decode bursts are available: a paged
        pool, a plain (non-strategy) attention impl, and fused qkv
        weights on every layer (the shared projection matmul is the whole
        point of the mixed step)."""
        return (
            self.page_pool is not None
            and isinstance(self.attn_impl, (str, type(None)))
            and all(l.attn.wqkv is not None for l in self.params.layers)
        )

    def mixed_burst(
        self,
        cache,  # PagedBatchingKVCache — the decode slots
        first_tokens: np.ndarray,  # [B] int32 — next token per slot
        steps: int,
        schedule,  # list[MixedStep | None], len == steps
        chunk: int,  # c — prefill tokens per step (must divide page_size)
        *,
        temp: float = 0.0,
        top_k: int | None = None,
        top_p: float | None = None,
        rng: jax.Array | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """`steps` decode tokens for every active slot AND up to
        steps*chunk prefill tokens across the scheduled requests in ONE
        dispatch + ONE fetch (forward_mixed_burst_paged). `schedule[t]`
        names the request sub-chunk step t prefills (None = idle prefill
        row). Returns (decode tokens [steps, B] int32, completion tokens
        [steps] int32 — valid at steps whose sub-chunk ends its prompt).
        Slots advance by `steps`; each scheduled cache advances by its
        real token count."""
        from ..kv.paged import PagedBatchingKVCache

        assert isinstance(cache, PagedBatchingKVCache)
        assert temp == 0 or rng is not None, "sampled burst needs rng"
        assert steps > 0 and len(schedule) == steps
        pool = cache.pool
        ps = pool.page_size
        # Single-page sub-chunk writes (one in-place DUS per layer) need
        # every sub-chunk inside one page: c | page_size and c-aligned
        # offsets. The scheduler maintains the same invariants.
        assert 0 < chunk <= ps and ps % chunk == 0, (chunk, ps)
        for s in cache.slots:
            if s is not None:
                s.ensure_capacity(s.offset + steps)
        width = self._paged_width
        table_np = cache.block_table(width)
        p_chunks = np.zeros((steps, chunk), np.int32)
        p_offsets = np.zeros((steps,), np.int32)
        p_tables = np.full((steps, width), -1, np.int32)
        p_last = np.zeros((steps,), np.int32)
        p_keys = [] if temp > 0 else None
        for t, entry in enumerate(schedule):
            if entry is None:
                if p_keys is not None:
                    p_keys.append(rng)  # unused draw; any key
                continue
            r = len(entry.tokens)
            assert 0 < r <= chunk and entry.offset % chunk == 0, (
                r, chunk, entry.offset,
            )
            assert entry.cache.pool is pool, "schedule must share the pool"
            entry.cache.ensure_capacity(entry.offset + r)
            p_chunks[t, :r] = entry.tokens
            p_offsets[t] = entry.offset
            p_tables[t] = entry.cache.block_table_row(width)
            p_last[t] = r - 1
            if p_keys is not None:
                p_keys.append(
                    entry.sample_key if entry.sample_key is not None else rng
                )
        toks, comp, kp, vp = self._mixed_burst_jit(
            self.params,
            rope_tabs=self._rope_tables,
            tokens0=jnp.asarray(first_tokens, jnp.int32),
            offsets0=jnp.asarray(cache.offsets),
            key_pages=pool.key_pages,
            value_pages=pool.value_pages,
            block_table=jnp.asarray(table_np),
            p_chunks=jnp.asarray(p_chunks),
            p_offsets=jnp.asarray(p_offsets),
            p_tables=jnp.asarray(p_tables),
            p_last=jnp.asarray(p_last),
            p_keys=jnp.stack(p_keys) if p_keys is not None else None,
            steps=steps,
            temp=temp,
            top_k=top_k,
            top_p=top_p,
            rng0=rng,
        )
        pool.update_tensors(kp, vp)
        toks, comp = jax.device_get((toks, comp))
        for s in cache.slots:
            if s is not None:
                s.advance(steps)
        for entry in schedule:
            if entry is not None:
                entry.cache.advance(len(entry.tokens))
        return np.asarray(toks, np.int32), np.asarray(comp, np.int32)

    def _call_paged(self, inputs, offset, cache, logits_to_keep):
        from ..kv.paged import PagedBatchingKVCache, PagedKVCache

        B, L = inputs.shape
        pool = cache.pool
        ps = pool.page_size
        if isinstance(cache, PagedBatchingKVCache):
            offsets_np = cache.offsets
            if offset is not None:
                given = np.asarray(offset, dtype=np.int32).reshape(-1)
                offsets_np = np.where(cache.active, given, offsets_np)
            assert B == cache.max_active_requests
            for c in cache.slots:
                if c is not None:
                    c.ensure_capacity(c.offset + L)
            width = self._paged_width
            table_np = cache.block_table(width)
        else:
            if offset is None:
                offset = cache.offset
            offsets_np = np.full((B,), int(np.max(offset)), dtype=np.int32)
            assert int(offsets_np[0]) == cache.offset, (
                f"offset {offsets_np} disagrees with cache offset {cache.offset}"
            )
            cache.ensure_capacity(cache.offset + L)
            width = self._paged_width
            table_np = np.asarray([cache.block_table_row(width)] * B, np.int32)

        logits, kp, vp = self._paged_step_jit(
            self.params,
            rope_tabs=self._rope_tables,
            tokens=inputs,
            offsets=jnp.asarray(offsets_np),
            key_pages=pool.key_pages,
            value_pages=pool.value_pages,
            block_table=jnp.asarray(table_np),
            logits_to_keep=logits_to_keep,
            # First chunk of a request: the chunk is the whole context, so
            # attention never needs the page walk (L>1 keeps decode steps
            # on the paged kernel even at offset 0). Later chunks split
            # into chunk-local causal + non-causal prefix page stream
            # (exact softmax-state combine); short query blocks stay on
            # the paged decode kernel, which already streams efficiently.
            local_attention=bool(L > 1 and np.all(offsets_np == 0)),
            split_attention=bool(
                self.split_prefill
                and L >= self.split_prefill_min_chunk
                and L > 16
                and np.any(offsets_np > 0)
            ),
        )
        pool.update_tensors(kp, vp)
        if isinstance(cache, PagedBatchingKVCache):
            for c in cache.slots:
                if c is not None:
                    c.advance(L)
        else:
            cache.advance(L)
        return logits
