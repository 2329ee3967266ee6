"""Tensor-parallel sharding rules for Qwen3 params and KV caches.

Megatron-style TP expressed as GSPMD NamedShardings (the scaling-book
recipe: annotate placements, let XLA insert the collectives):

  * q/k/v projections and MLP gate/up: ROW-parallel — out_features sharded
    on `tp` (whole attention heads per shard; H_q and H_kv are multiples of
    tp, so QK-norm/RoPE/attention stay shard-local).
  * o_proj and MLP down: COLUMN-parallel — in_features sharded on `tp`;
    XLA inserts the all-reduce after the matmul (the psum the reference's
    single-device design never needed).
  * MoE expert stacks: experts sharded over `tp` (expert parallelism).
  * Embedding / LM head / norms: replicated (vocab sharding is a later
    memory optimization).
  * KV caches: batch on `dp`, KV heads on `tp` — decode attention is fully
    shard-local; pages never cross shards.

QuantizedTensor shards by its packed/scales/biases leaves: all three share
the [N, K/g] row structure, so one PartitionSpec per logical axis applies
to each leaf (K-axis sharding divides both the packed words and the
scale groups because supergroups are 1024-value aligned).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen3 import Qwen3Params
from ..ops.quantize import QuantizedTensor


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    mesh: Mesh
    tp_axis: str = "tp"
    dp_axis: str = "dp"
    # Composed EP x TP (round-5): when set (e.g. "ep" on a (dp, ep, tp)
    # mesh), MoE expert stacks shard their EXPERT axis here while each
    # expert's out/in features shard over tp_axis — the north-star
    # 30B-A3B pairing. When None, experts shard over tp_axis alone
    # (round-1 behavior, EP and TP mutually exclusive per layer).
    ep_axis: str | None = None


def _qt_spec(row: Any, col: Any, layout: str = "sg") -> dict[str, P]:
    """PartitionSpecs for QuantizedTensor leaves given (row=N, col=K) axes.

    The magic_t layout stores everything transposed ([K*, N]), so the axes
    swap relative to the logical (N, K) orientation. Scale/bias rows (the
    quant-group axis G = K/128) are REPLICATED rather than K-sharded:
    they are ~1.5% of the weight bytes, and G is often not divisible by
    the mesh axis (e.g. Qwen3-4B down_proj G=76 with tp=8). pair_t
    shares magic_t's transposed shapes exactly (round-5 W4A8 tier), so
    its specs are identical — N-sharding never crosses a packed word."""
    if layout in ("magic_t", "pair_t"):
        return {
            "packed": P(col, row),
            "scales": P(None, row),
            "biases": P(None, row),
        }
    return {
        "packed": P(row, col),
        "scales": P(row, col),
        "biases": P(row, col),
    }


def _spec_for_linear(leaf_name: str, w, row: Any, col: Any, expert: Any = None):
    """Build the spec for one linear weight (dense array or QuantizedTensor)."""
    if isinstance(w, QuantizedTensor):
        specs = _qt_spec(row, col, layout=w.layout)
        if w.packed.ndim == 3:  # stacked experts [E, N, K*]
            specs = {k: P(expert, *v) for k, v in specs.items()}
        return QuantizedTensor(
            packed=specs["packed"],
            scales=specs["scales"],
            biases=specs["biases"],
            group_size=w.group_size,
            bits=w.bits,
            out_features=w.out_features,
            in_features=w.in_features,
            k_padded=w.k_padded,
            layout=w.layout,
        )
    if w.ndim == 3:
        return P(expert, row, col)
    return P(row, col)


def param_shardings(params: Qwen3Params, cfg: ShardingConfig):
    """Pytree of PartitionSpecs matching `params`' structure."""
    tp = cfg.tp_axis

    def attn_spec(attn):
        if getattr(attn, "wqkv", None) is not None:
            raise ValueError(
                "cannot TP-shard fused QKV params: the concatenated "
                "out_features axis crosses q/k/v boundaries. Shard the "
                "unfused params (Qwen3Model(..., fuse=False) or the raw "
                "loader output)."
            )
        return dataclasses.replace(
            attn,
            wq=_spec_for_linear("wq", attn.wq, tp, None),
            wk=_spec_for_linear("wk", attn.wk, tp, None),
            wv=_spec_for_linear("wv", attn.wv, tp, None),
            wo=_spec_for_linear("wo", attn.wo, None, tp),
            q_norm=P(None),
            k_norm=P(None),
        )

    def mlp_spec(mlp):
        from ..models.qwen3 import MLPParams, MoEParams

        if getattr(mlp, "w_gate_up", None) is not None:
            raise ValueError(
                "cannot TP-shard fused gate/up params: shard unfused params."
            )
        if isinstance(mlp, MoEParams):
            if cfg.ep_axis is not None:
                # Composed EP x TP: experts over ep, and WITHIN each
                # expert Megatron-style TP — gate/up row-parallel
                # (moe_intermediate over tp), down column-parallel
                # (in_features over tp; GSPMD inserts the psum).
                return dataclasses.replace(
                    mlp,
                    w_router=_spec_for_linear("w_router", mlp.w_router, None, None),
                    w_gate=_spec_for_linear(
                        "w_gate", mlp.w_gate, tp, None, expert=cfg.ep_axis
                    ),
                    w_up=_spec_for_linear(
                        "w_up", mlp.w_up, tp, None, expert=cfg.ep_axis
                    ),
                    w_down=_spec_for_linear(
                        "w_down", mlp.w_down, None, tp, expert=cfg.ep_axis
                    ),
                )
            return dataclasses.replace(
                mlp,
                w_router=_spec_for_linear("w_router", mlp.w_router, None, None),
                w_gate=_spec_for_linear("w_gate", mlp.w_gate, None, None, expert=tp),
                w_up=_spec_for_linear("w_up", mlp.w_up, None, None, expert=tp),
                w_down=_spec_for_linear("w_down", mlp.w_down, None, None, expert=tp),
            )
        return dataclasses.replace(
            mlp,
            w_gate=_spec_for_linear("w_gate", mlp.w_gate, tp, None),
            w_up=_spec_for_linear("w_up", mlp.w_up, tp, None),
            w_down=_spec_for_linear("w_down", mlp.w_down, None, tp),
        )

    def block_spec(block):
        return dataclasses.replace(
            block,
            input_layernorm=P(None),
            post_attention_layernorm=P(None),
            attn=attn_spec(block.attn),
            mlp=mlp_spec(block.mlp),
        )

    emb = _spec_for_linear("embedding", params.embedding, None, None)
    head = (
        None
        if params.lm_head is None
        else _spec_for_linear("lm_head", params.lm_head, None, None)
    )
    return Qwen3Params(
        embedding=emb,
        layers=tuple(block_spec(b) for b in params.layers),
        final_norm=P(None),
        lm_head=head,
    )


def _to_sharding_tree(spec_tree, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s,
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Qwen3Params, cfg: ShardingConfig) -> Qwen3Params:
    """Place params on the mesh per the TP rules (device_put with
    NamedSharding — GSPMD handles everything downstream)."""
    specs = param_shardings(params, cfg)
    shardings = _to_sharding_tree(specs, cfg.mesh)
    return jax.device_put(params, shardings)


def kv_cache_spec(cfg: ShardingConfig) -> P:
    """[num_layers, B, H_kv, S, D] slab: batch on dp, KV heads on tp."""
    return P(None, cfg.dp_axis, cfg.tp_axis, None, None)


def shard_kv_cache(cache, cfg: ShardingConfig):
    """Place a DenseKVCache's slabs onto the mesh."""
    sharding = NamedSharding(cfg.mesh, kv_cache_spec(cfg))
    cache.keys = jax.device_put(cache.keys, sharding)
    cache.values = jax.device_put(cache.values, sharding)
    return cache
