"""Pipeline parallelism: layer-stage sharding for inference.

SURVEY.md §2.8 lists PP as the optional scale-out axis for the 30B
config. This implements single-controller layer-stage PP: the layer stack
is split into contiguous stages, each stage's params live on their own
device (or submesh), and the residual stream flows stage to stage
(preserving the residual-stream contract, qwen3_week3.py:196-207). For
single-request decode this is sequential by nature; microbatched stage
overlap (the throughput form of PP) composes with the continuous-batching
scheduler and is tracked as future scaling work — the correctness
boundary (what crosses stages: hidden states + positions only) is what
this module pins down.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.qwen3 import (
    Qwen3Config,
    Qwen3Params,
    _embed,
    _lm_head,
    _linear,
    _mlp,
    _qkv,
    rope_tables,
)
from ..kernels import flash_attention
from ..ops.norm import rms_norm


def split_stages(params: Qwen3Params, num_stages: int) -> list[tuple]:
    """Contiguous layer ranges per stage (embedding with stage 0, final
    norm + lm head with the last stage)."""
    n = len(params.layers)
    assert num_stages >= 1 and num_stages <= n
    per = -(-n // num_stages)
    return [tuple(params.layers[i : i + per]) for i in range(0, n, per)]


def _stage_forward(
    layers: tuple,
    cfg: Qwen3Config,
    rope_tabs,
    h: jax.Array,  # [B, L, D] residual stream entering the stage
    positions: jax.Array,
) -> jax.Array:
    scale = cfg.head_dim**-0.5
    B, L, _ = h.shape
    for layer in layers:
        r = rms_norm(h, layer.input_layernorm, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, layer.attn, r, positions, rope_tabs)
        attn = flash_attention(q, k, v, scale=scale, mask="causal", impl="xla")
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, -1)
        h = h + _linear(attn, layer.attn.wo)
        r = rms_norm(h, layer.post_attention_layernorm, cfg.rms_norm_eps)
        h = h + _mlp(cfg, layer.mlp, r)
    return h


class PipelinedQwen3:
    """Full-prefix forward over layer stages placed on distinct devices.

    The residual stream is the ONLY inter-stage traffic ([B, L, D] per
    hop) — on hardware this rides ICI via the implicit device-to-device
    transfer jax performs when a stage's jitted function receives the
    previous stage's output.
    """

    def __init__(
        self,
        params: Qwen3Params,
        cfg: Qwen3Config,
        devices: list | None = None,
        num_stages: int | None = None,
    ):
        devices = devices if devices is not None else jax.devices()
        num_stages = num_stages or len(devices)
        assert num_stages <= len(devices)
        self.cfg = cfg
        self.devices = devices[:num_stages]
        stage_layers = split_stages(params, num_stages)
        tabs = rope_tables(cfg.head_dim, cfg.max_position_embeddings,
                           cfg.rope_theta)

        self._head_params = jax.device_put(
            {"embedding": params.embedding, "tabs": tabs}, self.devices[0]
        )
        self._tail_params = jax.device_put(
            {"final_norm": params.final_norm, "lm_head": params.lm_head,
             "embedding": params.embedding},
            self.devices[-1],
        )
        self._stages = []
        for dev, layers in zip(self.devices, stage_layers):
            placed = jax.device_put(layers, dev)
            fn = jax.jit(
                functools.partial(_stage_forward, cfg=cfg),
                static_argnames=(),
            )
            self._stages.append((fn, placed, jax.device_put(tabs, dev)))

    def __call__(self, tokens: jax.Array) -> jax.Array:
        tokens = jnp.asarray(tokens, jnp.int32)
        B, L = tokens.shape
        positions = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None], (B, L)
        )
        embed = jax.jit(
            lambda p, t: _embed(
                Qwen3Params(p["embedding"], (), None, None), t
            )
        )
        h = embed(self._head_params, jax.device_put(tokens, self.devices[0]))
        for dev, (fn, layers, tabs) in zip(self.devices, self._stages):
            # The inter-stage hop: the residual stream moves to the next
            # stage's device (ICI transfer on hardware).
            h = fn(
                layers,
                rope_tabs=tabs,
                h=jax.device_put(h, dev),
                positions=jax.device_put(positions, dev),
            )
        tail = jax.jit(
            lambda p, hh: _lm_head(
                Qwen3Params(p["embedding"], (), p["final_norm"], p["lm_head"]),
                rms_norm(hh, p["final_norm"], self.cfg.rms_norm_eps),
            )
        )
        return tail(self._tail_params, h)
