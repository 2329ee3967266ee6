"""Pipeline parallelism: layer-stage sharding for inference.

SURVEY.md §2.8 lists PP as the optional scale-out axis for the 30B
config. Two forms live here:

* `PipelinedQwen3` — single-controller layer-stage PP: each stage's
  params live on their own device, the residual stream flows stage to
  stage (preserving the residual-stream contract, qwen3_week3.py:196-207).
  Sequential by nature; pins down the correctness boundary (hidden states
  + positions are the only inter-stage traffic).
* `MicrobatchedPipeline` — the throughput form: a GPipe schedule inside
  ONE jitted `shard_map` over a 'pp' mesh axis. Stage params are stacked
  on a leading stage axis sharded over 'pp'; each of the M + S - 1 steps
  runs every stage on its in-flight microbatch, then `jax.lax.ppermute`
  rotates the residual stream one stage to the right over ICI. In steady
  state all S devices compute concurrently (bubble = (S-1)/(M+S-1)).
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


def _stack_stage_layers(stage_layers: list[tuple]):
    """[S stages] x [Lper layers] of BlockParams -> one BlockParams pytree
    with leaves stacked to [S, Lper, ...]. Requires homogeneous stages
    (equal layer counts and shapes — dense MLP; MoE layers would need
    per-stage structure)."""
    per = len(stage_layers[0])
    assert all(len(s) == per for s in stage_layers), (
        "microbatched PP needs equal-size stages; pad num_layers or pick "
        "num_stages dividing it"
    )
    stacked_per_stage = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *s) for s in stage_layers
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stacked_per_stage)


class MicrobatchedPipeline:
    """GPipe-scheduled prefill over a 'pp' mesh axis.

    forward(tokens [B, L]) -> logits [B, L, V]; B must be divisible by
    `num_microbatches`. Embedding and LM head run replicated outside the
    shard_map (they are small next to the layer stack); the layer stack
    runs stage-parallel with `ppermute` hops.
    """

    def __init__(
        self,
        params: Qwen3Params,
        cfg: Qwen3Config,
        num_stages: int,
        num_microbatches: int,
        devices: list | None = None,
    ):
        from ..models.qwen3 import MoEParams

        assert cfg.num_hidden_layers % num_stages == 0, (
            "num_stages must divide num_hidden_layers"
        )
        assert not any(
            isinstance(b.mlp, MoEParams) for b in params.layers
        ), "microbatched PP currently supports dense-MLP models"
        self.cfg = cfg
        self.num_stages = num_stages
        self.num_microbatches = num_microbatches
        devices = devices if devices is not None else jax.devices()
        assert len(devices) >= num_stages
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        self.mesh = Mesh(np.asarray(devices[:num_stages]), ("pp",))
        stage_layers = split_stages(params, num_stages)
        stacked = _stack_stage_layers(stage_layers)
        # Stage axis sharded over pp; everything else follows.
        self._layers = jax.device_put(
            stacked,
            jax.tree.map(
                lambda x: NamedSharding(self.mesh, P("pp")), stacked
            ),
        )
        self._head_tail = Qwen3Params(
            params.embedding, (), params.final_norm, params.lm_head
        )
        self._tabs = rope_tables(
            cfg.head_dim, cfg.max_position_embeddings, cfg.rope_theta
        )
        self._fwd = jax.jit(functools.partial(self._forward))

    def _forward(self, layers, head_tail, tabs, tokens):
        from jax.sharding import PartitionSpec as P

        cfg = self.cfg
        M, S = self.num_microbatches, self.num_stages
        B, L = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        h = _embed(head_tail, tokens)  # [B, L, D]
        h_mb = h.reshape(M, B // M, L, *h.shape[2:])
        pos_mb = positions.reshape(M, B // M, L)

        def stage_scan(stage_layers, h, positions):
            scale = cfg.head_dim**-0.5
            Bm, Lm, _ = h.shape

            def body(carry, layer):
                hh = carry
                r = rms_norm(hh, layer.input_layernorm, cfg.rms_norm_eps)
                q, k, v = _qkv(cfg, layer.attn, r, positions, tabs)
                attn = flash_attention(q, k, v, scale=scale, mask="causal",
                                       impl="xla")
                attn = attn.transpose(0, 2, 1, 3).reshape(Bm, Lm, -1)
                hh = hh + _linear(attn, layer.attn.wo)
                r = rms_norm(hh, layer.post_attention_layernorm,
                             cfg.rms_norm_eps)
                hh = hh + _mlp(cfg, layer.mlp, r)
                return hh, None

            out, _ = jax.lax.scan(body, h, stage_layers)
            return out

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P("pp"), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        def pipeline(stage_stack, h_mb, pos_mb):
            # stage_stack: [1, Lper, ...] — this device's stage.
            stage = jax.lax.axis_index("pp")
            my_layers = jax.tree.map(lambda x: x[0], stage_stack)
            received = jnp.zeros_like(h_mb[0])
            outputs = jnp.zeros_like(h_mb)
            for t in range(M + S - 1):
                # Stage s works on microbatch t - s this step; stage 0
                # feeds from the (replicated) embedded microbatches. Every
                # microbatch shares the same positions row (full-prefix
                # prefill), so pos_mb[0] serves all of them.
                inp = jnp.where(stage == 0, h_mb[min(t, M - 1)], received)
                out = stage_scan(my_layers, inp, pos_mb[0])
                received = jax.lax.ppermute(
                    out, "pp", [(i, i + 1) for i in range(S - 1)]
                )
                if t >= S - 1:
                    outputs = outputs.at[t - (S - 1)].set(out)
            # Only the last stage's writes are the real model output.
            is_last = (stage == S - 1).astype(outputs.dtype)
            return jax.lax.psum(outputs * is_last, "pp")

        h_out = pipeline(self._layers, h_mb, pos_mb)  # [M, B/M, L, D]
        h_full = h_out.reshape(B, L, -1)
        h_full = rms_norm(h_full, head_tail.final_norm, cfg.rms_norm_eps)
        return _lm_head(head_tail, h_full)

    def __call__(self, tokens: jax.Array) -> jax.Array:
        tokens = jnp.asarray(tokens, jnp.int32)
        assert tokens.shape[0] % self.num_microbatches == 0, (
            "batch must divide into microbatches"
        )
        return self._fwd(self._layers, self._head_tail, self._tabs, tokens)
