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
* `DecodePipeline` — decode-time PP: per-stage KV slabs and a fully-
  packed round-robin token schedule. M == S microbatches of requests
  rotate through the stages; at every tick each stage runs one decode
  step of its current microbatch against its own layers' KV, then the
  residual stream ppermutes forward and the last stage's sampled token
  rides the ring wrap back to stage 0 to start that microbatch's next
  step. Steady state keeps all S stages busy every tick — the decode
  analog of GPipe, with the KV cache partitioned by (stage, microbatch)
  so no KV bytes ever cross ICI.
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


class DecodePipeline:
    """Decode-time pipeline parallelism (the optional 30B-class scale-out
    axis, SURVEY.md §2.8): stages own contiguous layer ranges AND the KV
    for those layers; decode tokens round-robin through the stages.

    Schedule (M == S, fully packed): microbatch m enters stage 0 at tick
    m; its step-k token finishes on stage S-1 at tick m + kM + S - 1 and
    the argmax result ppermutes across the ring wrap to stage 0, arriving
    exactly when that microbatch's next step is due. Per tick every stage
    executes Lper layers on one microbatch — S× the per-device decode
    throughput of sequential layer-stage PP, at 1/S of the weight and KV
    memory per device.

    KV layout: keys/values [S, Lper, M+1, Bm, Hkv, W, D], stage axis
    sharded over 'pp'; microbatch slot M is a trash row absorbing
    ramp-up/drain ticks so live KV is never clobbered. Inter-stage
    traffic per tick: one [Bm, 1, D] residual + one [Bm] token — KV never
    moves.

    Correctness contract: token-for-token equal to the single-device
    dense-cache decode (tests/test_pipeline_decode.py). Uniform prompt
    length per prefill call (the serving scheduler's bucketed chunks
    already provide that).
    """

    def __init__(
        self,
        params: Qwen3Params,
        cfg: Qwen3Config,
        num_stages: int,
        max_seq_len: int = 256,
        devices: list | None = None,
    ):
        from ..models.qwen3 import MoEParams

        assert cfg.num_hidden_layers % num_stages == 0, (
            "num_stages must divide num_hidden_layers"
        )
        assert not any(
            isinstance(b.mlp, MoEParams) for b in params.layers
        ), "decode PP currently supports dense-MLP models"
        self.cfg = cfg
        self.S = num_stages
        self.M = num_stages  # fully-packed schedule
        self.Lper = cfg.num_hidden_layers // num_stages
        self.W = max_seq_len
        devices = devices if devices is not None else jax.devices()
        assert len(devices) >= num_stages
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        self.mesh = Mesh(np.asarray(devices[: self.S]), ("pp",))
        self._pp = NamedSharding(self.mesh, P("pp"))
        stacked = _stack_stage_layers(split_stages(params, num_stages))
        self._layers = jax.device_put(
            stacked, jax.tree.map(lambda x: self._pp, stacked)
        )
        self._head_tail = Qwen3Params(
            params.embedding, (), params.final_norm, params.lm_head
        )
        self._tabs = rope_tables(cfg.head_dim, max_seq_len, cfg.rope_theta)
        self.keys = None
        self.values = None
        self.offsets = None  # np [M, Bm]
        self._decode_jit = jax.jit(
            self._decode_fn,
            static_argnames=("steps", "Bm"),
            donate_argnames=("keys", "values"),
        )
        self._prefill_jit = jax.jit(
            self._prefill_fn, static_argnames=("Bm",),
            donate_argnames=("keys", "values"),
        )

    # -- shared per-stage decode-step body ------------------------------------
    def _stage_step(self, layers, keys_m, values_m, h, off):
        """Run this stage's layers for ONE token per row.

        layers: pytree stacked [Lper]; keys_m/values_m [Lper, Bm, Hkv, W, D];
        h [Bm, 1, D]; off [Bm] — tokens already cached per row. Returns
        (h, keys_m, values_m)."""
        cfg = self.cfg
        scale = cfg.head_dim**-0.5
        Bm = h.shape[0]
        positions = off[:, None]
        lens = off + 1
        bidx = jnp.arange(Bm, dtype=jnp.int32)

        def body(hh, xs):
            layer, k_slab, v_slab = xs
            q, k, v = _qkv(
                cfg, layer.attn, hh, positions, self._tabs,
                norm_w=layer.input_layernorm,
            )
            # Per-row append at off[b] (in-place DUS per row, cf.
            # models/qwen3.py _scatter_rows).
            for b in range(Bm):
                k_slab = jax.lax.dynamic_update_slice(
                    k_slab, k[b][None], (jnp.int32(b), jnp.int32(0), off[b], jnp.int32(0))
                )
                v_slab = jax.lax.dynamic_update_slice(
                    v_slab, v[b][None], (jnp.int32(b), jnp.int32(0), off[b], jnp.int32(0))
                )
            attn = flash_attention(
                q, k_slab, v_slab, scale=scale, mask="causal", lens=lens,
                impl="xla",
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(Bm, 1, -1)
            hh = hh + _linear(attn, layer.attn.wo)
            hh = hh + _mlp(cfg, layer.mlp, hh,
                           norm_w=layer.post_attention_layernorm)
            return hh, (k_slab, v_slab)

        h, (keys_m, values_m) = jax.lax.scan(
            body, h, (layers, keys_m, values_m)
        )
        return h, keys_m, values_m

    def _stage_prefill(self, layers, h, positions):
        """Full-chunk forward of this stage's layers, returning per-layer
        K/V for the chunk: h [Bm, L, D] -> (h, k/v [Lper, Bm, Hkv, L, D])."""
        cfg = self.cfg
        scale = cfg.head_dim**-0.5
        Bm, L, _ = h.shape

        def body(hh, layer):
            q, k, v = _qkv(
                cfg, layer.attn, hh, positions, self._tabs,
                norm_w=layer.input_layernorm,
            )
            attn = flash_attention(q, k, v, scale=scale, mask="causal",
                                   impl="xla")
            attn = attn.transpose(0, 2, 1, 3).reshape(Bm, L, -1)
            hh = hh + _linear(attn, layer.attn.wo)
            hh = hh + _mlp(cfg, layer.mlp, hh,
                           norm_w=layer.post_attention_layernorm)
            return hh, (k, v)

        h, (ks, vs) = jax.lax.scan(body, h, layers)
        return h, ks, vs

    # -- prefill ---------------------------------------------------------------
    def _prefill_fn(self, layers, head_tail, tokens, keys, values, *, Bm):
        from jax.sharding import PartitionSpec as P

        cfg = self.cfg
        M, S, Lper, W = self.M, self.S, self.Lper, self.W
        B, L = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None],
                                     (Bm, L))
        h_mb = _embed(head_tail, tokens).reshape(M, Bm, L, -1)

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("pp"), P(), P("pp"), P("pp")),
            out_specs=(P(), P("pp"), P("pp")),
            check_vma=False,
        )
        def pipeline(stage_stack, h_mb, keys, values):
            stage = jax.lax.axis_index("pp")
            my_layers = jax.tree.map(lambda x: x[0], stage_stack)
            keys = keys[0]      # [Lper, M+1, Bm, Hkv, W, D]
            values = values[0]
            received = jnp.zeros_like(h_mb[0])
            h_last = jnp.zeros((M, Bm, h_mb.shape[-1]), h_mb.dtype)
            for t in range(M + S - 1):
                # Drain ticks replay microbatch M-1 deterministically, so
                # their KV writes are idempotent; ramp-up garbage at m=0
                # is overwritten by the valid tick t == stage.
                inp = jnp.where(stage == 0, h_mb[min(t, M - 1)], received)
                out, ks, vs = self._stage_prefill(my_layers, inp, positions)
                m_idx = jnp.clip(t - stage, 0, M - 1)
                keys = jax.lax.dynamic_update_slice(
                    keys, ks[:, None], (0, m_idx, 0, 0, 0, 0)
                )
                values = jax.lax.dynamic_update_slice(
                    values, vs[:, None], (0, m_idx, 0, 0, 0, 0)
                )
                received = jax.lax.ppermute(
                    out, "pp", [(i, i + 1) for i in range(S - 1)]
                )
                if t >= S - 1:
                    h_last = jax.lax.dynamic_update_slice(
                        h_last, out[None, :, -1, :], (t - (S - 1), 0, 0)
                    )
            is_last = (stage == S - 1).astype(h_last.dtype)
            return (
                jax.lax.psum(h_last * is_last, "pp"),
                keys[None],
                values[None],
            )

        h_last, keys, values = pipeline(layers, h_mb, keys, values)
        h_last = rms_norm(h_last.reshape(B, -1), head_tail.final_norm,
                          cfg.rms_norm_eps)
        logits = _lm_head(head_tail, h_last[:, None, :])[:, 0]
        tok0 = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        return tok0, keys, values

    def prefill(self, tokens) -> "jax.Array":
        """Uniform-length prompt prefill for all M*Bm requests; initializes
        the per-stage KV and returns the first sampled token per row [B]."""
        import numpy as np

        tokens = jnp.asarray(tokens, jnp.int32)
        B, L = tokens.shape
        assert B % self.M == 0, "batch must divide into M microbatches"
        assert L <= self.W
        Bm = B // self.M
        shape = (self.S, self.Lper, self.M + 1, Bm,
                 self.cfg.num_key_value_heads, self.W, self.cfg.head_dim)
        self.keys = jax.device_put(jnp.zeros(shape, jnp.bfloat16), self._pp)
        self.values = jax.device_put(jnp.zeros(shape, jnp.bfloat16), self._pp)
        tok0, self.keys, self.values = self._prefill_jit(
            self._layers, self._head_tail, tokens, self.keys, self.values,
            Bm=Bm,
        )
        self.offsets = np.full((self.M, Bm), L, np.int32)
        return tok0

    # -- decode ----------------------------------------------------------------
    def _decode_fn(self, layers, head_tail, tokens0, off0, keys, values,
                   *, steps, Bm):
        from jax.sharding import PartitionSpec as P

        cfg = self.cfg
        M, S, W = self.M, self.S, self.W
        tokens0 = tokens0.reshape(M, Bm)

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("pp"), P(), P(), P("pp"), P("pp")),
            out_specs=(P(), P("pp"), P("pp")),
            check_vma=False,
        )
        def pipeline(stage_stack, off0, tokens0, keys, values):
            stage = jax.lax.axis_index("pp")
            my_layers = jax.tree.map(lambda x: x[0], stage_stack)
            keys = keys[0]
            values = values[0]
            D = cfg.hidden_size

            def tick(carry, t):
                h_recv, tok_recv, keys, values, outputs = carry
                rel = t - stage
                m = jnp.where(rel >= 0, rel % M, 0)
                k_step = jnp.where(rel >= 0, rel // M, 0)
                active = (rel >= 0) & (rel < M * steps)

                # Stage-0 input: the microbatch's next token — initial at
                # step 0, else the ring-wrapped argmax from the last stage.
                tok_m = jnp.where(
                    k_step == 0,
                    jax.lax.dynamic_index_in_dim(tokens0, m, 0, False),
                    tok_recv,
                )
                h0 = _embed(self._head_tail, tok_m[:, None])
                h_in = jnp.where(stage == 0, h0, h_recv)
                off_m = jax.lax.dynamic_index_in_dim(off0, m, 0, False) + k_step

                # Inactive ticks write to the trash microbatch slot M.
                m_write = jnp.where(active, m, M)
                off_w = jnp.clip(off_m, 0, W - 1)
                keys_m = jax.lax.dynamic_index_in_dim(keys, m_write, 1, False)
                values_m = jax.lax.dynamic_index_in_dim(values, m_write, 1, False)
                h_out, keys_m, values_m = self._stage_step(
                    my_layers, keys_m, values_m, h_in, off_w
                )
                keys = jax.lax.dynamic_update_slice(
                    keys, keys_m[:, None], (0, m_write, 0, 0, 0, 0)
                )
                values = jax.lax.dynamic_update_slice(
                    values, values_m[:, None], (0, m_write, 0, 0, 0, 0)
                )

                # Last stage: sample, record, send the token around the
                # ring wrap; other stages forward the residual stream.
                is_last = stage == S - 1

                def sample(hh):
                    r = rms_norm(hh, self._head_tail.final_norm,
                                 cfg.rms_norm_eps)
                    logits = _lm_head(self._head_tail, r)[:, 0]
                    return jnp.argmax(
                        logits.astype(jnp.float32), axis=-1
                    ).astype(jnp.int32)

                tok_out = jax.lax.cond(
                    is_last, sample, lambda hh: jnp.zeros((Bm,), jnp.int32),
                    h_out,
                )
                write = (active & is_last).astype(jnp.int32)
                prev = jax.lax.dynamic_slice(
                    outputs, (jnp.clip(k_step, 0, steps - 1), m, 0),
                    (1, 1, Bm),
                )
                outputs = jax.lax.dynamic_update_slice(
                    outputs,
                    (write * tok_out + (1 - write) * prev[0, 0])[None, None],
                    (jnp.clip(k_step, 0, steps - 1), m, 0),
                )
                ring = [(i, (i + 1) % S) for i in range(S)]
                h_next = jax.lax.ppermute(h_out, "pp", ring)
                tok_next = jax.lax.ppermute(tok_out, "pp", ring)
                return (h_next, tok_next, keys, values, outputs), None

            carry = (
                jnp.zeros((Bm, 1, D), jnp.bfloat16),
                jnp.zeros((Bm,), jnp.int32),
                keys,
                values,
                jnp.zeros((steps, M, Bm), jnp.int32),
            )
            (h_recv, tok_recv, keys, values, outputs), _ = jax.lax.scan(
                tick, carry, jnp.arange(M * steps + S - 1, dtype=jnp.int32)
            )
            is_last = (stage == S - 1).astype(jnp.int32)
            return jax.lax.psum(outputs * is_last, "pp"), keys[None], values[None]

        toks, keys, values = pipeline(layers, off0, tokens0, keys, values)
        return toks, keys, values

    def decode(self, first_tokens, steps: int):
        """`steps` greedy tokens for every row in ONE dispatch. Returns
        int32 [steps, B]."""
        import numpy as np

        assert self.keys is not None, "prefill first"
        M, Bm = self.offsets.shape
        assert int(self.offsets.max()) + steps <= self.W
        toks, self.keys, self.values = self._decode_jit(
            self._layers, self._head_tail,
            jnp.asarray(first_tokens, jnp.int32),
            jnp.asarray(self.offsets),
            self.keys, self.values,
            steps=steps, Bm=Bm,
        )
        self.offsets = self.offsets + steps
        return np.asarray(jax.device_get(toks), np.int32).reshape(steps, M * Bm)
