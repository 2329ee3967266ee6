"""Sequence-parallel (sharded-KV) decode attention with explicit
cross-shard softmax-state combine.

SURVEY.md §2.8 / hard-part 4: for contexts sharded along the sequence
axis (KV split across chips/hosts), decode attention runs the flash
kernel on each shard's LOCAL KV slice and merges the per-shard online-
softmax states with two collectives — the cross-simdgroup epilogue of
the reference's Metal decode kernels (week2_kernels.metal:206-234,
paged_attention.metal:206-243) lifted to the mesh level:

    m   = pmax(m_i)
    w_i = l_i * exp(m_i - m)
    out = psum(w_i * o_i) / psum(w_i)

Compared to the GSPMD default (which all-gathers the KV shard or the
attention scores), this moves only [B, Hq, L, D] partial outputs and two
[B, Hq, L] state tensors over ICI — independent of context length.

`SPAttention` is an attention-strategy object (duck-typed like
tp_kernels.TPAttention): pass it as `attn_impl` to the model/kernels.
Decode steps (L == 1) and prefill chunks (L > 1) both use the sharded
state combine — prefill causality decomposes per KV shard by giving each
shard a VIRTUAL context length (global length minus the shard's start
offset, unclipped): shards wholly before the chunk's queries run
non-causally, the overlapping shard runs causally, later shards emit the
identity state. inner="gather" keeps the old all-gather prefill for A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .sharding import ShardingConfig

shard_map = jax.shard_map


def decode_state_xla(q, k, v, lens, scale):
    """Oracle/portable (o, m, l) for one KV shard: o normalized locally,
    m = rowwise max of masked scaled scores, l = sum exp(s - m).
    Zero-length shards emit the combine identity (0, -inf, 0)."""
    B, Hq, L, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qg = qf.reshape(B, Hkv, n_rep * L, D)
    s = jnp.einsum("bhrd,bhsd->bhrs", qg, kf)
    k_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    l_idx = jnp.arange(n_rep * L, dtype=jnp.int32)[None, None, :, None] % L
    q_pos = lens[:, None, None, None] - L + l_idx
    s = jnp.where(k_pos <= q_pos, s, -jnp.inf)
    m = jnp.max(s, axis=-1)  # -inf where no visible key
    p = jnp.exp(s - m[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhrs,bhsd->bhrd", p, vf) / jnp.maximum(l, 1e-30)[..., None]
    shape3 = (B, Hq, L)
    return (
        o.reshape(B, Hq, L, D).astype(q.dtype),
        m.reshape(shape3),
        l.reshape(shape3),
    )


def combine_softmax_states(o, m, l, axis_name: str):
    """Merge per-shard (o, m, l) across `axis_name` into final attention."""
    m_glob = jax.lax.pmax(m, axis_name)  # [B, Hq, L]
    w = l * jnp.exp(m - m_glob)  # -inf shards -> w = 0
    num = jax.lax.psum(w[..., None] * o.astype(jnp.float32), axis_name)
    den = jax.lax.psum(w, axis_name)
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(o.dtype)


class SPAttention:
    """Attention strategy: KV sharded on the sequence axis of `axis`
    (default the mesh's tp axis), decode combined with softmax states."""

    def __init__(
        self,
        scfg: ShardingConfig,
        axis: str | None = None,
        inner: str = "xla",
        interpret: bool = False,
    ):
        self.scfg = scfg
        self.axis = axis or scfg.tp_axis
        self.inner = inner
        self.interpret = interpret

    def flash(self, q, k, v, scale=None, mask=None, lens=None):
        B, Hq, L, D = q.shape
        S = k.shape[2]
        scale = (D**-0.5) if scale is None else float(scale)
        mesh = self.scfg.mesh
        n_shards = mesh.shape[self.axis]
        if lens is None:
            lens = jnp.full((B,), S, jnp.int32)
        kv_spec = P(None, None, self.axis, None)

        if L > 1 and self.inner == "gather":
            # Legacy prefill path: all-gather the KV shard and run the
            # local kernel. Moves the whole sharded context over ICI;
            # kept for A/B comparison against the state combine below.
            from ..kernels.flash_attention import flash_attention

            def gathered(q, k, v, lens):
                k_full = jax.lax.all_gather(k, self.axis, axis=2, tiled=True)
                v_full = jax.lax.all_gather(v, self.axis, axis=2, tiled=True)
                return flash_attention(
                    q, k_full, v_full, scale=scale, mask="causal", lens=lens,
                    impl="xla",
                )

            return shard_map(
                gathered, mesh=mesh,
                in_specs=(P(), kv_spec, kv_spec, P()),
                out_specs=P(), check_vma=False,
            )(q, k, v, lens)

        if L > 1:
            # Sharded prefill: causality DOES decompose per KV shard once
            # the kernel takes a per-shard VIRTUAL length (lens - shard
            # start, unclipped). A query row at global position p sees the
            # shard's key k_local iff k_local <= p - start; shards wholly
            # before the queries run non-causally, shards wholly after
            # emit the identity state. Moves [B,Hq,L,D] partials + two
            # [B,Hq,L] states over ICI — independent of context length
            # (the all-gather path moves the full sharded KV).
            S_loc = S // n_shards
            inner = self.inner
            interpret = self.interpret

            def local_prefill(q, k, v, lens):
                shard = jax.lax.axis_index(self.axis)
                lens_virtual = lens - shard * S_loc  # may be <0 or >S_loc
                if inner == "pallas":
                    from ..kernels.flash_attention_pallas import (
                        flash_prefill_state_pallas,
                    )

                    o, m, l = flash_prefill_state_pallas(
                        q, k, v, lens_virtual, scale=scale, causal=True,
                        interpret=interpret,
                    )
                else:
                    o, m, l = decode_state_xla(q, k, v, lens_virtual, scale)
                return combine_softmax_states(o, m, l, self.axis)

            return shard_map(
                local_prefill, mesh=mesh,
                in_specs=(P(), kv_spec, kv_spec, P()),
                out_specs=P(), check_vma=False,
            )(q, k, v, lens)

        S_loc = S // n_shards
        inner = self.inner
        interpret = self.interpret

        def local(q, k, v, lens):
            shard = jax.lax.axis_index(self.axis)
            start = shard * S_loc
            lens_loc = jnp.clip(lens - start, 0, S_loc)
            if inner == "pallas":
                from ..kernels.flash_attention_pallas import (
                    flash_decode_state_pallas,
                )

                o, m, l = flash_decode_state_pallas(
                    q, k, v, lens_loc, scale=scale, interpret=interpret
                )
            else:
                o, m, l = decode_state_xla(q, k, v, lens_loc, scale)
            return combine_softmax_states(o, m, l, self.axis)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), kv_spec, kv_spec, P()),
            out_specs=P(), check_vma=False,
        )(q, k, v, lens)
