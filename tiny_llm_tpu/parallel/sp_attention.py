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


def paged_decode_state_xla(
    q, key_pages_loc, value_pages_loc, block_table, lens, page_base, scale
):
    """Oracle/portable (o, m, l) over the LOCALLY-OWNED pages of a
    sequence-sharded page pool: the shard holds global pages
    [page_base, page_base + P_loc); block-table entries outside that
    range contribute nothing. Identity (0, -inf, 0) when the shard owns
    none of a row's visible pages."""
    B, Hq, L, D = q.shape
    P_loc, Hkv, ps, _ = key_pages_loc.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    owned = (block_table >= page_base) & (block_table < page_base + P_loc)
    local = jnp.clip(block_table - page_base, 0, P_loc - 1)  # [B, maxp]
    k = jnp.take(key_pages_loc, local, axis=0)  # [B, maxp, Hkv, ps, D]
    v = jnp.take(value_pages_loc, local, axis=0)
    S = maxp * ps
    k = k.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, S, D)
    v = v.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, S, D)
    qf = q.astype(jnp.float32) * scale
    qg = qf.reshape(B, Hkv, n_rep * L, D)
    s = jnp.einsum("bhrd,bhsd->bhrs", qg, k.astype(jnp.float32))
    k_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    l_idx = jnp.arange(n_rep * L, dtype=jnp.int32)[None, None, :, None] % L
    q_pos = lens[:, None, None, None] - L + l_idx
    owned_pos = jnp.repeat(owned, ps, axis=1)[:, None, None, :]  # [B,1,1,S]
    s = jnp.where((k_pos <= q_pos) & owned_pos, s, -jnp.inf)
    # Identity rows carry m = -1e30 (the Pallas kernels' NEG_INF), not
    # -inf: equivalent under the combine (l == 0), comparable in tests.
    m = jnp.maximum(jnp.max(s, axis=-1), -1e30)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhrs,bhsd->bhrd", p, v.astype(jnp.float32))
    o = o / jnp.maximum(l, 1e-30)[..., None]
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

    def paged(
        self, q, key_pages, value_pages, block_table, context_lens,
        scale=None, mask="causal",
    ):
        """Sequence-sharded PAGED decode: the page pool's page axis is
        sharded over `axis` (shard s owns global pages
        [s·P_loc, (s+1)·P_loc)); each shard computes (o, m, l) over the
        block-table entries it owns and the states merge with the same
        two collectives as the dense path. This is the distributed
        paged-KV pool of SURVEY.md §2.8: block tables keep GLOBAL page
        ids, ownership is pure arithmetic, and no KV pages ever cross
        ICI — only [B, Hq, L, (D+2)] of states. Prefill chunks (L > 16)
        all-gather the local pages and run the single-pool kernel
        (chunked prefill is a small share of serving time; see
        PERFORMANCE.md)."""
        B, Hq, L, D = q.shape
        P_pages, Hkv, ps, _ = key_pages.shape
        scale = (D**-0.5) if scale is None else float(scale)
        assert mask in ("causal", None)
        mesh = self.scfg.mesh
        n_shards = mesh.shape[self.axis]
        assert P_pages % n_shards == 0, (
            f"num_pages {P_pages} must divide over {n_shards} shards; pad "
            "the pool (enable_paged_attention(num_pages=...))"
        )
        P_loc = P_pages // n_shards
        pool_spec = P(self.axis, None, None, None)
        inner = self.inner
        interpret = self.interpret

        if L > 16:
            from ..kernels.paged_attention import paged_attention

            def gathered(q, kp, vp, bt, lens):
                kp_full = jax.lax.all_gather(kp, self.axis, axis=0, tiled=True)
                vp_full = jax.lax.all_gather(vp, self.axis, axis=0, tiled=True)
                return paged_attention(
                    q, kp_full, vp_full, bt, lens, scale=scale, mask=mask,
                    impl="xla",
                )

            return shard_map(
                gathered, mesh=mesh,
                in_specs=(P(), pool_spec, pool_spec, P(), P()),
                out_specs=P(), check_vma=False,
            )(q, key_pages, value_pages, block_table, context_lens)

        def local(q, kp, vp, bt, lens):
            shard = jax.lax.axis_index(self.axis)
            base = shard * P_loc
            if inner == "pallas":
                from ..kernels.paged_attention_pallas import paged_decode_state

                o, m, l = paged_decode_state(
                    q, kp, vp, bt, lens, base, scale=scale,
                    interpret=interpret,
                )
            else:
                o, m, l = paged_decode_state_xla(
                    q, kp, vp, bt, lens, base, scale
                )
            return combine_softmax_states(o, m, l, self.axis)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), pool_spec, pool_spec, P(), P()),
            out_specs=P(), check_vma=False,
        )(q, key_pages, value_pages, block_table, context_lens)
