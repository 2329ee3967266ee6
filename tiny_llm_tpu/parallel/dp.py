"""Data-parallel serving (VERDICT round-1 item #6; SURVEY.md §2.8 "DP").

DP replicates the weights across the `dp` mesh axis and shards the
decode BATCH (the scheduler's slot array) across replicas. Batched
decode has no cross-slot math, so the reference scheduler's slot
semantics (serving/batch.py; reference batch.py:120-221) are preserved
exactly — slots partition into contiguous per-replica blocks (slot i is
served by replica i // (slots/dp)), and admission/eviction logic is
untouched.

DENSE path: the placement is carried by the batching KV slab — batch
axis sharded over `dp`, KV-head axis over `tp` (sharding.kv_cache_spec).
GSPMD partitions every batch-axis op of the jitted decode step along
`dp` with zero decode-path collectives; weight specs never mention
`dp`, so parameters replicate.

PAGED path (round 3): the page pool's PAGE axis is sharded over `dp` —
each replica physically holds 1/dp of the pool — and page allocation is
PINNED: every page of a request comes from the stripe of the replica
that will serve its slot (kv/paged.py dp_shards mode; page s·P_loc is
replica s's local trash page). `DPPagedAttention` shard_maps both the
page write and the paged decode so each replica touches only its
stripe; decode needs ZERO collectives (a row's pages are local by the
pinning invariant), and the B=1 prefill chunk merges per-replica
softmax states with the same two collectives as SP (only the pinned
replica contributes). The scheduler's only extra constraint: a request
installs into a slot of its pinned replica (choose_slot).

Chunked prefill of a single pending request (B=1) cannot shard over
`dp` and runs replicated — the same work on every replica, which is
correct and keeps the scheduler single-controller. Scheduler-level DP
across HOSTS (separate processes, disjoint request sets) is
`distributed.host_local_requests`; this module is in-mesh DP for one
controller.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..kv.paged import PagedBatchingKVCache
from .sharding import ShardingConfig, kv_cache_spec
from .sp_attention import combine_softmax_states, paged_decode_state_xla


def dp_paged_pool_spec(scfg: ShardingConfig) -> P:
    """Per-layer [Pg, H_kv, page_size, D] buffer: pages on dp, KV heads
    on tp (the pool is a tuple of per-layer buffers, kv/paged.py)."""
    return P(scfg.dp_axis, scfg.tp_axis, None, None)


@dataclasses.dataclass(frozen=True)
class DPPagedAttention:
    """Attention + page-write strategy for a dp-sharded page pool.

    Pass as the model's `attn_impl`. Handles two batch regimes:
    * B divisible by dp (batched decode / batched steps): batch and
      pages both manually sharded over dp — fully local per replica.
    * B not divisible (the scheduler's single pending prefill, B=1):
      q replicated, each replica computes softmax states over its local
      pages, states merge across dp (only the pinned replica owns any
      of the row's pages, so the combine picks its exact result).
    Heads shard over tp in both regimes, like TPAttention.
    """

    scfg: ShardingConfig
    inner: str = "pallas"
    interpret: bool = False

    @property
    def _dp(self) -> int:
        return self.scfg.mesh.shape[self.scfg.dp_axis]

    def _dp_ok(self, B: int) -> bool:
        return B >= self._dp and B % self._dp == 0

    # -- dense chunk-local attention (prefill local_attention path) --------
    def flash(self, q, k, v, scale=None, mask=None, lens=None):
        from ..kernels.flash_attention import flash_attention

        batch = self.scfg.dp_axis if self._dp_ok(q.shape[0]) else None
        hs = P(batch, self.scfg.tp_axis, None, None)
        lens_specs = () if lens is None else (P(batch),)
        inner = self.inner
        interpret = self.interpret

        @functools.partial(
            jax.shard_map, mesh=self.scfg.mesh,
            in_specs=(hs, hs, hs) + lens_specs, out_specs=hs,
            check_vma=False,
        )
        def run(q, k, v, *maybe_lens):
            lens_local = maybe_lens[0] if maybe_lens else None
            if inner == "pallas":
                from ..kernels.flash_attention_pallas import flash_attention_pallas

                return flash_attention_pallas(
                    q, k, v, scale=scale, mask=mask, lens=lens_local,
                    interpret=interpret,
                )
            return flash_attention(
                q, k, v, scale=scale, mask=mask, lens=lens_local, impl=inner
            )

        args = (q, k, v) if lens is None else (q, k, v, lens)
        return run(*args)

    # -- paged attention ----------------------------------------------------
    def paged(self, q, key_pages, value_pages, block_table, context_lens,
              scale=None, mask="causal"):
        from ..kernels.paged_attention import paged_attention

        assert mask in ("causal", None)
        B, Hq, L, D = q.shape
        scale = (D**-0.5) if scale is None else float(scale)
        dp = self._dp
        P_pages = key_pages.shape[0]
        assert P_pages % dp == 0
        P_loc = P_pages // dp
        pool_spec = P(self.scfg.dp_axis, self.scfg.tp_axis, None, None)
        dp_axis = self.scfg.dp_axis
        inner = self.inner
        interpret = self.interpret

        if self._dp_ok(B):
            hs = P(dp_axis, self.scfg.tp_axis, None, None)
            bspec = P(dp_axis)

            def local(q, kp, vp, bt, lens):
                base = jax.lax.axis_index(dp_axis) * P_loc
                # Pinning invariant: every VALID page of a local row is in
                # this replica's stripe; -1 padding stays -1.
                bt_local = jnp.where(bt >= 0, bt - base, -1)
                if inner == "pallas":
                    from ..kernels.paged_attention_pallas import (
                        paged_attention_pallas,
                    )

                    return paged_attention_pallas(
                        q, kp, vp, bt_local, lens, scale=scale, mask=mask,
                        interpret=interpret,
                    )
                return paged_attention(
                    q, kp, vp, bt_local, lens, scale=scale, mask=mask,
                    impl=inner,
                )

            return jax.shard_map(
                local, mesh=self.scfg.mesh,
                in_specs=(hs, pool_spec, pool_spec, bspec, bspec),
                out_specs=hs, check_vma=False,
            )(q, key_pages, value_pages, block_table, context_lens)

        rq = P(None, self.scfg.tp_axis, None, None)

        def states(q, kp, vp, bt, lens):
            base = jax.lax.axis_index(dp_axis) * P_loc
            o, m, l = paged_decode_state_xla(q, kp, vp, bt, lens, base, scale)
            return combine_softmax_states(o, m, l, dp_axis)

        return jax.shard_map(
            states, mesh=self.scfg.mesh,
            in_specs=(rq, pool_spec, pool_spec, P(), P()),
            out_specs=rq, check_vma=False,
        )(q, key_pages, value_pages, block_table, context_lens)

    # -- page writes ----------------------------------------------------------
    def paged_update(self, kp_i, vp_i, k, v, page_idx_raw, slot):
        """Shard-local scatter of this step's K/V into the dp-sharded
        pool layer. Positions owned by another replica (or -1 idle
        padding) land in THIS replica's local trash page (local index 0
        = global s*P_loc, reserved by the allocator)."""
        B = k.shape[0]
        dp = self._dp
        P_loc = kp_i.shape[0] // dp
        dp_axis = self.scfg.dp_axis
        pool_spec = P(dp_axis, self.scfg.tp_axis, None, None)
        batch = dp_axis if self._dp_ok(B) else None
        data_spec = P(batch, self.scfg.tp_axis, None, None)
        idx_spec = P(batch, None)

        def local(kp_i, vp_i, k, v, idx, slot):
            base = jax.lax.axis_index(dp_axis) * P_loc
            li = idx - base
            mine = (li >= 0) & (li < P_loc)
            li = jnp.where(mine, li, 0)  # foreign/idle -> local trash
            kp_i = kp_i.at[li, :, slot, :].set(k.transpose(0, 2, 1, 3))
            vp_i = vp_i.at[li, :, slot, :].set(v.transpose(0, 2, 1, 3))
            return kp_i, vp_i

        return jax.shard_map(
            local, mesh=self.scfg.mesh,
            in_specs=(pool_spec, pool_spec, data_spec, data_spec,
                      idx_spec, idx_spec),
            out_specs=(pool_spec, pool_spec), check_vma=False,
        )(kp_i, vp_i, k, v, page_idx_raw, slot)


class DPServing:
    """Wrap a model so serving state lands dp-sharded on the mesh.

    Drop-in for `serving.batch.batch_generate(model=...)`: delegates
    everything to the wrapped model, but batching KV slabs (dense) or
    the page pool (paged) come back dp-sharded, so the jitted decode
    step partitions across replicas.

    Paged usage contract: construct the model with
    `attn_impl=DPPagedAttention(scfg, ...)` BEFORE
    `enable_paged_attention` (the jit partials bind attn_impl at model
    construction), then wrap with DPServing. DPServing re-strides the
    pool's allocator for dp pinning and places the pool tensors with
    their page axis on `dp`.
    """

    def __init__(self, model: Any, scfg: ShardingConfig):
        self._model = model
        self.scfg = scfg
        if model.page_pool is not None:
            from ..kv.paged import PagePool

            dp = scfg.mesh.shape[scfg.dp_axis]
            if not hasattr(model.attn_impl, "paged_update"):
                raise ValueError(
                    "paged DP needs the model built with "
                    "attn_impl=DPPagedAttention(scfg) so page writes and "
                    "reads run stripe-locally"
                )
            old = model.page_pool
            if old.num_pages % dp:
                raise ValueError(
                    f"num_pages ({old.num_pages}) must be divisible by dp "
                    f"({dp}); pass enable_paged_attention(num_pages=...)"
                )
            if old.dp_shards != dp:
                if old.live_pages:
                    raise ValueError(
                        "wrap with DPServing before allocating any pages"
                    )
                model.page_pool = PagePool(
                    num_layers=old.num_layers,
                    num_pages=old.num_pages,
                    num_kv_heads=old.num_kv_heads,
                    page_size=old.page_size,
                    head_dim=old.head_dim,
                    dtype=old.dtype,
                    native=False,
                    dp_shards=dp,
                )
            pool = model.page_pool
            sharding = NamedSharding(scfg.mesh, dp_paged_pool_spec(scfg))
            pool.update_tensors(
                jax.device_put(pool.key_pages, sharding),
                jax.device_put(pool.value_pages, sharding),
            )

    def __getattr__(self, name: str):
        return getattr(self._model, name)

    def __call__(self, *args, **kwargs):
        # dunder lookup bypasses __getattr__; delegate explicitly
        return self._model(*args, **kwargs)

    def create_batching_kv_cache(
        self, max_active_requests: int, max_seq_len: int | None = None
    ):
        dp = self.scfg.mesh.shape[self.scfg.dp_axis]
        if max_active_requests % dp:
            raise ValueError(
                f"batch_size ({max_active_requests}) must be divisible by "
                f"the dp axis ({dp}) so slots partition evenly"
            )
        if self._model.page_pool is not None:
            return DPPagedBatchingKVCache(
                self._model.page_pool, max_active_requests, dp
            )
        cache = self._model.create_batching_kv_cache(
            max_active_requests, max_seq_len
        )
        sharding = NamedSharding(self.scfg.mesh, kv_cache_spec(self.scfg))
        cache.update_tensors(
            jax.device_put(cache.keys, sharding),
            jax.device_put(cache.values, sharding),
            cache.offsets,
        )
        return cache

    def slot_replica(self, slot: int, num_slots: int) -> int:
        """Which dp replica serves a slot (contiguous block placement)."""
        dp = self.scfg.mesh.shape[self.scfg.dp_axis]
        return slot // (num_slots // dp)


class DPPagedBatchingKVCache(PagedBatchingKVCache):
    """Slot-multiplexed paged cache whose slots partition into dp
    replica blocks; a request may only install into a slot of the
    replica its pages are pinned to."""

    def __init__(self, pool, max_active_requests: int, dp: int):
        assert pool.dp_shards == dp, "pool must be dp-striped (DPServing)"
        assert max_active_requests % dp == 0
        super().__init__(pool, max_active_requests)
        self.dp = dp
        self.slots_per_replica = max_active_requests // dp

    def slot_shard(self, slot: int) -> int:
        return slot // self.slots_per_replica

    def choose_slot(self, request_cache, free_slots):
        """First free slot on the request's pinned replica; None stalls
        admission until one frees (scheduler retries)."""
        for i in free_slots:
            if self.slot_shard(i) == request_cache.shard:
                return i
        return None

    def add_request(self, prefilled, slot: int) -> None:
        if prefilled.shard != self.slot_shard(slot):
            raise ValueError(
                f"request pinned to replica {prefilled.shard} cannot "
                f"occupy slot {slot} (replica {self.slot_shard(slot)})"
            )
        super().add_request(prefilled, slot)
