"""Data-parallel serving (VERDICT round-1 item #6; SURVEY.md §2.8 "DP").

DP replicates the weights across the `dp` mesh axis and shards the
decode BATCH (the scheduler's slot array) across replicas. Batched
decode has no cross-slot math, so the reference scheduler's slot
semantics (serving/batch.py; reference batch.py:120-221) are preserved
exactly — slots partition into contiguous per-replica blocks (slot i is
served by replica i // (slots/dp)), and admission/eviction logic is
untouched.

Mechanically, the placement is carried by the batching KV slab: its
batch axis is sharded over `dp` (and its KV-head axis over `tp`, as
everywhere else — sharding.kv_cache_spec). GSPMD then partitions every
batch-axis op of the jitted decode step along `dp` with zero decode-path
collectives; weight specs never mention `dp`, so parameters replicate.
Chunked prefill of a single pending request (B=1) cannot shard over
`dp` and runs replicated — the same work on every replica, which is
correct and keeps the scheduler single-controller. Scheduler-level DP
across HOSTS (separate processes, disjoint request sets) is
`distributed.host_local_requests`; this module is in-mesh DP for one
controller.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .sharding import ShardingConfig, kv_cache_spec


class DPServing:
    """Wrap a model so serving state lands dp-sharded on the mesh.

    Drop-in for `serving.batch.batch_generate(model=...)`: delegates
    everything to the wrapped model, but batching KV slabs come back
    with their batch axis sharded over `dp` and replicated inputs, so
    the jitted decode step partitions across replicas.
    """

    def __init__(self, model: Any, scfg: ShardingConfig):
        self._model = model
        self.scfg = scfg
        if model.page_pool is not None:
            # Paged DP needs dp-striped page allocation (the pool is one
            # global tensor); the dense slab path is the DP-supported
            # serving configuration this round.
            raise NotImplementedError(
                "DPServing supports the dense batching cache; use SP/TP "
                "sharding for the paged pool (parallel/sp_attention.py)"
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
