"""Paged KV cache: page pool, per-request handles, batch metadata.

Parity targets: TinyKvPagedPool / TinyKvPagedCache / PagedKvMetadata
(/root/reference/src/tiny_llm_ref/paged_kv_cache.py:11-360) and the paged
side of BatchingKvCache (kv_cache.py:141-202). TPU-first redesign:

* ONE free list / block table for ALL layers (page ids are
  layer-invariant because appends touch every layer symmetrically), but
  per-layer PAGE BUFFERS — a tuple of [P, H_kv, page_size, D] arrays,
  not one stacked tensor (see __init__; round 4). The reference keeps
  per-layer pools with identical allocation patterns; sharing the ids
  makes the block table one [B, max_pages] array instead of num_layers of
  them, and lets the whole model step be one jitted call with one donated
  pool buffer pair).
* Capacity is FIXED at construction (pages = a preallocated device
  tensor). The reference's geometric growth-with-copy
  (paged_kv_cache.py:100-128) is a lazy-runtime idiom; under jit,
  reallocation would recompile every step. Pool exhaustion raises — the
  scheduler sizes the pool from max_seq_len * batch_size.
* The actual page WRITES happen inside the jitted model step (scatter on
  the donated pool arrays); these host-side objects track only free-list
  and logical metadata (page ids, offsets), mirroring the reference's
  id/len bookkeeping (paged_kv_cache.py:187-360).

Instrumentation counters mirror the reference's
(reused_page_allocations etc., paged_kv_cache.py:37-40) so the serving
benchmarks can report the same ledger.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cache import KVCache


class PoolExhausted(RuntimeError):
    """Raised by every allocate_page exhaustion path (flat, SP-striped,
    DP-striped, native). A dedicated type so the scheduler's admission
    backpressure (serving/batch.py) can defer on exhaustion without
    matching exception-message substrings — the DP-stripe message
    differs from the flat pool's, which broke string matching
    (ADVICE round 4)."""


class PagePool:
    """Physical page storage shared by every request and layer."""

    def __init__(
        self,
        num_layers: int,
        num_pages: int,
        num_kv_heads: int,
        page_size: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        native: bool | None = None,
        stripe_shards: int | None = None,
        dp_shards: int | None = None,
    ):
        self.num_layers = num_layers
        self.num_pages = num_pages
        self.num_kv_heads = num_kv_heads
        self.page_size = page_size
        self.head_dim = head_dim
        self.dtype = dtype
        # PER-LAYER buffers (a tuple pytree), NOT one stacked
        # [L, P, H, ps, D] array: every jitted step updates layer i's
        # pages in place AND feeds them to that layer's attention kernel.
        # With a stacked array each layer's read needs a materialized
        # kp[i] slice (XLA cannot pass a sub-buffer to a custom call) —
        # at a 32K-context pool that is 110 MB x 72 slices = ~11 ms of
        # pure copies per decode step (round-4 trace). Independent
        # per-layer buffers make the slice free, keep the in-place DUS
        # chain per buffer, and remove cross-layer false aliasing.
        # Indexing semantics are unchanged (key_pages[i] is layer i).
        shape = (num_pages, num_kv_heads, page_size, head_dim)
        self.key_pages = tuple(
            jnp.zeros(shape, dtype=dtype) for _ in range(num_layers)
        )
        self.value_pages = tuple(
            jnp.zeros(shape, dtype=dtype) for _ in range(num_layers)
        )
        # Page 0 is the TRASH page: -1 block-table entries clamp to it, so
        # idle batch slots scatter their garbage writes there instead of
        # into a live page. Never allocated.
        #
        # Bookkeeping backend: the native C++ index (csrc/page_allocator.cpp)
        # when the toolchain is available, else pure Python. Identical
        # semantics; the native path also assembles block tables in C++.
        #
        # stripe_shards: for a SEQUENCE-SHARDED pool (page axis split over
        # stripe_shards mesh devices, parallel/sp_attention.py .paged),
        # allocation balances across the per-shard page ranges so every
        # request's context spreads evenly — the SP decode combine then
        # gets near-equal per-shard work. Pure-Python backend only.
        # dp_shards: for a DATA-PARALLEL pool (page axis split over
        # dp_shards replicas, parallel/dp.py) allocation is PINNED — every
        # page of one request comes from one replica's stripe, so that
        # replica's shard_map'd decode step never reads a foreign page.
        # The opposite of SP striping (which spreads one request across
        # shards). Page s*P_loc is reserved as replica s's local trash
        # page (block-table -1 entries clamp there shard-locally).
        self.dp_shards = dp_shards
        self._pinned_free: list[list[int]] | None = None
        if dp_shards:
            assert not stripe_shards, "dp_shards and stripe_shards are exclusive"
            assert num_pages % dp_shards == 0, (
                f"num_pages {num_pages} must divide over {dp_shards} replicas"
            )
            p_loc = num_pages // dp_shards
            assert p_loc >= 2, "each dp stripe needs at least trash + 1 page"
            self._pinned_free = [
                list(range((s + 1) * p_loc - 1, s * p_loc, -1))
                for s in range(dp_shards)
            ]
        self.stripe_shards = stripe_shards
        self.native_index = None
        self._free_by_shard: list[list[int]] | None = None
        if dp_shards:
            pass  # bookkeeping handled above (pure Python)
        elif stripe_shards:
            assert num_pages % stripe_shards == 0, (
                f"num_pages {num_pages} must divide over {stripe_shards} shards"
            )
            p_loc = num_pages // stripe_shards
            self._free_by_shard = [
                [p for p in range((s + 1) * p_loc - 1, s * p_loc - 1, -1)
                 if p != 0]
                for s in range(stripe_shards)
            ]
        elif native is not False:
            try:
                from ..native import NativePageIndex

                self.native_index = NativePageIndex(num_pages)
            except Exception:
                if native is True:
                    raise
        self._free: list[int] = list(range(num_pages - 1, 0, -1))
        # Ledger (reference paged_kv_cache.py:37-40).
        self._reused = 0
        self._ever_allocated: set[int] = set()

    @property
    def free_pages(self) -> int:
        if self.native_index is not None:
            return self.native_index.free_pages
        if self._pinned_free is not None:
            return sum(len(f) for f in self._pinned_free)
        if self._free_by_shard is not None:
            return sum(len(f) for f in self._free_by_shard)
        return len(self._free)

    @property
    def reserved_pages(self) -> int:
        """Trash pages: one per dp replica (shard-local), else one global."""
        return self.dp_shards if self.dp_shards else 1

    @property
    def live_pages(self) -> int:
        return self.num_pages - self.reserved_pages - self.free_pages

    def least_loaded_shard(self) -> int:
        """dp replica whose stripe has the most free pages (new requests
        pin their allocations there)."""
        assert self._pinned_free is not None, "not a dp-striped pool"
        return max(
            range(len(self._pinned_free)),
            key=lambda s: len(self._pinned_free[s]),
        )

    @property
    def reused_page_allocations(self) -> int:
        if self.native_index is not None:
            return self.native_index.reused_page_allocations
        return self._reused

    def allocate_page(self, shard: int | None = None) -> int:
        if self._pinned_free is not None:
            assert shard is not None, "dp-striped pools need a pinned shard"
            if not self._pinned_free[shard]:
                raise PoolExhausted(
                    f"dp stripe {shard} exhausted "
                    f"({self.num_pages // self.dp_shards} pages); size the "
                    "pool for max_seq_len * max_active_requests"
                )
            page = self._pinned_free[shard].pop()
            if page in self._ever_allocated:
                self._reused += 1
            self._ever_allocated.add(page)
            return page
        if self.native_index is not None:
            return self.native_index.allocate_page()
        if self._free_by_shard is not None:
            # Balance: take from the shard with the most free pages, so
            # each request's context spreads evenly over the SP shards.
            shard = max(
                range(len(self._free_by_shard)),
                key=lambda s: len(self._free_by_shard[s]),
            )
            if not self._free_by_shard[shard]:
                raise PoolExhausted(
                    f"page pool exhausted ({self.num_pages} pages); size the "
                    "pool for max_seq_len * max_active_requests"
                )
            page = self._free_by_shard[shard].pop()
        else:
            if not self._free:
                raise PoolExhausted(
                    f"page pool exhausted ({self.num_pages} pages); size the "
                    "pool for max_seq_len * max_active_requests"
                )
            page = self._free.pop()
        if page in self._ever_allocated:
            self._reused += 1
        self._ever_allocated.add(page)
        return page

    def free_page(self, page: int) -> None:
        if self._pinned_free is not None:
            p_loc = self.num_pages // self.dp_shards
            self._pinned_free[page // p_loc].append(page)
            return
        if self.native_index is not None:
            self.native_index.free_page(page)
            return
        if self._free_by_shard is not None:
            p_loc = self.num_pages // self.stripe_shards
            self._free_by_shard[page // p_loc].append(page)
            return
        self._free.append(page)

    def reset(self) -> None:
        if self._pinned_free is not None:
            p_loc = self.num_pages // self.dp_shards
            self._pinned_free = [
                list(range((s + 1) * p_loc - 1, s * p_loc, -1))
                for s in range(self.dp_shards)
            ]
            return
        if self.native_index is not None:
            from ..native import NativePageIndex

            self.native_index = NativePageIndex(self.num_pages)
            return
        if self._free_by_shard is not None:
            p_loc = self.num_pages // self.stripe_shards
            self._free_by_shard = [
                [p for p in range((s + 1) * p_loc - 1, s * p_loc - 1, -1)
                 if p != 0]
                for s in range(self.stripe_shards)
            ]
            return
        self._free = list(range(self.num_pages - 1, 0, -1))

    def update_tensors(self, key_pages, value_pages) -> None:
        """Install post-step (donated) per-layer pool buffers."""
        self.key_pages = tuple(key_pages)
        self.value_pages = tuple(value_pages)

    def materialize(self) -> None:
        jax.block_until_ready((self.key_pages, self.value_pages))


class PagedKVCache(KVCache):
    """Per-request logical view: page ids + token offset.

    Layer-invariant: one id list serves every layer (see PagePool).
    """

    def __init__(self, pool: PagePool, shard: int | None = None):
        self.pool = pool
        self._native = pool.native_index
        # dp-striped pools pin every page of this request to one replica
        # stripe (parallel/dp.py); pick the emptiest stripe by default.
        if pool.dp_shards and shard is None:
            shard = pool.least_loaded_shard()
        self.shard = shard
        if self._native is not None:
            self._req = self._native.request_create()
        else:
            self.page_ids: list[int] = []
            self._offset = 0
        self._released = False

    @property
    def offset(self) -> int:
        if self._native is not None:
            return self._native.request_offset(self._req)
        return self._offset

    @property
    def num_pages(self) -> int:
        if self._native is not None:
            return self._native.request_num_pages(self._req)
        return len(self.page_ids)

    def ensure_capacity(self, new_offset: int) -> None:
        """Allocate pages so positions [0, new_offset) are backed."""
        if self._native is not None:
            self._native.request_ensure(self._req, new_offset, self.pool.page_size)
            return
        ps = self.pool.page_size
        needed = (new_offset + ps - 1) // ps
        while len(self.page_ids) < needed:
            self.page_ids.append(self.pool.allocate_page(shard=self.shard)
                                 if self.pool.dp_shards
                                 else self.pool.allocate_page())

    def advance(self, n: int) -> None:
        """Record n appended tokens (pages must already be ensured)."""
        if self._native is not None:
            self._native.request_advance(self._req, n)
            assert self.offset <= self.num_pages * self.pool.page_size
            return
        self._offset += n
        assert self._offset <= len(self.page_ids) * self.pool.page_size

    def rewind(self, n: int) -> None:
        """Drop the newest n tokens; free whole trailing pages
        (reference paged_kv_cache.py:331-351)."""
        assert n <= self.offset
        if self._native is not None:
            self._native.request_rewind(self._req, n, self.pool.page_size)
            return
        self._offset -= n
        ps = self.pool.page_size
        needed = (self._offset + ps - 1) // ps
        while len(self.page_ids) > max(needed, 0):
            self.pool.free_page(self.page_ids.pop())

    def release(self) -> None:
        if self._released:
            return
        if self._native is not None:
            self._native.request_release(self._req)
        else:
            for p in self.page_ids:
                self.pool.free_page(p)
            self.page_ids = []
        self._released = True

    def materialize(self) -> None:
        self.pool.materialize()

    def block_table_row(self, width: int) -> list[int]:
        if self._native is not None:
            return list(self._native.block_table([self._req], width)[0])
        return self.page_ids + [-1] * (width - len(self.page_ids))


class PagedBatchingKVCache(KVCache):
    """Slot-multiplexed paged cache for continuous batching.

    Reference parity: BatchingKvCache's paged path (kv_cache.py:141-221).
    Installation and removal are O(1) metadata — the pages already live in
    the shared pool.
    """

    owns_added_requests = True  # installation is by reference, not copy

    def __init__(self, pool: PagePool, max_active_requests: int):
        self.pool = pool
        self.max_active_requests = max_active_requests
        self.slots: list[PagedKVCache | None] = [None] * max_active_requests

    @property
    def offset(self) -> int:
        return max((c.offset for c in self.slots if c is not None), default=0)

    @property
    def offsets(self) -> np.ndarray:
        return np.asarray(
            [(c.offset if c is not None else 0) for c in self.slots], np.int32
        )

    @property
    def active(self) -> np.ndarray:
        return np.asarray([c is not None for c in self.slots], bool)

    def add_request(self, prefilled: PagedKVCache, slot: int) -> None:
        if slot >= self.max_active_requests:
            raise ValueError(f"slot {slot} out of range")
        if prefilled.pool is not self.pool:
            raise ValueError("paged batch caches must share one page pool")
        self.slots[slot] = prefilled

    def remove_request(self, slot: int) -> None:
        if self.slots[slot] is None:
            raise ValueError(f"slot {slot} is not active")
        self.slots[slot].release()
        self.slots[slot] = None

    def rewind(self, n: int) -> None:
        for c in self.slots:
            if c is not None:
                c.rewind(n)

    def release(self) -> None:
        for i, c in enumerate(self.slots):
            if c is not None:
                c.release()
                self.slots[i] = None

    def materialize(self) -> None:
        self.pool.materialize()

    def block_table(self, width: int | None = None) -> np.ndarray:
        w = width or max((c.num_pages for c in self.slots if c is not None), default=1)
        native = self.pool.native_index
        if native is not None:
            handles = [(c._req if c is not None else -1) for c in self.slots]
            return native.block_table(handles, w)
        rows = []
        for c in self.slots:
            rows.append(
                c.block_table_row(w) if c is not None else [-1] * w
            )
        return np.asarray(rows, np.int32)
