"""KV caches — TPU-idiomatic redesign of the reference cache layer.

Parity targets: TinyKvCache / TinyKvFullCache / BatchingKvCache
(/root/reference/src/tiny_llm_ref/kv_cache.py:8-265). Design differences,
on purpose:

* The reference grows dense caches by `mx.concat` every step — an O(S²)
  copy pattern its own book flags as a flaw. Here the cache is a
  PREALLOCATED slab [num_layers, B, H_kv, max_seq, D]; appends are
  `dynamic_update_slice` into donated buffers inside the jitted model
  step, so decode does zero reallocation and zero copies.
* Caches hold device arrays + a host-side integer offset. The *model step*
  performs the actual append (functional, jit-compiled); the cache object
  is the owner of the buffers between steps. `update_tensors()` is how the
  model hands back the post-step (donated) buffers.
* Attention cost is bounded by window BUCKETS (powers of two), not
  max_seq: the wrapper slices the slab to the smallest bucket covering the
  current context, giving one compiled program per bucket instead of one
  per length — the static-shape analog of lazy dynamic growth.

The rewind contract for speculative decoding (kv_cache.py:59-67) is an
O(1) offset decrement here: stale tail entries are simply masked off by
the length mask and overwritten by the next append.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp
import numpy as np


def bucket_for(n: int, minimum: int = 128, maximum: int | None = None) -> int:
    """Smallest power-of-two >= n (clamped), used as the attention window."""
    b = minimum
    while b < n:
        b *= 2
    if maximum is not None:
        b = min(b, maximum)
    return b


class KVCache(ABC):
    """Abstract per-request cache handle (reference TinyKvCache parity)."""

    @property
    @abstractmethod
    def offset(self) -> int: ...

    @abstractmethod
    def rewind(self, n: int) -> None:
        """Drop the newest n logical tokens (speculative decoding)."""

    def release(self) -> None:
        """Release resources owned by this cache."""

    def materialize(self) -> None:
        """Block until pending device work on the cache has finished.

        The reference uses this to truncate MLX's lazy graph
        (kv_cache.py:40-42); under JAX's async dispatch it bounds the
        in-flight computation queue during chunked prefill.
        """


class DenseKVCache(KVCache):
    """Preallocated dense cache for one request (or one fused batch).

    keys/values: [num_layers, B, H_kv, max_seq, D] device arrays.
    """

    def __init__(
        self,
        num_layers: int,
        batch_size: int,
        num_kv_heads: int,
        max_seq_len: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ):
        self.num_layers = num_layers
        self.batch_size = batch_size
        self.num_kv_heads = num_kv_heads
        self.max_seq_len = max_seq_len
        self.head_dim = head_dim
        self.dtype = dtype
        shape = (num_layers, batch_size, num_kv_heads, max_seq_len, head_dim)
        self.keys = jnp.zeros(shape, dtype=dtype)
        self.values = jnp.zeros(shape, dtype=dtype)
        self._offset = 0

    @property
    def offset(self) -> int:
        return self._offset

    def update_tensors(self, keys: jax.Array, values: jax.Array, new_offset: int):
        """Install post-step buffers returned by the jitted model step."""
        self.keys = keys
        self.values = values
        self._offset = new_offset

    def rewind(self, n: int) -> None:
        assert n <= self._offset, f"rewind {n} past offset {self._offset}"
        self._offset -= n

    def release(self) -> None:
        self.keys = None
        self.values = None

    def materialize(self) -> None:
        if self.keys is not None:
            jax.block_until_ready((self.keys, self.values))


class BatchingKVCache(KVCache):
    """Slot-multiplexed dense cache for continuous batching.

    Reference parity: BatchingKvCache (kv_cache.py:70-221), redesigned: the
    batch slab is allocated ONCE at [L, max_active, H, max_seq, D]; adding
    a request copies its prefilled rows into the slot (one device-side
    dynamic_update_slice), removing a request just zeroes the slot's
    offset. No per-step batch reconstruction — the per-step mask derives
    from the per-slot offsets array.
    """

    def __init__(
        self,
        num_layers: int,
        max_active_requests: int,
        num_kv_heads: int,
        max_seq_len: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ):
        self.num_layers = num_layers
        self.max_active_requests = max_active_requests
        self.num_kv_heads = num_kv_heads
        self.max_seq_len = max_seq_len
        self.head_dim = head_dim
        self.dtype = dtype
        shape = (num_layers, max_active_requests, num_kv_heads, max_seq_len, head_dim)
        self.keys = jnp.zeros(shape, dtype=dtype)
        self.values = jnp.zeros(shape, dtype=dtype)
        self.offsets = np.zeros((max_active_requests,), dtype=np.int32)
        self.active = np.zeros((max_active_requests,), dtype=bool)

    @property
    def offset(self) -> int:
        return int(self.offsets.max()) if self.active.any() else 0

    def add_request(self, prefilled: DenseKVCache, slot: int) -> None:
        if slot >= self.max_active_requests:
            raise ValueError(f"slot {slot} out of range")
        assert prefilled.batch_size == 1
        n = prefilled.offset
        src_k = jax.lax.slice_in_dim(prefilled.keys, 0, n, axis=3)[:, 0]
        src_v = jax.lax.slice_in_dim(prefilled.values, 0, n, axis=3)[:, 0]
        self.keys = jax.lax.dynamic_update_slice(
            self.keys, src_k[:, None], (0, slot, 0, 0, 0)
        )
        self.values = jax.lax.dynamic_update_slice(
            self.values, src_v[:, None], (0, slot, 0, 0, 0)
        )
        self.offsets[slot] = n
        self.active[slot] = True

    def remove_request(self, slot: int) -> None:
        if not self.active[slot]:
            raise ValueError(f"slot {slot} is not active")
        self.offsets[slot] = 0
        self.active[slot] = False

    def update_tensors(self, keys, values, new_offsets: np.ndarray) -> None:
        self.keys = keys
        self.values = values
        self.offsets = np.asarray(new_offsets, dtype=np.int32)

    def rewind(self, n: int) -> None:
        self.offsets = self.offsets - n

    def release(self) -> None:
        self.keys = None
        self.values = None

    def materialize(self) -> None:
        if self.keys is not None:
            jax.block_until_ready((self.keys, self.values))
