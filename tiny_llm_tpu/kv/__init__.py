from .cache import BatchingKVCache, DenseKVCache, KVCache
from .paged import PagePool, PagedBatchingKVCache, PagedKVCache

__all__ = [
    "KVCache",
    "DenseKVCache",
    "BatchingKVCache",
    "PagePool",
    "PagedKVCache",
    "PagedBatchingKVCache",
]
