from .cache import BatchingKVCache, DenseKVCache, KVCache

__all__ = ["KVCache", "DenseKVCache", "BatchingKVCache"]
