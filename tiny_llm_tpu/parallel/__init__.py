from .mesh import make_mesh
from .sharding import (
    ShardingConfig,
    param_shardings,
    shard_kv_cache,
    shard_params,
)

__all__ = [
    "make_mesh",
    "ShardingConfig",
    "param_shardings",
    "shard_kv_cache",
    "shard_params",
]
