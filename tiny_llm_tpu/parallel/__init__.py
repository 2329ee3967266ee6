from .mesh import make_mesh
from .sharding import (
    ShardingConfig,
    param_shardings,
    shard_kv_cache,
    shard_params,
)
from .tp_kernels import TPAttention, paged_pool_spec
from .pipeline import MicrobatchedPipeline, PipelinedQwen3, split_stages

__all__ = [
    "MicrobatchedPipeline",
    "PipelinedQwen3",
    "split_stages",
    "make_mesh",
    "ShardingConfig",
    "param_shardings",
    "shard_kv_cache",
    "shard_params",
    "TPAttention",
    "paged_pool_spec",
]
