from .mesh import make_mesh
from .distributed import (
    barrier,
    host_local_requests,
    initialize,
    make_multihost_mesh,
    runtime_topology,
)
from .overlap import allgather_matmul, matmul_reducescatter, overlapped_tp_matmuls
from .sharding import (
    ShardingConfig,
    param_shardings,
    shard_kv_cache,
    shard_params,
)
from .dp import DPPagedAttention, DPServing
from .ep_moe import EPMoE
from .sp_attention import SPAttention, combine_softmax_states
from .tp_kernels import TPAttention, paged_pool_spec
from .pipeline import (
    DecodePipeline,
    MicrobatchedPipeline,
    PipelinedQwen3,
    split_stages,
)

__all__ = [
    "allgather_matmul",
    "barrier",
    "host_local_requests",
    "initialize",
    "make_multihost_mesh",
    "matmul_reducescatter",
    "overlapped_tp_matmuls",
    "runtime_topology",
    "DecodePipeline",
    "MicrobatchedPipeline",
    "PipelinedQwen3",
    "split_stages",
    "make_mesh",
    "ShardingConfig",
    "param_shardings",
    "shard_kv_cache",
    "shard_params",
    "DPPagedAttention",
    "DPServing",
    "EPMoE",
    "SPAttention",
    "TPAttention",
    "combine_softmax_states",
    "paged_pool_spec",
]
