from .qwen3 import (
    AttentionParams,
    BlockParams,
    MLPParams,
    MoEParams,
    Qwen3Config,
    Qwen3Model,
    Qwen3Params,
    forward_full,
    forward_step,
    fuse_projections,
)
from .loader import (
    load_config,
    load_params,
    random_params,
    synthetic_quantized_params,
    tiny_test_config,
)
from .registry import MODEL_SHORTCUTS, QWEN3_CONFIGS, dispatch_model

# Reference-course naming parity: the three "week" model variants are one
# implementation here, selected by weight type and cache kind:
#   Week1 = dense bf16 weights (random_params/load_params quantized=False),
#           no cache (forward_full)
#   Week2 = W4A16 weights + dense preallocated KV cache
#   Week3 = W4A16 weights + enable_paged_attention() (paged pool + MoE)
Qwen3ModelWeek1 = Qwen3Model
Qwen3ModelWeek2 = Qwen3Model
Qwen3ModelWeek3 = Qwen3Model

__all__ = [
    "AttentionParams",
    "BlockParams",
    "MLPParams",
    "MoEParams",
    "Qwen3Config",
    "Qwen3Model",
    "Qwen3Params",
    "forward_full",
    "forward_step",
    "fuse_projections",
    "load_config",
    "load_params",
    "random_params",
    "synthetic_quantized_params",
    "tiny_test_config",
    "MODEL_SHORTCUTS",
    "QWEN3_CONFIGS",
    "dispatch_model",
]
