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
)
from .loader import (
    load_config,
    load_params,
    random_params,
    synthetic_quantized_params,
    tiny_test_config,
)
from .registry import MODEL_SHORTCUTS, QWEN3_CONFIGS, dispatch_model

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
    "load_config",
    "load_params",
    "random_params",
    "synthetic_quantized_params",
    "tiny_test_config",
    "MODEL_SHORTCUTS",
    "QWEN3_CONFIGS",
    "dispatch_model",
]
