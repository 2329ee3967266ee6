from .basics import linear, silu, softmax, swiglu
from .attention import (
    causal_mask,
    scaled_dot_product_attention_grouped,
    scaled_dot_product_attention_simple,
)
from .norm import RMSNorm, rms_norm
from .rope import RoPE
from .embedding import Embedding, QuantizedEmbedding, quantized_embedding_gather
from .quantize import (
    QuantizedTensor,
    dequantize,
    from_mlx_packing,
    quantize,
    quantized_linear,
)
from .sampler import make_sampler

__all__ = [
    "linear",
    "silu",
    "softmax",
    "swiglu",
    "causal_mask",
    "scaled_dot_product_attention_grouped",
    "scaled_dot_product_attention_simple",
    "RMSNorm",
    "rms_norm",
    "RoPE",
    "Embedding",
    "QuantizedEmbedding",
    "quantized_embedding_gather",
    "QuantizedTensor",
    "dequantize",
    "from_mlx_packing",
    "quantize",
    "quantized_linear",
    "make_sampler",
]
