"""tiny-llm-tpu: a TPU-native LLM serving framework.

Brand-new JAX/XLA/Pallas implementation of the capability set of
skyzh/tiny-llm (MLX/Metal reference at /root/reference): quantized Qwen3
inference, KV caching, paged KV + continuous batching, speculative
decoding, MoE, and multi-chip sharding — designed TPU-first rather than
ported.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401

__all__ = ["ops", "speculative"]
