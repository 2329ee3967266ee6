"""Pallas TPU kernels + dispatch.

Every hot op has two implementations:
  - "xla": pure jax/jnp, runs anywhere (CPU tests, multi-chip dry-runs),
    and is the correctness oracle.
  - "pallas": hand-tiled Mosaic kernel for TPU.

`default_impl()` picks Pallas iff the default backend is a real TPU.
This mirrors the reference's kernel-choice flags
(/root/reference/src/tiny_llm_ref/quantize.py:16-27) but keyed off the
backend instead of per-weight booleans.
"""

from __future__ import annotations

import functools

import jax

from .axpby import axpby
from .dispatch import default_impl, set_default_impl
from .quant_matmul import quantized_matmul
from .moe_matmul import grouped_quantized_matmul
from .flash_attention import flash_attention, flash_decode_attention
from .paged_attention import paged_attention
from .split_prefill import combine_state_pair, split_paged_prefill

__all__ = [
    "axpby",
    "default_impl",
    "set_default_impl",
    "quantized_matmul",
    "grouped_quantized_matmul",
    "flash_attention",
    "flash_decode_attention",
    "paged_attention",
    "combine_state_pair",
    "split_paged_prefill",
]
