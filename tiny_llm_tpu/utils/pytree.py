"""Pytree dataclass helpers.

The framework keeps all model state in params pytrees (plain dataclasses
registered with JAX) so every step function can be `jax.jit`-ed, sharded with
`NamedSharding`, and donated for in-place KV updates. This replaces the
reference's weight-holding Python classes (e.g. QuantizedWeights in
/root/reference/src/tiny_llm_ref/quantize.py:8) with a functional design.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")

_STATIC_MARK = "tiny_llm_tpu_static"


def static_field(**kwargs):
    """A dataclass field treated as pytree metadata (static under jit)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_MARK] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Decorator: freeze the dataclass and register it as a JAX pytree.

    Fields created with `static_field()` become metadata (hashable, static
    under jit); all other fields are children (traced arrays).
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC_MARK, False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls
