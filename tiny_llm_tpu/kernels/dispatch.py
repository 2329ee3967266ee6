"""Backend-aware kernel implementation dispatch."""

from __future__ import annotations

import functools

import jax

_OVERRIDE: str | None = None


@functools.lru_cache(maxsize=1)
def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def default_impl() -> str:
    """"pallas" on TPU, "xla" elsewhere, unless overridden."""
    if _OVERRIDE is not None:
        return _OVERRIDE
    return "pallas" if _backend_is_tpu() else "xla"


def set_default_impl(impl: str | None) -> None:
    """Force an implementation globally (None restores auto)."""
    global _OVERRIDE
    assert impl in (None, "xla", "pallas"), impl
    _OVERRIDE = impl


def resolve(impl: str | None) -> str:
    if impl is None:
        return default_impl()
    assert impl in ("xla", "pallas"), impl
    return impl
