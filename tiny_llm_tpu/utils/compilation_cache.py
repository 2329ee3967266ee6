"""Persistent XLA compilation cache setup.

Remote-compile TPU environments pay 30s+ per program; caching compiled
executables across processes makes reruns (benchmarks, CLIs, the serving
ladder of chunk/window shapes) start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "tiny-llm-tpu", "xla-cache",
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
