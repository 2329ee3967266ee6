"""Tiny build system: g++ -O2 -shared with content-hash caching."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_CACHE = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "tiny-llm-tpu",
)

_loaded: dict[str, ctypes.CDLL] = {}
_failed: set[str] = set()


def native_available(name: str = "page_allocator") -> bool:
    try:
        return load_library(name) is not None
    except Exception:
        return False


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile csrc/<name>.cpp if needed and dlopen it. Returns None when
    no toolchain is available (callers fall back to Python)."""
    if name in _loaded:
        return _loaded[name]
    if name in _failed:
        return None
    src = os.path.join(_CSRC, f"{name}.cpp")
    if not os.path.exists(src):
        _failed.add(name)
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE, exist_ok=True)
    so_path = os.path.join(_CACHE, f"{name}-{digest}.so")
    if not os.path.exists(so_path):
        tmp = tempfile.mktemp(suffix=".so", dir=_CACHE)
        cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except (subprocess.SubprocessError, OSError, FileNotFoundError):
            _failed.add(name)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        _failed.add(name)
        return None
    _loaded[name] = lib
    return lib
