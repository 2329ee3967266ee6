"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-use: compiles csrc/*.cpp with g++ into a cached shared
object (no pybind11 in the image; flat C ABI + ctypes instead). Every
consumer has a pure-Python fallback, so the framework works without a
toolchain.
"""

from .build import load_library, native_available
from .page_allocator import NativePageIndex

__all__ = ["load_library", "native_available", "NativePageIndex"]
