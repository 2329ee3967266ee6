"""ctypes wrapper over the native page allocator (csrc/page_allocator.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from .build import load_library


class NativePageIndex:
    """Free-list + per-request page bookkeeping + block-table assembly.

    Same semantics as the Python structures in kv/paged.py (page 0 =
    trash, whole-page rewind). One instance backs one PagePool.
    """

    def __init__(self, num_pages: int):
        lib = load_library("page_allocator")
        if lib is None:
            raise RuntimeError("native page_allocator unavailable")
        self._lib = lib
        self._configure(lib)
        self._h = lib.pa_create(num_pages)
        self.num_pages = num_pages

    @staticmethod
    def _configure(lib) -> None:
        if getattr(lib, "_tlt_configured", False):
            return
        lib.pa_create.restype = ctypes.c_void_p
        lib.pa_create.argtypes = [ctypes.c_int32]
        lib.pa_destroy.argtypes = [ctypes.c_void_p]
        lib.pa_alloc.restype = ctypes.c_int32
        lib.pa_alloc.argtypes = [ctypes.c_void_p]
        lib.pa_free.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pa_free_count.restype = ctypes.c_int32
        lib.pa_free_count.argtypes = [ctypes.c_void_p]
        lib.pa_reused_count.restype = ctypes.c_int64
        lib.pa_reused_count.argtypes = [ctypes.c_void_p]
        lib.pa_request_create.restype = ctypes.c_int32
        lib.pa_request_create.argtypes = [ctypes.c_void_p]
        lib.pa_request_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pa_request_ensure.restype = ctypes.c_int32
        lib.pa_request_ensure.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
        lib.pa_request_advance.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 2
        lib.pa_request_rewind.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
        lib.pa_request_offset.restype = ctypes.c_int32
        lib.pa_request_offset.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pa_request_num_pages.restype = ctypes.c_int32
        lib.pa_request_num_pages.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pa_fill_block_table.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib._tlt_configured = True

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pa_destroy(h)
            self._h = None

    # -- pool ----------------------------------------------------------------
    @property
    def free_pages(self) -> int:
        return int(self._lib.pa_free_count(self._h))

    @property
    def reused_page_allocations(self) -> int:
        return int(self._lib.pa_reused_count(self._h))

    def allocate_page(self) -> int:
        p = int(self._lib.pa_alloc(self._h))
        if p < 0:
            from ..kv.paged import PoolExhausted

            raise PoolExhausted(f"page pool exhausted ({self.num_pages} pages)")
        return p

    def free_page(self, page: int) -> None:
        self._lib.pa_free(self._h, page)

    # -- requests ------------------------------------------------------------
    def request_create(self) -> int:
        return int(self._lib.pa_request_create(self._h))

    def request_release(self, req: int) -> None:
        self._lib.pa_request_release(self._h, req)

    def request_ensure(self, req: int, new_offset: int, page_size: int) -> None:
        if self._lib.pa_request_ensure(self._h, req, new_offset, page_size) < 0:
            from ..kv.paged import PoolExhausted

            raise PoolExhausted(f"page pool exhausted ({self.num_pages} pages)")

    def request_advance(self, req: int, n: int) -> None:
        self._lib.pa_request_advance(self._h, req, n)

    def request_rewind(self, req: int, n: int, page_size: int) -> None:
        self._lib.pa_request_rewind(self._h, req, n, page_size)

    def request_offset(self, req: int) -> int:
        return int(self._lib.pa_request_offset(self._h, req))

    def request_num_pages(self, req: int) -> int:
        return int(self._lib.pa_request_num_pages(self._h, req))

    def block_table(self, reqs: list[int], width: int) -> np.ndarray:
        """Assemble the -1-padded [len(reqs), width] block table natively.
        reqs entries < 0 mark idle slots."""
        arr = np.asarray(reqs, dtype=np.int32)
        out = np.empty((len(reqs), width), dtype=np.int32)
        self._lib.pa_fill_block_table(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(reqs),
            width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
