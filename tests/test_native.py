"""Native C++ page allocator: availability + exact parity with the
Python bookkeeping (same free-list order, counters, block tables)."""

import numpy as np
import pytest

from tiny_llm_tpu.kv.paged import PagePool
from tiny_llm_tpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def make_pools(n=10):
    kw = dict(num_layers=1, num_pages=n, num_kv_heads=1, page_size=8, head_dim=64)
    return PagePool(native=True, **kw), PagePool(native=False, **kw)


def test_native_pool_is_used_by_default():
    pool = PagePool(1, 4, 1, 8, 64)
    assert pool.native_index is not None


def test_allocation_order_matches_python():
    nat, py = make_pools()
    seq_n = [nat.allocate_page() for _ in range(9)]
    seq_p = [py.allocate_page() for _ in range(9)]
    assert seq_n == seq_p
    assert 0 not in seq_n  # trash page reserved in both
    with pytest.raises(RuntimeError):
        nat.allocate_page()
    with pytest.raises(RuntimeError):
        py.allocate_page()


def test_free_reuse_parity():
    nat, py = make_pools()
    for pool in (nat, py):
        a = pool.allocate_page()
        b = pool.allocate_page()
        pool.free_page(a)
        pool.free_page(b)
        c = pool.allocate_page()
        assert c == b  # LIFO
        assert pool.reused_page_allocations == 1
        assert pool.free_pages == 8
        assert pool.live_pages == 1


def test_request_lifecycle_parity():
    from tiny_llm_tpu.kv.paged import PagedKVCache

    nat, py = make_pools(n=20)
    for pool in (nat, py):
        c = PagedKVCache(pool)
        c.ensure_capacity(20)  # 3 pages of 8
        c.advance(20)
        assert (c.num_pages, c.offset) == (3, 20)
        c.rewind(13)  # 7 tokens -> 1 page
        assert (c.num_pages, c.offset) == (1, 7)
        row = c.block_table_row(4)
        assert row[0] >= 1 and row[1:] == [-1, -1, -1]
        c.release()
        assert pool.live_pages == 0


def test_batch_block_table_parity():
    from tiny_llm_tpu.kv.paged import PagedBatchingKVCache, PagedKVCache

    nat, py = make_pools(n=20)
    tables = []
    for pool in (nat, py):
        batch = PagedBatchingKVCache(pool, 3)
        a = PagedKVCache(pool)
        a.ensure_capacity(10)
        a.advance(10)
        b = PagedKVCache(pool)
        b.ensure_capacity(3)
        b.advance(3)
        batch.add_request(a, 0)
        batch.add_request(b, 2)
        tables.append(batch.block_table(4))
    np.testing.assert_array_equal(tables[0], tables[1])
    assert tables[0][1].tolist() == [-1, -1, -1, -1]  # idle slot
