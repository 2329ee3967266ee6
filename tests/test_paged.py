"""Paged KV tests: pool invariants, paged-vs-dense equivalence, serving.

Mirrors the reference's week-3 strategy: paged cache vs full cache
contents incl. rewind (test_week_3_day_3.py:106-127,228-255), paged
attention vs dense grouped attention across non-contiguous pages
(test_week_3_day_5.py:24-61), and token-by-token paged-vs-dense model
equality (test_week_3_day_3.py:305-321).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.kv import PagePool, PagedBatchingKVCache, PagedKVCache
from tiny_llm_tpu.kernels.paged_attention import gather_pages_dense, paged_attention
from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from tiny_llm_tpu.ops import scaled_dot_product_attention_grouped
from tiny_llm_tpu.serving import batch_generate
from tiny_llm_tpu.generate import simple_generate_with_kv_cache
from .utils import FakeTokenizer, assert_allclose


def make_pool(num_pages=9, layers=1, heads=2, ps=8, d=64):
    return PagePool(layers, num_pages, heads, ps, d)


class TestPool:
    def test_trash_page_reserved(self):
        pool = make_pool(num_pages=4)
        ids = [pool.allocate_page() for _ in range(3)]
        assert 0 not in ids
        with pytest.raises(RuntimeError):
            pool.allocate_page()

    def test_free_and_reuse_counter(self):
        pool = make_pool(num_pages=4)
        a = pool.allocate_page()
        pool.free_page(a)
        b = pool.allocate_page()
        assert b == a
        assert pool.reused_page_allocations == 1

    def test_live_pages(self):
        pool = make_pool(num_pages=5)
        assert pool.live_pages == 0
        pool.allocate_page()
        assert pool.live_pages == 1


class TestPagedCache:
    def test_capacity_and_advance(self):
        pool = make_pool(num_pages=9, ps=8)
        c = PagedKVCache(pool)
        c.ensure_capacity(20)  # 3 pages of 8
        assert c.num_pages == 3
        c.advance(20)
        assert c.offset == 20

    def test_rewind_frees_whole_pages(self):
        pool = make_pool(num_pages=9, ps=8)
        c = PagedKVCache(pool)
        c.ensure_capacity(20)
        c.advance(20)
        free_before = pool.free_pages
        c.rewind(3)  # 17 tokens -> still 3 pages
        assert c.num_pages == 3 and pool.free_pages == free_before
        c.rewind(9)  # 8 tokens -> 1 page
        assert c.num_pages == 1 and pool.free_pages == free_before + 2
        assert c.offset == 8

    def test_release_returns_pages(self):
        pool = make_pool(num_pages=9, ps=8)
        c = PagedKVCache(pool)
        c.ensure_capacity(30)
        c.release()
        assert pool.free_pages == 8
        c.release()  # idempotent
        assert pool.free_pages == 8


def test_paged_attention_xla_vs_dense_noncontiguous_pages():
    """Logical KV scattered across non-contiguous pages must equal dense
    grouped SDPA on the packed equivalent."""
    Hq, Hkv, ps, D = 4, 2, 8, 64
    P = 9
    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.float32)
    # Request 0: pages [5, 2, 7], 19 tokens; request 1: pages [1, 4], 10.
    table = jnp.asarray([[5, 2, 7], [1, 4, -1]], jnp.int32)
    lens = jnp.asarray([19, 10], jnp.int32)
    L = 3
    q = jnp.asarray(rng.normal(size=(2, Hq, L, D)), jnp.float32)

    got = paged_attention(q, kp, vp, table, lens, impl="xla")

    k_dense, v_dense = gather_pages_dense(kp, vp, table)
    for b in range(2):
        n = int(lens[b])
        kb = k_dense[b : b + 1, :, :n]
        vb = v_dense[b : b + 1, :, :n]
        from tiny_llm_tpu.ops import causal_mask

        expected = scaled_dot_product_attention_grouped(
            q[b : b + 1], kb, vb, mask=causal_mask(L, n)
        )
        assert_allclose(got[b], expected[0], jnp.bfloat16, atol=2e-2,
                        message=f"row {b}")


@pytest.fixture(scope="module")
def paired_models():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=0, quantized=True)
    dense = Qwen3Model(params, cfg, max_seq_len=128)
    paged = Qwen3Model(params, cfg, max_seq_len=128).enable_paged_attention(
        num_pages=33, page_size=8
    )
    return dense, paged


def test_paged_model_matches_dense_model(paired_models):
    """Token-by-token logit equality between the paged and dense paths."""
    dense, paged = paired_models
    ids = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    tokens = jnp.asarray([ids], jnp.int32)

    dc = dense.create_kv_cache()
    pc = paged.create_kv_cache()
    assert isinstance(pc, PagedKVCache)
    ld = np.asarray(dense(tokens[:, :6], 0, dc, logits_to_keep=1), np.float32)
    lp = np.asarray(paged(tokens[:, :6], 0, pc, logits_to_keep=1), np.float32)
    assert_allclose(lp, ld, jnp.bfloat16, atol=5e-2, message="prefill")
    for i in range(6, len(ids)):
        ld = np.asarray(
            dense(tokens[:, i : i + 1], i, dc, logits_to_keep=1), np.float32
        )
        lp = np.asarray(
            paged(tokens[:, i : i + 1], i, pc, logits_to_keep=1), np.float32
        )
        assert_allclose(lp, ld, jnp.bfloat16, atol=5e-2, message=f"step {i}")
    pc.release()


def test_paged_rewind_matches_dense(paired_models):
    dense, paged = paired_models
    ids = [3, 1, 4, 1, 5, 9]
    tokens = jnp.asarray([ids], jnp.int32)
    pc = paged.create_kv_cache()
    paged(tokens, 0, pc)
    step = jnp.asarray([[7]], jnp.int32)
    first = np.asarray(paged(step, 6, pc, logits_to_keep=1), np.float32)
    pc.rewind(1)
    again = np.asarray(paged(step, 6, pc, logits_to_keep=1), np.float32)
    np.testing.assert_allclose(first, again, rtol=1e-5)
    pc.release()


def test_paged_batching_matches_single(paired_models):
    dense, paged = paired_models
    a, b = [3, 1, 4, 1, 5], [9, 2, 6]
    # Singles.
    ca = paged.create_kv_cache()
    paged(jnp.asarray([a]), 0, ca)
    la = np.asarray(paged(jnp.asarray([[7]]), 5, ca, logits_to_keep=1), np.float32)
    ca.release()
    cb = paged.create_kv_cache()
    paged(jnp.asarray([b]), 0, cb)
    lb = np.asarray(paged(jnp.asarray([[8]]), 3, cb, logits_to_keep=1), np.float32)
    cb.release()
    # Batch.
    batch = paged.create_batching_kv_cache(max_active_requests=3)
    assert isinstance(batch, PagedBatchingKVCache)
    ca2 = paged.create_kv_cache()
    paged(jnp.asarray([a]), 0, ca2)
    cb2 = paged.create_kv_cache()
    paged(jnp.asarray([b]), 0, cb2)
    batch.add_request(ca2, 0)
    batch.add_request(cb2, 2)  # non-contiguous slot on purpose
    out = paged(
        jnp.asarray([[7], [0], [8]]), [5, 0, 3], batch, logits_to_keep=1
    )
    out = np.asarray(out, np.float32)
    assert_allclose(out[0, 0], la[0, 0], jnp.bfloat16, atol=5e-2)
    assert_allclose(out[2, 0], lb[0, 0], jnp.bfloat16, atol=5e-2)
    batch.release()


def test_paged_serving_end_to_end(paired_models):
    """Continuous batching over the paged pool must reproduce the
    single-request greedy outputs, and return all pages afterwards."""
    dense, paged = paired_models
    tok = FakeTokenizer()
    prompts = ["hello world", "abc", "the quick brown fox", "x"]
    singles = [
        simple_generate_with_kv_cache(paged, tok, p, max_tokens=6)
        for p in prompts
    ]
    live_before = paged.page_pool.live_pages
    results = batch_generate(
        paged, tok, prompts, max_seq_len=48, batch_size=2, prefill_step=4,
        max_output_tokens=6,
    )
    assert paged.page_pool.live_pages == live_before  # no page leaks
    assert sorted(r[0] for r in results) == [0, 1, 2, 3]
    by_idx = dict(results)
    for i, p in enumerate(prompts):
        assert by_idx[i] == singles[i], (i, by_idx[i], singles[i])


def test_decode_burst_matches_stepwise(paired_models):
    """The K-step fused decode burst must produce the same outputs as
    per-step scheduling (modulo nothing — greedy is deterministic)."""
    dense, paged = paired_models
    tok = FakeTokenizer()
    prompts = ["hello world", "abc", "the quick brown fox"]
    step_results = batch_generate(
        paged, tok, prompts, max_seq_len=64, batch_size=2, prefill_step=8,
        max_output_tokens=7, decode_burst=1,
    )
    burst_results = batch_generate(
        paged, tok, prompts, max_seq_len=64, batch_size=2, prefill_step=8,
        max_output_tokens=7, decode_burst=4,
    )
    assert dict(step_results) == dict(burst_results)
    assert paged.page_pool.live_pages == 0


class TestStripedPool:
    """Sequence-sharded pool allocation (SP paged decode): pages balance
    across per-shard ranges so every request's context spreads evenly."""

    def test_allocations_balance_across_shards(self):
        pool = PagePool(1, 16, 2, 8, 64, stripe_shards=4)
        pages = [pool.allocate_page() for _ in range(8)]
        shard_of = [p // 4 for p in pages]
        # Every shard got exactly 2 of the first 8 pages.
        assert sorted(shard_of) == [0, 0, 1, 1, 2, 2, 3, 3]
        assert 0 not in pages  # trash page never allocated

    def test_free_returns_to_owning_shard(self):
        pool = PagePool(1, 16, 2, 8, 64, stripe_shards=4)
        pages = [pool.allocate_page() for _ in range(8)]
        before = pool.free_pages
        for p in pages:
            pool.free_page(p)
        assert pool.free_pages == before + 8
        # Re-allocation still balances and reuses.
        again = [pool.allocate_page() for _ in range(8)]
        assert sorted(p // 4 for p in again) == [0, 0, 1, 1, 2, 2, 3, 3]
        assert pool.reused_page_allocations >= 8

    def test_exhaustion_raises(self):
        pool = PagePool(1, 8, 2, 8, 64, stripe_shards=2)
        for _ in range(7):  # 8 pages minus the trash page
            pool.allocate_page()
        with pytest.raises(RuntimeError):
            pool.allocate_page()

    def test_reset_restores_striping(self):
        pool = PagePool(1, 16, 2, 8, 64, stripe_shards=4)
        [pool.allocate_page() for _ in range(8)]
        pool.reset()
        assert pool.free_pages == 15
        pages = [pool.allocate_page() for _ in range(4)]
        assert sorted(p // 4 for p in pages) == [0, 1, 2, 3]

    def test_striped_pool_serves_paged_cache(self):
        pool = PagePool(2, 16, 2, 8, 64, stripe_shards=4)
        c = PagedKVCache(pool)
        c.ensure_capacity(30)  # 4 pages
        assert c.num_pages == 4
        assert sorted(p // 4 for p in c.page_ids) == [0, 1, 2, 3]
        c.release()
        assert pool.free_pages == 15


def test_scan_scope_dispatch_schedule_selection(monkeypatch):
    """Paged-decode schedule selection: gather for single-step
    dispatches, the whole-page BlockSpec walk (pages) inside scan
    bursts (the gather probabilistically faults the relay's TPU worker
    under scan — see the dispatch note), the per-(page, head) walk for
    odd head dims, TLT_PAGED_DECODE_SCAN overriding scan scope only,
    and TLT_PAGED_DECODE overriding everywhere."""
    import numpy as np

    from tiny_llm_tpu.kernels import paged_attention_pallas as pap

    calls = []
    monkeypatch.setattr(
        pap, "paged_flash_decode_gather",
        lambda *a, **k: calls.append("gather") or jnp.zeros((1, 4, 1, 128)),
    )
    monkeypatch.setattr(
        pap, "paged_flash_decode_pages",
        lambda *a, **k: calls.append("pages") or jnp.zeros((1, 4, 1, 128)),
    )
    monkeypatch.setattr(
        pap, "paged_flash_decode",
        lambda *a, **k: calls.append("walk") or jnp.zeros((1, 4, 1, 128)),
    )
    q = jnp.zeros((1, 4, 1, 128), jnp.bfloat16)
    kp = jnp.zeros((4, 2, 8, 128), jnp.bfloat16)
    table = jnp.asarray([[1, 2]], jnp.int32)
    lens = jnp.asarray([5], jnp.int32)

    pap.paged_attention_pallas(q, kp, kp, table, lens)
    assert calls[-1] == "gather"  # single-step: the 769 GB/s path
    with pap.scan_scope():
        pap.paged_attention_pallas(q, kp, kp, table, lens)
        assert calls[-1] == "pages"  # scan-safe fast schedule
        monkeypatch.setenv("TLT_PAGED_DECODE_SCAN", "gather")
        pap.paged_attention_pallas(q, kp, kp, table, lens)
        assert calls[-1] == "gather"  # re-test hatch after relay updates
        monkeypatch.setenv("TLT_PAGED_DECODE_SCAN", "walk")
        pap.paged_attention_pallas(q, kp, kp, table, lens)
        assert calls[-1] == "walk"
        monkeypatch.delenv("TLT_PAGED_DECODE_SCAN")
        monkeypatch.setenv("TLT_PAGED_DECODE", "walk")
        pap.paged_attention_pallas(q, kp, kp, table, lens)
        assert calls[-1] == "walk"  # global override reaches scan scope
        monkeypatch.delenv("TLT_PAGED_DECODE")
    monkeypatch.setenv("TLT_PAGED_DECODE_SCAN", "walk")
    pap.paged_attention_pallas(q, kp, kp, table, lens)
    assert calls[-1] == "gather"  # scan hatch is inert outside scan scope
    monkeypatch.delenv("TLT_PAGED_DECODE_SCAN")
    monkeypatch.setenv("TLT_PAGED_DECODE", "pages")
    pap.paged_attention_pallas(q, kp, kp, table, lens)
    assert calls[-1] == "pages"
    monkeypatch.delenv("TLT_PAGED_DECODE")
    # Odd head dim: only the per-(page, head) walk handles D % 128 != 0.
    q64 = jnp.zeros((1, 4, 1, 64), jnp.bfloat16)
    kp64 = jnp.zeros((4, 2, 8, 64), jnp.bfloat16)
    pap.paged_attention_pallas(q64, kp64, kp64, table, lens)
    assert calls[-1] == "walk"


def test_paged_decode_pages_kernel_matches_oracle():
    """Interpret-mode correctness of the whole-page decode kernel vs
    the XLA paged-attention oracle: ragged lens, dead (-1) table slots,
    GQA grouping."""
    import numpy as np

    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.kernels.paged_attention_pallas import (
        paged_flash_decode_pages,
    )

    rng = np.random.default_rng(11)
    P, Hkv, ps, D, B, Hq = 8, 2, 8, 128, 2, 4
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.bfloat16)
    table = jnp.asarray([[3, 1, 6, -1], [5, 2, -1, -1]], jnp.int32)
    lens = jnp.asarray([3 * ps - 3, ps + 5], jnp.int32)
    got = paged_flash_decode_pages(
        q, kp, vp, table, lens, scale=D**-0.5, interpret=True
    )
    want = paged_attention(q, kp, vp, table, lens, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.02, rtol=0.02,
    )
