"""Dense cache unit semantics, dense-path continuous batching, metrics,
and generation-loop behaviors (filling out the reference suite's week-2
/ week-3 day-1 coverage)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.kv import BatchingKVCache, DenseKVCache
from tiny_llm_tpu.kv.cache import bucket_for
from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from tiny_llm_tpu.serving import ServingMetrics, batch_generate
from tiny_llm_tpu.generate import simple_generate_with_kv_cache
from tiny_llm_tpu.ops import make_sampler
from .utils import FakeTokenizer


def test_bucket_for():
    assert bucket_for(1) == 128
    assert bucket_for(128) == 128
    assert bucket_for(129) == 256
    assert bucket_for(1000, maximum=512) == 512
    assert bucket_for(5, minimum=2) == 8


class TestDenseCache:
    def test_offsets_and_rewind(self):
        c = DenseKVCache(2, 1, 1, 32, 8)
        assert c.offset == 0
        c.update_tensors(c.keys, c.values, 10)
        assert c.offset == 10
        c.rewind(4)
        assert c.offset == 6
        with pytest.raises(AssertionError):
            c.rewind(7)

    def test_release_drops_buffers(self):
        c = DenseKVCache(1, 1, 1, 16, 8)
        c.release()
        assert c.keys is None

    def test_batching_slots(self):
        b = BatchingKVCache(1, 3, 1, 32, 8)
        src = DenseKVCache(1, 1, 1, 32, 8)
        src.update_tensors(src.keys, src.values, 5)
        b.add_request(src, 1)
        assert b.offsets[1] == 5 and b.active[1]
        with pytest.raises(ValueError):
            b.add_request(src, 99)
        b.remove_request(1)
        assert not b.active[1]
        with pytest.raises(ValueError):
            b.remove_request(1)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(num_hidden_layers=2)
    return Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=96)


def test_dense_path_continuous_batching(model):
    """The scheduler over the DENSE BatchingKVCache (week-3 day-1 path)
    must match single-request greedy outputs."""
    tok = FakeTokenizer()
    prompts = ["hello world", "abc def", "xyz"]
    singles = [
        simple_generate_with_kv_cache(model, tok, p, max_tokens=5)
        for p in prompts
    ]
    metrics = ServingMetrics()
    results = batch_generate(
        model, tok, prompts, max_seq_len=48, batch_size=2, prefill_step=8,
        max_output_tokens=5, metrics=metrics,
    )
    assert dict(results) == {i: s for i, s in enumerate(singles)}
    assert metrics.requests_completed == 3
    assert metrics.output_tokens == sum(len(tok.encode(s)) for s in singles)
    assert metrics.prefill_tokens == sum(len(tok.encode(p)) for p in prompts)
    assert metrics.peak_active_requests <= 2
    # Latency ledger: every request that emitted a token has a TTFT
    # sample; TTFT <= end-to-end latency; arrival-based TTFT includes
    # queueing so it dominates the admission-based one.
    assert len(metrics.ttft_ms) == 3
    assert len(metrics.admission_ttft_ms) == 3
    assert len(metrics.request_latency_ms) == 3
    for ttft, adm, lat in zip(
        sorted(metrics.ttft_ms),
        sorted(metrics.admission_ttft_ms),
        sorted(metrics.request_latency_ms),
    ):
        assert 0 <= adm <= ttft <= lat
    d = metrics.as_dict()
    assert d["ttft_p50_ms"] <= d["ttft_p95_ms"] <= d["ttft_max_ms"]
    assert d["request_latency_p50_ms"] <= d["request_latency_p95_ms"]


def test_scheduler_eviction_at_max_seq(model):
    tok = FakeTokenizer()
    results = batch_generate(
        model, tok, ["hello"], max_seq_len=10, batch_size=1, prefill_step=8,
    )
    # Prompt is 5 tokens; the prefill token doesn't advance the offset, so
    # eviction at offset >= 10 allows at most 6 outputs.
    assert len(tok.encode(results[0][1])) <= 6


def test_scheduler_handles_more_prompts_than_slots(model):
    tok = FakeTokenizer()
    prompts = [f"prompt {i}" for i in range(7)]
    results = batch_generate(
        model, tok, prompts, max_seq_len=48, batch_size=2, prefill_step=8,
        max_output_tokens=3,
    )
    assert sorted(r[0] for r in results) == list(range(7))


def test_generation_on_token_stream_and_max_tokens(model):
    tok = FakeTokenizer()
    seen = []
    out = simple_generate_with_kv_cache(
        model, tok, "stream me", max_tokens=4, on_token=seen.append
    )
    assert len(tok.encode(out)) <= 4
    assert seen and seen[-1] == out
    # streaming callbacks are cumulative prefixes
    for a, b in zip(seen, seen[1:]):
        assert b.startswith(a)


def test_generation_sampler_reproducible(model):
    tok = FakeTokenizer()
    sampler = make_sampler(0.9, top_k=8)
    a = simple_generate_with_kv_cache(
        model, tok, "sample", sampler=sampler, max_tokens=5, seed=7
    )
    b = simple_generate_with_kv_cache(
        model, tok, "sample", sampler=sampler, max_tokens=5, seed=7
    )
    c = simple_generate_with_kv_cache(
        model, tok, "sample", sampler=sampler, max_tokens=5, seed=8
    )
    assert a == b
    assert isinstance(c, str)  # different seed may differ; must not crash


def test_serving_metrics_dict():
    m = ServingMetrics()
    m.observe_step(3)
    m.observe_step(1)
    m.requests_completed = 2
    m.output_tokens = 10
    m.wall_s = 2.0
    d = m.as_dict()
    assert d["mean_batch_occupancy"] == 2.0
    assert d["output_tok_s"] == 5.0
    assert d["req_s"] == 1.0
    # Structural-zero ledger columns are present (and zero).
    assert d["growth_copy_bytes"] == 0
    assert d["staging_copy_bytes"] == 0


# ---------------------------------------------------------------------------
# Idle-slot invariance: an installed request's logits must not depend on
# whether OTHER batch slots are idle or occupied. (Round-4 lesson: idle
# slots legitimately compute discarded garbage — different per code path
# — so parity/equality checks must compare INSTALLED rows only; this
# test pins the property those checks rely on, for both the dense and
# paged batched decode paths.)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("paged", [False, True])
def test_idle_slot_invariance(paged):
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=9, quantized=True)

    def build():
        m = Qwen3Model(params, cfg, max_seq_len=64)
        if paged:
            m.enable_paged_attention(num_pages=24, page_size=8)
        return m

    prompt = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)

    def decode_row(with_neighbor: bool):
        model = build()
        batch = model.create_batching_kv_cache(max_active_requests=2)
        c = model.create_kv_cache()
        lg = model(prompt, 0, c, logits_to_keep=1)
        tok = int(np.asarray(
            jnp.argmax(lg[:, -1].astype(jnp.float32), -1))[0])
        batch.add_request(c, 0)
        off = prompt.shape[1]
        neighbor_off = 0
        if with_neighbor:
            n = model.create_kv_cache()
            nprompt = jnp.asarray([[7, 7, 7]], jnp.int32)
            model(nprompt, 0, n, logits_to_keep=1)
            batch.add_request(n, 1)
            neighbor_off = 3
        toks = [tok]
        for i in range(5):
            t = jnp.asarray([[toks[-1]], [0]], jnp.int32)
            lg = model(t, [off + i, neighbor_off + i], batch,
                       logits_to_keep=1)
            toks.append(int(np.asarray(
                jnp.argmax(lg[0, -1].astype(jnp.float32), -1))))
        return toks

    alone = decode_row(with_neighbor=False)
    with_other = decode_row(with_neighbor=True)
    assert alone == with_other, (alone, with_other)


# ---------------------------------------------------------------------------
# Pool backpressure: admission defers (not crashes) when the page pool is
# momentarily full, and still fails loudly when the pool can never fit
# the prompt. (Round-4: Request() reserves the prompt's full page span
# at admission; an undersized-but-workable pool used to raise out of
# batch_generate and LOSE the popped prompt.)
# ---------------------------------------------------------------------------


def _paged_model(num_pages, page_size=8):
    cfg = tiny_test_config(num_hidden_layers=2)
    m = Qwen3Model(random_params(cfg, key=4), cfg, max_seq_len=64)
    m.enable_paged_attention(num_pages=num_pages, page_size=page_size)
    return m


def test_pool_backpressure_defers_admission():
    """A pool sized for ~1.5 concurrent requests serves 4 prompts to
    completion (admission waits for retirements) and matches
    single-request outputs."""
    tok = FakeTokenizer()
    # ~26-30 chars = 4 pages per request at ps=8 (plus decode slack):
    # two concurrent requests need 8+, the pool below holds 5 usable.
    prompts = [
        "hello world this is request A",
        "abc def ghi jkl mno pqr stu",
        "xyz uvw rst opq lmn ijk fgh",
        "one two three four five six!",
    ]
    singles = []
    for p in prompts:
        m = _paged_model(num_pages=32)
        singles.append(simple_generate_with_kv_cache(m, tok, p, max_tokens=4))
    model = _paged_model(num_pages=6)
    results = batch_generate(
        model, tok, prompts, max_seq_len=48, batch_size=2, prefill_step=8,
        max_output_tokens=4,
    )
    assert dict(results) == {i: s for i, s in enumerate(singles)}
    assert model.page_pool.live_pages == 0  # everything released


# ---------------------------------------------------------------------------
# Open-loop arrivals (round-5, VERDICT r4 weak #4): requests enter the
# pending queue at stamped times; TTFT responds to offered load instead
# of batch-division arithmetic.
# ---------------------------------------------------------------------------


def test_open_loop_arrivals_gate_admission():
    """With arrivals [0, 5] s (fake clock: time only advances when the
    scheduler sleeps), the two requests must never overlap — the second
    is admitted only after the idle wait walks the clock to its arrival.
    Outputs must equal the offline campaign's."""
    import tiny_llm_tpu.serving.batch as batch_mod
    from tiny_llm_tpu.serving import ServingMetrics

    clock = [0.0]

    class FakeTime:
        monotonic = staticmethod(lambda: clock[0])
        sleep = staticmethod(lambda dt: clock.__setitem__(0, clock[0] + dt))

    tok = FakeTokenizer()
    offline = batch_generate(
        _paged_model(num_pages=32), tok, ["hello world", "abc def"],
        max_seq_len=48, batch_size=2, prefill_step=8, max_output_tokens=3,
    )
    real_time, batch_mod.time = batch_mod.time, FakeTime
    try:
        m = ServingMetrics(pool_capacity_pages=32, page_size=8)
        open_loop = batch_generate(
            _paged_model(num_pages=32), tok, ["hello world", "abc def"],
            max_seq_len=48, batch_size=2, prefill_step=8, max_output_tokens=3,
            metrics=m, arrival_times=[0.0, 5.0],
        )
    finally:
        batch_mod.time = real_time
    assert dict(open_loop) == dict(offline)
    assert clock[0] >= 5.0  # the scheduler actually idled to the arrival
    assert m.peak_active_requests == 1  # never concurrent


def test_open_loop_arrival_validation():
    tok = FakeTokenizer()
    model = _paged_model(num_pages=16)
    with pytest.raises(ValueError, match="match prompts"):
        batch_generate(model, tok, ["a", "b"], arrival_times=[0.0])
    with pytest.raises(ValueError, match="non-decreasing"):
        batch_generate(model, tok, ["a", "b"], arrival_times=[1.0, 0.5])


def test_every_exhaustion_path_raises_pool_exhausted_type():
    """All four allocate_page backends (flat Python, SP-striped,
    DP-striped, native C++) must raise PoolExhausted — the scheduler's
    backpressure catches the type, so any path raising a bare
    RuntimeError would crash batch_generate instead of deferring."""
    from tiny_llm_tpu.kv.paged import PagePool, PoolExhausted

    def drain(pool, **kw):
        with pytest.raises(PoolExhausted):
            for _ in range(pool.num_pages + 1):
                pool.allocate_page(**kw)

    common = dict(num_layers=1, num_pages=8, num_kv_heads=2, page_size=8,
                  head_dim=16)
    drain(PagePool(**common, native=False))
    drain(PagePool(**common, stripe_shards=2))
    drain(PagePool(**common, dp_shards=2), shard=0)
    try:
        native_pool = PagePool(**common, native=True)
    except Exception:
        pytest.skip("native allocator unavailable")
    drain(native_pool)
    # The native RESERVATION path (request_ensure — what Request() hits
    # at admission) must raise the same type, not a bare RuntimeError:
    # it bypasses allocate_page entirely (csrc/page_allocator.cpp).
    from tiny_llm_tpu.kv.paged import PagedKVCache

    pool2 = PagePool(**common, native=True)
    cache = PagedKVCache(pool2)
    with pytest.raises(PoolExhausted):
        cache.ensure_capacity(pool2.num_pages * 8 * 2)
    cache.release()


def test_pool_too_small_for_any_prompt_raises():
    tok = FakeTokenizer()
    model = _paged_model(num_pages=2)  # 1 usable page = 8 tokens
    with pytest.raises(RuntimeError, match="size the pool"):
        batch_generate(
            model, tok, ["this prompt needs more than one page for sure"],
            max_seq_len=48, batch_size=2, prefill_step=8,
            max_output_tokens=4,
        )
