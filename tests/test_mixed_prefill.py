"""Mixed prefill+decode step programs (POD-style serving steps).

The serialized scheduler (reference batch.py:120-221: at most one prefill
chunk, then a batched decode step) makes admission compete with decode
for dispatches — the measured round-5 operating curve was admission-bound
(docs/serving.md). forward_mixed_burst_paged runs the pending request's
prefill sub-chunks INSIDE the decode burst's scan, sharing each step's
projection/MLP weight stream. These tests pin (a) the mixed step's
numerics against the serialized schedule and (b) the scheduler
integration end-to-end.
"""

import numpy as np
import jax.numpy as jnp

from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from tiny_llm_tpu.serving import batch_generate
from .utils import FakeTokenizer


def _paged_model(params=None, cfg=None, key=11, num_pages=64, page_size=8):
    if cfg is None:
        cfg = tiny_test_config(num_hidden_layers=2)
    if params is None:
        params = random_params(cfg, key=key)
    m = Qwen3Model(params, cfg, max_seq_len=128)
    m.enable_paged_attention(num_pages=num_pages, page_size=page_size)
    return m


def test_mixed_burst_equals_serialized_schedule():
    """One mixed dispatch == (decode burst, then chunked prefill) run
    separately: same decode tokens for the live slot, same next-token
    logits for the pending request."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=3)
    prompt1 = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    prompt2 = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4, 5, 9, 0, 4, 5]
    steps = 4

    def run(mixed: bool):
        m = _paged_model(params, cfg)
        batch = m.create_batching_kv_cache(max_active_requests=2)
        c1 = m.create_kv_cache()
        lg = m(jnp.asarray([prompt1], jnp.int32), 0, c1, logits_to_keep=1)
        t0 = int(np.argmax(np.asarray(lg[0, -1], np.float32)))
        batch.add_request(c1, 0)
        c2 = m.create_kv_cache()
        first = np.asarray([t0, 0], np.int32)
        if mixed:
            assert m.supports_mixed
            toks, p_logit = m.mixed_burst(batch, first, steps, c2, prompt2)
            assert c2.offset == len(prompt2)
        else:
            toks = m.decode_burst(batch, first, steps)
            lg2 = None
            for off in range(0, len(prompt2), 8):
                lg2 = m(
                    jnp.asarray([prompt2[off : off + 8]], jnp.int32),
                    off, c2, logits_to_keep=1,
                )
            p_logit = np.asarray(lg2[0, -1], np.float32)
        return np.asarray(toks)[:, 0], np.asarray(p_logit, np.float32)

    t_ser, l_ser = run(mixed=False)
    t_mix, l_mix = run(mixed=True)
    assert list(t_ser) == list(t_mix), (t_ser, t_mix)
    assert int(np.argmax(l_ser)) == int(np.argmax(l_mix))
    np.testing.assert_allclose(l_ser, l_mix, rtol=2e-4, atol=2e-4)


def test_mixed_decode_rows_do_not_disturb_pending_context():
    """After a mixed burst, the pending request's cache must decode the
    same continuation as a request prefilled alone on a fresh pool (the
    mixed step's page writes for decode rows and prefill rows land in
    disjoint pages)."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=5)
    prompt1 = [9, 8, 7, 6, 5, 4, 3, 2]
    prompt2 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    steps, c = 3, 4

    # Reference: prompt2 alone, classic prefill + greedy continuation.
    m_ref = _paged_model(params, cfg)
    c_ref = m_ref.create_kv_cache()
    lg = m_ref(jnp.asarray([prompt2], jnp.int32), 0, c_ref, logits_to_keep=1)
    want = [int(np.argmax(np.asarray(lg[0, -1], np.float32)))]
    off = len(prompt2)
    for _ in range(3):
        lg = m_ref(
            jnp.asarray([[want[-1]]], jnp.int32), off, c_ref, logits_to_keep=1
        )
        want.append(int(np.argmax(np.asarray(lg[0, -1], np.float32))))
        off += 1

    # Mixed: prompt2 prefills inside a decode burst over prompt1's slot.
    m = _paged_model(params, cfg)
    batch = m.create_batching_kv_cache(max_active_requests=1)
    c1 = m.create_kv_cache()
    lg = m(jnp.asarray([prompt1], jnp.int32), 0, c1, logits_to_keep=1)
    t0 = int(np.argmax(np.asarray(lg[0, -1], np.float32)))
    batch.add_request(c1, 0)
    c2 = m.create_kv_cache()
    _, p_logit = m.mixed_burst(
        batch, np.asarray([t0], np.int32), steps, c2, prompt2
    )
    got = [int(np.argmax(p_logit))]
    off = len(prompt2)
    for _ in range(3):
        lg = m(jnp.asarray([[got[-1]]], jnp.int32), off, c2, logits_to_keep=1)
        got.append(int(np.argmax(np.asarray(lg[0, -1], np.float32))))
        off += 1
    assert got == want, (got, want)


PROMPTS = [
    "the quick brown fox jumps over the lazy dog again and again!",
    "pack my box with five dozen liquor jugs or more, said nobody",
    "sphinx of black quartz judge my vow while the band plays on..",
    "a very long prompt that keeps going and going for the mixer!!",
    "how vexingly quick daft zebras jump when the serving mixes up",
]


def test_mixed_serving_matches_classic_end_to_end():
    tok = FakeTokenizer()
    classic = batch_generate(
        _paged_model(), tok, PROMPTS, max_seq_len=96, batch_size=2,
        prefill_step=8, max_output_tokens=6, decode_burst=2,
    )
    model = _paged_model()
    calls = []
    orig = model.mixed_burst

    def spy(*a, **k):
        calls.append(len(a[4]))
        return orig(*a, **k)

    model.mixed_burst = spy
    mixed = batch_generate(
        model, tok, PROMPTS, max_seq_len=96, batch_size=2,
        prefill_step=8, max_output_tokens=6, decode_burst=2,
        mixed_prefill=True, mixed_chunk=4,
    )
    assert calls, "mixed path never engaged"
    assert all(n == 8 for n in calls)  # decode_burst * mixed_chunk
    assert dict(mixed) == dict(classic)
    assert model.page_pool.live_pages == 0


def test_mixed_serving_with_sampler_is_reproducible():
    """temp > 0: the mixed path threads the decode rng and the pending
    request's rng exactly like the classic path — two mixed runs with
    the same seed agree."""
    tok = FakeTokenizer()

    def run():
        model = _paged_model(key=13)
        return batch_generate(
            model, tok, PROMPTS[:3], max_seq_len=96, batch_size=2,
            prefill_step=8, max_output_tokens=5, decode_burst=2,
            mixed_prefill=True, mixed_chunk=4, temp=0.8, top_k=8, seed=7,
        )

    assert run() == run()


def test_mixed_falls_back_when_unsupported():
    """Dense (non-paged) serving with mixed_prefill=True must silently
    keep the classic schedule (supports_mixed is False without a pool)."""
    tok = FakeTokenizer()
    cfg = tiny_test_config(num_hidden_layers=2)
    model = Qwen3Model(random_params(cfg, key=2), cfg, max_seq_len=128)
    assert not model.supports_mixed
    classic = batch_generate(
        model, tok, PROMPTS[:3], max_seq_len=96, batch_size=2,
        prefill_step=8, max_output_tokens=4,
    )
    model2 = Qwen3Model(random_params(cfg, key=2), cfg, max_seq_len=128)
    mixed = batch_generate(
        model2, tok, PROMPTS[:3], max_seq_len=96, batch_size=2,
        prefill_step=8, max_output_tokens=4,
        mixed_prefill=True, mixed_chunk=4,
    )
    assert dict(mixed) == dict(classic)
