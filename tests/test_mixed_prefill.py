"""Mixed prefill+decode step programs (POD-style serving steps).

The serialized scheduler (reference batch.py:120-221: at most one prefill
chunk, then a batched decode step) makes admission compete with decode
for dispatches — the measured round-5 operating curve was admission-bound
(docs/serving.md). forward_mixed_burst_paged runs prefill sub-chunks of
queued prompts INSIDE the decode burst's scan, sharing each step's
projection/MLP weight stream; the per-step schedule streams several
prompts back-to-back through one burst. These tests pin (a) the mixed
step's numerics against the serialized schedule and (b) the scheduler
integration end-to-end.
"""

import numpy as np
import jax.numpy as jnp

from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from tiny_llm_tpu.models.qwen3 import MixedStep
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


def _chunk_schedule(cache, tokens, chunk, steps, start_step=0):
    """Schedule `tokens` as consecutive `chunk`-sized sub-chunks starting
    at burst step `start_step` (the last sub-chunk may be short)."""
    sched = [None] * steps
    off = 0
    t = start_step
    while off < len(tokens):
        r = min(chunk, len(tokens) - off)
        sched[t] = MixedStep(cache=cache, tokens=tokens[off : off + r], offset=off)
        off += r
        t += 1
    return sched, t - 1  # schedule, step index of the completing sub-chunk


def test_mixed_burst_equals_serialized_schedule():
    """One mixed dispatch == (decode burst, then chunked prefill) run
    separately: same decode tokens for the live slot, same greedy
    next token for the scheduled request."""
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
            sched, last_t = _chunk_schedule(c2, prompt2, 4, steps)
            toks, comp = m.mixed_burst(batch, first, steps, sched, 4)
            assert c2.offset == len(prompt2)
            nxt = int(comp[last_t])
        else:
            toks = m.decode_burst(batch, first, steps)
            lg2 = None
            for off in range(0, len(prompt2), 8):
                lg2 = m(
                    jnp.asarray([prompt2[off : off + 8]], jnp.int32),
                    off, c2, logits_to_keep=1,
                )
            nxt = int(np.argmax(np.asarray(lg2[0, -1], np.float32)))
        return list(np.asarray(toks)[:, 0]), nxt

    t_ser, n_ser = run(mixed=False)
    t_mix, n_mix = run(mixed=True)
    assert t_ser == t_mix, (t_ser, t_mix)
    assert n_ser == n_mix


def test_mixed_decode_rows_do_not_disturb_pending_context():
    """After a mixed burst, the scheduled request's cache must decode the
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
    sched, last_t = _chunk_schedule(c2, prompt2, c, steps)
    _, comp = m.mixed_burst(batch, np.asarray([t0], np.int32), steps, sched, c)
    got = [int(comp[last_t])]
    off = len(prompt2)
    for _ in range(3):
        lg = m(jnp.asarray([[got[-1]]], jnp.int32), off, c2, logits_to_keep=1)
        got.append(int(np.argmax(np.asarray(lg[0, -1], np.float32))))
        off += 1
    assert got == want, (got, want)


def test_mixed_burst_streams_two_prompts_with_idle_step():
    """One burst prefills TWO requests back-to-back — the first ends
    mid-chunk (short sub-chunk, garbage padding on the trash-free page) —
    with an idle step between them; each request's completion token and
    continuation match the request prefilled alone."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=7)
    prompt1 = [9, 8, 7, 6, 5, 4, 3, 2]  # the decode slot
    prompt_a = [1, 2, 3, 4, 5, 6]  # ends mid-chunk: 4 + 2
    prompt_b = [7, 7, 5, 3, 1, 9, 2, 4]  # two full sub-chunks
    steps, c = 6, 4

    def alone(prompt, n=2):
        m = _paged_model(params, cfg)
        cc = m.create_kv_cache()
        lg = m(jnp.asarray([prompt], jnp.int32), 0, cc, logits_to_keep=1)
        out = [int(np.argmax(np.asarray(lg[0, -1], np.float32)))]
        off = len(prompt)
        for _ in range(n):
            lg = m(
                jnp.asarray([[out[-1]]], jnp.int32), off, cc, logits_to_keep=1
            )
            out.append(int(np.argmax(np.asarray(lg[0, -1], np.float32))))
            off += 1
        return out

    want_a, want_b = alone(prompt_a), alone(prompt_b)

    m = _paged_model(params, cfg)
    batch = m.create_batching_kv_cache(max_active_requests=1)
    c1 = m.create_kv_cache()
    lg = m(jnp.asarray([prompt1], jnp.int32), 0, c1, logits_to_keep=1)
    t0 = int(np.argmax(np.asarray(lg[0, -1], np.float32)))
    batch.add_request(c1, 0)
    ca, cb = m.create_kv_cache(), m.create_kv_cache()
    sa, last_a = _chunk_schedule(ca, prompt_a, c, steps, start_step=0)
    sb, last_b = _chunk_schedule(cb, prompt_b, c, steps, start_step=3)
    assert last_a == 1 and last_b == 4  # step 2 and step 5 stay idle
    sched = [sa[t] if sa[t] is not None else sb[t] for t in range(steps)]
    _, comp = m.mixed_burst(batch, np.asarray([t0], np.int32), steps, sched, c)
    assert ca.offset == len(prompt_a) and cb.offset == len(prompt_b)

    for cc, prompt, last_t, want in (
        (ca, prompt_a, last_a, want_a),
        (cb, prompt_b, last_b, want_b),
    ):
        got = [int(comp[last_t])]
        off = len(prompt)
        for _ in range(2):
            lg = m(
                jnp.asarray([[got[-1]]], jnp.int32), off, cc, logits_to_keep=1
            )
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
        # a = (kv_cache, first_tokens, steps, schedule, chunk)
        calls.append(sum(len(e.tokens) for e in a[3] if e is not None))
        return orig(*a, **k)

    model.mixed_burst = spy
    mixed = batch_generate(
        model, tok, PROMPTS, max_seq_len=96, batch_size=2,
        prefill_step=8, max_output_tokens=6, decode_burst=2,
        mixed_prefill=True, mixed_chunk=4,
    )
    assert calls, "mixed path never engaged"
    assert all(0 < n <= 8 for n in calls)  # <= decode_burst * mixed_chunk
    assert dict(mixed) == dict(classic)
    assert model.page_pool.live_pages == 0


def test_mixed_serving_with_sampler_is_reproducible():
    """temp > 0: the mixed path threads the decode rng and each scheduled
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
