"""On-device sampled decode bursts.

The reference samples host-side once per token (sampler.py:5-25 used from
generate.py loops). The TPU build moves temperature/top-k/top-p sampling
INTO the fused decode burst (lax.scan), so sampled decoding keeps the
one-dispatch-per-K-tokens schedule. These tests pin the key-schedule
contract: a sampled burst equals a per-step loop that draws from
jax.random.split(rng0, steps) in order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from tiny_llm_tpu.ops import make_sampler
from tiny_llm_tpu.serving import batch_generate
from .utils import FakeTokenizer

TEMP, TOP_K, TOP_P = 1.0, 7, 0.95


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=0, quantized=True)
    return Qwen3Model(params, cfg, max_seq_len=64)


def _manual_sampled_loop(model, cache, first_token: int, steps: int, rng0):
    """Single-step decode drawing from the burst's exact key schedule."""
    sampler = make_sampler(TEMP, TOP_P, TOP_K)
    keys = jax.random.split(rng0, steps)
    toks, tok = [], first_token
    for i in range(steps):
        logits = model(
            jnp.asarray([[tok]], jnp.int32), cache.offset, cache,
            logits_to_keep=1,
        )
        lp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
        tok = int(sampler(lp, keys[i])[0])
        toks.append(tok)
    return toks


def test_dense_sampled_burst_matches_manual_loop(model):
    prompt = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    rng = jax.random.key(42)

    cache_a = model.create_kv_cache()
    logits = model(prompt, 0, cache_a, logits_to_keep=1)
    first = int(jnp.argmax(logits[0, -1]))
    burst = model.decode_burst_dense(
        cache_a, np.asarray([first], np.int32), 6,
        temp=TEMP, top_k=TOP_K, top_p=TOP_P, rng=rng,
    )
    cache_a.release()

    cache_b = model.create_kv_cache()
    model(prompt, 0, cache_b, logits_to_keep=1)
    manual = _manual_sampled_loop(model, cache_b, first, 6, rng)
    cache_b.release()

    assert burst[:, 0].tolist() == manual


def test_sampled_burst_differs_from_greedy(model):
    prompt = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)

    cache = model.create_kv_cache()
    logits = model(prompt, 0, cache, logits_to_keep=1)
    first = int(jnp.argmax(logits[0, -1]))
    greedy = model.decode_burst_dense(cache, np.asarray([first], np.int32), 8)
    cache.release()

    cache = model.create_kv_cache()
    model(prompt, 0, cache, logits_to_keep=1)
    sampled = model.decode_burst_dense(
        cache, np.asarray([first], np.int32), 8,
        temp=5.0, rng=jax.random.key(7),
    )
    cache.release()
    assert sampled[:, 0].tolist() != greedy[:, 0].tolist()


@pytest.fixture(scope="module")
def paged_model():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=0, quantized=True)
    return Qwen3Model(params, cfg, max_seq_len=128).enable_paged_attention(
        num_pages=65, page_size=8
    )


def test_sampled_serving_is_seed_deterministic(paged_model):
    """batch_generate(temp>0) must be reproducible from the seed alone,
    across both the burst and single-step scheduler paths."""
    tok = FakeTokenizer()
    prompts = ["hello world", "abc", "the quick brown fox"]
    kw = dict(
        max_seq_len=64, batch_size=2, prefill_step=8, max_output_tokens=7,
        temp=TEMP, top_k=TOP_K, top_p=TOP_P, seed=11,
    )
    a = batch_generate(paged_model, tok, prompts, decode_burst=4, **kw)
    b = batch_generate(paged_model, tok, prompts, decode_burst=4, **kw)
    assert dict(a) == dict(b)
    assert paged_model.page_pool.live_pages == 0

    c = batch_generate(paged_model, tok, prompts, decode_burst=1, **kw)
    assert dict(c) == dict(
        batch_generate(paged_model, tok, prompts, decode_burst=1, **kw)
    )
    assert paged_model.page_pool.live_pages == 0


def test_paged_sampled_burst_matches_manual_loop(paged_model):
    """Same key-schedule contract on the paged burst path."""
    model = paged_model
    tok_ids = [3, 1, 4, 1, 5, 9, 2, 6]
    rng = jax.random.key(123)

    def prefill_into_slot():
        cache = model.create_kv_cache()
        cache.ensure_capacity(len(tok_ids) + 10)
        logits = model(
            jnp.asarray([tok_ids], jnp.int32), 0, cache, logits_to_keep=1
        )
        batch = model.create_batching_kv_cache(
            max_active_requests=2, max_seq_len=64
        )
        batch.add_request(cache, 1)  # non-zero slot on purpose
        return batch, int(jnp.argmax(logits[0, -1]))

    batch_a, first = prefill_into_slot()
    burst = model.decode_burst(
        batch_a, np.asarray([0, first], np.int32), 5,
        temp=TEMP, top_k=TOP_K, top_p=TOP_P, rng=rng,
    )
    batch_a.release()

    # Manual loop: model.__call__ over the batching cache, slot-1 tokens
    # fed back, slot 0 idle. The burst samples over the whole [B] row with
    # one key per step; replicate exactly.
    batch_b, first_b = prefill_into_slot()
    assert first_b == first
    sampler = make_sampler(TEMP, TOP_P, TOP_K)
    keys = jax.random.split(rng, 5)
    toks, tok = [], first
    for i in range(5):
        logits = model(
            jnp.asarray([[0], [tok]], jnp.int32),
            [0, batch_b.offsets[1]], batch_b, logits_to_keep=1,
        )
        lp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
        tok = int(sampler(lp, keys[i])[1])
        toks.append(tok)
    batch_b.release()

    assert burst[:, 1].tolist() == toks
