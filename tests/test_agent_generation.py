"""GenerationSession tests: KV prefix reuse, rewind, stats, reset-retry.

Reference parity: agent/generation.py behaviors — cross-turn prefix reuse
must be numerically identical to cold generation (the KV-cache analog of
the paged-vs-dense equality tests).
"""

import pytest

from tiny_llm_tpu.agent import GenerationSession
from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from .utils import FakeTokenizer


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(num_hidden_layers=2)
    return Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=256)


def msgs(*contents):
    out = [{"role": "user", "content": contents[0]}]
    for i, c in enumerate(contents[1:]):
        role = "assistant" if i % 2 == 0 else "user"
        out.append({"role": role, "content": c})
    return out


def test_cold_then_warm_same_output(model):
    tok = FakeTokenizer()
    warm = GenerationSession(model, tok, max_tokens=6)
    cold = GenerationSession(model, tok, max_tokens=6)

    convo = msgs("hello there")
    out1, stats1 = warm(convo)
    assert stats1.cold_start and stats1.reused_tokens == 0

    # Extend the conversation; the warm session reuses the prefix.
    convo2 = msgs("hello there", out1, "tell me more")
    out2, stats2 = warm(convo2)
    assert stats2.reused_tokens > 0
    assert stats2.prefilled_tokens < stats2.input_tokens

    out2_cold, _ = cold(convo2)  # fresh session: full prefill (after its own turn)
    cold.reset()
    out2_cold2, stats_cold = cold(convo2)
    assert stats_cold.reused_tokens == 0
    assert out2 == out2_cold2 == out2_cold


def test_divergent_prefix_rewinds(model):
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=5)
    sess(msgs("first topic alpha"))
    _, stats = sess(msgs("first topic beta"))  # shares only a short prefix
    assert stats.rewound_tokens > 0
    assert stats.reused_tokens > 0  # the common "first topic " prefix


def test_identical_prompt_replays_last_token(model):
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=4)
    out1, _ = sess(msgs("same prompt"))
    sess._cached_ids = sess.encode_messages(msgs("same prompt"))  # force exact
    # The real path: calling again with a conversation whose encoding is a
    # strict prefix of the cache must not crash and must reuse almost all.
    out2, stats = sess(msgs("same prompt"))
    assert stats.prefilled_tokens >= 1  # the replayed token


def test_reset_releases_cache(model):
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=3)
    sess(msgs("abc"))
    assert sess._cache is not None
    sess.reset()
    assert sess._cache is None and sess._cached_ids == []


def test_error_resets_and_retries(model):
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=3)
    sess(msgs("abc"))
    # Corrupt the cached ids so reuse computes an impossible rewind.
    sess._cached_ids = [999999] * 500  # longer than cache, mismatched
    out, stats = sess(msgs("abc def"))
    assert stats.cold_start  # recovered by reset + cold retry
    assert isinstance(out, str)


def test_stats_accounting(model):
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=4)
    convo = msgs("count me")
    out, stats = sess(convo)
    assert stats.input_tokens == len(sess.encode_messages(convo))
    assert stats.output_tokens == len(tok.encode(out))
    assert stats.latency_s > 0
