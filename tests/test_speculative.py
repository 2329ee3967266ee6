"""Speculative decoding tests.

The reference scripts fake models with programmable disagreement points
(test_week_3_day_7.py); here the same guarantees are checked with real
tiny models, exploiting the algorithm's losslessness: speculative output
must equal plain greedy target output whatever the draft does.
"""

import jax.numpy as jnp
import pytest

from tiny_llm_tpu.generate import (
    simple_generate_with_kv_cache,
    speculative_generate,
    speculative_max_speedup,
)
from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from .utils import FakeTokenizer


@pytest.fixture(scope="module")
def target():
    cfg = tiny_test_config(num_hidden_layers=2)
    return Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=128)


@pytest.fixture(scope="module")
def draft_same(target):
    return target


@pytest.fixture(scope="module")
def draft_different():
    cfg = tiny_test_config(num_hidden_layers=1)
    return Qwen3Model(random_params(cfg, key=7), cfg, max_seq_len=128)


def test_spec_decode_lossless_with_perfect_draft(target, draft_same):
    tok = FakeTokenizer()
    expected = simple_generate_with_kv_cache(target, tok, "hello", max_tokens=8)
    got = speculative_generate(
        draft_same, target, tok, tok, "hello", proposal_length=4, max_tokens=8,
        auto_disable=False
    )
    assert got == expected


def test_spec_decode_lossless_with_bad_draft(target, draft_different):
    """A disagreeing draft changes speed, never output."""
    tok = FakeTokenizer()
    expected = simple_generate_with_kv_cache(target, tok, "abc xyz", max_tokens=8)
    got = speculative_generate(
        draft_different, target, tok, tok, "abc xyz", proposal_length=3,
        max_tokens=8, auto_disable=False
    )
    assert got == expected


def test_spec_decode_proposal_zero_is_target_only(target, draft_different):
    tok = FakeTokenizer()
    expected = simple_generate_with_kv_cache(target, tok, "zq", max_tokens=6)
    got = speculative_generate(
        draft_different, target, tok, tok, "zq", proposal_length=0, max_tokens=6,
        auto_disable=False
    )
    assert got == expected


def test_spec_decode_validates_proposal_length(target):
    tok = FakeTokenizer()
    with pytest.raises(ValueError):
        speculative_generate(target, target, tok, tok, "x", proposal_length=-1)
    with pytest.raises(ValueError):
        speculative_generate(target, target, tok, tok, "x", proposal_length=True)


def test_spec_decode_rejects_mismatched_tokenizers(target):
    class OtherTok(FakeTokenizer):
        def encode(self, s):
            return [(ord(c) + 1) % 90 for c in s]

    with pytest.raises(ValueError):
        speculative_generate(target, target, OtherTok(), FakeTokenizer(), "abc")

    class OtherEos(FakeTokenizer):
        eos_token_id = 5

        def __init__(self):
            super().__init__(eos_token_id=5)

    with pytest.raises(ValueError):
        speculative_generate(target, target, OtherEos(), FakeTokenizer(), "abc")


def test_speculative_max_speedup_bound():
    # a draft as slow as the target can never win: K+1 draft steps +
    # one verify always exceed K+1 target steps
    assert speculative_max_speedup(1.0, 1.0, 1.0, 4) < 1.0
    # the reference regime: target 13 ms, draft 2 ms, K=4 clearly pays
    assert speculative_max_speedup(13.0, 2.0, 13.0, 4) > 2.0
    # a bandwidth-bound 4B target vs a 0.6B draft on one v5e (measured
    # round-1 regime: ~3.4 ms target, ~1.3 ms draft): bound sits near 1
    assert 0.5 < speculative_max_speedup(3.4, 1.3, 3.4, 4) < 2.0


def test_spec_guard_falls_back_losslessly(target, draft_same, monkeypatch):
    """With an equal-speed draft the guard must disable speculation,
    warn, and still produce the exact greedy output."""
    import time as _time

    tok = FakeTokenizer()
    expected = simple_generate_with_kv_cache(target, tok, "guarded", max_tokens=6)
    # pin the probe's clock so the decision is deterministic on CI: every
    # interval measures 1.0s, so t_draft == t_target and the bound is < 1
    counter = iter(range(10_000))
    monkeypatch.setattr(_time, "perf_counter", lambda: float(next(counter)))

    with pytest.warns(UserWarning, match="speculative decoding disabled"):
        got = speculative_generate(
            draft_same, target, tok, tok, "guarded",
            proposal_length=4, max_tokens=6, auto_disable=True,
        )
    assert got == expected


def test_spec_guard_keeps_fast_draft(target, draft_different):
    """The guard must not fire when the draft clearly pays; output is
    still lossless either way."""
    tok = FakeTokenizer()
    expected = simple_generate_with_kv_cache(target, tok, "keep", max_tokens=6)
    got = speculative_generate(
        draft_different, target, tok, tok, "keep",
        proposal_length=3, max_tokens=6, auto_disable=False,
    )
    assert got == expected


def test_spec_decode_on_paged_caches(target):
    """Rewind over paged caches (page-freeing path) must stay lossless."""
    cfg = tiny_test_config(num_hidden_layers=2)
    paged = Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=128)
    paged.enable_paged_attention(num_pages=65, page_size=8)
    draft_cfg = tiny_test_config(num_hidden_layers=1)
    draft = Qwen3Model(random_params(draft_cfg, key=7), draft_cfg, max_seq_len=128)
    tok = FakeTokenizer()
    expected = simple_generate_with_kv_cache(paged, tok, "hello", max_tokens=8)
    got = speculative_generate(
        draft, paged, tok, tok, "hello", proposal_length=3, max_tokens=8,
        auto_disable=False,
    )
    assert got == expected
    assert paged.page_pool.live_pages == 0  # caches released, no leaks
