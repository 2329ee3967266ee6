"""GenerationSession interrupt interleavings: cache/id-ledger consistency.

Reference analog: the day-6 cache-lifecycle interrupt family
(ref tests_refsol/test_week_4_day_6.py task-4 cache tests — partial
caches discarded on cancellation/KeyboardInterrupt at every stage).
This design has ONE cache and an id ledger (`_cached_ids`) instead of a
cache factory, so the property under attack is different: a
BaseException at ANY point may leave the cache's row count and the
ledger out of sync (prefill advances the cache per chunk but the ledger
extends only after the whole suffix; decode appends the id BEFORE the
model call). The invariant these tests pin: after an interrupt lands
anywhere inside a generation, the NEXT call still produces exactly the
cold-session text — the offset assertion in the model step turns any
desync into an exception, and the reset-and-retry path (generation.py
__call__) converts that into a cold start.

Mutation check (verified while writing): removing the `reset()` in the
retry path fails `test_interrupt_after_rewind_before_ledger_truncation`
and `test_interrupt_during_recovery_retry_then_third_call`. Removing
the model step's `offset == cache.offset` assertion does NOT fail any
of these — defense-in-depth masking, recorded honestly: the step writes
K/V at the GIVEN positions and masks attention by the given lengths, so
a cache whose internal offset ran ahead still computes correct text;
the assertion only converts silent bookkeeping drift into a loud error.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiny_llm_tpu.agent import GenerationSession
from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from .utils import FakeTokenizer


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(num_hidden_layers=2)
    return Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=256)


class InterruptOnNthModelCall:
    """Wrap a model; raise KeyboardInterrupt on the Nth __call__."""

    def __init__(self, model, n: int):
        self._model = model
        self._n = n
        self.calls = 0

    def __getattr__(self, name):
        return getattr(self._model, name)

    def __call__(self, *args, **kwargs):
        self.calls += 1
        if self.calls == self._n:
            raise KeyboardInterrupt("injected")
        return self._model(*args, **kwargs)


def msgs(*contents):
    out = [{"role": "user", "content": contents[0]}]
    for i, c in enumerate(contents[1:]):
        role = "assistant" if i % 2 == 0 else "user"
        out.append({"role": role, "content": c})
    return out


LONG_TURN = "tell me more about " + "the same thing " * 6  # multi-chunk


def cold_text(model, convo, max_tokens=6):
    out, _ = GenerationSession(model, FakeTokenizer(), max_tokens=max_tokens)(
        convo
    )
    return out


@pytest.mark.parametrize("nth", [1, 2, 3])
def test_interrupt_mid_prefill_recovers_cold_equal(model, nth):
    """Interrupt on the nth model call of a warm second turn (chunked
    prefill advances the cache before the ledger extends); the next
    call must produce exactly the cold text."""
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=6, prefill_chunk=32)
    first = msgs("hello there")
    out1, _ = sess(first)
    convo = msgs("hello there", out1, LONG_TURN)

    wrapped = InterruptOnNthModelCall(model, nth)
    sess.model = wrapped
    with pytest.raises(KeyboardInterrupt):
        sess(convo)
    sess.model = model

    out2, stats2 = sess(convo)
    assert out2 == cold_text(model, convo)
    # The desync is only observable when the interrupt landed after at
    # least one cache write; either way the session must have healed.
    assert stats2.output_tokens >= 0


def test_interrupt_mid_decode_recovers_cold_equal(model):
    """Interrupt inside the decode loop: the ledger has the id appended
    BEFORE the model call, so the cache is one row short of the ledger."""
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=8, prefill_chunk=64)
    convo = msgs("hello there")
    # First call cold-prefills in 1 chunk; decode calls follow. Interrupt
    # on the 3rd model call = second decode step.
    wrapped = InterruptOnNthModelCall(model, 3)
    sess.model = wrapped
    with pytest.raises(KeyboardInterrupt):
        sess(convo)
    sess.model = model

    out, stats = sess(convo)
    assert out == cold_text(model, convo, max_tokens=8)


def test_interrupt_after_rewind_before_ledger_truncation(model):
    """The nastiest window: cache.rewind() has run but the ledger still
    holds the rewound ids. Injected by a rewind wrapper that raises
    AFTER mutating the cache."""
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=6, prefill_chunk=64)
    out1, _ = sess(msgs("hello there"))
    # Divergent second turn forces a rewind on the next call.
    convo = msgs("hello there", out1, "completely different branch")

    real_cache = sess._cache
    real_rewind = real_cache.rewind
    state = {"armed": True}

    def exploding_rewind(n):
        real_rewind(n)
        if state["armed"]:
            state["armed"] = False
            raise KeyboardInterrupt("injected after rewind")

    real_cache.rewind = exploding_rewind
    try:
        with pytest.raises(KeyboardInterrupt):
            sess(convo)
    finally:
        real_cache.rewind = real_rewind

    out2, _ = sess(convo)
    assert out2 == cold_text(model, convo)


def test_interrupt_during_recovery_retry_then_third_call(model):
    """A second interrupt landing inside the reset-retry path must not
    brick the session: the third call still matches cold."""
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=6, prefill_chunk=32)
    out1, _ = sess(msgs("hello there"))
    convo = msgs("hello there", out1, LONG_TURN)

    # ValueError on call 1 triggers the in-call cold retry; the retry's
    # own 2nd model call then gets a KeyboardInterrupt.
    class TwoFaults:
        def __init__(self, model):
            self._model = model
            self.calls = 0

        def __getattr__(self, name):
            return getattr(self._model, name)

        def __call__(self, *args, **kwargs):
            self.calls += 1
            if self.calls == 1:
                raise ValueError("transient")
            if self.calls == 3:
                raise KeyboardInterrupt("injected in retry")
            return self._model(*args, **kwargs)

    sess.model = TwoFaults(model)
    with pytest.raises(KeyboardInterrupt):
        sess(convo)
    sess.model = model

    out2, _ = sess(convo)
    assert out2 == cold_text(model, convo)


def test_interrupt_before_any_model_call_keeps_warm_state(model):
    """An interrupt before the first model call of a turn (calls == 0
    mutated) must not cost the warm prefix: the next call still reuses
    the cached prefix and matches cold text."""
    tok = FakeTokenizer()
    sess = GenerationSession(model, tok, max_tokens=6)
    out1, _ = sess(msgs("hello there"))
    convo = msgs("hello there", out1, "tell me more")

    class RaiseImmediately:
        def __init__(self, model):
            self._model = model

        def __getattr__(self, name):
            return getattr(self._model, name)

        def __call__(self, *args, **kwargs):
            raise KeyboardInterrupt("injected before work")

    sess.model = RaiseImmediately(model)
    with pytest.raises(KeyboardInterrupt):
        sess(convo)
    sess.model = model

    out2, stats2 = sess(convo)
    assert out2 == cold_text(model, convo)
    # Nothing was desynced, so the warm prefix must have survived.
    assert stats2.reused_tokens > 0
    assert not stats2.cold_start
