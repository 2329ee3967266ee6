"""Device-resident speculative decoding (one dispatch per round burst).

Greedy speculative decoding is lossless — the emitted stream must equal
the target's own greedy continuation no matter what the draft proposes
(reference generate.py:84-322 establishes the same property for the
host-driven loop; tests/test_speculative.py covers that path). Here the
whole accept/rewind state machine runs inside jit, so these tests are
the cross-implementation equality check (SURVEY.md §4) for it.
"""

import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.models import random_params, tiny_test_config
from tiny_llm_tpu.speculative import (
    SpecModel,
    greedy_continuation,
    speculative_decode_device,
)

MAX_SEQ = 128


def _pair():
    tcfg = tiny_test_config(num_hidden_layers=3)
    dcfg = tiny_test_config(num_hidden_layers=2)
    target = SpecModel.build(random_params(tcfg, key=7), tcfg, MAX_SEQ)
    draft = SpecModel.build(random_params(dcfg, key=11), dcfg, MAX_SEQ)
    return draft, target


PROMPT = [3, 14, 15, 9, 2, 6]


@pytest.mark.parametrize("k,rounds", [(3, 2), (4, 1), (1, 4)])
def test_device_speculative_is_lossless(k, rounds):
    draft, target = _pair()
    want = greedy_continuation(target, PROMPT, 24, MAX_SEQ)
    got = speculative_decode_device(
        draft,
        target,
        PROMPT,
        max_tokens=24,
        proposal_length=k,
        rounds_per_dispatch=rounds,
        max_seq=MAX_SEQ,
    )
    assert got == want[:24]


@pytest.mark.parametrize("alpha", [0.0, 1.0, 0.6])
def test_forced_acceptance_emits_budget(alpha):
    """Forced-acceptance mode pins the accept/reject draws; the stream is
    the verifier's own predictions (self-consistent but not necessarily
    target-greedy — accepted draft proposals need not match it)."""
    draft, target = _pair()
    stats = {}
    got = speculative_decode_device(
        draft,
        target,
        PROMPT,
        max_tokens=20,
        proposal_length=4,
        rounds_per_dispatch=2,
        max_seq=MAX_SEQ,
        forced_alpha=alpha,
        stats=stats,
    )
    assert len(got) == 20
    assert all(0 <= t < target.cfg.vocab_size for t in got)
    assert stats["dispatches"] >= 1
    if alpha == 1.0:
        # every proposal accepted -> the verify stream IS target-greedy
        want = greedy_continuation(target, PROMPT, 20, MAX_SEQ)
        assert got[0] == want[0]


def test_acceptance_rate_controls_dispatch_count():
    """alpha=1 accepts every proposal (K+1 tokens/round); alpha=0 rejects
    every proposal (1 token/round). Dispatch counts must reflect that."""
    draft, target = _pair()
    k, rounds, max_tokens = 4, 2, 21
    counts = {}
    for alpha in (0.0, 1.0):
        stats = {}
        speculative_decode_device(
            draft,
            target,
            PROMPT,
            max_tokens=max_tokens,
            proposal_length=k,
            rounds_per_dispatch=rounds,
            max_seq=MAX_SEQ,
            forced_alpha=alpha,
            stats=stats,
        )
        counts[alpha] = stats["dispatches"]
    # 20 post-prefill tokens: alpha=1 -> 10/dispatch -> 2; alpha=0 ->
    # 2/dispatch -> 10.
    assert counts[1.0] == 2
    assert counts[0.0] == 10


def test_eos_stops_emission():
    draft, target = _pair()
    want = greedy_continuation(target, PROMPT, 24, MAX_SEQ)
    eos = want[10]  # force a stop partway through the stream
    got = speculative_decode_device(
        draft,
        target,
        PROMPT,
        max_tokens=24,
        proposal_length=3,
        rounds_per_dispatch=2,
        max_seq=MAX_SEQ,
        eos_ids=frozenset({eos}),
    )
    first_eos = want.index(eos)
    assert got == want[:first_eos]
