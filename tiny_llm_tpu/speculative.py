"""Device-resident speculative decoding (the TPU-native fast path).

`generate.speculative_generate` keeps the reference's host-driven
algorithm (reference generate.py:84-322) over cache objects; that loop
syncs with the host once per draft token and once per verification —
fine on unified memory, ruinous behind a real device boundary. This
module restructures the same algorithm as ONE jitted dispatch per batch
of speculation rounds:

  * draft proposes `proposal_length` tokens in a `lax.scan` (greedy,
    on-device argmax),
  * target verifies `[last, *proposals]` in one forward with
    `logits_to_keep = K+1`,
  * longest-prefix acceptance is computed on device,
  * cache "rewind" is free: the KV slabs are append-at-offset
    (models/qwen3.py `forward_step`), so rejecting a suffix just means
    not advancing the offset — stale entries are overwritten by the next
    round and never attended (lens masking). This is the slab analog of
    the reference's `TinyKvPagedCache.rewind` (paged_kv_cache.py:331-351).
  * `rounds` consecutive rounds run inside one `lax.scan`, so the host
    pays one dispatch + one small fetch per `rounds * (K+1)` potential
    tokens (same burst discipline as the serving path).

Greedy speculative decoding is lossless: the emitted stream equals the
target's own greedy continuation regardless of the draft. The tests
assert exactly that, draft and target sharing nothing but a vocabulary.

The optional `forced_reject` input replaces the accept/reject decision
with a scripted pattern (used by benches/bench_speculative.py to pin the
acceptance rate while paying identical compute); `None` is the
production path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models.qwen3 import Qwen3Config, Qwen3Params, forward_step
from .ops.rope import rope_tables


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "rope_tabs"],
    meta_fields=["cfg"],
)
@dataclasses.dataclass(frozen=True)
class SpecModel:
    """One side (draft or target) of the speculative pair. A pytree:
    weights/tables are leaves, the config is static metadata, so a
    SpecModel passes straight through jit."""

    params: Qwen3Params
    cfg: Qwen3Config
    rope_tabs: tuple[jax.Array, jax.Array]

    @classmethod
    def build(cls, params: Qwen3Params, cfg: Qwen3Config, max_seq: int) -> "SpecModel":
        return cls(params, cfg, rope_tables(cfg.head_dim, max_seq, base=cfg.rope_theta))

    def empty_slabs(self, max_seq: int) -> tuple[jax.Array, jax.Array]:
        shape = (
            self.cfg.num_hidden_layers,
            1,
            self.cfg.num_key_value_heads,
            max_seq,
            self.cfg.head_dim,
        )
        return jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16)


def _greedy_last(logits: jax.Array) -> jax.Array:
    """argmax of the last row, as a device scalar int32."""
    return jnp.argmax(logits[0, -1]).astype(jnp.int32)


def speculative_rounds(
    draft: SpecModel,
    target: SpecModel,
    last_token: jax.Array,  # scalar int32 — last emitted token (not yet in cache)
    offset: jax.Array,  # scalar int32 — valid context length in BOTH caches
    d_keys: jax.Array,
    d_values: jax.Array,
    t_keys: jax.Array,
    t_values: jax.Array,
    forced_reject: jax.Array | None = None,  # [rounds, K] bool — bench mode
    *,
    proposal_length: int,
    rounds: int,
    window: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, tuple]:
    """Run `rounds` speculation rounds in one traced computation.

    Returns (emitted [rounds, K+1], n_emit [rounds], last, offset, slabs).
    Row r's first n_emit[r] entries are the tokens emitted by round r, in
    order; the caller (host) concatenates and truncates at EOS/budget.

    `forced_reject`, if given, REPLACES the accept/reject comparison with
    the given pattern: proposal slot (r, k) is treated as rejected iff
    forced_reject[r, k] (first rejection wins, as in production). Every
    forward pass, cache write, and offset update is identical to the
    production path — only the match predicate changes — which pins the
    acceptance rate for benchmarking. Emitted tokens are still the
    verifier's own predictions, so the stream stays self-consistent, but
    it is NOT the target's greedy stream (accepted draft proposals need
    not match it); benchmark mode only.
    """
    K = proposal_length

    def one_round(carry, reject_row):
        last, off, dk, dv, tk, tv = carry

        def draft_step(c, _):
            tok, doff, dk, dv = c
            logits, dk, dv = forward_step(
                draft.params,
                draft.cfg,
                draft.rope_tabs,
                tok[None, None],
                doff[None],
                dk,
                dv,
                window=window,
                logits_to_keep=1,
            )
            proposal = _greedy_last(logits)
            return (proposal, doff + 1, dk, dv), proposal

        (_, _, dk, dv), proposals = jax.lax.scan(
            draft_step,
            (last, off, dk, dv),
            None,
            length=K,
        )

        verification = jnp.concatenate([last[None], proposals])  # [K+1]
        logits, tk, tv = forward_step(
            target.params,
            target.cfg,
            target.rope_tabs,
            verification[None, :],
            off[None],
            tk,
            tv,
            window=window,
            logits_to_keep=K + 1,
        )
        predictions = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [K+1]

        if reject_row is None:
            matches = predictions[:K] == proposals  # [K]
        else:
            matches = ~reject_row
        m = jnp.where(jnp.all(matches), K, jnp.argmin(matches))
        n_emit = m + 1  # accepted proposals + correction/bonus token
        new_last = predictions[m]
        new_off = off + n_emit
        return (new_last, new_off, dk, dv, tk, tv), (predictions, n_emit)

    if forced_reject is None:
        body = lambda carry, _: one_round(carry, None)
        xs = jnp.zeros((rounds,), jnp.int32)
    else:
        body = one_round
        xs = forced_reject

    carry0 = (last_token, offset, d_keys, d_values, t_keys, t_values)
    (last, offset, dk, dv, tk, tv), (emitted, n_emits) = jax.lax.scan(
        body, carry0, xs
    )
    return emitted, n_emits, last, offset, (dk, dv, tk, tv)


# Module-level jit caches: jax.jit memoizes on the wrapped callable's
# identity plus static args, so these MUST be created once — per-call
# functools.partial wrappers would recompile on every generate call.
_rounds_jit = jax.jit(
    speculative_rounds,
    static_argnames=("proposal_length", "rounds", "window"),
    donate_argnums=(4, 5, 6, 7),
)


def speculative_decode_device(
    draft: SpecModel,
    target: SpecModel,
    prompt_ids: list[int],
    *,
    max_tokens: int = 128,
    proposal_length: int = 4,
    rounds_per_dispatch: int = 4,
    max_seq: int | None = None,
    eos_ids: frozenset[int] = frozenset(),
    forced_alpha: float | None = None,
    forced_seed: int = 0,
    stats: dict | None = None,
) -> list[int]:
    """Host driver: prefill both models, then burst speculation rounds.

    With `forced_alpha` set, the accept/reject decision is replaced by an
    i.i.d. Bernoulli(alpha) draw per proposal slot (benchmark mode: all
    compute identical, acceptance rate pinned — see speculative_rounds).
    Returns emitted token ids.
    """
    P = len(prompt_ids)
    K = proposal_length
    max_seq = max_seq or _round_up(P + max_tokens + (K + 1) * rounds_per_dispatch + 1, 128)
    window = max_seq

    d_keys, d_values = draft.empty_slabs(max_seq)
    t_keys, t_values = target.empty_slabs(max_seq)
    tokens = jnp.asarray([prompt_ids], jnp.int32)
    offsets0 = jnp.zeros((1,), jnp.int32)

    logits, t_keys, t_values = _prefill_jit(target, tokens, offsets0, t_keys, t_values, window=window)
    last = _greedy_last(logits)
    _, d_keys, d_values = _prefill_jit(draft, tokens, offsets0, d_keys, d_values, window=window)

    rng = np.random.default_rng(forced_seed) if forced_alpha is not None else None

    emitted: list[int] = [int(jax.device_get(last))]
    if emitted[0] in eos_ids:
        return []
    offset = jnp.asarray(P, jnp.int32)
    last = jnp.asarray(emitted[0], jnp.int32)
    dispatches = 0

    while len(emitted) < max_tokens:
        forced_reject = None
        if rng is not None:
            forced_reject = jnp.asarray(
                rng.random((rounds_per_dispatch, K)) >= forced_alpha
            )
        toks, n_emits, last, offset, (d_keys, d_values, t_keys, t_values) = _rounds_jit(
            draft, target, last, offset, d_keys, d_values, t_keys, t_values,
            forced_reject,
            proposal_length=K,
            rounds=rounds_per_dispatch,
            window=window,
        )
        dispatches += 1
        toks_h = jax.device_get(toks)
        n_h = jax.device_get(n_emits)
        done = False
        for r in range(rounds_per_dispatch):
            for t in toks_h[r][: int(n_h[r])]:
                t = int(t)
                if t in eos_ids:
                    done = True
                    break
                emitted.append(t)
            if done:
                break
        if done:
            break
    if stats is not None:
        stats["dispatches"] = dispatches
        stats["emitted"] = len(emitted)
    # emitted[0] came from prefill; keep the budget semantics of the
    # host-loop API (max_tokens generated tokens total).
    return emitted[:max_tokens]


def _prefill(model: SpecModel, tokens, offsets, keys, values, *, window: int):
    return forward_step(
        model.params, model.cfg, model.rope_tabs, tokens, offsets,
        keys, values, window=window, logits_to_keep=1,
    )


_prefill_jit = jax.jit(_prefill, static_argnames=("window",), donate_argnums=(3, 4))


def greedy_continuation(
    target: SpecModel, prompt_ids: list[int], n: int, max_seq: int
) -> list[int]:
    """Plain greedy decode of `n` tokens, one jitted burst (the
    non-speculative baseline; also the benchmark's reference stream)."""
    window = max_seq

    def burst(model: SpecModel, last, off, keys, values):
        def body(carry, _):
            tok, off, keys, values = carry
            logits, keys, values = forward_step(
                model.params, model.cfg, model.rope_tabs,
                tok[None, None], off[None], keys, values,
                window=window, logits_to_keep=1,
            )
            nxt = _greedy_last(logits)
            return (nxt, off + 1, keys, values), nxt

        (last, off, keys, values), toks = jax.lax.scan(
            body, (last, off, keys, values), None, length=n - 1
        )
        return toks

    t_keys, t_values = target.empty_slabs(max_seq)
    tokens = jnp.asarray([prompt_ids], jnp.int32)
    logits, t_keys, t_values = _prefill_jit(
        target, tokens, jnp.zeros((1,), jnp.int32), t_keys, t_values, window=window
    )
    last = _greedy_last(logits)
    first = int(jax.device_get(last))
    toks = jax.jit(burst, donate_argnums=(3, 4))(
        target, last, jnp.asarray(len(prompt_ids), jnp.int32), t_keys, t_values
    )
    return [first, *map(int, jax.device_get(toks))]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
