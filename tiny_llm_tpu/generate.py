"""Generation loops: simple, KV-cached, speculative.

Parity: /root/reference/src/tiny_llm_ref/generate.py:16-322. The tokenizer
contract is minimal (encode/decode/eos_token_id[s]) so HF tokenizers and
test fakes both fit. Unlike MLX's lazy eval, JAX dispatches asynchronously;
the host sync point per emitted token is the `int()` coercion, mirroring
the reference's one `mx.eval` per token (generate.py:72).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .tokenizer import StreamingDetokenizer


class _Stream:
    """Binds a StreamingDetokenizer to the cumulative on_token contract.

    on_token receives the full text so far (cumulative prefixes), but
    the per-token host cost is O(1): only the detokenizer's bounded
    window is re-decoded, never the whole output.
    """

    def __init__(self, tokenizer, on_token):
        self._detok = StreamingDetokenizer(tokenizer)
        self._on_token = on_token
        self._last_sent: str | None = None

    def feed(self, token_ids) -> None:
        changed = False
        for tid in token_ids:
            if self._detok.add_token(tid):
                changed = True
        if changed and self._on_token is not None:
            self._last_sent = self._detok.text
            self._on_token(self._last_sent)

    def close(self, final_text: str) -> None:
        """Emit the authoritative final text if it wasn't already sent."""
        self._detok.finalize()
        if self._on_token is not None and final_text != self._last_sent:
            self._on_token(final_text)


def _eos_ids(tokenizer) -> set[int]:
    eos = getattr(tokenizer, "eos_token_ids", None)
    if eos is None:
        eos = {tokenizer.eos_token_id}
    return {int(t) for t in eos}


def _release(kv_cache) -> None:
    if kv_cache is not None:
        kv_cache.release()


def _logprobs(logits: jax.Array) -> jax.Array:
    logits = logits.astype(jnp.float32)
    return logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)


def simple_generate(
    model,
    tokenizer,
    prompt: str,
    sampler: Callable | None = None,
    max_tokens: int = 512,
    on_token: Callable[[str], None] | None = None,
    seed: int = 0,
) -> str:
    """Week-1 path: no cache, full-prefix forward every step."""
    tokens = list(tokenizer.encode(prompt))
    eos = _eos_ids(tokenizer)
    out_ids: list[int] = []
    key = jax.random.key(seed)
    stream = _Stream(tokenizer, on_token)
    for _ in range(max_tokens):
        logits = model(jnp.asarray([tokens], dtype=jnp.int32), logits_to_keep=1)
        lp = _logprobs(logits[:, -1, :])
        if sampler is None:
            tok = jnp.argmax(lp, axis=-1)
        else:
            key, sub = jax.random.split(key)
            tok = sampler(lp, sub)
        tok = int(tok[0])
        if tok in eos:
            break
        tokens.append(tok)
        out_ids.append(tok)
        stream.feed([tok])
    text = tokenizer.decode(out_ids)
    stream.close(text)
    return text


def simple_generate_with_kv_cache(
    model,
    tokenizer,
    prompt: str,
    sampler: Callable | None = None,
    max_tokens: int = 512,
    on_token: Callable[[str], None] | None = None,
    seed: int = 0,
) -> str:
    """Week-2/3 path: prefill once, then single-token decode steps."""
    kv_cache = model.create_kv_cache()
    eos = _eos_ids(tokenizer)
    out_ids: list[int] = []
    key = jax.random.key(seed)
    stream = _Stream(tokenizer, on_token)
    try:
        tokens = jnp.asarray([tokenizer.encode(prompt)], dtype=jnp.int32)
        offset = 0
        while len(out_ids) < max_tokens:
            logits = model(tokens, offset, kv_cache, logits_to_keep=1)
            lp = _logprobs(logits[:, -1, :])
            if sampler is None:
                tok = jnp.argmax(lp, axis=-1)
            else:
                key, sub = jax.random.split(key)
                tok = sampler(lp, sub)
            tok = int(tok[0])
            if tok in eos:
                break
            out_ids.append(tok)
            stream.feed([tok])
            offset += tokens.shape[1]
            tokens = jnp.asarray([[tok]], dtype=jnp.int32)
        text = tokenizer.decode(out_ids)
        stream.close(text)
        return text
    finally:
        _release(kv_cache)


def speculative_max_speedup(
    t_target: float, t_draft: float, t_verify: float, proposal_length: int
) -> float:
    """Upper bound on speculative speedup, reached at perfect acceptance.

    One fully-accepted round emits K+1 tokens and costs K proposal steps
    plus one draft catch-up step plus one target verify forward; plain
    greedy emits the same K+1 tokens in (K+1) target steps. Any rejection
    only lowers the ratio, so if this bound is < 1 speculation cannot win
    at any acceptance rate.
    """
    k = proposal_length
    return ((k + 1) * t_target) / ((k + 1) * t_draft + t_verify)


def speculative_generate(
    draft_model,
    model,
    draft_tokenizer,
    tokenizer,
    prompt: str,
    proposal_length: int = 4,
    max_tokens: int = 512,
    on_token: Callable[[str], None] | None = None,
    auto_disable: bool = True,
) -> str:
    """Draft/target speculative decoding with cache rewind.

    Same algorithm and safety gates as the reference
    (generate.py:84-322): tokenizer-compatibility checks, greedy draft
    proposals, one-forward target verification with logits_to_keep,
    longest-prefix acceptance, rewind of both caches for rejected
    suffixes, bonus token + draft catch-up on full acceptance.

    With ``auto_disable=True``, warm decode steps of both models are
    timed after prefill; if even perfect acceptance could not beat plain
    greedy decode (``speculative_max_speedup`` < 1 — e.g. a draft that
    is not meaningfully faster than an already bandwidth-bound target),
    a warning is emitted and generation continues target-only. The probe
    steps are rewound, so the guard never changes the output. The guard
    defaults ON so library callers get the protection too; pass
    ``auto_disable=False`` to force speculation unconditionally.
    """
    # bool is an int subclass, so screen it out explicitly; a draft window
    # of zero is allowed (degenerates to verify-only decode).
    bad_type = not isinstance(proposal_length, int) or isinstance(proposal_length, bool)
    if bad_type or proposal_length < 0:
        raise ValueError("proposal_length must be a non-negative integer")

    # Speculation is only sound when both models speak the same token id
    # space; these gates refuse mismatched tokenizer pairs up front.
    target_prompt = [int(t) for t in tokenizer.encode(prompt)]
    draft_prompt = [int(t) for t in draft_tokenizer.encode(prompt)]
    if not target_prompt:
        raise ValueError("prompt produced no tokens under the target tokenizer")
    if target_prompt != draft_prompt:
        raise ValueError(
            "speculative decoding needs identical prompt ids from both "
            "tokenizers, but the draft tokenizer produced a different encoding"
        )
    if _eos_ids(tokenizer) != _eos_ids(draft_tokenizer):
        raise ValueError("EOS token ids differ between the draft and target tokenizers")
    tgv = getattr(tokenizer, "get_vocab", None)
    dgv = getattr(draft_tokenizer, "get_vocab", None)
    if not callable(tgv) or not callable(dgv):
        raise ValueError(
            "both tokenizers must implement get_vocab() so their id spaces "
            "can be verified to match"
        )
    if tgv() != dgv():
        raise ValueError("the draft and target vocabularies assign different ids")

    target_eos = _eos_ids(tokenizer)
    draft_eos = _eos_ids(draft_tokenizer)
    emitted: list[int] = []
    stream = _Stream(tokenizer, on_token)

    kv_cache = model.create_kv_cache()
    draft_kv_cache = None

    def _greedy(m, ids: list[int], offset: int, cache, n_keep: int = 1) -> list[int]:
        logits = m(
            jnp.asarray([ids], dtype=jnp.int32), offset, cache, logits_to_keep=n_keep
        )
        return [int(t) for t in np.asarray(jnp.argmax(logits[0], axis=-1))]

    def _rewind(cache, n: int) -> None:
        if n:
            cache.rewind(n)

    def _emit(ids: Iterable[int]) -> None:
        ids = list(ids)
        room = max_tokens - len(emitted)  # tokens past the cap are truncated
        emitted.extend(ids)
        if room > 0:
            stream.feed(ids[:room])

    def _finish() -> str:
        del emitted[max_tokens:]  # acceptance can overshoot by < one proposal
        text = tokenizer.decode(emitted)
        stream.close(text)
        return text

    def _target_only(token_id: int, offset: int) -> str:
        remaining = max_tokens - len(emitted)
        for _ in range(remaining):
            if token_id in target_eos:
                return _finish()
            _emit([token_id])
            token_id = _greedy(model, [token_id], offset, kv_cache)[0]
            offset += 1
        return _finish()

    try:
        token_id = _greedy(model, target_prompt, 0, kv_cache)[0]
        offset = len(target_prompt)
        if token_id in target_eos:
            return _finish()
        if proposal_length == 0:
            return _target_only(token_id, offset)

        draft_kv_cache = draft_model.create_kv_cache()
        draft_token = _greedy(draft_model, draft_prompt, 0, draft_kv_cache)[0]
        draft_offset = len(draft_prompt)
        assert offset == draft_offset
        if draft_token in draft_eos:
            return _target_only(token_id, offset)

        if auto_disable:
            import time
            import warnings

            def _time_step(m, cache, off: int) -> float:
                # One warm-up (compile) + two timed single-token steps at
                # the decode shape; each is rewound so the cache state the
                # main loop sees is untouched.
                _greedy(m, [token_id], off, cache)
                cache.rewind(1)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    _greedy(m, [token_id], off, cache)
                    best = min(best, time.perf_counter() - t0)
                    cache.rewind(1)
                return best

            t_target = _time_step(model, kv_cache, offset)
            t_draft = _time_step(draft_model, draft_kv_cache, draft_offset)
            # The verify forward streams the same weights as a single step
            # (both are weight-bandwidth bound at small K), so t_target is
            # its estimate — avoiding a compile of the verify shape that
            # would be wasted if the guard disables speculation.
            bound = speculative_max_speedup(
                t_target, t_draft, t_target, proposal_length
            )
            if bound < 1.0:
                warnings.warn(
                    "speculative decoding disabled: the draft step is not "
                    f"fast enough to break even (measured target step "
                    f"{t_target * 1e3:.2f} ms, draft {t_draft * 1e3:.2f} ms; "
                    f"best-case speedup {bound:.2f}x < 1). Continuing with "
                    "plain greedy decode on the target model.",
                    stacklevel=2,
                )
                return _target_only(token_id, offset)

        def _draft_generate(last_id: int, off: int, n: int) -> tuple[list[int], int]:
            out = []
            for _ in range(n):
                last_id = _greedy(draft_model, [last_id], off, draft_kv_cache)[0]
                out.append(last_id)
                off += 1
                if last_id in draft_eos:
                    break
            return out, off

        while len(emitted) < max_tokens:
            draft_tokens, draft_offset = _draft_generate(
                token_id, draft_offset, proposal_length
            )
            verification = [token_id, *draft_tokens]
            predictions = _greedy(
                model, verification, offset, kv_cache, n_keep=len(verification)
            )
            assert len(predictions) == len(verification)
            offset += len(verification)

            aligned = [token_id, *predictions[:-1]]
            mismatch = None
            terminal = None
            for i, (tgt, drafted) in enumerate(zip(aligned, verification)):
                if tgt != drafted:
                    mismatch = i
                    break
                if tgt in target_eos:
                    terminal = i
                    break

            if terminal is not None:
                _emit(aligned[:terminal])
                _rewind(kv_cache, len(verification) - terminal)
                _rewind(draft_kv_cache, len(draft_tokens) - terminal)
                offset -= len(verification) - terminal
                draft_offset -= len(draft_tokens) - terminal
                assert offset == draft_offset
                return _finish()

            if mismatch is not None:
                assert mismatch >= 1
                _emit(aligned[:mismatch])
                _rewind(kv_cache, len(verification) - mismatch)
                _rewind(draft_kv_cache, len(draft_tokens) - mismatch)
                offset -= len(verification) - mismatch
                draft_offset -= len(draft_tokens) - mismatch
                assert offset == draft_offset
                token_id = aligned[mismatch]
                if token_id in target_eos:
                    return _finish()
                continue

            _emit(aligned)
            bonus = predictions[-1]
            if bonus in target_eos:
                return _finish()
            _, draft_offset = _draft_generate(verification[-1], draft_offset, 1)
            token_id = bonus
            assert offset == draft_offset
        return _finish()
    finally:
        _release(draft_kv_cache)
        _release(kv_cache)
