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
        if on_token is not None:
            on_token(tokenizer.decode(out_ids))
    return tokenizer.decode(out_ids)


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
            if on_token is not None:
                on_token(tokenizer.decode(out_ids))
            offset += tokens.shape[1]
            tokens = jnp.asarray([[tok]], dtype=jnp.int32)
        return tokenizer.decode(out_ids)
    finally:
        _release(kv_cache)


def speculative_generate(
    draft_model,
    model,
    draft_tokenizer,
    tokenizer,
    prompt: str,
    proposal_length: int = 4,
    max_tokens: int = 512,
    on_token: Callable[[str], None] | None = None,
) -> str:
    """Draft/target speculative decoding with cache rewind.

    Same algorithm and safety gates as the reference
    (generate.py:84-322): tokenizer-compatibility checks, greedy draft
    proposals, one-forward target verification with logits_to_keep,
    longest-prefix acceptance, rewind of both caches for rejected
    suffixes, bonus token + draft catch-up on full acceptance.
    """
    if (
        not isinstance(proposal_length, int)
        or isinstance(proposal_length, bool)
        or proposal_length < 0
    ):
        raise ValueError("proposal_length must be a non-negative integer")

    target_prompt = [int(t) for t in tokenizer.encode(prompt)]
    draft_prompt = [int(t) for t in draft_tokenizer.encode(prompt)]
    if not target_prompt:
        raise ValueError("prompt must encode to at least one token")
    if target_prompt != draft_prompt:
        raise ValueError("draft and target tokenizers encode the prompt differently")
    if _eos_ids(tokenizer) != _eos_ids(draft_tokenizer):
        raise ValueError("draft and target tokenizers use different EOS token ids")
    tgv = getattr(tokenizer, "get_vocab", None)
    dgv = getattr(draft_tokenizer, "get_vocab", None)
    if not callable(tgv) or not callable(dgv):
        raise ValueError("draft and target tokenizers must expose comparable vocabularies")
    if tgv() != dgv():
        raise ValueError("draft and target tokenizers use different token ids")

    target_eos = _eos_ids(tokenizer)
    draft_eos = _eos_ids(draft_tokenizer)
    emitted: list[int] = []

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
        emitted.extend(ids)
        if on_token is not None and emitted:
            on_token(tokenizer.decode(emitted))

    def _finish() -> str:
        del emitted[max_tokens:]  # acceptance can overshoot by < one proposal
        return tokenizer.decode(emitted)

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
