"""Generation sessions: KV-cache prefix reuse across agent turns.

Parity: /root/reference/src/tiny_llm_ref/agent/generation.py (315 LoC) —
each turn re-encodes the full conversation, computes the common token
prefix with what the KV cache already holds, REWINDS the divergent
suffix, prefills only the new tokens, and greedy-decodes. Includes the
replay-last-token trick (when the cache covers the whole prompt we must
still run one token to obtain logits) and full cache reset + retry on any
reuse error. Emits GenerationStats for observability.
"""

from __future__ import annotations

import dataclasses
import time

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GenerationStats:
    input_tokens: int = 0
    reused_tokens: int = 0
    rewound_tokens: int = 0
    prefilled_tokens: int = 0
    output_tokens: int = 0
    cold_start: bool = False
    latency_s: float = 0.0


def render_messages(messages: list[dict], add_generation_prompt: bool = True) -> str:
    """Deterministic chat rendering used when the tokenizer has no chat
    template (synthetic/byte tokenizers)."""
    parts = []
    for m in messages:
        parts.append(f"<|{m['role']}|>\n{m['content']}\n")
    if add_generation_prompt:
        parts.append("<|assistant|>\n")
    return "".join(parts)


class GenerationSession:
    def __init__(
        self,
        model,
        tokenizer,
        max_tokens: int = 512,
        prefill_chunk: int = 256,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.prefill_chunk = prefill_chunk
        self._cache = None
        self._cached_ids: list[int] = []
        eos = getattr(tokenizer, "eos_token_ids", None)
        self._eos = (
            {int(t) for t in eos} if eos is not None else {int(tokenizer.eos_token_id)}
        )

    # -- encoding ------------------------------------------------------------
    def encode_messages(self, messages: list[dict]) -> list[int]:
        apply = getattr(self.tokenizer, "apply_chat_template", None)
        if callable(apply):
            try:
                ids = apply(messages, tokenize=True, add_generation_prompt=True)
                return [int(t) for t in ids]
            except Exception:
                pass
        return [int(t) for t in self.tokenizer.encode(render_messages(messages))]

    # -- cache management ----------------------------------------------------
    def reset(self) -> None:
        if self._cache is not None:
            self._cache.release()
        self._cache = None
        self._cached_ids = []

    def _common_prefix(self, prompt_ids: list[int]) -> int:
        n = 0
        for a, b in zip(self._cached_ids, prompt_ids):
            if a != b:
                break
            n += 1
        return n

    def _prefill(self, ids: list[int], offset: int):
        """Chunked prefill; returns logits of the final row."""
        logits = None
        pos = 0
        while pos < len(ids):
            chunk = ids[pos : pos + self.prefill_chunk]
            logits = self.model(
                jnp.asarray([chunk], jnp.int32), offset + pos, self._cache,
                logits_to_keep=1,
            )
            pos += len(chunk)
        return logits

    # -- main entry ----------------------------------------------------------
    def __call__(
        self, messages: list[dict], max_tokens: int | None = None
    ) -> tuple[str, GenerationStats]:
        t0 = time.monotonic()
        max_tokens = max_tokens or self.max_tokens
        prompt_ids = self.encode_messages(messages)
        stats = GenerationStats(input_tokens=len(prompt_ids))
        try:
            text = self._generate(prompt_ids, max_tokens, stats)
        except Exception:
            # Any reuse error invalidates the cache: reset and retry cold
            # (reference generation.py: full reset on reuse failure).
            self.reset()
            stats.cold_start = True
            stats.reused_tokens = 0
            stats.rewound_tokens = 0
            text = self._generate(prompt_ids, max_tokens, stats)
        stats.latency_s = time.monotonic() - t0
        return text, stats

    def _generate(
        self, prompt_ids: list[int], max_tokens: int, stats: GenerationStats
    ) -> str:
        if self._cache is None:
            self._cache = self.model.create_kv_cache()
            self._cached_ids = []
            stats.cold_start = True

        common = self._common_prefix(prompt_ids)
        if common == len(prompt_ids):
            # Cache covers the entire prompt; replay the last token to get
            # its logits (generation.py:214-227).
            common -= 1
        rewind_n = len(self._cached_ids) - common
        if rewind_n:
            self._cache.rewind(rewind_n)
            del self._cached_ids[common:]
        stats.reused_tokens = common
        stats.rewound_tokens = rewind_n

        suffix = prompt_ids[common:]
        stats.prefilled_tokens = len(suffix)
        logits = self._prefill(suffix, common)
        self._cached_ids.extend(suffix)

        out_ids: list[int] = []
        tok = int(np.asarray(jnp.argmax(logits[0, -1].astype(jnp.float32))))
        offset = len(self._cached_ids)
        for _ in range(max_tokens):
            if tok in self._eos:
                break
            out_ids.append(tok)
            self._cached_ids.append(tok)
            logits = self.model(
                jnp.asarray([[tok]], jnp.int32), offset, self._cache,
                logits_to_keep=1,
            )
            offset += 1
            tok = int(np.asarray(jnp.argmax(logits[0, -1].astype(jnp.float32))))
        stats.output_tokens = len(out_ids)
        return self.tokenizer.decode(out_ids)
