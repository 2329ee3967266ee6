"""Tokenizer adapters.

The reference uses mlx_lm's TokenizerWrapper; here the contract is the
minimal protocol the generation loops need (encode / decode /
eos_token_id[s], optional get_vocab), satisfied by HF tokenizers and by
the synthetic ByteTokenizer used when no checkpoint is available
(zero-egress benchmarking).
"""

from __future__ import annotations


class ByteTokenizer:
    """UTF-8 byte-level tokenizer: ids 0..255, EOS 256. Deterministic and
    dependency-free — for synthetic-weight smoke runs and benchmarks."""

    vocab_size = 257
    eos_token_id = 256

    def encode(self, text: str) -> list[int]:
        return list(text.encode("utf-8")) or [0]

    def decode(self, ids) -> str:
        return bytes(i for i in ids if 0 <= i < 256).decode("utf-8", "replace")

    def get_vocab(self):
        return {str(i): i for i in range(self.vocab_size)}


class StreamingDetokenizer:
    """Incremental detokenizer with O(1) amortized host work per token.

    The reference streams output through an incremental detokenizer
    (/root/reference/src/tiny_llm_ref/generate.py:40-46) rather than
    re-decoding the whole output every step. This adapter provides the
    same contract over any tokenizer exposing ``decode``: per token it
    re-decodes only a bounded window (a few finalized context ids plus
    the pending ids whose text is not yet stable), never the full
    output.

    Multi-byte UTF-8 sequences that span token boundaries are held back
    until complete — a partial sequence decodes to a trailing U+FFFD
    replacement character, which signals "wait for more bytes". A
    pending run is force-flushed after ``_MAX_PENDING`` ids so a
    genuine U+FFFD in the vocabulary cannot stall the stream (a UTF-8
    code point spans at most 4 bytes, hence at most 4 byte-level
    tokens).
    """

    _CONTEXT = 4
    _MAX_PENDING = 4

    def __init__(self, tokenizer):
        self._tok = tokenizer
        self._context: list[int] = []
        self._context_text = ""
        self._pending: list[int] = []
        self.text = ""
        self.last_segment = ""

    def _flush(self) -> str:
        window = self._context + self._pending
        full = self._tok.decode(window)
        if self._context_text and full.startswith(self._context_text):
            segment = full[len(self._context_text):]
        else:
            # Context decode is not a stable prefix (tokenizer-specific
            # cleanup); decode the pending ids alone instead.
            segment = self._tok.decode(self._pending)
        self._context = window[-self._CONTEXT:]
        self._context_text = self._tok.decode(self._context)
        self._pending = []
        self.text += segment
        self.last_segment = segment
        return segment

    def add_token(self, token_id: int) -> str:
        """Feed one token id; return newly-finalized text ("" if held)."""
        self._pending.append(int(token_id))
        full = self._tok.decode(self._context + self._pending)
        if full.endswith("�") and len(self._pending) < self._MAX_PENDING:
            self.last_segment = ""
            return ""
        return self._flush()

    def finalize(self) -> str:
        """Flush any held-back ids; return the final segment."""
        if not self._pending:
            self.last_segment = ""
            return ""
        return self._flush()


def load_tokenizer(model_dir: str):
    """HF tokenizer from a checkpoint directory (transformers)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)

    class _Wrapped:
        eos_token_id = tok.eos_token_id

        def encode(self, text: str) -> list[int]:
            return tok.encode(text, add_special_tokens=False)

        def decode(self, ids) -> str:
            return tok.decode(list(ids))

        def get_vocab(self):
            return tok.get_vocab()

        def apply_chat_template(self, messages, **kw):
            return tok.apply_chat_template(messages, **kw)

    return _Wrapped()
