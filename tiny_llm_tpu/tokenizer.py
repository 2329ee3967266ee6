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
