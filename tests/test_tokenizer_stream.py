"""Streaming detokenizer: incremental decode with bounded host work.

Parity: the reference streams tokens through an incremental detokenizer
(/root/reference/src/tiny_llm_ref/generate.py:40-46) instead of
re-decoding the full output each step. These tests pin the two
properties that matter: (a) multi-byte UTF-8 sequences that span token
boundaries are held back until complete, and (b) per-token decode cost
is bounded by a constant window, not the output length.
"""

from tiny_llm_tpu.tokenizer import ByteTokenizer, StreamingDetokenizer


class CountingTokenizer(ByteTokenizer):
    """ByteTokenizer that records the id-window size of each decode call."""

    def __init__(self):
        self.decode_sizes: list[int] = []

    def decode(self, ids) -> str:
        ids = list(ids)
        self.decode_sizes.append(len(ids))
        return super().decode(ids)


def test_multibyte_utf8_across_token_boundaries():
    tok = ByteTokenizer()
    text = "héllo wörld 🎉 end"
    ids = tok.encode(text)
    detok = StreamingDetokenizer(tok)
    segments = []
    for tid in ids:
        seg = detok.add_token(tid)
        # no partially-decoded characters ever escape
        assert "�" not in seg
        segments.append(seg)
    assert detok.finalize() == ""
    assert "".join(segments) == text
    assert detok.text == text
    # the 4-byte emoji must have been held back across its 3 continuation bytes
    assert segments.count("") >= 3


def test_held_tokens_emit_empty_then_complete():
    tok = ByteTokenizer()
    detok = StreamingDetokenizer(tok)
    ids = tok.encode("é")  # two UTF-8 bytes
    assert detok.add_token(ids[0]) == ""
    assert detok.add_token(ids[1]) == "é"


def test_decode_window_is_bounded():
    tok = CountingTokenizer()
    detok = StreamingDetokenizer(tok)
    long_text = "a mixed ascii/unicode stream: ü🎉é " * 50
    for tid in tok.encode(long_text):
        detok.add_token(tid)
    detok.finalize()
    assert detok.text == long_text
    bound = StreamingDetokenizer._CONTEXT + StreamingDetokenizer._MAX_PENDING
    assert max(tok.decode_sizes) <= bound


def test_finalize_flushes_trailing_partial_bytes():
    tok = ByteTokenizer()
    detok = StreamingDetokenizer(tok)
    ids = tok.encode("x🎉")
    for tid in ids[:-1]:  # drop the emoji's last byte
        detok.add_token(tid)
    tail = detok.finalize()
    assert detok.text.startswith("x")
    assert tail != "" or detok.text == "x"


def test_pathological_replacement_char_does_not_stall():
    class FffdTokenizer:
        def decode(self, ids):
            return "�" * len(ids)

    detok = StreamingDetokenizer(FffdTokenizer())
    out = [detok.add_token(i) for i in range(10)]
    # force-flush kicks in at _MAX_PENDING; the stream keeps moving
    assert any(seg for seg in out)


def test_real_hf_tokenizer_stream_matches_full_decode():
    import os

    import pytest

    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".artifacts",
        "qwen3-tiny-real",
    )
    if not os.path.isfile(os.path.join(art, "tokenizer.json")):
        pytest.skip("real checkpoint artifact not built (see test_real_checkpoint)")
    from tiny_llm_tpu.tokenizer import load_tokenizer

    tok = load_tokenizer(art)
    text = "Hello, wörld! 🎉 Multi-byte boundaries: 你好"
    ids = tok.encode(text)
    detok = StreamingDetokenizer(tok)
    segments = [detok.add_token(t) for t in ids]
    tail = detok.finalize()
    assert "".join(segments) + tail == detok.text
    assert detok.text == tok.decode(ids)
