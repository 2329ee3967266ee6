"""Shared test utilities: tolerance ladder + fake Qwen3 checkpoints.

Mirrors the reference test harness (/root/reference/tests_refsol/utils.py:
72-107 tolerance ladder, :12-69 fake model fixture), re-expressed for JAX.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PRECISIONS = [jnp.float32, jnp.float16]
PRECISION_IDS = ["f32", "f16"]


class FakeTokenizer:
    """Deterministic toy tokenizer for generation/serving tests (the
    reference's scripted FakeTokenizer pattern, test_week_3_day_7.py)."""

    def __init__(self, eos_token_id: int = 99, vocab: int = 128):
        self.eos_token_id = eos_token_id
        self.vocab = vocab

    def encode(self, s: str):
        return [ord(c) % (self.vocab - 30) for c in s] or [1]

    def decode(self, ids):
        return "".join(chr(97 + i % 26) for i in ids)

    def get_vocab(self):
        return {str(i): i for i in range(self.vocab)}


def assert_allclose(
    a,
    b,
    precision=jnp.float32,
    rtol: float | None = None,
    atol: float | None = None,
    message: str | None = None,
):
    a = np.asarray(jax.device_get(a), dtype=np.float32)
    b = np.asarray(jax.device_get(b), dtype=np.float32)
    if precision == jnp.float32:
        rtol = rtol or 1.0e-5
        atol = atol or 1.0e-6
    elif precision == jnp.float16:
        rtol = rtol or 5.0e-2
        atol = atol or 1.0e-3
    elif precision == jnp.bfloat16:
        rtol = rtol or 5.0e-2
        atol = atol or 1.0e-2
    else:
        raise ValueError(f"Unsupported precision: {precision}")
    assert a.shape == b.shape, f"shape mismatch: {a.shape} vs {b.shape}"
    if not np.allclose(a, b, rtol=rtol, atol=atol):
        diff = ~np.isclose(a, b, rtol=rtol, atol=atol)
        with np.printoptions(precision=3, suppress=True):
            print("a=", a)
            print("b=", b)
            print("diff_a_val=", a[diff])
            print("diff_b_val=", b[diff])
        raise AssertionError(
            f"result mismatch ({diff.sum()}/{diff.size} elements): {message}"
        )
