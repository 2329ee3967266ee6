"""Ops oracle tests vs jax built-ins + numpy references.

Mirrors the reference's week-1 day-1/2 strategy
(tests_refsol/test_week_1_day_1.py): compare against platform library
implementations across precisions and random trials.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.ops import (
    causal_mask,
    linear,
    scaled_dot_product_attention_grouped,
    scaled_dot_product_attention_simple,
    silu,
    softmax,
    swiglu,
    rms_norm,
    RoPE,
    make_sampler,
)
from .utils import PRECISIONS, PRECISION_IDS, assert_allclose


@pytest.mark.parametrize("precision", PRECISIONS, ids=PRECISION_IDS)
def test_softmax(precision):
    for seed in range(20):
        x = jax.random.normal(jax.random.key(seed), (8, 33), dtype=precision)
        assert_allclose(softmax(x), jax.nn.softmax(x, axis=-1), precision)


@pytest.mark.parametrize("precision", PRECISIONS, ids=PRECISION_IDS)
def test_linear(precision):
    for seed in range(20):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        x = jax.random.normal(k1, (4, 7, 32), dtype=precision)
        w = jax.random.normal(k2, (16, 32), dtype=precision)
        b = jax.random.normal(k3, (16,), dtype=precision)
        expected = jnp.einsum("...k,nk->...n", x, w) + b
        assert_allclose(linear(x, w, b), expected, precision, rtol=5e-2 if precision == jnp.float16 else None)


@pytest.mark.parametrize("precision", PRECISIONS, ids=PRECISION_IDS)
def test_silu_swiglu(precision):
    x = jax.random.normal(jax.random.key(0), (6, 50), dtype=precision) * 8
    assert_allclose(silu(x), jax.nn.silu(x), precision)
    up = jax.random.normal(jax.random.key(1), (6, 50), dtype=precision)
    assert_allclose(swiglu(x, up), jax.nn.silu(x) * up, precision)


def test_causal_mask():
    m = causal_mask(3, 5)
    expected = np.zeros((3, 5))
    for i in range(3):
        for j in range(5):
            if j > i + 2:
                expected[i, j] = -np.inf
    np.testing.assert_array_equal(np.asarray(m), expected)


@pytest.mark.parametrize("precision", PRECISIONS, ids=PRECISION_IDS)
def test_sdpa_simple_vs_manual(precision):
    for seed in range(10):
        keys = jax.random.split(jax.random.key(seed), 3)
        q = jax.random.normal(keys[0], (2, 4, 8, 16), dtype=precision)
        k = jax.random.normal(keys[1], (2, 4, 8, 16), dtype=precision)
        v = jax.random.normal(keys[2], (2, 4, 8, 16), dtype=precision)
        scores = jnp.einsum("bhld,bhsd->bhls", q.astype(jnp.float32), k.astype(jnp.float32)) * (16**-0.5)
        expected = jnp.einsum(
            "bhls,bhsd->bhld", jax.nn.softmax(scores, axis=-1), v.astype(jnp.float32)
        )
        assert_allclose(scaled_dot_product_attention_simple(q, k, v), expected, precision)


@pytest.mark.parametrize("precision", PRECISIONS, ids=PRECISION_IDS)
@pytest.mark.parametrize("mask", [None, "causal"])
def test_sdpa_grouped_vs_repeat_kv(precision, mask):
    """GQA must equal plain SDPA with KV heads repeated n_rep times."""
    Hq, Hkv, L, S, D = 6, 2, 4, 9, 16
    for seed in range(5):
        keys = jax.random.split(jax.random.key(seed), 3)
        q = jax.random.normal(keys[0], (2, Hq, L, D), dtype=precision)
        k = jax.random.normal(keys[1], (2, Hkv, S, D), dtype=precision)
        v = jax.random.normal(keys[2], (2, Hkv, S, D), dtype=precision)
        k_rep = jnp.repeat(k, Hq // Hkv, axis=1)
        v_rep = jnp.repeat(v, Hq // Hkv, axis=1)
        m = causal_mask(L, S, jnp.float32) if mask == "causal" else None
        expected = scaled_dot_product_attention_simple(q, k_rep, v_rep, mask=m)
        got = scaled_dot_product_attention_grouped(q, k, v, mask=mask)
        assert_allclose(got, expected, precision)


def test_sdpa_grouped_batched_mask():
    q = jax.random.normal(jax.random.key(0), (2, 4, 3, 8))
    k = jax.random.normal(jax.random.key(1), (2, 2, 7, 8))
    v = jax.random.normal(jax.random.key(2), (2, 2, 7, 8))
    mask = jnp.where(
        jax.random.uniform(jax.random.key(3), (2, 4, 3, 7)) > 0.3, 0.0, -jnp.inf
    )
    k_rep = jnp.repeat(k, 2, axis=1)
    v_rep = jnp.repeat(v, 2, axis=1)
    expected = scaled_dot_product_attention_simple(q, k_rep, v_rep, mask=mask)
    got = scaled_dot_product_attention_grouped(q, k, v, mask=mask)
    assert_allclose(got, expected, jnp.float32)


@pytest.mark.parametrize("traditional", [True, False], ids=["interleaved", "half"])
def test_rope_rotation_property(traditional):
    """RoPE(x, n) followed by relative attention must depend only on distance:
    dot(RoPE(q, p1), RoPE(k, p2)) == dot(RoPE(q, p1+d), RoPE(k, p2+d))."""
    D = 16
    rope = RoPE(D, 128, base=10000, traditional=traditional)
    q = jax.random.normal(jax.random.key(0), (1, 1, 1, D))
    k = jax.random.normal(jax.random.key(1), (1, 1, 1, D))
    def score(p_q, p_k):
        qr = rope(q, offset=p_q)[0, 0, 0]
        kr = rope(k, offset=p_k)[0, 0, 0]
        return float(jnp.dot(qr, kr))
    assert abs(score(3, 7) - score(13, 17)) < 1e-4
    assert abs(score(0, 5) - score(40, 45)) < 1e-4


def test_rope_offset_forms_agree():
    D, B, L = 8, 3, 4
    rope = RoPE(D, 64)
    x = jax.random.normal(jax.random.key(0), (B, L, 2, D))
    base = rope(x, offset=5)
    via_slice = rope(x, offset=slice(5, 5 + L))
    via_list = rope(x, offset=[5] * B)
    via_array = rope(x, offset=jnp.full((B,), 5, jnp.int32))
    via_pos = rope(x, offset=jnp.tile(jnp.arange(5, 5 + L)[None], (B, 1)))
    for other in (via_slice, via_list, via_array, via_pos):
        assert_allclose(base, other, jnp.float32)


def test_rope_zero_offset_is_default():
    rope = RoPE(8, 64)
    x = jax.random.normal(jax.random.key(0), (2, 6, 2, 8))
    assert_allclose(rope(x), rope(x, offset=0), jnp.float32)


@pytest.mark.parametrize("precision", PRECISIONS, ids=PRECISION_IDS)
def test_rms_norm(precision):
    for seed in range(10):
        x = jax.random.normal(jax.random.key(seed), (2, 5, 64), dtype=precision)
        w = jax.random.normal(jax.random.key(seed + 100), (64,), dtype=precision)
        x32 = x.astype(jnp.float32)
        expected = (
            x32 / jnp.sqrt(jnp.mean(x32**2, axis=-1, keepdims=True) + 1e-5)
        ).astype(precision) * w
        assert_allclose(rms_norm(x, w, eps=1e-5), expected, precision)


def test_sampler_greedy():
    sampler = make_sampler(temp=0.0)
    logprobs = jnp.log(jnp.asarray([[0.1, 0.7, 0.2], [0.6, 0.3, 0.1]]))
    tokens = sampler(logprobs)
    np.testing.assert_array_equal(np.asarray(tokens), [1, 0])


def test_sampler_top_k_restricts_support():
    sampler = make_sampler(temp=1.0, top_k=2)
    logits = jnp.asarray([[5.0, 4.0, -1.0, -2.0, -3.0]])
    logprobs = jax.nn.log_softmax(logits)
    seen = set()
    for i in range(50):
        t = int(sampler(logprobs, jax.random.key(i))[0])
        seen.add(t)
    assert seen <= {0, 1}
    assert len(seen) == 2


def test_sampler_top_p_restricts_support():
    # probs ~ [0.85, 0.10, ...]: top_p=0.5 keeps only token 0;
    # top_p=0.9 keeps tokens {0, 1} (cum before token1 = 0.85 < 0.9).
    logits = jnp.log(jnp.asarray([[0.85, 0.10, 0.03, 0.02]]))
    logprobs = jax.nn.log_softmax(logits)
    only_top = make_sampler(temp=1.0, top_p=0.5)
    two_top = make_sampler(temp=1.0, top_p=0.9)
    seen_1, seen_2 = set(), set()
    for i in range(60):
        seen_1.add(int(only_top(logprobs, jax.random.key(i))[0]))
        seen_2.add(int(two_top(logprobs, jax.random.key(i))[0]))
    assert seen_1 == {0}
    assert seen_2 <= {0, 1} and len(seen_2) == 2


def test_sampler_temperature_flattens():
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    logprobs = jax.nn.log_softmax(logits)
    hot = make_sampler(temp=5.0)
    counts = {}
    for i in range(200):
        t = int(hot(logprobs, jax.random.key(i))[0])
        counts[t] = counts.get(t, 0) + 1
    assert len(counts) == 4  # high temperature visits the whole support


def test_axpby_tutorial_kernel():
    """The "hello Pallas" example op (reference src/extensions axpby):
    interpret-mode kernel vs the XLA expression, incl. ragged edges."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiny_llm_tpu.kernels import axpby

    key = jax.random.key(0)
    for shape in ((8, 128), (300, 1100)):  # aligned + ragged-edge blocks
        x = jax.random.normal(key, shape, jnp.float32)
        y = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
        ref = axpby(x, y, alpha=2.5, beta=-0.5, impl="xla")
        out = axpby(x, y, alpha=2.5, beta=-0.5, impl="pallas", interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
