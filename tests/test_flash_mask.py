"""Explicit additive masks on the Pallas flash-attention path
(VERDICT round-2 item #6): the mask streams through the kernels as a
third tiled input instead of falling back to XLA. Oracle: the XLA twin
with the same mask (reference contract: week2_kernels.py:60-95 prefill,
:98-147 decode — an array mask replaces causality; lengths still bound
visibility)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny_llm_tpu.kernels.flash_attention import flash_attention
from tiny_llm_tpu.kernels.flash_attention_pallas import flash_attention_pallas

from .utils import assert_allclose

NEG = -1e30


def setup(B=2, Hq=8, Hkv=4, L=1, S=64, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, Hq, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    return q, k, v, rng


def sliding_window_mask(L, S, window, offset):
    """Additive [L, S]: query row l (absolute position offset+l) sees
    keys in (pos-window, pos]."""
    q_pos = offset + np.arange(L)[:, None]
    k_pos = np.arange(S)[None, :]
    visible = (k_pos <= q_pos) & (k_pos > q_pos - window)
    return jnp.asarray(np.where(visible, 0.0, NEG), jnp.float32)


def check(q, k, v, mask, lens=None, atol=5e-2):
    got = flash_attention_pallas(q, k, v, mask=mask, lens=lens, interpret=True)
    want = flash_attention(q, k, v, mask=mask, lens=lens, impl="xla")
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        jnp.bfloat16, atol=atol,
    )


class TestDecodeMask:
    def test_sliding_window_decode(self):
        q, k, v, _ = setup(L=1, S=64)
        lens = jnp.asarray([64, 40], jnp.int32)
        # Each row's window trails its OWN last position (lens-1).
        m = jnp.stack([
            sliding_window_mask(1, 64, window=16, offset=63),
            sliding_window_mask(1, 64, window=16, offset=39),
        ])
        check(q, k, v, m, lens=lens)

    def test_per_row_padding_mask(self):
        """Left-padded batch rows: the mask hides the pad positions."""
        q, k, v, rng = setup(B=3, L=1, S=48, seed=1)
        pads = [0, 7, 23]
        m = np.zeros((3, 1, 48), np.float32)
        for b, p in enumerate(pads):
            m[b, :, :p] = NEG
        check(q, k, v, jnp.asarray(m))

    def test_random_additive_bias_decode(self):
        """Real-valued (ALiBi-style) biases, not just 0/-inf."""
        q, k, v, rng = setup(L=1, S=64, seed=2)
        bias = jnp.asarray(rng.normal(size=(2, 1, 64)) * 2.0, jnp.float32)
        check(q, k, v, bias)

    def test_2d_mask_broadcasts_over_batch(self):
        q, k, v, _ = setup(L=1, S=64, seed=3)
        mask = sliding_window_mask(1, 64, window=8, offset=63)
        got = flash_attention_pallas(q, k, v, mask=mask, interpret=True)
        want = flash_attention(
            q, k, v, mask=jnp.broadcast_to(mask[None], (2, 1, 64)), impl="xla"
        )
        assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            jnp.bfloat16, atol=5e-2,
        )


class TestPrefillMask:
    def test_sliding_window_prefill(self):
        q, k, v, _ = setup(L=64, S=64, seed=4)
        mask = sliding_window_mask(64, 64, window=16, offset=0)
        check(q, k, v, jnp.broadcast_to(mask[None], (2, 64, 64)))

    def test_blockwise_document_mask(self):
        """Two packed documents: tokens attend within their own document
        only (sequence-packing masks, a real serving pattern)."""
        L = S = 64
        q, k, v, _ = setup(L=L, S=S, seed=5)
        doc = np.zeros(S, np.int64)
        doc[32:] = 1
        causal = np.tril(np.ones((L, S), bool))
        same_doc = doc[:, None] == doc[None, :]
        m = np.where(causal & same_doc, 0.0, NEG).astype(np.float32)
        check(q, k, v, jnp.broadcast_to(jnp.asarray(m)[None], (2, L, S)))

    def test_4d_unit_head_mask_accepted(self):
        q, k, v, _ = setup(L=32, S=64, seed=6)
        mask = sliding_window_mask(32, 64, window=24, offset=32)
        m4 = jnp.broadcast_to(mask[None, None], (2, 1, 32, 64))
        got = flash_attention_pallas(q, k, v, mask=m4, interpret=True)
        want = flash_attention(q, k, v, mask=m4, impl="xla")
        assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            jnp.bfloat16, atol=5e-2,
        )

    def test_fully_masked_rows_are_finite(self):
        """A row whose mask hides every key must produce zeros (combine
        identity), never NaN."""
        L = S = 32
        q, k, v, _ = setup(B=1, L=L, S=S, seed=7)
        m = np.zeros((1, L, S), np.float32)
        m[0, 5, :] = NEG  # row 5 sees nothing
        got = flash_attention_pallas(q, k, v, mask=jnp.asarray(m),
                                     interpret=True)
        got = np.asarray(got, np.float32)
        assert np.isfinite(got).all()
        assert np.abs(got[0, :, 5, :]).max() < 1e-3

    def test_mask_with_uneven_tiles(self):
        """S not a multiple of the KV tile exercises the mask padding."""
        q, k, v, _ = setup(L=48, S=80, seed=8)
        mask = sliding_window_mask(48, 80, window=20, offset=32)
        check(q, k, v, jnp.broadcast_to(mask[None], (2, 48, 80)))


class TestPerHeadMask:
    """[B, Hq, L, S] masks stream per (request, head) block (round-5,
    VERDICT r4 missing #2 — previously routed to the XLA twin)."""

    def _head_mask(self, B, Hq, L, S, seed, lens=None):
        rng = np.random.default_rng(seed)
        # Distinct sliding window per head + random bias: any head mixup
        # in the index map produces a visible mismatch. Each row's window
        # trails its OWN last valid position so no row is fully masked
        # (fully-masked identity conventions differ between the Pallas
        # kernel and the XLA twin and are pinned by their own test).
        m = np.empty((B, Hq, L, S), np.float32)
        for b in range(B):
            off = (S if lens is None else int(lens[b])) - L
            for h in range(Hq):
                base = np.asarray(
                    sliding_window_mask(L, S, window=8 + 4 * h, offset=off)
                )
                m[b, h] = base + rng.normal(size=(L, S)) * 0.3
        return jnp.asarray(m)

    def test_per_head_mask_prefill(self):
        q, k, v, _ = setup(L=32, S=64, seed=9)
        m = self._head_mask(2, 8, 32, 64, seed=10)
        check(q, k, v, m)

    def test_per_head_mask_decode(self):
        q, k, v, _ = setup(L=1, S=64, seed=11)
        lens = jnp.asarray([64, 48], jnp.int32)
        m = self._head_mask(2, 8, 1, 64, seed=12, lens=[64, 48])
        check(q, k, v, m, lens=lens)

    def test_per_head_mask_decode_multiquery_rows(self):
        """L=4 decode rows x per-head masks: the reshaped
        [B, Hkv, n_rep, L, S] block ordering must match q's grouping."""
        q, k, v, _ = setup(L=4, S=64, seed=13)
        m = self._head_mask(2, 8, 4, 64, seed=14)
        check(q, k, v, m)

    def test_per_head_mask_uneven_tiles(self):
        q, k, v, _ = setup(L=48, S=80, seed=15)
        m = self._head_mask(2, 8, 48, 80, seed=16)
        check(q, k, v, m)

    def test_wrong_head_count_rejected(self):
        q, k, v, _ = setup(L=8, S=64, seed=17)
        m = jnp.zeros((2, 3, 8, 64), jnp.float32)  # 3 != Hq=8
        with pytest.raises(ValueError):
            flash_attention_pallas(q, k, v, mask=m, interpret=True)
