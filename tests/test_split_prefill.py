"""Split-attention chunked prefill: exactness of the prefix ⊕ chunk
softmax-state combine against full causal paged attention.

The reference computes offset>0 prefill chunks with one causal page-walk
kernel (paged_attention.metal:250-506); the split path must be
numerically equivalent (same softmax over the same key set, decomposed
into disjoint prefix/chunk parts — see kernels/split_prefill.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.kernels.paged_attention import paged_attention
from tiny_llm_tpu.kernels.split_prefill import (
    chunk_state_xla,
    combine_state_pair,
    prefix_state_xla,
    split_paged_prefill,
)
from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from .utils import assert_allclose


def _make_case(seed=0, B=2, Hq=4, Hkv=2, ps=8, D=64, L=24,
               offsets=(17, 0), P=17):
    """Pages filled with prefix+chunk K/V exactly as forward_step_paged
    leaves them: positions [0, offset) are prefix, [offset, offset+L) are
    the chunk (also present in the dense chunk arrays)."""
    rng = np.random.default_rng(seed)
    offsets = np.asarray(offsets, np.int32)
    assert offsets.shape[0] == B
    total = offsets + L
    maxp = int(-(-(total.max()) // ps)) + 1
    kp = rng.normal(size=(P, Hkv, ps, D)).astype(np.float32)
    vp = rng.normal(size=(P, Hkv, ps, D)).astype(np.float32)
    table = np.full((B, maxp), -1, np.int32)
    next_page = 1  # page 0 is the trash page
    for b in range(B):
        n = -(-int(total[b]) // ps)
        table[b, :n] = np.arange(next_page, next_page + n)
        next_page += n
    assert next_page <= P
    q = rng.normal(size=(B, Hq, L, D)).astype(np.float32)
    # The chunk K/V as dense arrays, mirrored into the pages at
    # positions [offset, offset + L).
    kc = rng.normal(size=(B, Hkv, L, D)).astype(np.float32)
    vc = rng.normal(size=(B, Hkv, L, D)).astype(np.float32)
    for b in range(B):
        for t in range(L):
            pos = int(offsets[b]) + t
            page = table[b, pos // ps]
            kp[page, :, pos % ps, :] = kc[b, :, t, :]
            vp[page, :, pos % ps, :] = vc[b, :, t, :]
    return (
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(table),
        jnp.asarray(offsets),
    )


def test_split_xla_matches_full_causal_paged():
    """Mixed offsets (non-page-aligned 17, and 0) must match the single
    causal paged-attention pass over the same pages."""
    q, kc, vc, kp, vp, table, offsets = _make_case()
    L = q.shape[2]
    got = split_paged_prefill(q, kc, vc, kp, vp, table, offsets, impl="xla")
    want = paged_attention(q, kp, vp, table, offsets + L, impl="xla")
    assert_allclose(got, want, jnp.float32, atol=1e-5, rtol=1e-5)


def test_combine_identity_for_empty_prefix():
    """An offset-0 row's prefix state is the combine identity: the split
    result equals the chunk-only attention."""
    q, kc, vc, kp, vp, table, offsets = _make_case(offsets=(0, 0))
    scale = q.shape[-1] ** -0.5
    o_c, m_c, l_c = chunk_state_xla(q, kc, vc, scale)
    o_p, m_p, l_p = prefix_state_xla(q, kp, vp, table, offsets, scale)
    assert np.all(np.asarray(l_p) == 0.0)
    combined = combine_state_pair(o_c, m_c, l_c, o_p, m_p, l_p)
    assert_allclose(combined, o_c, jnp.float32, atol=1e-6, rtol=1e-6)


def test_prefill_state_pallas_matches_oracle():
    from tiny_llm_tpu.kernels.flash_attention_pallas import (
        flash_prefill_state_pallas,
    )

    q, kc, vc, *_ = _make_case(L=32)
    scale = q.shape[-1] ** -0.5
    lens = jnp.full((q.shape[0],), q.shape[2], jnp.int32)
    o, m, l = flash_prefill_state_pallas(
        q, kc, vc, lens, scale=scale, causal=True, interpret=True
    )
    o_ref, m_ref, l_ref = chunk_state_xla(q, kc, vc, scale)
    # The Pallas kernel runs QK^T / PV on the MXU in bf16 (the production
    # dtype); the oracle is f32 — compare at the bf16 tolerance ladder.
    assert_allclose(o, o_ref, jnp.bfloat16)
    assert_allclose(m, m_ref, jnp.bfloat16)
    assert_allclose(l, l_ref, jnp.bfloat16, atol=5e-2)


def test_paged_prefix_state_pallas_matches_oracle():
    from tiny_llm_tpu.kernels.paged_attention_pallas import paged_prefix_state

    q, kc, vc, kp, vp, table, offsets = _make_case(offsets=(17, 3), L=32)
    scale = q.shape[-1] ** -0.5
    o, m, l = paged_prefix_state(
        q, kp, vp, table, offsets, scale=scale, interpret=True
    )
    o_ref, m_ref, l_ref = prefix_state_xla(q, kp, vp, table, offsets, scale)
    assert_allclose(o, o_ref, jnp.bfloat16)
    assert_allclose(m, m_ref, jnp.bfloat16)
    assert_allclose(l, l_ref, jnp.bfloat16, atol=5e-2)


def test_split_pallas_interpret_matches_full_causal():
    q, kc, vc, kp, vp, table, offsets = _make_case(offsets=(17, 9), L=32)
    L = q.shape[2]
    got = split_paged_prefill(
        q, kc, vc, kp, vp, table, offsets, impl="pallas", interpret=True
    )
    want = paged_attention(q, kp, vp, table, offsets + L, impl="xla")
    assert_allclose(got, want, jnp.bfloat16)


def test_model_split_prefill_matches_plain_paged():
    """Model-level: a 32-token chunk prefilled at offset>0 with
    split_attention produces the same logits as the plain paged path, and
    subsequent decode (which reads only the pages) is unaffected."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = random_params(cfg, key=0, quantized=True)

    def fresh(split: bool):
        m = Qwen3Model(params, cfg, max_seq_len=128).enable_paged_attention(
            num_pages=40, page_size=8
        )
        m.split_prefill = split
        m.split_prefill_min_chunk = 32  # exercise the path at test scale
        return m

    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=64).astype(np.int32)

    logits = {}
    for split in (False, True):
        model = fresh(split)
        cache = model.create_kv_cache()
        # Chunked prefill: 24 (offset 0, local path) + 40 (offset 24 —
        # split path when enabled; 40 > the L>16 gate).
        model(prompt[None, :24], offset=0, cache=cache, logits_to_keep=1)
        out = model(prompt[None, 24:], offset=24, cache=cache,
                    logits_to_keep=1)
        # One decode step on the pages written by the chunk.
        step = model(np.asarray([[7]], np.int32), offset=64, cache=cache,
                     logits_to_keep=1)
        logits[split] = (np.asarray(out), np.asarray(step))
        cache.release()

    assert_allclose(logits[True][0], logits[False][0], jnp.bfloat16,
                    atol=5e-2, rtol=5e-2, message="chunk logits")
    assert_allclose(logits[True][1], logits[False][1], jnp.bfloat16,
                    atol=5e-2, rtol=5e-2, message="decode logits")
