#!/usr/bin/env python
"""On-device Pallas kernel gate (VERDICT round-2 item #7).

Compiles and oracle-checks every Pallas kernel family at ONE small shape
on the real TPU, so kernel regressions surface without a benchmark
campaign. Prints one JSON line: {"passed": [...], "failed": {...}} and
exits non-zero on any failure. Runnable by the bench driver alongside
bench.py (reference analog: real-hardware CI, .github/workflows/macos.yml).

Usage: python scripts/tpu_smoke.py           (~5 min: one remote compile
per kernel family; subsequent runs hit the compilation cache)
"""

from __future__ import annotations

import json
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _close(got, want, atol=5e-2, rtol=5e-2):
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=rtol, atol=atol,
    )


def smoke_flash_prefill():
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.kernels.flash_attention_pallas import flash_attention_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 8, 128, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 4, 128, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 4, 128, 64)), jnp.bfloat16)
    got = flash_attention_pallas(q, k, v, mask="causal")
    want = flash_attention(q, k, v, mask="causal", impl="xla")
    _close(got, want)


def smoke_flash_decode():
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.kernels.flash_attention_pallas import flash_attention_pallas

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 8, 1, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 4, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 4, 256, 64)), jnp.bfloat16)
    lens = jnp.asarray([100, 256], jnp.int32)
    got = flash_attention_pallas(q, k, v, mask="causal", lens=lens)
    want = flash_attention(q, k, v, mask="causal", lens=lens, impl="xla")
    _close(got, want)


def smoke_per_head_mask():
    """Round-5: [B, Hq, L, S] masks stream through the Pallas kernels
    (prefill AND decode) instead of the XLA twin."""
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.kernels.flash_attention_pallas import flash_attention_pallas

    rng = np.random.default_rng(21)
    B, Hq, Hkv, D, S = 2, 8, 4, 64, 128
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    for L in (1, 32):
        q = jnp.asarray(rng.normal(size=(B, Hq, L, D)), jnp.bfloat16)
        q_pos = S - L + np.arange(L)[:, None]
        k_pos = np.arange(S)[None, :]
        m = np.empty((B, Hq, L, S), np.float32)
        for h in range(Hq):
            vis = (k_pos <= q_pos) & (k_pos > q_pos - (8 + 8 * h))
            m[:, h] = np.where(vis, 0.0, -1e30) + rng.normal(size=(B, L, S)) * 0.3
        got = flash_attention_pallas(q, k, v, mask=jnp.asarray(m))
        want = flash_attention(q, k, v, mask=jnp.asarray(m), impl="xla")
        _close(got, want)


def _paged_setup(P=16, Hkv=4, ps=16, D=64, B=2, Hq=8, L=1, seed=2):
    rng = np.random.default_rng(seed)
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, Hq, L, D)), jnp.bfloat16)
    table = jnp.asarray([[1, 3, 5, -1], [2, 4, -1, -1]], jnp.int32)
    lens = jnp.asarray([3 * ps - 5, ps + 7], jnp.int32)
    return q, kp, vp, table, lens


def smoke_paged_decode():
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.kernels.paged_attention_pallas import paged_flash_decode

    q, kp, vp, table, lens = _paged_setup()
    got = paged_flash_decode(q, kp, vp, table, lens,
                             scale=q.shape[-1] ** -0.5)
    want = paged_attention(q, kp, vp, table, lens, impl="xla")
    _close(got, want)


def smoke_paged_decode_gather():
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.kernels.paged_attention_pallas import (
        paged_flash_decode_gather,
    )

    # The gather schedule's manual page DMAs need lane-aligned head
    # dim (D=128, the production head size); D=64 fails Mosaic tiling.
    q, kp, vp, table, lens = _paged_setup(seed=3, D=128)
    got = paged_flash_decode_gather(q, kp, vp, table, lens,
                                    scale=q.shape[-1] ** -0.5)
    want = paged_attention(q, kp, vp, table, lens, impl="xla")
    _close(got, want)


def smoke_paged_decode_pages():
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.kernels.paged_attention_pallas import (
        paged_flash_decode_pages,
    )

    # Whole-page blocks [1, Hkv, ps, D]: the scan-safe fast schedule.
    q, kp, vp, table, lens = _paged_setup(seed=5, D=128)
    got = paged_flash_decode_pages(q, kp, vp, table, lens,
                                   scale=q.shape[-1] ** -0.5)
    want = paged_attention(q, kp, vp, table, lens, impl="xla")
    _close(got, want)


def smoke_paged_prefill():
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.kernels.paged_attention_pallas import paged_flash_prefill

    q, kp, vp, table, lens = _paged_setup(L=32, seed=4)
    # Every row must have at least L context (queries are the LAST L
    # tokens); the default second-row length (23) would put queries
    # before position 0.
    lens = jnp.asarray([43, 37], jnp.int32)
    got = paged_flash_prefill(q, kp, vp, table, lens,
                              scale=q.shape[-1] ** -0.5)
    want = paged_attention(q, kp, vp, table, lens, mask="causal", impl="xla")
    _close(got, want)


def smoke_quant_matmul():
    from tiny_llm_tpu.kernels.quant_matmul import quantized_matmul
    from tiny_llm_tpu.ops.quantize import dequantize, quantize

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(512, 1024)).astype(np.float32) * 0.1)
    qt = jax.jit(quantize, static_argnames=("group_size", "bits", "layout"))(
        w, layout="magic_t"
    )
    wd = dequantize(qt, jnp.bfloat16)[:, :1024]
    for rows in (1, 64):  # matvec and matmul dispatch arms
        x = jnp.asarray(rng.normal(size=(rows, 1024)), jnp.bfloat16)
        got = quantized_matmul(x, qt)
        want = x @ wd.T
        _close(got, want, atol=0.5)


def smoke_pair_quant_matmul():
    """Round-5 W4A8 family: pair_t decode a8 vs the exact W4A8 oracle,
    pair a16 + staged prefill vs the dequant oracle — compiled on the
    real device (interpret-mode parity lives in tests/test_quantize.py)."""
    from tiny_llm_tpu.kernels.quant_matmul import quantized_matmul
    from tiny_llm_tpu.ops.quantize import convert_layout, dequantize, quantize

    rng = np.random.default_rng(15)
    w = jnp.asarray(rng.normal(size=(512, 1024)).astype(np.float32) * 0.1)
    qp = convert_layout(
        jax.jit(quantize, static_argnames=("group_size", "bits", "layout"))(
            w, layout="magic_t"
        ),
        "pair_t",
    )
    wd = np.asarray(dequantize(qp, jnp.float32))[:, :1024]
    x = jnp.asarray(rng.normal(size=(8, 1024)), jnp.bfloat16)
    got8 = np.asarray(
        jax.device_get(quantized_matmul(x, qp, act="int8")), np.float32
    )
    xf = np.asarray(x, np.float32)
    sx = np.abs(xf).max(axis=1, keepdims=True) / 127.0
    xq = np.clip(np.round(xf / sx), -127, 127)
    want8 = (sx * xq) @ wd.T
    assert np.abs(got8 - want8).max() / max(np.abs(want8).max(), 1e-6) < 1e-2
    for rows, act in ((8, "bf16"), (256, "bf16")):
        xr = jnp.asarray(rng.normal(size=(rows, 1024)), jnp.bfloat16)
        got = quantized_matmul(xr, qp, act=act)
        _close(got, jnp.asarray(np.asarray(xr, np.float32) @ wd.T), atol=0.5)


def smoke_moe_pair_walk():
    from tiny_llm_tpu.kernels.moe_matmul import _gqmm_pair_pallas
    from tiny_llm_tpu.ops.quantize import (
        convert_layout_stacked,
        dequantize,
        quantize_stacked,
    )

    rng = np.random.default_rng(16)
    E, N, K, T = 8, 256, 512, 16
    w = jnp.asarray(rng.normal(size=(E, N, K)).astype(np.float32) * 0.1)
    qt = jax.jit(
        quantize_stacked, static_argnames=("group_size", "bits", "layout")
    )(w, layout="magic_t")
    sp = convert_layout_stacked(qt, "pair_t")
    ids = np.sort(rng.integers(0, E, size=T))
    sizes = jnp.asarray(np.bincount(ids, minlength=E), jnp.int32)
    x = jnp.asarray(rng.normal(size=(T, sp.k_padded)), jnp.bfloat16)
    wd = np.asarray(dequantize(sp, jnp.float32))
    xf = np.asarray(x, np.float32)
    sx = np.abs(xf).max(axis=1, keepdims=True) / 127.0
    xq = np.clip(np.round(xf / sx), -127, 127)
    want = np.einsum("tk,tnk->tn", sx * xq, wd[ids])
    got = np.asarray(
        jax.device_get(
            _gqmm_pair_pallas(
                x, sp.packed, sp.scales, sp.biases, sizes,
                group_size=sp.group_size, bits=sp.bits, a8=True,
            )
        ),
        np.float32,
    )
    assert np.abs(got - want).max() / max(np.abs(want).max(), 1e-6) < 1e-2


def smoke_moe_gather_and_walk():
    from tiny_llm_tpu.kernels.moe_matmul import (
        _gqmm_gather_pallas,
        _gqmm_magic_pallas,
    )
    from tiny_llm_tpu.ops.quantize import dequantize, quantize_stacked

    rng = np.random.default_rng(6)
    E, N, K, T = 8, 256, 512, 16
    w = jnp.asarray(rng.normal(size=(E, N, K)).astype(np.float32) * 0.1)
    qt = jax.jit(
        quantize_stacked, static_argnames=("group_size", "bits", "layout")
    )(w, layout="magic_t")
    ids = np.sort(rng.integers(0, E, size=T))
    sizes = jnp.asarray(np.bincount(ids, minlength=E), jnp.int32)
    x = jnp.asarray(rng.normal(size=(T, qt.k_padded)), jnp.bfloat16)
    wd = dequantize(qt, jnp.bfloat16)[..., :K]
    want = jnp.einsum("tk,tnk->tn", x[:, :K].astype(jnp.float32),
                      wd[ids].astype(jnp.float32))
    for fn in (_gqmm_gather_pallas, _gqmm_magic_pallas):
        got = fn(x, qt.packed, qt.scales, qt.biases, sizes,
                 group_size=qt.group_size, bits=qt.bits)
        _close(got, want, atol=0.5)


def smoke_split_prefill():
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.kernels.split_prefill import split_paged_prefill

    rng = np.random.default_rng(7)
    P, Hkv, ps, D, B, Hq, L = 16, 4, 16, 64, 1, 8, 32
    kp = jnp.zeros((P, Hkv, ps, D), jnp.bfloat16)
    vp = jnp.zeros((P, Hkv, ps, D), jnp.bfloat16)
    offsets = jnp.asarray([ps], jnp.int32)  # one full prefix page
    prefix_k = jnp.asarray(rng.normal(size=(B, Hkv, ps, D)), jnp.bfloat16)
    prefix_v = jnp.asarray(rng.normal(size=(B, Hkv, ps, D)), jnp.bfloat16)
    # page layout [Hkv, ps, D]: page 1 holds the whole prefix
    kp = kp.at[1].set(prefix_k[0])
    vp = vp.at[1].set(prefix_v[0])
    q = jnp.asarray(rng.normal(size=(B, Hq, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, L, D)), jnp.bfloat16)
    table = jnp.asarray([[1, 2, 3, -1]], jnp.int32)
    got = split_paged_prefill(q, k, v, kp, vp, table, offsets)
    k_full = jnp.concatenate([prefix_k, k], axis=2)
    v_full = jnp.concatenate([prefix_v, v], axis=2)
    lens = offsets + L
    want = flash_attention(q, k_full, v_full, mask="causal", lens=lens,
                           impl="xla")
    _close(got, want)


def smoke_fused_decode_attention():
    """Fused qkv-split + QK-norm + RoPE + flash decode (round-4 kernel)
    vs the unfused op chain at matching rounding points."""
    from tiny_llm_tpu.kernels.fused_decode_attention import fused_decode_attention
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.ops.norm import rms_norm
    from tiny_llm_tpu.ops.rope import apply_rope, rope_tables

    rng = np.random.default_rng(9)
    B, Hkv, n_rep, D, S = 2, 4, 2, 128, 256
    qkv_rows = jnp.asarray(rng.normal(size=(B, Hkv, n_rep + 2, D)), jnp.bfloat16)
    keys = jnp.asarray(rng.normal(size=(2, B, Hkv, S, D)), jnp.bfloat16)
    values = jnp.asarray(rng.normal(size=(2, B, Hkv, S, D)), jnp.bfloat16)
    qw = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    kwt = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    offsets = jnp.asarray([40, 200], jnp.int32)
    cos_t, sin_t = rope_tables(D, S)
    scale = D ** -0.5
    got, k_row, v_row = fused_decode_attention(
        qkv_rows, keys, values, offsets,
        jnp.take(cos_t, offsets, axis=0), jnp.take(sin_t, offsets, axis=0),
        qw, kwt, layer_idx=1, scale=scale, eps=1e-6, window=S, bs=128,
    )
    # Unfused chain: norm/rope, scatter, dense flash with lens.
    q = rms_norm(qkv_rows[:, :, :n_rep, :].reshape(B, 1, Hkv * n_rep, D), qw, 1e-6)
    k = rms_norm(qkv_rows[:, :, n_rep, :].reshape(B, 1, Hkv, D), kwt, 1e-6)
    v = qkv_rows[:, :, n_rep + 1, :].reshape(B, 1, Hkv, D)
    q = apply_rope(q, cos_t, sin_t, offsets[:, None], D).transpose(0, 2, 1, 3)
    k = apply_rope(k, cos_t, sin_t, offsets[:, None], D).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    slab_k, slab_v = keys[1], values[1]
    for b in range(B):
        slab_k = jax.lax.dynamic_update_slice(
            slab_k, k[b][None], (jnp.int32(b), jnp.int32(0), offsets[b], jnp.int32(0)))
        slab_v = jax.lax.dynamic_update_slice(
            slab_v, v[b][None], (jnp.int32(b), jnp.int32(0), offsets[b], jnp.int32(0)))
    want = flash_attention(
        q, slab_k, slab_v, scale=scale, mask="causal", lens=offsets + 1,
        impl="xla",
    )
    _close(got.reshape(B, Hkv * n_rep, 1, D), want)
    _close(k_row.reshape(B, Hkv, 1, D), k, atol=3e-2)
    _close(v_row.reshape(B, Hkv, 1, D), v, atol=1e-6)


def smoke_fused_dense_model_parity():
    """Dense decode fast path (one-kernel fused attention) vs the
    unfused path over installed dense batch slots: same greedy tokens.
    (Requests installed — see the paged twin's docstring.)"""
    import os

    from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params

    cfg = QWEN3_CONFIGS["qwen3-0.6b"]
    rng = np.random.default_rng(12)
    p0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 24)), jnp.int32)
    p1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 17)), jnp.int32)
    results = {}
    prev = os.environ.get("TLT_FUSED_ATTN")
    try:
        for arm, env in (("fused", "1"), ("unfused", "0")):
            os.environ["TLT_FUSED_ATTN"] = env
            model = Qwen3Model(
                synthetic_quantized_params(cfg, key=5), cfg, max_seq_len=256
            )
            batch = model.create_batching_kv_cache(max_active_requests=2)
            toks, offs = [], []
            for slot_i, pr in ((0, p0), (1, p1)):
                c = model.create_kv_cache()
                lg = model(pr, 0, c, logits_to_keep=1)
                toks.append(int(jax.device_get(
                    jnp.argmax(lg[:, -1].astype(jnp.float32), -1))[0]))
                batch.add_request(c, slot_i)
                offs.append(pr.shape[1])
            tok = np.asarray(toks, np.int32)
            offs = np.asarray(offs, np.int32)
            hist = [tok.copy()]
            for _ in range(8):
                lg = model(tok[:, None], list(offs), batch, logits_to_keep=1)
                lp = lg[:, -1].astype(jnp.float32)
                tok = np.asarray(jax.device_get(jnp.argmax(lp, -1)), np.int32)
                hist.append(tok.copy())
                offs = offs + 1
            results[arm] = (np.stack(hist), np.asarray(jax.device_get(lp)))
    finally:
        if prev is None:
            os.environ.pop("TLT_FUSED_ATTN", None)
        else:
            os.environ["TLT_FUSED_ATTN"] = prev
    assert np.array_equal(results["fused"][0], results["unfused"][0]), (
        results["fused"][0], results["unfused"][0])
    _close(results["fused"][1], results["unfused"][1], atol=8e-2, rtol=8e-2)


def smoke_fused_paged_model_parity():
    """Paged decode fast path (one-kernel fused attention + DUS page
    writes) vs the unfused path with REAL INSTALLED REQUESTS: same
    greedy tokens, close logits. Requests must be installed — idle
    batch slots legitimately produce different garbage per path (their
    outputs are discarded and writes land on the trash page); an early
    version of this check compared idle-slot garbage and misread the
    difference as corruption. TLT_FUSED_ATTN is read at trace time, so
    each arm traces its own model instance."""
    import os

    from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params

    cfg = QWEN3_CONFIGS["qwen3-0.6b"]
    rng = np.random.default_rng(11)
    p0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 24)), jnp.int32)
    p1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 30)), jnp.int32)
    results = {}
    prev = os.environ.get("TLT_FUSED_ATTN")
    try:
        for arm, env in (("fused", "1"), ("unfused", "0")):
            os.environ["TLT_FUSED_ATTN"] = env
            model = Qwen3Model(
                synthetic_quantized_params(cfg, key=3), cfg, max_seq_len=256
            )
            model.enable_paged_attention(page_size=16)
            batch = model.create_batching_kv_cache(max_active_requests=2)
            toks, offs = [], []
            for slot_i, pr in ((0, p0), (1, p1)):
                c = model.create_kv_cache()
                lg = model(pr, 0, c, logits_to_keep=1)
                toks.append(int(jax.device_get(
                    jnp.argmax(lg[:, -1].astype(jnp.float32), -1))[0]))
                batch.add_request(c, slot_i)
                offs.append(pr.shape[1])
            tok = np.asarray(toks, np.int32)
            offs = np.asarray(offs, np.int32)
            hist = [tok.copy()]
            for _ in range(8):
                lg = model(tok[:, None], list(offs), batch, logits_to_keep=1)
                lp = lg[:, -1].astype(jnp.float32)
                tok = np.asarray(jax.device_get(jnp.argmax(lp, -1)), np.int32)
                hist.append(tok.copy())
                offs = offs + 1
            results[arm] = (np.stack(hist), np.asarray(jax.device_get(lp)))
    finally:
        if prev is None:
            os.environ.pop("TLT_FUSED_ATTN", None)
        else:
            os.environ["TLT_FUSED_ATTN"] = prev
    assert np.array_equal(results["fused"][0], results["unfused"][0]), (
        results["fused"][0], results["unfused"][0])
    _close(results["fused"][1], results["unfused"][1], atol=8e-2, rtol=8e-2)


def smoke_axpby():
    from tiny_llm_tpu.kernels.axpby import axpby

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    _close(axpby(x, y, alpha=2.0, beta=3.0), 2.0 * x + 3.0 * y, atol=1e-5)


SMOKES = [
    ("flash_prefill", smoke_flash_prefill),
    ("flash_decode", smoke_flash_decode),
    ("per_head_mask", smoke_per_head_mask),
    ("paged_decode", smoke_paged_decode),
    ("paged_decode_gather", smoke_paged_decode_gather),
    ("paged_decode_pages", smoke_paged_decode_pages),
    ("paged_prefill", smoke_paged_prefill),
    ("quant_matmul", smoke_quant_matmul),
    ("moe_gqmm", smoke_moe_gather_and_walk),
    ("pair_quant_matmul", smoke_pair_quant_matmul),
    ("moe_pair_walk", smoke_moe_pair_walk),
    ("split_prefill", smoke_split_prefill),
    ("fused_decode_attention", smoke_fused_decode_attention),
    ("fused_dense_model_parity", smoke_fused_dense_model_parity),
    ("fused_paged_model_parity", smoke_fused_paged_model_parity),
    ("axpby", smoke_axpby),
]


def main() -> int:
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    passed, failed = [], {}
    for name, fn in SMOKES:
        try:
            fn()
            passed.append(name)
            print(f"PASS {name}", file=sys.stderr, flush=True)
        except Exception as e:
            failed[name] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
    print(json.dumps({
        "metric": "tpu_kernel_smoke",
        "backend": backend,
        "device": str(jax.devices()[0]),
        "passed": passed,
        "failed": failed,
        "ok": not failed,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
