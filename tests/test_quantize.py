"""Quantization layout + numerics tests.

Mirrors the reference's week-2 day-3 strategy
(tests_refsol/test_week_2_day_3.py): quantize/dequantize round-trips,
quantized matmul vs the dequantized oracle at both toy and real shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.ops import (
    QuantizedTensor,
    dequantize,
    from_mlx_packing,
    quantize,
    quantized_linear,
    quantized_embedding_gather,
)
from tiny_llm_tpu.ops.quantize import (
    pack_supergroup,
    supergroup_values,
    unpack_mlx,
    unpack_supergroup,
)
from tiny_llm_tpu.kernels import quantized_matmul
from .utils import assert_allclose


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for N, K in [(4, 1024), (8, 2048), (3, 1024)]:
        q = rng.integers(0, 16, size=(N, K), dtype=np.uint32)
        packed = pack_supergroup(jnp.asarray(q), 128, 4)
        assert packed.shape == (N, K // 8)
        out = unpack_supergroup(packed, K, 128, 4)
        np.testing.assert_array_equal(np.asarray(out), q.astype(np.int32))


def test_supergroup_layout_definition():
    """Nibble-plane j of word w in supergroup sg = value sg*1024 + j*128 + w."""
    K = 1024
    q = np.arange(K, dtype=np.uint32) % 16
    packed = np.asarray(pack_supergroup(jnp.asarray(q[None]), 128, 4))[0]
    for w in [0, 17, 127]:
        for j in range(8):
            expect = q[j * 128 + w]
            got = (packed[w] >> (4 * j)) & 0xF
            assert got == expect, (w, j)


def test_unpack_mlx_layout():
    """MLX packs consecutive values little-endian within each uint32."""
    vals = np.arange(8, dtype=np.uint32) % 16
    word = 0
    for i, v in enumerate(vals):
        word |= int(v) << (4 * i)
    out = unpack_mlx(jnp.asarray([[word]], dtype=jnp.uint32), 4)
    np.testing.assert_array_equal(np.asarray(out)[0], vals.astype(np.int32))


@pytest.mark.parametrize("shape", [(16, 1024), (10, 2560), (64, 128)])
def test_quantize_dequantize_roundtrip(shape):
    w = jax.random.normal(jax.random.key(0), shape, dtype=jnp.float32)
    qt = quantize(w, group_size=128, bits=4)
    w_hat = dequantize(qt, dtype=jnp.float32)
    assert w_hat.shape == shape
    # 4-bit affine error bound: half a quantization step per element, plus
    # bf16 rounding of the stored scales/biases (|q*Δs| <= 15*s*2^-9,
    # |Δb| <= |min|*2^-9).
    step = np.abs(np.asarray(qt.scales, dtype=np.float32)).max()
    err = np.abs(np.asarray(w_hat) - np.asarray(w)).max()
    assert err <= step * 0.55 + 0.03, (err, step)


def test_from_mlx_packing_matches_mlx_dequant():
    """Ingesting MLX-packed data must reproduce MLX's dequantization
    (reference quantize.py:103-121)."""
    rng = np.random.default_rng(1)
    N, K, gs = 6, 256, 128
    q = rng.integers(0, 16, size=(N, K), dtype=np.uint32)
    # MLX pack: 8 consecutive values per word, little-endian.
    words = np.zeros((N, K // 8), dtype=np.uint32)
    for i in range(8):
        words |= q[:, i::8] << (4 * i)
    # careful: MLX packs q[:, 8p + i] into nibble i of word p:
    words = np.zeros((N, K // 8), dtype=np.uint32)
    for p in range(K // 8):
        for i in range(8):
            words[:, p] |= q[:, 8 * p + i] << (4 * i)
    scales = rng.uniform(0.01, 0.2, size=(N, K // gs)).astype(np.float32)
    biases = rng.uniform(-1, 1, size=(N, K // gs)).astype(np.float32)
    qt = from_mlx_packing(jnp.asarray(words), jnp.asarray(scales), jnp.asarray(biases), gs, 4)
    w_hat = np.asarray(dequantize(qt, dtype=jnp.float32))
    expected = (
        q.reshape(N, K // gs, gs) * scales[..., None] + biases[..., None]
    ).reshape(N, K)
    # bf16 scales/biases storage rounds; compare with bf16 tolerance.
    assert_allclose(w_hat, expected, jnp.bfloat16)


@pytest.mark.parametrize("rows", [1, 8, 100])
@pytest.mark.parametrize("shape", [(256, 1024), (300, 2560)])
def test_quantized_matmul_xla_vs_oracle(rows, shape):
    N, K = shape
    w = jax.random.normal(jax.random.key(0), (N, K), dtype=jnp.float32) * 0.05
    x = jax.random.normal(jax.random.key(1), (rows, K), dtype=jnp.bfloat16)
    qt = quantize(w)
    expected = x.astype(jnp.float32) @ dequantize(qt, jnp.float32).T
    got = quantized_matmul(x, qt, impl="xla")
    assert got.dtype == x.dtype
    assert_allclose(got, expected, jnp.bfloat16, atol=0.5)


@pytest.mark.parametrize("rows", [1, 8, 100])
def test_quantized_matmul_pallas_interpret_vs_xla(rows):
    """Pallas kernel (interpret mode on CPU) must match the XLA path."""
    N, K = 256, 2560
    w = jax.random.normal(jax.random.key(0), (N, K), dtype=jnp.float32) * 0.05
    x = jax.random.normal(jax.random.key(1), (rows, K), dtype=jnp.bfloat16)
    qt = quantize(w)
    expected = quantized_matmul(x, qt, impl="xla")
    got = quantized_matmul(x, qt, impl="pallas", interpret=True)
    assert_allclose(got, expected, jnp.bfloat16, atol=0.2)


@pytest.mark.parametrize("shape", [(512, 1024), (512, 1920)])  # 1920: padded K
def test_quantized_matmul_k_split_matches_full_k(shape):
    """Explicit k_split partial accumulation must match the full-K kernel,
    including when K padding misaligns the scale grid (scale rows are
    padded to the Kp grid with zero scale AND bias)."""
    from tiny_llm_tpu.kernels.quant_matmul import _qmm_magic_pallas

    N, K = shape
    w = jax.random.normal(jax.random.key(0), (N, K), dtype=jnp.float32) * 0.05
    x = jax.random.normal(jax.random.key(1), (1, K), dtype=jnp.bfloat16)
    qt = quantize(w, layout="magic_t")
    xp = x
    if qt.k_padded != K:
        xp = jnp.pad(x, ((0, 0), (0, qt.k_padded - K)))
    ref = _qmm_magic_pallas(
        xp, qt.packed, qt.scales, qt.biases,
        group_size=128, bits=4, k_split=1, interpret=True)
    got = _qmm_magic_pallas(
        xp, qt.packed, qt.scales, qt.biases,
        group_size=128, bits=4, k_split=2, interpret=True)
    assert_allclose(got, ref, jnp.bfloat16, atol=0.05)


def test_quantized_matmul_bias_and_leading_dims():
    N, K = 128, 1024
    w = jax.random.normal(jax.random.key(0), (N, K)) * 0.05
    x = jax.random.normal(jax.random.key(1), (2, 3, K), dtype=jnp.bfloat16)
    b = jax.random.normal(jax.random.key(2), (N,), dtype=jnp.float32)
    qt = quantize(w)
    got = quantized_linear(x, qt, bias=b, impl="xla")
    assert got.shape == (2, 3, N)
    expected = x.reshape(-1, K).astype(jnp.float32) @ dequantize(qt, jnp.float32).T + b
    assert_allclose(got.reshape(-1, N), expected, jnp.bfloat16, atol=0.5)


def test_quantized_embedding_gather_matches_dequant_rows():
    V, D = 64, 256
    w = jax.random.normal(jax.random.key(0), (V, D)) * 0.1
    qt = quantize(w)
    ids = jnp.asarray([[0, 5, 63], [10, 10, 2]], dtype=jnp.int32)
    got = quantized_embedding_gather(qt, ids)
    expected = jnp.take(dequantize(qt, jnp.float32), ids, axis=0)
    assert got.shape == (2, 3, D)
    assert_allclose(got, expected, jnp.bfloat16)


def test_fused_rmsnorm_prologue_matches_separate():
    """quantized_matmul(norm_weight=...) == rms_norm then matmul (magic_t
    Pallas path, interpret mode)."""
    import jax
    import jax.numpy as jnp
    from tiny_llm_tpu.kernels import quant_matmul as qm
    from tiny_llm_tpu.kernels.quant_matmul import quantized_matmul
    from tiny_llm_tpu.ops.norm import rms_norm
    from tiny_llm_tpu.ops.quantize import quantize

    key = jax.random.key(7)
    w = jax.random.normal(key, (256, 512), jnp.float32) * 0.05
    qt = quantize(w)  # magic_t default
    assert qt.layout == "magic_t"
    nw = jax.random.normal(jax.random.fold_in(key, 1), (512,), jnp.float32) * 0.1 + 1.0
    nw = nw.astype(jnp.bfloat16)
    prev = qm.FUSE_NORM_ENABLED
    qm.FUSE_NORM_ENABLED = True  # exercise the kernel prologue path
    try:
        for M in (1, 4, 130):  # decode-fused + prefill (pre-normalized) paths
            x = jax.random.normal(jax.random.fold_in(key, M), (M, 512), jnp.bfloat16)
            ref = quantized_matmul(rms_norm(x, nw, 1e-6), qt, impl="xla")
            out = quantized_matmul(
                x, qt, impl="pallas", norm_weight=nw, eps=1e-6, interpret=True
            )
            assert out.shape == ref.shape
            import numpy as np

            a = np.asarray(out, np.float32)
            b = np.asarray(ref, np.float32)
            assert np.max(np.abs(a - b)) < 0.15, np.max(np.abs(a - b))
    finally:
        qm.FUSE_NORM_ENABLED = prev


def test_residual_epilogue_matches_post_add():
    """The fused residual epilogue (kernels/quant_matmul.py) must equal
    matmul-then-add on both the decode (M<=32) and staged prefill
    (M>=128) kernel paths, and on the XLA fallback."""
    import numpy as np

    from tiny_llm_tpu.kernels.quant_matmul import quantized_matmul

    rng = np.random.default_rng(5)
    N, K = 256, 256
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.05)
    qt = quantize(w, group_size=128, bits=4, layout="magic_t")
    for M in (1, 256):
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        r = jnp.asarray(rng.normal(size=(M, N)), jnp.bfloat16)
        base = quantized_matmul(x, qt, impl="pallas", interpret=True)
        fused = quantized_matmul(
            x, qt, residual=r, impl="pallas", interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(fused, np.float32),
            np.asarray(base + r, np.float32),
            atol=0.06, rtol=0.02,
        )
        xla = quantized_matmul(x, qt, residual=r, impl="xla")
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(xla, np.float32),
            atol=0.2, rtol=0.05,
        )


# ---------------------------------------------------------------------------
# pair_t layout (int8 nibble-pair consumption — the round-5 W4A8 path)
# ---------------------------------------------------------------------------


def test_pack_unpack_pair_t_roundtrip():
    from tiny_llm_tpu.ops.quantize import pack_pair_t, unpack_pair_t

    rng = np.random.default_rng(0)
    for N, K in [(4, 512), (8, 2560), (3, 1024)]:
        q = rng.integers(0, 16, size=(N, K), dtype=np.uint32)
        packed = pack_pair_t(jnp.asarray(q), 128, 4)
        assert packed.shape == (K // 8, N)
        out = unpack_pair_t(packed, K, 128, 4)
        np.testing.assert_array_equal(np.asarray(out), q.astype(np.int32))


def test_pair_t_int8_bitcast_extraction_is_k_ordered():
    """The load-bearing layout property: `word & 0x0F0F0F0F` bitcast to
    int8 must yield 256 CONSECUTIVE logical-k values (two quant groups as
    static row slices), `>> 4` the next 256 — this is what lets the
    kernel run s8 MXU dots with zero reordering."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tiny_llm_tpu.ops.quantize import pack_pair_t

    K, N = 512, 128
    # q[n, k] = k % 16 — distinguishable per logical position.
    q = np.tile((np.arange(K) % 16).astype(np.uint32), (N, 1))
    packed = pack_pair_t(jnp.asarray(q), 128, 4)  # [64, N]

    def kern(w_ref, lo_ref, hi_ref):
        m4 = jnp.uint32(0x0F0F0F0F)
        lo_ref[:] = pltpu.bitcast(w_ref[:] & m4, jnp.int8).astype(jnp.int32)
        hi_ref[:] = pltpu.bitcast((w_ref[:] >> 4) & m4, jnp.int8).astype(
            jnp.int32
        )

    lo, hi = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((256, N), jnp.int32),
            jax.ShapeDtypeStruct((256, N), jnp.int32),
        ),
        interpret=True,
    )(packed)
    np.testing.assert_array_equal(np.asarray(lo)[:, 0], np.arange(256) % 16)
    np.testing.assert_array_equal(
        np.asarray(hi)[:, 0], (np.arange(256, 512)) % 16
    )


def test_convert_layout_pair_t_exact():
    from tiny_llm_tpu.ops.quantize import convert_layout

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(16, 1024)).astype(np.float32) * 0.05)
    qt = quantize(w)  # magic_t default
    qp = convert_layout(qt, "pair_t")
    assert qp.layout == "pair_t"
    np.testing.assert_array_equal(
        np.asarray(dequantize(qt, jnp.float32)),
        np.asarray(dequantize(qp, jnp.float32)),
    )
    # Round trip back: packed bits identical.
    qm = convert_layout(qp, "magic_t")
    np.testing.assert_array_equal(np.asarray(qm.packed), np.asarray(qt.packed))


@pytest.mark.parametrize("rows", [1, 8, 256])
def test_pair_a16_matches_xla(rows):
    """pair_t W4A16-exact paths (decode bf16 dots at small M, staged
    512-deep dots at prefill M) vs the XLA dequant oracle."""
    from tiny_llm_tpu.ops.quantize import convert_layout

    N, K = 256, 2560
    w = jax.random.normal(jax.random.key(0), (N, K), dtype=jnp.float32) * 0.05
    x = jax.random.normal(jax.random.key(1), (rows, K), dtype=jnp.bfloat16)
    qp = convert_layout(quantize(w), "pair_t")
    expected = quantized_matmul(x, qp, impl="xla")
    got = quantized_matmul(x, qp, impl="pallas", act="bf16", interpret=True)
    assert_allclose(got, expected, jnp.bfloat16, atol=0.2)


@pytest.mark.parametrize("shape", [(256, 2560), (256, 1920)])  # 1920: padded K
def test_pair_a8_matches_w4a8_oracle(shape):
    """The W4A8 decode kernel must match the EXACT W4A8 semantics:
    y = (sx * round(x / sx)) @ dequant(W).T with per-row absmax int8
    activations — the activation quantization is the ONLY approximation,
    so the oracle is computable exactly in numpy (integer dots are exact;
    mismatch tolerance is output-bf16 rounding + f32 accumulation order).
    Includes a K that pads (padded groups must contribute nothing)."""
    from tiny_llm_tpu.ops.quantize import convert_layout

    N, K = shape
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.bfloat16)
    qp = convert_layout(quantize(w), "pair_t")
    got = np.asarray(
        quantized_matmul(x, qp, impl="pallas", act="int8", interpret=True),
        np.float32,
    )
    xf = np.asarray(x, np.float32)
    sx = np.abs(xf).max(axis=1, keepdims=True) / 127.0
    xq = np.clip(np.round(xf / sx), -127, 127)
    wd = np.asarray(dequantize(qp, jnp.float32))
    oracle = (sx * xq) @ wd.T
    scale = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / scale < 1e-2, (
        np.abs(got - oracle).max(),
        scale,
    )


def test_pair_a8_activation_error_is_bounded():
    """W4A8 vs W4A16 on the same weights: the activation-quantization
    error at decode shapes stays under ~2% of the output scale for
    normal activations (the accuracy budget the model-level eval then
    pins end to end)."""
    from tiny_llm_tpu.ops.quantize import convert_layout

    N, K = 512, 2560
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.bfloat16)
    qp = convert_layout(quantize(w), "pair_t")
    a16 = np.asarray(
        quantized_matmul(x, qp, impl="pallas", act="bf16", interpret=True),
        np.float32,
    )
    a8 = np.asarray(
        quantized_matmul(x, qp, impl="pallas", act="int8", interpret=True),
        np.float32,
    )
    assert np.abs(a8 - a16).max() / np.abs(a16).max() < 0.02


def test_pair_residual_epilogue():
    from tiny_llm_tpu.ops.quantize import convert_layout

    rng = np.random.default_rng(5)
    N, K = 256, 512
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.05)
    qp = convert_layout(quantize(w), "pair_t")
    for M, act in ((8, "int8"), (8, "bf16"), (256, "bf16")):
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        r = jnp.asarray(rng.normal(size=(M, N)), jnp.bfloat16)
        base = quantized_matmul(x, qp, impl="pallas", act=act, interpret=True)
        fused = quantized_matmul(
            x, qp, residual=r, impl="pallas", act=act, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(fused, np.float32),
            np.asarray(base + r, np.float32),
            atol=0.06,
            rtol=0.02,
        )
