"""Weight-only affine group quantization (W4A16 and friends).

Semantics parity with MLX group quantization as used by the reference
(/root/reference/src/tiny_llm_ref/quantize.py:103-121): weights are split
into `group_size` groups along the input dimension; each group stores a
scale and bias with `w ~= q * scale + bias`, q unsigned `bits`-bit.

TPU-first storage layout (deliberately different from MLX): values are
packed in SUPERGROUPS of `vpw * group_size` values (vpw = 32 / bits; 1024
for W4 g128). Within a supergroup, nibble-plane j of the `group_size`
uint32 words is exactly quant group j:

    packed[n, sg * group_size + w]  bits [4j, 4j+4)  =  q[n, sg*1024 + j*128 + w]

A Pallas kernel can therefore dequantize with one shift+mask per group, a
per-group sublane broadcast of scale/bias, and a lane-axis concat — no
cross-lane interleave at all. (MLX's consecutive little-endian packing
would force an 8-way lane shuffle on the VPU.) K is padded in storage to a
supergroup multiple; padded groups dequantize to exactly 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import pytree_dataclass, static_field


def _values_per_word(bits: int) -> int:
    assert bits in (2, 4, 8), f"unsupported bits {bits}"
    return 32 // bits


def supergroup_values(group_size: int, bits: int) -> int:
    return _values_per_word(bits) * group_size


@pytree_dataclass
class QuantizedTensor:
    """Group-quantized 2-D weight with logical shape [out_features, in_features].

    Fields:
      packed: uint32 [N, k_padded // values_per_word], supergroup layout
      scales: [N, k_padded // group_size]
      biases: [N, k_padded // group_size]
      group_size, bits: quantization parameters (static)
      out_features, in_features: logical shape (static)
      k_padded: storage K, a supergroup multiple (static)
    """

    packed: jax.Array
    scales: jax.Array
    biases: jax.Array
    group_size: int = static_field(default=128)
    bits: int = static_field(default=4)
    out_features: int = static_field(default=0)
    in_features: int = static_field(default=0)
    k_padded: int = static_field(default=0)

    @property
    def shape(self):
        return (self.out_features, self.in_features)


def pack_supergroup(q: jax.Array, group_size: int, bits: int) -> jax.Array:
    """Pack unsigned values [N, K_pad] -> uint32 [N, K_pad / vpw].

    K_pad must be a supergroup multiple. See module docstring for layout.
    """
    vpw = _values_per_word(bits)
    sg_vals = vpw * group_size
    *lead, K = q.shape
    assert K % sg_vals == 0, f"K={K} not a supergroup ({sg_vals}) multiple"
    qv = q.reshape(*lead, K // sg_vals, vpw, group_size).astype(jnp.uint32)
    word = jnp.zeros((*lead, K // sg_vals, group_size), dtype=jnp.uint32)
    for j in range(vpw):
        word = word | (qv[..., j, :] << (bits * j))
    return word.reshape(*lead, K // vpw)


def unpack_supergroup(
    packed: jax.Array, k_padded: int, group_size: int, bits: int
) -> jax.Array:
    """Inverse of pack_supergroup -> int32 values [N, K_pad]."""
    vpw = _values_per_word(bits)
    sg_vals = vpw * group_size
    *lead, _ = packed.shape
    words = packed.reshape(*lead, k_padded // sg_vals, 1, group_size)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits).reshape(1, vpw, 1)
    vals = (words >> shifts) & jnp.uint32((1 << bits) - 1)
    return vals.reshape(*lead, k_padded).astype(jnp.int32)


def unpack_mlx(packed: jax.Array, bits: int) -> jax.Array:
    """Unpack MLX layout: consecutive values little-endian within each word.

    Matches dequantize_weights in the reference (quantize.py:110-115).
    """
    vpw = _values_per_word(bits)
    shifts = jnp.arange(0, 32, bits, dtype=jnp.uint32)
    vals = (packed[..., None].astype(jnp.uint32) >> shifts) & jnp.uint32((1 << bits) - 1)
    return vals.reshape(*packed.shape[:-1], packed.shape[-1] * vpw).astype(jnp.int32)


def _from_values(
    vals: jax.Array,  # int [N, K] in 0..2^bits-1
    scales: jax.Array,  # [N, K // group_size]
    biases: jax.Array,
    group_size: int,
    bits: int,
    K: int,
) -> QuantizedTensor:
    N = vals.shape[0]
    sg_vals = supergroup_values(group_size, bits)
    k_padded = ((K + sg_vals - 1) // sg_vals) * sg_vals
    g_padded = k_padded // group_size
    G = K // group_size
    if k_padded != K:
        vals = jnp.pad(vals, ((0, 0), (0, k_padded - K)))
        scales = jnp.pad(
            scales, ((0, 0), (0, g_padded - G)), constant_values=1
        )
        biases = jnp.pad(biases, ((0, 0), (0, g_padded - G)))
    return QuantizedTensor(
        packed=pack_supergroup(vals.astype(jnp.uint32), group_size, bits),
        scales=scales.astype(jnp.bfloat16),
        biases=biases.astype(jnp.bfloat16),
        group_size=group_size,
        bits=bits,
        out_features=N,
        in_features=K,
        k_padded=k_padded,
    )


def quantize(w: jax.Array, group_size: int = 128, bits: int = 4) -> QuantizedTensor:
    """Affine group quantization: per group scale = (max-min)/(2^bits - 1),
    bias = min, q = round((w - bias) / scale)."""
    N, K = w.shape
    assert K % group_size == 0, f"K={K} not a multiple of group_size={group_size}"
    levels = (1 << bits) - 1
    wg = w.astype(jnp.float32).reshape(N, K // group_size, group_size)
    gmax = jnp.max(wg, axis=-1)
    gmin = jnp.min(wg, axis=-1)
    scale = (gmax - gmin) / levels
    scale = jnp.where(scale == 0, jnp.ones_like(scale), scale)
    q = jnp.clip(jnp.round((wg - gmin[..., None]) / scale[..., None]), 0, levels)
    return _from_values(
        q.reshape(N, K).astype(jnp.int32), scale, gmin, group_size, bits, K
    )


def from_mlx_packing(
    mlx_weight: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    group_size: int,
    bits: int,
) -> QuantizedTensor:
    """Ingest an MLX-packed checkpoint layer into the supergroup layout."""
    vpw = _values_per_word(bits)
    N = mlx_weight.shape[0]
    K = mlx_weight.shape[-1] * vpw
    vals = unpack_mlx(mlx_weight, bits).reshape(N, K)
    return _from_values(vals, scales, biases, group_size, bits, K)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the dense weight [..., N, K]: w = q * scale + bias.

    Supports stacked expert tensors (leading dims before [N, K])."""
    vals = unpack_supergroup(qt.packed, qt.k_padded, qt.group_size, qt.bits)
    *lead, _ = qt.packed.shape
    G = qt.k_padded // qt.group_size
    vg = vals.reshape(*lead, G, qt.group_size).astype(jnp.float32)
    w = (
        vg * qt.scales.astype(jnp.float32)[..., None]
        + qt.biases.astype(jnp.float32)[..., None]
    )
    return w.reshape(*lead, qt.k_padded)[..., : qt.in_features].astype(dtype)


def quantized_linear(
    x: jax.Array,
    qt: QuantizedTensor,
    bias: jax.Array | None = None,
    impl: str | None = None,
) -> jax.Array:
    """y = x @ dequant(qt).T (+ bias), dispatching to the Pallas
    dequant-fused kernel on TPU (see kernels/quant_matmul.py). Mirrors the
    reference's matvec-vs-matmul kernel selection (quantize.py:49-90)."""
    from ..kernels import quantized_matmul

    return quantized_matmul(x, qt, bias=bias, impl=impl)
