"""Weight-only affine group quantization (W4A16 and friends).

Semantics parity with MLX group quantization as used by the reference
(/root/reference/src/tiny_llm_ref/quantize.py:103-121): weights are split
into `group_size` groups along the input dimension; each group stores a
scale and bias with `w ~= q * scale + bias`, q unsigned `bits`-bit.

TPU-first storage layouts (deliberately different from MLX), selected by
the static `layout` field:

* "magic_t" (default for 2-D W4): TRANSPOSED packing, `packed[K_pad/8, N]`
  uint32 with K on sublanes and N on lanes, `scales`/`biases` `[G, N]`
  float32. K pads to a multiple of 512 (a "magic supergroup" = 4 groups =
  64 word rows — every Qwen3 K is already a multiple, so padding is
  usually zero). Logical value k = sg*512 + j*128 + 2w + h is stored in
  word row sg*64 + w at bits [16h + 4j, 16h + 4j + 4), so nibble-pair
  plane j of a 64-word block is exactly quant group sg*4 + j. This is the
  layout the magic-number dequant consumes: `(word >> 4j) & 0x000F000F |
  0x43004300` bit-casts (pltpu.bitcast, which doubles the sublane dim) to
  bf16 values `128 + q` on ADJACENT sublanes in logical-k order, so the
  Pallas kernel dequants with 3 VPU ops per 8 values and feeds the MXU in
  native [K, N] orientation — no transpose, no per-value scale multiply
  (scale/bias fold per group AFTER the dot: w = (128+q)*s + (b-128*s)).

* "pair_t" (W4A8 / int8-pair consumption): TRANSPOSED packing with the
  same shapes as magic_t (`packed[K_pad/8, N]` uint32, `scales`/`biases`
  `[G, N]`), but nibbles arranged for the int8 NIBBLE-PAIR extraction:
  logical value k = sg*512 + c*256 + 4w + b is stored in word row
  sg*64 + w at bits [8b + 4c, 8b + 4c + 4). One `word & 0x0F0F0F0F`
  (c=0) or `(word >> 4) & 0x0F0F0F0F` (c=1) then pltpu.bitcast to int8
  (which quadruples the sublane dim, low byte first) yields 256
  CONSECUTIVE logical-k values per extraction — two quant groups as
  static row slices — at 3 VPU word-ops per 8 values (vs the magic
  trick's 3 per 2), ready for s8 MXU dots with the scale/bias fold
  after the dot. This is the layout the round-5 weight-stream
  diagnostic motivated (the W4A16 magic path is VPU-bound, not
  HBM-bound; int8-pair extraction measures at stream speed).

* "sg" (stacked experts / non-4-bit): `packed[..., N, K_pad/8]` uint32
  where nibble-plane j of the `group_size` words of supergroup sg is quant
  group j:

    packed[n, sg * group_size + w]  bits [4j, 4j+4)  =  q[n, sg*1024 + j*128 + w]

  Dequant is one shift+mask per group, a per-group sublane broadcast of
  scale/bias, and a lane-axis concat — no cross-lane interleave. (MLX's
  consecutive little-endian packing would force an 8-way lane shuffle.)

K is padded in storage to a supergroup multiple; padded groups dequantize
to exactly 0 (scale 1, bias 0, q 0 — and zero-padded activations anyway).
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

    Fields (see module docstring for the two layouts):
      packed: uint32 — "magic_t": [k_padded // vpw, N]; "sg": [N, k_padded // vpw]
      scales: "magic_t": float32 [G, N]; "sg": [N, G]
      biases: same shape as scales
      group_size, bits: quantization parameters (static)
      out_features, in_features: logical shape (static)
      k_padded: storage K, a supergroup multiple (static)
      layout: "magic_t" | "sg" (static)
    """

    packed: jax.Array
    scales: jax.Array
    biases: jax.Array
    group_size: int = static_field(default=128)
    bits: int = static_field(default=4)
    out_features: int = static_field(default=0)
    in_features: int = static_field(default=0)
    k_padded: int = static_field(default=0)
    layout: str = static_field(default="sg")

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


MAGIC_SUPERGROUP = 512  # 4 quant groups; 64 uint32 word rows


def pack_magic_t(q: jax.Array, group_size: int, bits: int) -> jax.Array:
    """Pack unsigned values [N, K_pad] -> uint32 [K_pad / vpw, N] (magic_t).

    Logical value k = sg*512 + j*128 + 2w + h lands in word row sg*64 + w
    at bits [16h + 4j, 16h + 4j + 4) so the in-kernel magic extraction
    yields logical-k-ordered bf16 sublanes, one quant group per extraction.
    W4 g128 only.
    """
    assert bits == 4 and group_size == 128, "magic_t layout is W4 g128 only"
    N, K = q.shape
    assert K % MAGIC_SUPERGROUP == 0, f"K={K} not a multiple of {MAGIC_SUPERGROUP}"
    n_sg = K // MAGIC_SUPERGROUP
    half = MAGIC_SUPERGROUP // 8  # 64 word rows per supergroup
    # [N, n_sg, j(4), w(64), h(2)]: k-order = j major, then w, then h.
    qv = q.reshape(N, n_sg, 4, half, 2).astype(jnp.uint32)
    word = jnp.zeros((N, n_sg, half), dtype=jnp.uint32)
    for j in range(4):
        word = word | (qv[:, :, j, :, 0] << (4 * j)) | (qv[:, :, j, :, 1] << (16 + 4 * j))
    return word.reshape(N, K // 8).T


def unpack_magic_t(
    packed_t: jax.Array, k_padded: int, group_size: int, bits: int
) -> jax.Array:
    """Inverse of pack_magic_t: uint32 [K_pad / vpw, N'] -> int32 [N', K_pad]."""
    assert bits == 4 and group_size == 128
    n_sg = k_padded // MAGIC_SUPERGROUP
    half = MAGIC_SUPERGROUP // 8
    N = packed_t.shape[1]
    word = packed_t.T.reshape(N, n_sg, half)
    mask = jnp.uint32(0xF)
    planes = []
    for j in range(4):
        lo = (word >> (4 * j)) & mask
        hi = (word >> (16 + 4 * j)) & mask
        planes.append(jnp.stack([lo, hi], axis=-1))  # [N, n_sg, 64, 2]
    vals = jnp.stack(planes, axis=2)  # [N, n_sg, 4, 64, 2]
    return vals.reshape(N, k_padded).astype(jnp.int32)


def pack_pair_t(q: jax.Array, group_size: int, bits: int) -> jax.Array:
    """Pack unsigned values [N, K_pad] -> uint32 [K_pad / vpw, N] (pair_t).

    Logical value k = sg*512 + c*256 + 4w + b lands in word row sg*64 + w
    at bits [8b + 4c, 8b + 4c + 4): the low nibbles of the four bytes of
    a word are four CONSECUTIVE k values, so the in-kernel int8-pair
    extraction (`& 0x0F0F0F0F` / `>> 4 & 0x0F0F0F0F` + bitcast) yields
    logical-k-ordered int8 sublanes, two quant groups per extraction.
    W4 g128 only."""
    assert bits == 4 and group_size == 128, "pair_t layout is W4 g128 only"
    N, K = q.shape
    assert K % MAGIC_SUPERGROUP == 0, f"K={K} not a multiple of {MAGIC_SUPERGROUP}"
    n_sg = K // MAGIC_SUPERGROUP
    half = MAGIC_SUPERGROUP // 8  # 64 word rows per supergroup
    # [N, n_sg, c(2), w(64), b(4)]: k-order = c major, then w, then b.
    qv = q.reshape(N, n_sg, 2, half, 4).astype(jnp.uint32)
    word = jnp.zeros((N, n_sg, half), dtype=jnp.uint32)
    for b in range(4):
        word = (
            word
            | (qv[:, :, 0, :, b] << (8 * b))
            | (qv[:, :, 1, :, b] << (8 * b + 4))
        )
    return word.reshape(N, K // 8).T


def unpack_pair_t(
    packed_t: jax.Array, k_padded: int, group_size: int, bits: int
) -> jax.Array:
    """Inverse of pack_pair_t: uint32 [K_pad / vpw, N'] -> int32 [N', K_pad]."""
    assert bits == 4 and group_size == 128
    n_sg = k_padded // MAGIC_SUPERGROUP
    half = MAGIC_SUPERGROUP // 8
    N = packed_t.shape[1]
    word = packed_t.T.reshape(N, n_sg, half)
    mask = jnp.uint32(0xF)
    planes = []
    for c in range(2):
        bs = [(word >> (8 * b + 4 * c)) & mask for b in range(4)]
        planes.append(jnp.stack(bs, axis=-1))  # [N, n_sg, 64, 4]
    vals = jnp.stack(planes, axis=2)  # [N, n_sg, 2, 64, 4]
    return vals.reshape(N, k_padded).astype(jnp.int32)


_TRANSPOSED_LAYOUTS = ("magic_t", "pair_t")

_PACK_T = {"magic_t": pack_magic_t, "pair_t": pack_pair_t}
_UNPACK_T = {"magic_t": unpack_magic_t, "pair_t": unpack_pair_t}


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
    layout: str | None = None,
) -> QuantizedTensor:
    N = vals.shape[0]
    if layout is None:
        layout = "magic_t" if (bits == 4 and group_size == 128) else "sg"
    sg_vals = (
        MAGIC_SUPERGROUP
        if layout in _TRANSPOSED_LAYOUTS
        else supergroup_values(group_size, bits)
    )
    k_padded = ((K + sg_vals - 1) // sg_vals) * sg_vals
    g_padded = k_padded // group_size
    G = K // group_size
    if k_padded != K:
        vals = jnp.pad(vals, ((0, 0), (0, k_padded - K)))
        scales = jnp.pad(
            scales, ((0, 0), (0, g_padded - G)), constant_values=1
        )
        biases = jnp.pad(biases, ((0, 0), (0, g_padded - G)))
    if layout in _TRANSPOSED_LAYOUTS:
        packed = _PACK_T[layout](vals.astype(jnp.uint32), group_size, bits)
        # bf16 scale/bias storage: scale metadata is 12.5% of the packed
        # weight bytes at f32 — at decode the kernel is a pure HBM stream,
        # so halving it buys ~5% step time. Lossless for MLX checkpoints
        # (they ship half-precision scales); for f32-scale sources the
        # dequant shift is <= 2^-9 relative, ~3% of one quant step.
        scales = scales.astype(jnp.bfloat16).T
        biases = biases.astype(jnp.bfloat16).T
    else:
        packed = pack_supergroup(vals.astype(jnp.uint32), group_size, bits)
        scales = scales.astype(jnp.bfloat16)
        biases = biases.astype(jnp.bfloat16)
    return QuantizedTensor(
        packed=packed,
        scales=scales,
        biases=biases,
        group_size=group_size,
        bits=bits,
        out_features=N,
        in_features=K,
        k_padded=k_padded,
        layout=layout,
    )


def quantize(
    w: jax.Array,
    group_size: int = 128,
    bits: int = 4,
    layout: str | None = None,
) -> QuantizedTensor:
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
    # q is computed with the f32 scale even though storage rounds the
    # scale to bf16: the dequant shift is <= 15*s*2^-9 (~3% of one quant
    # step) and the codes stay bit-identical to MLX's f32-scale exports
    # (tests/test_loader.py bf16-vs-mlx agreement).
    q = jnp.clip(jnp.round((wg - gmin[..., None]) / scale[..., None]), 0, levels)
    return _from_values(
        q.reshape(N, K).astype(jnp.int32), scale, gmin, group_size, bits, K,
        layout=layout,
    )


def from_mlx_packing(
    mlx_weight: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    group_size: int,
    bits: int,
    layout: str | None = None,
) -> QuantizedTensor:
    """Ingest an MLX-packed checkpoint layer into the TPU layout."""
    vpw = _values_per_word(bits)
    N = mlx_weight.shape[0]
    K = mlx_weight.shape[-1] * vpw
    vals = unpack_mlx(mlx_weight, bits).reshape(N, K)
    return _from_values(vals, scales, biases, group_size, bits, K, layout=layout)


def from_mlx_packing_stacked(
    mlx_weight: jax.Array,  # [E, N, K/vpw] uint32 (MLX switch_mlp export)
    scales: jax.Array,  # [E, N, G]
    biases: jax.Array,
    group_size: int,
    bits: int,
    layout: str | None = None,
) -> QuantizedTensor:
    """Ingest an MLX-packed STACKED expert tensor (switch_mlp layout,
    reference qwen3_week3.py:258-272) into the TPU stacked layout —
    flatten experts into rows (quant groups are per output row, so this
    is exact), ingest, restack with E leading."""
    vpw = _values_per_word(bits)
    E, N = mlx_weight.shape[0], mlx_weight.shape[1]
    K = mlx_weight.shape[-1] * vpw
    flat = from_mlx_packing(
        mlx_weight.reshape(E * N, K // vpw),
        scales.reshape(E * N, -1),
        biases.reshape(E * N, -1),
        group_size,
        bits,
        layout=layout,
    )
    if flat.layout in _TRANSPOSED_LAYOUTS:
        packed = flat.packed.reshape(-1, E, N).transpose(1, 0, 2)
        qs = flat.scales.reshape(-1, E, N).transpose(1, 0, 2)
        qb = flat.biases.reshape(-1, E, N).transpose(1, 0, 2)
    else:
        packed = flat.packed.reshape(E, N, -1)
        qs = flat.scales.reshape(E, N, -1)
        qb = flat.biases.reshape(E, N, -1)
    return QuantizedTensor(
        packed=packed,
        scales=qs,
        biases=qb,
        group_size=flat.group_size,
        bits=flat.bits,
        out_features=N,
        in_features=K,
        k_padded=flat.k_padded,
        layout=flat.layout,
    )


def quantize_stacked(
    w: jax.Array,  # [E, N, K] stacked expert weights
    group_size: int = 128,
    bits: int = 4,
    layout: str | None = None,
) -> QuantizedTensor:
    """Quantize a stacked expert tensor. Groups are per output row, so one
    flat [E*N, K] quantize pass is exact; the leaves are then restacked
    with E leading ("magic_t": packed [E, Kp/8, N], scales [E, G, N];
    "sg": packed [E, N, Kp/8], scales [E, N, G])."""
    E, N, K = w.shape
    qt = quantize(w.reshape(E * N, K), group_size=group_size, bits=bits, layout=layout)
    if qt.layout in _TRANSPOSED_LAYOUTS:
        packed = qt.packed.reshape(-1, E, N).transpose(1, 0, 2)
        scales = qt.scales.reshape(-1, E, N).transpose(1, 0, 2)
        biases = qt.biases.reshape(-1, E, N).transpose(1, 0, 2)
    else:
        packed = qt.packed.reshape(E, N, -1)
        scales = qt.scales.reshape(E, N, -1)
        biases = qt.biases.reshape(E, N, -1)
    return QuantizedTensor(
        packed=packed,
        scales=scales,
        biases=biases,
        group_size=qt.group_size,
        bits=qt.bits,
        out_features=N,
        in_features=K,
        k_padded=qt.k_padded,
        layout=qt.layout,
    )


def concat_out_features(qts: list[QuantizedTensor]) -> QuantizedTensor:
    """Concatenate 2-D quantized weights along out_features (N) — EXACT.

    Quant groups run along K, so stacking N rows (lanes in magic_t, rows in
    sg) never crosses a group boundary: the packed words, scales and biases
    of each input are preserved bit-for-bit. This is how QKV and gate/up
    projections fuse into one kernel launch (models/qwen3.py
    fuse_projections); the reference issues them as separate Metal
    dispatches (qwen3_week2.py:74-80).
    """
    head = qts[0]
    assert all(q.packed.ndim == 2 for q in qts), "2-D weights only"
    for q in qts[1:]:
        assert (
            q.layout == head.layout
            and q.in_features == head.in_features
            and q.k_padded == head.k_padded
            and q.group_size == head.group_size
            and q.bits == head.bits
        ), "concat_out_features requires matching K / layout / quant params"
    axis = 1 if head.layout in _TRANSPOSED_LAYOUTS else 0
    return QuantizedTensor(
        packed=jnp.concatenate([q.packed for q in qts], axis=axis),
        scales=jnp.concatenate([q.scales for q in qts], axis=axis),
        biases=jnp.concatenate([q.biases for q in qts], axis=axis),
        group_size=head.group_size,
        bits=head.bits,
        out_features=sum(q.out_features for q in qts),
        in_features=head.in_features,
        k_padded=head.k_padded,
        layout=head.layout,
    )


def permute_out_features(qt: QuantizedTensor, perm) -> QuantizedTensor:
    """Reorder a 2-D quantized weight along out_features (N) — EXACT.

    Quant groups run along K, so an N permutation is a pure gather of
    packed lanes (magic_t) or rows (sg) plus the matching scale/bias
    gather; every stored bit is preserved. Used by models/qwen3.py
    fuse_projections to interleave the fused [q; k; v] columns per KV
    head so the fused decode-attention kernel's BlockSpec slices each
    head's rows directly."""
    assert qt.packed.ndim == 2, "2-D weights only"
    perm = jnp.asarray(perm, dtype=jnp.int32)
    assert perm.shape == (qt.out_features,), perm.shape
    axis = 1 if qt.layout in _TRANSPOSED_LAYOUTS else 0
    return QuantizedTensor(
        packed=jnp.take(qt.packed, perm, axis=axis),
        scales=jnp.take(qt.scales, perm, axis=axis),
        biases=jnp.take(qt.biases, perm, axis=axis),
        group_size=qt.group_size,
        bits=qt.bits,
        out_features=qt.out_features,
        in_features=qt.in_features,
        k_padded=qt.k_padded,
        layout=qt.layout,
    )


def convert_layout(qt: QuantizedTensor, layout: str) -> QuantizedTensor:
    """Repack a 2-D QuantizedTensor into another storage layout (exact —
    the stored integer values and scales are preserved bit-for-bit)."""
    if qt.layout == layout:
        return qt
    assert qt.packed.ndim == 2, "layout conversion is for 2-D weights"
    if qt.layout in _TRANSPOSED_LAYOUTS:
        vals = _UNPACK_T[qt.layout](qt.packed, qt.k_padded, qt.group_size, qt.bits)
        scales, biases = qt.scales.T, qt.biases.T
    else:
        vals = unpack_supergroup(qt.packed, qt.k_padded, qt.group_size, qt.bits)
        scales, biases = qt.scales, qt.biases
    # The layouts pad K at different granularities (512 vs 1024).
    sg_vals = (
        MAGIC_SUPERGROUP
        if layout in _TRANSPOSED_LAYOUTS
        else supergroup_values(qt.group_size, qt.bits)
    )
    k_new = ((qt.k_padded + sg_vals - 1) // sg_vals) * sg_vals
    if k_new != qt.k_padded:
        vals = jnp.pad(vals, ((0, 0), (0, k_new - qt.k_padded)))
        g_new = k_new // qt.group_size
        scales = jnp.pad(
            scales, ((0, 0), (0, g_new - scales.shape[1])), constant_values=1
        )
        biases = jnp.pad(biases, ((0, 0), (0, g_new - biases.shape[1])))
    if layout in _TRANSPOSED_LAYOUTS:
        packed = _PACK_T[layout](vals.astype(jnp.uint32), qt.group_size, qt.bits)
        scales = scales.astype(jnp.bfloat16).T
        biases = biases.astype(jnp.bfloat16).T
    else:
        packed = pack_supergroup(vals.astype(jnp.uint32), qt.group_size, qt.bits)
        scales = scales.astype(jnp.bfloat16)
        biases = biases.astype(jnp.bfloat16)
    return QuantizedTensor(
        packed=packed,
        scales=scales,
        biases=biases,
        group_size=qt.group_size,
        bits=qt.bits,
        out_features=qt.out_features,
        in_features=qt.in_features,
        k_padded=k_new,
        layout=layout,
    )


def convert_layout_stacked(qt: QuantizedTensor, layout: str) -> QuantizedTensor:
    """Repack a STACKED (3-D, experts-leading) transposed-layout
    QuantizedTensor into another transposed layout (magic_t <-> pair_t) —
    exact. Uses the same flatten-experts-into-columns trick as
    dequantize: [E, Kp/8, N] -> [Kp/8, E*N] is a pure transpose because
    quant groups run along K."""
    if qt.layout == layout:
        return qt
    assert qt.packed.ndim == 3, "use convert_layout for 2-D weights"
    assert qt.layout in _TRANSPOSED_LAYOUTS and layout in _TRANSPOSED_LAYOUTS
    E, _, N = qt.packed.shape
    G = qt.k_padded // qt.group_size
    p2 = qt.packed.transpose(1, 0, 2).reshape(qt.k_padded // 8, E * N)
    vals = _UNPACK_T[qt.layout](p2, qt.k_padded, qt.group_size, qt.bits)
    packed = _PACK_T[layout](
        vals.astype(jnp.uint32), qt.group_size, qt.bits
    ).reshape(-1, E, N).transpose(1, 0, 2)
    return QuantizedTensor(
        packed=packed,
        scales=qt.scales,
        biases=qt.biases,
        group_size=qt.group_size,
        bits=qt.bits,
        out_features=qt.out_features,
        in_features=qt.in_features,
        k_padded=qt.k_padded,
        layout=layout,
    )


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the dense weight [..., N, K]: w = q * scale + bias.

    Supports stacked expert tensors (leading dims before [N, K])."""
    if qt.layout in _TRANSPOSED_LAYOUTS:
        unpack_t = _UNPACK_T[qt.layout]
        G = qt.k_padded // qt.group_size
        if qt.packed.ndim == 3:  # stacked experts [E, Kp/8, N]
            E, _, N = qt.packed.shape
            p2 = qt.packed.transpose(1, 0, 2).reshape(qt.k_padded // 8, E * N)
            vals = unpack_t(p2, qt.k_padded, qt.group_size, qt.bits)
            s2 = qt.scales.transpose(1, 0, 2).reshape(G, E * N)
            b2 = qt.biases.transpose(1, 0, 2).reshape(G, E * N)
            vg = vals.reshape(E * N, G, qt.group_size).astype(jnp.float32)
            w = (
                vg * s2.astype(jnp.float32).T[..., None]
                + b2.astype(jnp.float32).T[..., None]
            )
            return w.reshape(E, N, qt.k_padded)[
                ..., : qt.in_features
            ].astype(dtype)
        vals = unpack_t(qt.packed, qt.k_padded, qt.group_size, qt.bits)
        vg = vals.reshape(qt.out_features, G, qt.group_size).astype(jnp.float32)
        w = (
            vg * qt.scales.astype(jnp.float32).T[..., None]
            + qt.biases.astype(jnp.float32).T[..., None]
        )
        return w.reshape(qt.out_features, qt.k_padded)[
            :, : qt.in_features
        ].astype(dtype)
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
    norm_weight: jax.Array | None = None,
    eps: float = 1e-6,
    residual: jax.Array | None = None,
) -> jax.Array:
    """y = x @ dequant(qt).T (+ bias) (+ residual), dispatching to the
    Pallas dequant-fused kernel on TPU (see kernels/quant_matmul.py).
    Mirrors the reference's matvec-vs-matmul kernel selection
    (quantize.py:49-90). `norm_weight` RMS-normalizes x first, fused into
    the kernel prologue where supported; `residual` adds into the output,
    fused into the kernel epilogue where supported."""
    from ..kernels import quantized_matmul

    return quantized_matmul(
        x, qt, bias=bias, impl=impl, norm_weight=norm_weight, eps=eps,
        residual=residual,
    )
