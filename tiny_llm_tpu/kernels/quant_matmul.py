"""Dequant-fused W4A16 / W4A8 matmul-matvec Pallas kernels.

TPU replacement for the reference's Metal quantized-matmul family
(/root/reference/src/extensions_ref/src/quantized_matmul.metal:8-557 —
vanilla / simdgroup-tile / split-K / matvec schedules). One kernel covers
both shapes: grid (M/BM, N/BN) with the FULL (padded) K dimension resident
per program and a statically unrolled supergroup loop. Decode (M <= 8)
just picks a small BM and wide BN — the op is weight-bandwidth-bound, so
the only thing that matters is streaming `packed` once at full HBM
bandwidth while the VPU dequantizes into MXU-ready bf16 tiles.

Round 5 adds the pair_t / W4A8 tier (_pair_kernel): int8 nibble-pair
extraction + s8 MXU dots with per-row absmax activation quantization at
decode shapes, W4A16-exact staged dots at prefill. Measured: a
single-stream-latency tier only (+5.4% B=1 ceiling) — the decode floor
is the MXU's ~8-cycle small-M tile issue rate, not unpack work (see
docs/kernels.md, the MXU issue-rate law).

Dequantization exploits the supergroup storage layout
(ops/quantize.py module docstring): nibble-plane j of each group_size-word
block is quant group j, so dequant per group is one shift+mask, a
[BN, 1]->[BN, lanes] broadcast of scale/bias, and a lane-axis concat. No
lane shuffles, no dynamic indexing — every slice in the kernel is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.quantize import QuantizedTensor, dequantize
from .dispatch import resolve

# Full-K residency bound: largest K_pad the kernel accepts before the
# wrapper falls back to XLA (Qwen3 family max is down_proj K=9728->10240).
MAX_RESIDENT_K = 32 * 1024

# Fused-RMSNorm kernel prologue toggle. Measured OFF as the default: on
# the v5e the in-kernel normalize costs 8% of the decode device ceiling
# (279 -> 260 tok/s, reproducible A/B) — inside one compiled step program
# XLA's standalone rms_norm is a free fused VPU pass, while the kernel
# prologue's first-step normalize + scratch disturb the weight-stream
# pipelining. Kept as a measurement hook; `norm_weight` semantics are
# identical either way (the wrapper pre-normalizes when this is False).
FUSE_NORM_ENABLED = False


def _quantized_matmul_xla(
    x: jax.Array, qt: QuantizedTensor, bias: jax.Array | None,
    a8: bool = False,
) -> jax.Array:
    """Dequant + XLA dot fallback. a8=True applies the SAME per-row
    absmax int8 activation quantization the pair_t Pallas decode kernel
    uses (x -> sx * round(x/sx)), so W4A8 semantics are backend-invariant
    — a pair_t model produces a8-class numerics on CPU too, not silently
    exact ones."""
    w = dequantize(qt, dtype=jnp.float32 if a8 else x.dtype)
    xc = x
    if a8:
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.where(sx == 0, jnp.ones_like(sx), sx)
        xc = sx * jnp.clip(jnp.round(xf / sx), -127.0, 127.0)
    out = jax.lax.dot_general(
        xc,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def _qmm_kernel(
    x_ref, w_ref, s_ref, b_ref, out_ref, wtile_ref, acc_ref, *, bits, group_size
):
    """out[BM, BN] = x[BM, K] @ dequant(w[BN, K/vpw]).T — full K resident.

    wtile_ref [BN, sg_vals] is the dequant staging buffer, explicitly
    reused across supergroups to bound scoped VMEM (an unrolled
    value-based loop made Mosaic keep every supergroup's staging alive).
    """
    vpw = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    num_sg = w_ref.shape[-1] // group_size
    sg_vals = vpw * group_size

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for sg in range(num_sg):
        words = w_ref[:, sg * group_size : (sg + 1) * group_size]
        for j in range(vpw):
            # Mosaic has no direct u32->bf16 cast; hop through i32 (values
            # are 0..15, exact in every float type).
            q = ((words >> (bits * j)) & mask).astype(jnp.int32).astype(jnp.bfloat16)
            g = sg * vpw + j
            s = s_ref[:, g : g + 1].astype(jnp.bfloat16)
            b = b_ref[:, g : g + 1].astype(jnp.bfloat16)
            wtile_ref[:, j * group_size : (j + 1) * group_size] = q * s + b
        x_sg = x_ref[:, sg * sg_vals : (sg + 1) * sg_vals]
        acc_ref[:] += jax.lax.dot_general(
            x_sg,
            wtile_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _block_sizes(M: int, N: int, K: int):
    """Pick (BM, BN). Full K is resident, so BN is bounded by VMEM:
    packed [BN, K/8] u32 + dequant staging [BN, 1024] + out [BM, BN]."""
    if M <= 32:
        bm = 8 if M <= 8 else 32
    elif M <= 128:
        bm = 128
    else:
        bm = 256
    bm = min(bm, M) if M >= 8 else 8
    # Scoped-VMEM budget per unit of BN (empirical, 16 MB limit): packed
    # double-buffer (words * 8 B) + dequant staging (sg_vals * 2 B) +
    # unrolled shift/mask temporaries (~4 KB) + acc row (bm * 4 B).
    words = K // 8
    per_bn = words * 8 + 1024 * 2 + 4096 + bm * 4
    budget = 9 * 1024 * 1024
    bn = 256
    while bn * 2 * per_bn <= budget and bn * 2 <= N:
        bn *= 2
    bn = min(bn, N)

    # Total scoped-VMEM check including the x-block double buffer, which
    # the per-BN heuristic above ignores — at prefill shapes (bm=256,
    # K~10K) x alone is 10+ MB and Mosaic's 16 MB limit trips. Shrink bm
    # first (prefill stays MXU-efficient at 128), then bn.
    def fits(bm, bn):
        x = 2 * bm * K * 2
        w = 2 * (bn * words * 4 + 2 * bn * (K // 128) * 2)
        stage = bn * 1024 * 2
        acc = bm * bn * 4
        out = 2 * bm * bn * 2
        return x + w + stage + acc + out + (1 << 20) <= 14 * 1024 * 1024

    while not fits(bm, bn) and bm > 8:
        bm //= 2
    while not fits(bm, bn) and bn > 128:
        bn //= 2
    return bm, bn


def _magic_kernel(
    x_ref, w_ref, s_ref, b_ref, out_ref, stage_ref, acc_ref, *, group_size,
    nw_ref=None, xn_ref=None, res_ref=None, true_k: int = 0, eps: float = 1e-6,
    k_axis: int | None = None,
):
    """acc[bm, bn] += x[bm, K] @ magic-dequant(w[K/8, bn]) — transposed layout.

    Per supergroup (8 groups, 1024 values): 4 magic extractions
    `(words >> 4j) & 0x000F000F | 0x43004300`, each pltpu.bitcast to bf16
    values (128 + q) on adjacent sublanes in logical-k order (see
    ops/quantize.py pack_magic_t). Scale/bias fold per group AFTER the
    MXU dot: w = (128+q)*s + (b - 128*s), so
    y += d*s + (sum x_g)*(b - 128*s), with d = x_g @ (128+q).
    The rhs arrives in native [K, N] orientation — no transpose — and the
    VPU does ~3 ops per 8 values, leaving the kernel HBM-bound
    (cf. the reference's matvec_x4_fast pre-scaled-activation trick,
    quantized_matmul.metal:441-538, which solves the same problem on Metal).
    """
    gs = group_size
    half = gs // 2  # 64 word rows per magic supergroup (512 values)
    num_sg = w_ref.shape[0] // half
    mask = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)

    if nw_ref is None:
        def load_x(lo, hi):
            return x_ref[:, lo:hi]
    else:
        # Fused RMSNorm prologue (decode path only, single m-tile): at the
        # FIRST grid step, stage xn = x * rsqrt(mean_K(x^2) + eps) * nw
        # into VMEM scratch; later n-blocks read staged bf16 slices at the
        # same cost as the raw x reads. This removes the separate
        # pointwise kernel launch and the HBM round trip of the normalized
        # activations (cf. the reference's standalone week2_rms_norm
        # dispatch, week2_kernels.cpp:104-125) without adding per-step VPU
        # work that would serialize with the MXU dots.
        @pl.when(pl.program_id(0) == 0)
        def _():
            xf = x_ref[:].astype(jnp.float32)
            rs = jax.lax.rsqrt(
                jnp.sum(xf * xf, axis=1, keepdims=True) / true_k + eps
            )  # [bm, 1]; zero K-padding contributes nothing to the sum
            xn_ref[:] = (xf * rs * nw_ref[0:1, :].astype(jnp.float32)).astype(
                jnp.bfloat16
            )

        def load_x(lo, hi):
            return xn_ref[:, lo:hi]

    if k_axis is None:
        acc_ref[:] = jnp.zeros_like(acc_ref)
    else:
        # K-split grid (the reference's split-K schedule for under-filled
        # grids, quantized_matmul.cpp:139-151, recast for a sequential
        # grid): partial accumulation in f32 scratch across k-steps; the
        # finer DMA granularity shortens pipeline fill on small-N shapes.
        @pl.when(pl.program_id(k_axis) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    for sg in range(num_sg):
        words = w_ref[sg * half : (sg + 1) * half, :]
        if stage_ref is None:
            # Decode / small-M: one MXU dot per group, scale/bias folded
            # after the dot — minimum VPU work (the path is HBM-bound).
            for j in range(4):
                g = sg * 4 + j  # nibble-pair plane j IS quant group g
                t = ((words >> (4 * j)) & mask) | magic
                v = pltpu.bitcast(t, jnp.bfloat16)  # [gs, bn] = 128 + q
                xg = load_x(g * gs, (g + 1) * gs)
                d = jax.lax.dot_general(
                    xg,
                    v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                s = s_ref[g : g + 1, :].astype(jnp.float32)
                c = b_ref[g : g + 1, :].astype(jnp.float32) - 128.0 * s
                acc_ref[:] += d * s + xs * c
        else:
            # Prefill / large-M: pre-scale the staged tile per group and do
            # ONE 512-deep MXU dot per supergroup — ~1.4x MFU at M>=512
            # (the extra VPU mul amortizes over bm rows; the MXU prefers
            # deeper contractions over 4 shallow ones).
            for j in range(4):
                g = sg * 4 + j
                t = ((words >> (4 * j)) & mask) | magic
                v = pltpu.bitcast(t, jnp.bfloat16)  # [gs, bn] = 128 + q
                s = s_ref[g : g + 1, :].astype(jnp.bfloat16)
                # (v - 128) recovers the exact integer q in bf16; staging
                # q*s keeps the oracle's rounding (staging (128+q)*s would
                # drown q*s in the 128*s term's mantissa).
                stage_ref[j * gs : (j + 1) * gs, :] = (v - 128.0) * s
            x_sg = load_x(sg * 4 * gs, (sg + 1) * 4 * gs)
            acc_ref[:] += jax.lax.dot_general(
                x_sg,
                stage_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Bias term per group: (sum x_g) * b, f32 outer adds.
            for j in range(4):
                g = sg * 4 + j
                xg = x_sg[:, j * gs : (j + 1) * gs]
                xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                acc_ref[:] += xs * b_ref[g : g + 1, :].astype(jnp.float32)
    if k_axis is None:
        acc = acc_ref[:]
        if res_ref is not None:
            # Residual epilogue: the model's pre-norm residual add
            # (h + proj(x)) folds into the output write — one fewer XLA
            # pointwise launch per projection, and the add happens in f32
            # before the bf16 round. Output-side only: it never touches
            # the weight-stream pipeline (unlike the input-side norm
            # fusion, which measured -8% and stays off).
            acc = acc + res_ref[:].astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)
    else:
        @pl.when(pl.program_id(k_axis) == pl.num_programs(k_axis) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pair_kernel(
    x_ref, w_ref, s_ref, bt_ref, out_ref, acc_ref, *, group_size,
    a8: bool, sx_ref=None, res_ref=None, stage_ref=None,
):
    """acc[bm, bn] = sum_g s_g * (x_g . q_g) over pair_t packed weights.

    Round-5 weight-stream redesign (the magic path is VPU-bound, not
    HBM-bound — benchmark_results/v5e-weight-stream-2026-08-21.json):
    per supergroup (4 groups, 512 values, 64 word rows) TWO nibble-pair
    extractions (`words & 0x0F0F0F0F`, `(words >> 4) & 0x0F0F0F0F`),
    each pltpu.bitcast to int8 [512, bn] holding 256 consecutive
    logical-k values in the low half... see ops/quantize.py pair_t: each
    extraction is [256, bn] = two quant groups as STATIC row slices.
    That is 3 VPU word-ops per 8 values — 4x less unpack work than the
    magic trick's 3 per 2 — and the values feed the MXU as s8 directly.

    The scale folds per group AFTER the dot (w = q*s + b). The bias term
    sum_g b_g * sum(x_g) has no weight dependence at all, so it arrives
    PRECOMPUTED via bt_ref (one tiny [M, G] @ [G, N] XLA dot outside the
    kernel) — the in-kernel fold is convert+mul+add per group, nothing
    else.

    a8=True (W4A8): x_ref is int8 (per-row absmax-quantized activations,
    x ~= sx * xq), the dots run s8 x s8 -> s32 on the MXU, and the
    epilogue rescales by sx_ref: y = sx * (sum_g s_g (xq_g . q_g) +
    sum_g b_g qsum_g). a8=False: x_ref is bf16, dots are bf16 -> f32
    (W4A16-exact, same numerics class as the magic path).
    stage_ref (prefill, bm >= 128): dequant-stage q*s per supergroup
    into bf16 and run ONE 512-deep dot — prefill stays W4A16-exact.
    """
    gs = group_size
    half = 64  # word rows per supergroup
    num_sg = w_ref.shape[0] // half
    m4 = jnp.uint32(0x0F0F0F0F)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for sg in range(num_sg):
        words = w_ref[sg * half : (sg + 1) * half, :]
        e0 = pltpu.bitcast(words & m4, jnp.int8)  # k in [0, 256)
        e1 = pltpu.bitcast((words >> 4) & m4, jnp.int8)  # k in [256, 512)
        planes = ((e0, 0), (e0, gs), (e1, 0), (e1, gs))
        if stage_ref is not None:
            for j, (e, lo) in enumerate(planes):
                g = sg * 4 + j
                s = s_ref[g : g + 1, :].astype(jnp.bfloat16)
                stage_ref[j * gs : (j + 1) * gs, :] = (
                    e[lo : lo + gs].astype(jnp.bfloat16) * s
                )
            x_sg = x_ref[:, sg * 4 * gs : (sg + 1) * 4 * gs]
            acc_ref[:] += jax.lax.dot_general(
                x_sg,
                stage_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            for j, (e, lo) in enumerate(planes):
                g = sg * 4 + j
                v = e[lo : lo + gs]
                xg = x_ref[:, g * gs : (g + 1) * gs]
                if a8:
                    d = jax.lax.dot_general(
                        xg,
                        v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    d = jax.lax.dot_general(
                        xg,
                        v.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                acc_ref[:] += d * s_ref[g : g + 1, :].astype(jnp.float32)
    acc = acc_ref[:] + bt_ref[:].astype(jnp.float32)
    if sx_ref is not None:
        acc = acc * sx_ref[:, :1]
    if res_ref is not None:
        acc = acc + res_ref[:].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "act", "block_n", "interpret"),
)
def _qmm_pair_pallas(
    x_pad: jax.Array,  # [M, k_padded] bf16
    packed_t: jax.Array,  # [k_padded // 8, N] uint32 (pair_t layout)
    scales_t: jax.Array,  # [G, N]
    biases_t: jax.Array,  # [G, N]
    residual: jax.Array | None = None,  # [M, N] — fused output-side add
    group_size: int = 128,
    bits: int = 4,
    act: str = "int8",
    block_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    assert bits == 4 and group_size == 128, "pair_t kernels are W4 g128 only"
    M, Kp = x_pad.shape
    N = packed_t.shape[1]
    G = scales_t.shape[0]
    assert G == Kp // group_size, (G, Kp)
    bm, bn = _magic_block_sizes(M, N, Kp)
    if block_n is not None:
        bn = min(block_n, N)
    staged = bm >= 128  # prefill: one 512-deep bf16 dot per supergroup
    a8 = act == "int8" and not staged

    # Activation-side prep + the weight-independent bias term, in XLA
    # (fused into the surrounding step program; at decode M <= 32 these
    # are sub-microsecond pointwise passes + one [M, G] @ [G, N] dot).
    xf = x_pad.astype(jnp.float32)
    if a8:
        sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
        sx = jnp.where(sx == 0, jnp.ones_like(sx), sx)
        xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0)
        x_in = xq.astype(jnp.int8)
        # Group sums of the QUANTIZED activations (exact in f32: each is
        # an integer sum bounded by 127 * group_size).
        xsum = jnp.sum(xq.reshape(M, G, group_size), axis=2)
    else:
        x_in = x_pad.astype(jnp.bfloat16)
        sx = None
        xsum = jnp.sum(xf.reshape(M, G, group_size), axis=2)
    bt = jax.lax.dot_general(
        xsum,
        biases_t.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, N]; for a8 the epilogue's sx rescale covers it (bt uses qsum)

    if staged:
        grid = (pl.cdiv(M, bm), pl.cdiv(N, bn))
        x_map = lambda m, n: (m, 0)
        w_map = lambda m, n: (0, n)
        o_map = lambda m, n: (m, n)
    else:
        grid = (pl.cdiv(N, bn), pl.cdiv(M, bm))
        x_map = lambda n, m: (m, 0)
        w_map = lambda n, m: (0, n)
        o_map = lambda n, m: (m, n)

    in_specs = [
        pl.BlockSpec((bm, Kp), x_map),
        pl.BlockSpec((Kp // 8, bn), w_map),
        pl.BlockSpec((G, bn), w_map),
        pl.BlockSpec((bm, bn), o_map),  # bt
    ]
    args = [x_in, packed_t, scales_t, bt]
    if a8:
        in_specs.append(pl.BlockSpec((bm, 1), x_map))
        args.append(sx)
    if residual is not None:
        in_specs.append(pl.BlockSpec((bm, bn), o_map))
        args.append(residual)

    base = functools.partial(_pair_kernel, group_size=group_size, a8=a8)
    if staged:
        kernel = lambda x, w, s, bt_, o, stage, acc: base(
            x, w, s, bt_, o, acc, stage_ref=stage
        )
        if residual is not None:
            kernel = lambda x, w, s, bt_, r, o, stage, acc: base(
                x, w, s, bt_, o, acc, stage_ref=stage, res_ref=r
            )
        scratch = [
            pltpu.VMEM((4 * group_size, bn), jnp.bfloat16),
            pltpu.VMEM((bm, bn), jnp.float32),
        ]
    else:
        if a8 and residual is not None:
            kernel = lambda x, w, s, bt_, sx_, r, o, acc: base(
                x, w, s, bt_, o, acc, sx_ref=sx_, res_ref=r
            )
        elif a8:
            kernel = lambda x, w, s, bt_, sx_, o, acc: base(
                x, w, s, bt_, o, acc, sx_ref=sx_
            )
        elif residual is not None:
            kernel = lambda x, w, s, bt_, r, o, acc: base(
                x, w, s, bt_, o, acc, res_ref=r
            )
        else:
            kernel = lambda x, w, s, bt_, o, acc: base(x, w, s, bt_, o, acc)
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), o_map),
        out_shape=jax.ShapeDtypeStruct((M, N), x_pad.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * Kp,
            bytes_accessed=M * Kp + packed_t.size * 4 + scales_t.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _magic_block_sizes(M: int, N: int, Kp: int) -> tuple[int, int]:
    """(bm, bn) under the ~13 MB scoped-VMEM budget (double-buffered w/x)."""
    if M <= 8:
        bm = 8
    elif M <= 32:
        bm = 32
    elif M <= 128:
        bm = 128
    else:
        bm = 256
    words, G = Kp // 8, Kp // 128

    def fits(bm: int, bn: int) -> bool:
        w = 2 * (words * bn * 4 + 2 * G * bn * 4)
        xb = 2 * bm * Kp * 2
        acc = bm * bn * 4
        out = 2 * bm * bn * 2
        stage = 512 * bn * 2 if bm >= 128 else 0  # staged-dot scratch
        return w + xb + acc + out + stage + (1 << 20) <= 13 * 1024 * 1024

    # Measured on v5e across the Qwen3-4B shapes: decode wants ~8 grid
    # steps (bn ~= N/8, clamped to [256, 1024]); the staged prefill path
    # wants (bm=256, bn=512) — deepest MXU feed under the VMEM budget.
    if bm >= 128:
        bn = 512
    else:
        # Block-size A/B knobs against the stable whole-model device
        # ceiling (noisy per-op probes could not resolve this):
        #   TLT_QMM_BN_CAP_MB — cap the packed block bytes (smaller
        #     blocks). Measured WORSE: 1.0 MiB cap dropped the Qwen3-4B
        #     decode ceiling 281.9 -> 239.8 tok/s (more grid steps =
        #     more per-step overhead; the <=1MiB-blocks-run-clean
        #     pattern in the per-op table was a harness artifact).
        #   TLT_QMM_BN_MAX — raise the 1024 clamp (bigger blocks for
        #     fat-N shapes; VMEM fit still enforced below).
        import os

        bn_max = int(os.environ.get("TLT_QMM_BN_MAX", "1024"))
        bn = min(bn_max, max(256, 256 * -(-(N // 8) // 256)))
        cap_mb = os.environ.get("TLT_QMM_BN_CAP_MB")
        if cap_mb:
            cap_bytes = int(float(cap_mb) * 1024 * 1024)
            bn_cap = max(128, cap_bytes // (words * 4) // 128 * 128)
            bn = min(bn, bn_cap)
    while not fits(bm, bn) and bn > 256:
        bn //= 2
    while not fits(bm, bn) and bm > 8:
        bm //= 2
    return bm, min(bn, max(256, N))


def _magic_k_split(M: int, N: int, bn: int, Kp: int, G: int) -> int:
    """K-split factor for the decode path — measured dead end, default 1.

    Hypothesis (the reference's split-K rationale for under-filled grids,
    quantized_matmul.cpp:139-151): small-N fat-K shapes (o_proj: N=2560,
    K=4096, ~5 sequential grid steps) are pipeline-fill bound, and
    splitting K multiplies the step count at identical traffic. Measured
    on the v5e (2026-08-21, PERFORMANCE.md): the isolated slope-clean
    o_proj time is already ~at the weight-bandwidth roofline (5.6-6.8 us
    vs 6.8 roofline), K-split makes it WORSE both isolated (nk=2: 6.2,
    nk=4: 8.3 us) and in-model (decode device ceiling 282.3 -> 275.4
    tok/s with the heuristic on) — on a sequential-grid TPU the finer
    blocks only add per-step overhead; the round-1 '59-75% of roofline'
    row was a replay-harness artifact, not a kernel deficiency. The
    mechanism stays for explicit use (`k_split=` arg, covered by tests).
    """
    del M, N, bn, Kp, G
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "bits", "true_k", "eps", "k_split", "block_n", "interpret"
    ),
)
def _qmm_magic_pallas(
    x_pad: jax.Array,  # [M, k_padded] bf16
    packed_t: jax.Array,  # [k_padded // 8, N] uint32 (magic_t layout)
    scales_t: jax.Array,  # [G, N] f32
    biases_t: jax.Array,  # [G, N] f32
    nw: jax.Array | None = None,  # [1, k_padded] — fused-RMSNorm weight
    residual: jax.Array | None = None,  # [M, N] — fused output-side add
    group_size: int = 128,
    bits: int = 4,
    true_k: int = 0,
    eps: float = 1e-6,
    k_split: int | None = None,
    block_n: int | None = None,  # override the bn heuristic (probe/sweep use)
    interpret: bool = False,
) -> jax.Array:
    assert bits == 4
    M, Kp = x_pad.shape
    N = packed_t.shape[1]
    G = scales_t.shape[0]
    bm, bn = _magic_block_sizes(M, N, Kp)
    if block_n is not None:
        bn = min(block_n, N)
    if residual is not None:
        k_split = 1  # residual epilogue needs the single final out write
    staged = bm >= 128  # prefill: one 512-deep dot per supergroup
    assert nw is None or not staged, (
        "fused norm is decode-path only (wrapper pre-normalizes at prefill)"
    )
    nk = _magic_k_split(M, N, bn, Kp, G) if k_split is None else k_split
    if nw is not None:
        nk = 1  # the fused-norm prologue needs the whole K resident
    if not staged and nk > 1:
        # Align scale/bias rows to the Kp group grid: K-padding groups get
        # zero scale AND zero bias, so they contribute exactly nothing
        # (d*0 + sum(x)*0) whatever the padded words hold.
        Gk = Kp // group_size
        if G != Gk:
            scales_t = jnp.pad(scales_t, ((0, Gk - G), (0, 0)))
            biases_t = jnp.pad(biases_t, ((0, Gk - G), (0, 0)))
            G = Gk
        if G % nk:
            nk = 1  # unsplittable scale grid; fall through below
    if not staged and nk > 1:
        grid = (pl.cdiv(N, bn), pl.cdiv(M, bm), nk)
        kernel = functools.partial(
            lambda x, w, s, b, o, acc, **kw: _magic_kernel(
                x, w, s, b, o, None, acc, **kw
            ),
            group_size=group_size,
            k_axis=2,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, Kp // nk), lambda n, m, k: (m, k)),
                pl.BlockSpec((Kp // 8 // nk, bn), lambda n, m, k: (k, n)),
                pl.BlockSpec((G // nk, bn), lambda n, m, k: (k, n)),
                pl.BlockSpec((G // nk, bn), lambda n, m, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda n, m, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), x_pad.dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * Kp,
                bytes_accessed=M * Kp * 2 + packed_t.size * 4 + scales_t.size * 8,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x_pad, packed_t, scales_t, biases_t)
    if staged:
        # m OUTER: the x block (large at prefill) loads once per m-block;
        # the weights re-stream per m-block but overlap MXU compute.
        grid = (pl.cdiv(M, bm), pl.cdiv(N, bn))
        x_map = lambda m, n: (m, 0)
        w_map = lambda m, n: (0, n)
        o_map = lambda m, n: (m, n)
        if residual is None:
            kernel = functools.partial(_magic_kernel, group_size=group_size)
        else:
            kernel = functools.partial(
                lambda x, w, s, b, r, o, stage, acc, **kw: _magic_kernel(
                    x, w, s, b, o, stage, acc, res_ref=r, **kw
                ),
                group_size=group_size,
            )
        stage_scratch = [pltpu.VMEM((4 * group_size, bn), jnp.bfloat16)]
        norm_scratch = []
    else:
        # n OUTER: decode x is tiny; the weight block is the stream.
        grid = (pl.cdiv(N, bn), pl.cdiv(M, bm))
        x_map = lambda n, m: (m, 0)
        w_map = lambda n, m: (0, n)
        o_map = lambda n, m: (m, n)
        if nw is None:
            if residual is None:
                kernel = functools.partial(
                    lambda x, w, s, b, o, acc, **kw: _magic_kernel(
                        x, w, s, b, o, None, acc, **kw
                    ),
                    group_size=group_size,
                )
            else:
                kernel = functools.partial(
                    lambda x, w, s, b, r, o, acc, **kw: _magic_kernel(
                        x, w, s, b, o, None, acc, res_ref=r, **kw
                    ),
                    group_size=group_size,
                )
            norm_scratch = []
        else:
            assert residual is None, "norm prologue + residual epilogue unsupported"
            kernel = functools.partial(
                lambda nwr, x, w, s, b, o, acc, xn, **kw: _magic_kernel(
                    x, w, s, b, o, None, acc, nw_ref=nwr, xn_ref=xn, **kw
                ),
                group_size=group_size,
                true_k=true_k,
                eps=eps,
            )
            norm_scratch = [pltpu.VMEM((bm, Kp), jnp.bfloat16)]
        stage_scratch = []
    nw_spec = [pl.BlockSpec((1, Kp), lambda *a: (0, 0))] if nw is not None else []
    nw_args = (nw.reshape(1, Kp),) if nw is not None else ()
    res_spec = [pl.BlockSpec((bm, bn), o_map)] if residual is not None else []
    res_args = (residual,) if residual is not None else ()
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=nw_spec
        + [
            pl.BlockSpec((bm, Kp), x_map),
            pl.BlockSpec((Kp // 8, bn), w_map),
            pl.BlockSpec((G, bn), w_map),
            pl.BlockSpec((G, bn), w_map),
        ]
        + res_spec,
        out_specs=pl.BlockSpec((bm, bn), o_map),
        out_shape=jax.ShapeDtypeStruct((M, N), x_pad.dtype),
        scratch_shapes=stage_scratch
        + [pltpu.VMEM((bm, bn), jnp.float32)]
        + norm_scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * Kp,
            bytes_accessed=M * Kp * 2 + packed_t.size * 4 + scales_t.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*nw_args, x_pad, packed_t, scales_t, biases_t, *res_args)


@functools.partial(
    jax.jit, static_argnames=("group_size", "bits", "interpret")
)
def _qmm_pallas(
    x_pad: jax.Array,  # [M, k_padded] bf16
    packed: jax.Array,  # [N, k_padded // vpw] uint32
    scales: jax.Array,  # [N, k_padded // group_size]
    biases: jax.Array,
    group_size: int,
    bits: int,
    interpret: bool = False,
) -> jax.Array:
    M, K = x_pad.shape
    N = packed.shape[0]
    G = scales.shape[1]
    vpw = 32 // bits
    sg_vals = vpw * group_size
    bm, bn = _block_sizes(M, N, K)
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn))
    kernel = functools.partial(_qmm_kernel, bits=bits, group_size=group_size)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda m, n: (m, 0)),
            pl.BlockSpec((bn, K // vpw), lambda m, n: (n, 0)),
            pl.BlockSpec((bn, G), lambda m, n: (n, 0)),
            pl.BlockSpec((bn, G), lambda m, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, sg_vals), jnp.bfloat16),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + packed.size * 4 + scales.size * 4 + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, packed, scales, biases)


import os as _os

# Activation precision for the pair_t decode path, read ONCE at import
# (construction-time knobs, not trace-time — ADVICE round 4). "int8" =
# W4A8 s8 MXU dots (the round-5 headline path); "bf16" = W4A16-exact
# bf16 dots on the same pair extraction. Callers override per call via
# `act=`.
PAIR_ACT_DEFAULT = _os.environ.get("TLT_PAIR_ACT", "int8")


def quantized_matmul(
    x: jax.Array,
    qt: QuantizedTensor,
    bias: jax.Array | None = None,
    impl: str | None = None,
    norm_weight: jax.Array | None = None,
    eps: float = 1e-6,
    residual: jax.Array | None = None,
    act: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """y = x @ dequant(qt).T (+ bias) (+ residual). x: [..., in_features].

    When `norm_weight` is given, x is RMS-normalized first
    (y = rms_norm(x, norm_weight, eps) @ W.T) — fused into the Pallas
    kernel prologue on the magic_t path, applied as a separate XLA op
    otherwise. Numerics match ops/norm.rms_norm (f32 statistics).
    `residual` ([..., out_features]) is added into the output — fused
    into the kernel's final write on the magic_t path (one fewer XLA
    launch per pre-norm residual block), an ordinary add elsewhere."""
    assert x.shape[-1] == qt.in_features, (
        f"x K={x.shape[-1]} vs weight K={qt.in_features}"
    )
    use = resolve(impl)
    if use == "pallas" and (qt.k_padded > MAX_RESIDENT_K or qt.packed.ndim != 2):
        use = "xla"
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    # Fuse only on the decode (non-staged) kernel path: the staged prefill
    # kernel re-reads x per supergroup and an in-kernel normalize there
    # serializes with the MXU (measured -14% prefill); XLA's standalone
    # norm amortizes fine over >=128 rows.
    fuse_norm = (
        FUSE_NORM_ENABLED
        and norm_weight is not None
        and use == "pallas"
        and qt.layout == "magic_t"
        and rows <= 32
    )
    if norm_weight is not None and not fuse_norm:
        from ..ops.norm import rms_norm

        x = rms_norm(x, norm_weight, eps)
    if use == "xla":
        a8 = (
            qt.layout == "pair_t"
            and (act or PAIR_ACT_DEFAULT) == "int8"
            and rows <= 32  # mirror the Pallas decode/staged gate
        )
        out = _quantized_matmul_xla(x, qt, bias, a8=a8)
        if residual is not None:
            out = out + residual.astype(out.dtype)
        return out
    *lead, K = x.shape
    x2 = x.reshape(-1, K).astype(jnp.bfloat16)
    if qt.k_padded != K:
        x2 = jnp.pad(x2, ((0, 0), (0, qt.k_padded - K)))
    if qt.layout == "magic_t":
        nw = None
        if fuse_norm:
            nw = norm_weight.reshape(1, K).astype(jnp.bfloat16)
            if qt.k_padded != K:
                nw = jnp.pad(nw, ((0, 0), (0, qt.k_padded - K)))
            # The fused prologue consumes the PRE-norm x in f32; the bf16
            # cast of x2 above matches the unfused path's input dtype.
        res2 = None
        if residual is not None and bias is None and nw is None:
            res2 = residual.reshape(-1, qt.out_features).astype(jnp.bfloat16)
        out = _qmm_magic_pallas(
            x2,
            qt.packed,
            qt.scales,
            qt.biases,
            nw=nw,
            residual=res2,
            group_size=qt.group_size,
            bits=qt.bits,
            true_k=K,
            eps=float(eps),
            interpret=interpret,
        )
        if res2 is not None:
            residual = None  # folded into the kernel epilogue
    elif qt.layout == "pair_t":
        res2 = None
        if residual is not None and bias is None:
            res2 = residual.reshape(-1, qt.out_features).astype(jnp.bfloat16)
        out = _qmm_pair_pallas(
            x2,
            qt.packed,
            qt.scales,
            qt.biases,
            residual=res2,
            group_size=qt.group_size,
            bits=qt.bits,
            act=act or PAIR_ACT_DEFAULT,
            interpret=interpret,
        )
        if res2 is not None:
            residual = None  # folded into the kernel epilogue
    else:
        out = _qmm_pallas(
            x2,
            qt.packed,
            qt.scales,
            qt.biases,
            group_size=qt.group_size,
            bits=qt.bits,
            interpret=interpret,
        )
    if bias is not None:
        out = (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(out.dtype)
    if residual is not None:
        out = out + residual.reshape(-1, qt.out_features).astype(out.dtype)
    return out.reshape(*lead, qt.out_features).astype(x.dtype)
