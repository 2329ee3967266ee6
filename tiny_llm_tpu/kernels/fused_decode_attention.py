"""Fused decode-attention step: qkv split + QK-norm + RoPE + flash decode.

Round-4 whole-model roofline work. A device profile of the Qwen3-4B decode
step (PERFORMANCE.md round 4) showed the W4A16 matmul kernels already
streaming weights at ~HBM speed of light — the remaining ~30% of the step
was per-layer XLA glue around attention: the q/k/v slice+norm+rope fusion
chains (~8 us/layer of launch-overhead-dominated tiny ops), the dense
flash-decode call's fixed cost, window slices and head-transpose copies.
This kernel replaces that chain with ONE Pallas call per layer:

  in:  the fused qkv projection row, reshaped [B, Hkv, n_rep+2, D] (the
       fused wqkv weight is column-interleaved per KV head — see
       models/qwen3.py fuse_projections — so the kernel's block holds
       each head's q rows, k row and v row in natural order),
       the full K/V cache slabs (read-only; tiles stream through the
       same BlockSpec + scalar-prefetch-clamp schedule as
       kernels/flash_attention_pallas._flash_decode),
       per-row offsets, the step's cos/sin RoPE rows (gathered once in
       XLA per step and shared by all layers — table-exact numerics),
       and the per-head QK RMSNorm weights.
  out: the attention output rows [B, Hkv, n_rep, D] plus the normed+roped
       k row and v row for the (cheap, in-place) slab scatter that
       follows outside.

Schedule: grid (B, n_tiles) with ALL KV heads batched per program — one
[Hkv, R, bs] batched MXU dot per tile and vectorized state updates, the
idiom measured 354 -> 606 GB/s on the paged pages-walk kernel
(_paged_decode_page_kernel): with decode-sized R a per-head grid is
bookkeeping-bound, not DMA-bound. A first cut with grid (B, Hkv, tiles)
measured ~10 us/call at serving shapes (8 programs x ~1 us fixed cost);
this schedule cuts the program count Hkv-fold.

The current token's K/V are NOT yet in the slab when the kernel runs —
the prologue computes them and the final grid step folds them into the
online-softmax state with elementwise ops (a [R, D] x [1, D] dot would
be an N=1 matmul, which trips a Mosaic lowering bug; the fold also
removes the write-then-read ordering the unfused path needed).

Numerics match the unfused path op-for-op: RMSNorm rounds to bf16 before
the weight multiply (ops/norm.rms_norm), RoPE rotates in f32 using the
same table values and rounds to bf16 (ops/rope.apply_rope), the streamed
k row is the bf16 value later written to the slab.

Reference parity: this fuses what the reference runs as separate Metal
dispatches per layer — week2_rms_norm (week2_kernels.metal:6-48), RoPE
(week2_kernels.metal:50-105) and flash decode (week2_kernels.metal:
119-235) — into the TPU idiom of one sequential-grid kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention_pallas import NEG_INF


def _rms_rope_heads(x, w, cos, sin, eps):
    """RMSNorm + RoPE over [Hkv, R, D] head rows (f32 in, bf16 out).

    Rounding points match ops/norm.rms_norm + ops/rope.apply_rope: the
    normalized value rounds to bf16 before the weight multiply, and the
    rotated value rounds to bf16 at the end. cos/sin are [1, 1, D//2].
    """
    half = x.shape[-1] // 2
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    normed = (x * jax.lax.rsqrt(ms + eps)).astype(jnp.bfloat16)
    y = (normed * w.astype(jnp.bfloat16)).astype(jnp.float32)
    x1, x2 = y[..., :half], y[..., half:]
    real = x1 * cos - x2 * sin
    imag = x2 * cos + x1 * sin
    return jnp.concatenate([real, imag], axis=-1).astype(jnp.bfloat16)


def _fused_step_kernel(
    # scalar prefetch
    offsets_ref,  # [B] i32 — context length BEFORE this token
    # inputs
    qkv_ref,  # [1, Hkv, n_rep + 2, D] bf16 — all heads' q rows, k row, v row
    cos_ref,  # [B, half] f32 — RoPE rows at each row's position
    sin_ref,  # [B, half]
    qw_ref,  # [1, D] — q-norm weight
    kw_ref,  # [1, D] — k-norm weight
    k_ref,  # [1, Hkv, BS, D] — cache slab tile (layer/batch flat-indexed)
    v_ref,  # [1, Hkv, BS, D]
    # outputs
    o_ref,  # [1, Hkv, n_rep, D]
    ko_ref,  # [1, Hkv, 1, D] — normed+roped k row (for the slab scatter)
    vo_ref,  # [1, Hkv, 1, D]
    # scratch
    m_ref,  # [Hkv, n_rep, 128] f32
    l_ref,
    acc_ref,  # [Hkv, n_rep, D] f32
    *,
    bs: int,
    scale: float,
    eps: float,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    Hkv, n_rep, D = acc_ref.shape[0], acc_ref.shape[1], acc_ref.shape[2]
    half = D // 2
    off = offsets_ref[b]  # current token's position; slab holds [0, off)
    cos = cos_ref[pl.ds(b, 1), :].reshape(1, 1, half)
    sin = sin_ref[pl.ds(b, 1), :].reshape(1, 1, half)

    # q/k/v are recomputed from the input block at every live grid step (a
    # few hundred VPU flops against a 256 KB+ tile DMA) instead of staged
    # in VMEM scratch: a bf16 scratch-read feeding the MXU dot trips a
    # Mosaic relayout verifier on this toolchain, while values computed
    # from input refs lower cleanly (the idiom every sibling kernel uses).
    def prep_q():
        q = qkv_ref[0, :, :n_rep, :].astype(jnp.float32)  # [Hkv, n_rep, D]
        q = _rms_rope_heads(q, qw_ref[0:1, :], cos, sin, eps)
        # Pre-scaled bf16, one rounding — matches the unfused path
        # (apply_rope rounds to bf16; _decode_kernel rounds q*scale to
        # bf16 for the MXU dot).
        return (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    def prep_kv():
        k = qkv_ref[0, :, n_rep : n_rep + 1, :].astype(jnp.float32)
        k = _rms_rope_heads(k, kw_ref[0:1, :], cos, sin, eps)
        return k, qkv_ref[0, :, n_rep + 1 : n_rep + 2, :]  # [Hkv, 1, D]

    @pl.when(s == 0)
    def _():
        k, v = prep_kv()
        ko_ref[0] = k
        vo_ref[0] = v
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs < off)
    def _():
        # Streamed tiles cover positions [0, off); entries at >= off are
        # stale slab rows masked by the position clamp. One [Hkv, R, bs]
        # batched MXU dot + vectorized online-softmax state update.
        q = prep_q()
        sc = jax.lax.dot_general(
            q, k_ref[0],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, R, bs]
        k_pos = s * bs + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 2)
        sc = jnp.where(k_pos < off, sc, NEG_INF)
        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(sc - jnp.maximum(m_new, NEG_INF / 2))
        l_new = l_ref[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        # Fold the current token's own K/V (the unfused path wrote it to
        # the slab first). Elementwise online-softmax update: the row is
        # always visible to its own query, so no masking; the bf16
        # rounding of p matches the batched dot's p.astype(bf16) feed.
        k, v = prep_kv()
        q = prep_q().astype(jnp.float32)
        s_cur = jnp.sum(q * k.astype(jnp.float32), axis=2, keepdims=True)
        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_cur - m_new)
        l_new = l_ref[:, :, :1] * alpha + p  # f32 p, like the tile sum
        p_b = p.astype(jnp.bfloat16).astype(jnp.float32)  # the PV-dot feed
        acc = acc_ref[:] * alpha + p_b * v.astype(jnp.float32)
        o_ref[0] = (acc / l_new).astype(o_ref.dtype)


def _qkv_prep_kernel(
    # scalar prefetch
    offsets_ref,  # [B] i32 (unused in-body; keeps the cos gather uniform)
    # inputs
    qkv_ref,  # [1, Hkv, n_rep + 2, D] bf16
    cos_ref,  # [B, half] f32
    sin_ref,  # [B, half]
    qw_ref,  # [1, D]
    kw_ref,  # [1, D]
    # outputs
    q_ref,  # [1, Hkv, n_rep, D] — normed + roped (UNscaled, bf16)
    ko_ref,  # [1, Hkv, 1, D]
    vo_ref,  # [1, Hkv, 1, D]
    *,
    eps: float,
):
    b = pl.program_id(0)
    n_rep = q_ref.shape[2]
    half = q_ref.shape[3] // 2
    cos = cos_ref[pl.ds(b, 1), :].reshape(1, 1, half)
    sin = sin_ref[pl.ds(b, 1), :].reshape(1, 1, half)
    q = qkv_ref[0, :, :n_rep, :].astype(jnp.float32)
    q_ref[0] = _rms_rope_heads(q, qw_ref[0:1, :], cos, sin, eps)
    k = qkv_ref[0, :, n_rep : n_rep + 1, :].astype(jnp.float32)
    ko_ref[0] = _rms_rope_heads(k, kw_ref[0:1, :], cos, sin, eps)
    vo_ref[0] = qkv_ref[0, :, n_rep + 1 : n_rep + 2, :]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_qkv_prep(
    qkv_rows: jax.Array,  # [B, Hkv, n_rep + 2, D] bf16
    offsets: jax.Array,  # [B] i32
    cos_row: jax.Array,  # [B, D // 2] f32
    sin_row: jax.Array,
    q_norm_w: jax.Array,  # [D]
    k_norm_w: jax.Array,  # [D]
    *,
    eps: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """qkv split + QK-RMSNorm + RoPE in ONE launch (no attention).

    The paged serving path uses this 3-output prep kernel followed by the
    in-place page scatter and the unmodified pages-walk attention, so the
    pool keeps the scatter-then-read order of the unfused path. A variant
    that read the pool BEFORE the scatter (attention fused in, current
    row folded in-register — the dense path's schedule) made XLA resolve
    the war hazard on the scan-carried pool with FOUR whole-pool copies
    per decode step (~4.2 ms measured); buffer order matters more than
    launch count here. Returns (q [B, Hkv, n_rep, D] normed+roped
    UNscaled, k_row, v_row [B, Hkv, 1, D]) — exactly the unfused chain's
    values at the same bf16 rounding points."""
    B, Hkv, rows, D = qkv_rows.shape
    n_rep = rows - 2
    half = D // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, rows, D), lambda b, o: (b, 0, 0, 0)),
            pl.BlockSpec((B, half), lambda b, o: (0, 0)),
            pl.BlockSpec((B, half), lambda b, o: (0, 0)),
            pl.BlockSpec((1, D), lambda b, o: (0, 0)),
            pl.BlockSpec((1, D), lambda b, o: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, n_rep, D), lambda b, o: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, o: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, o: (b, 0, 0, 0)),
        ],
    )
    dt = qkv_rows.dtype
    out = pl.pallas_call(
        functools.partial(_qkv_prep_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep, D), dt),
            jax.ShapeDtypeStruct((B, Hkv, 1, D), dt),
            jax.ShapeDtypeStruct((B, Hkv, 1, D), dt),
        ],
        interpret=interpret,
    )(
        offsets.astype(jnp.int32),
        qkv_rows,
        cos_row.astype(jnp.float32),
        sin_row.astype(jnp.float32),
        q_norm_w.reshape(1, D),
        k_norm_w.reshape(1, D),
    )
    return out[0], out[1], out[2]


def _fused_paged_step_kernel(
    # scalar prefetch
    bt_ref,  # [B, maxp] i32 — block table, -1 padded
    offsets_ref,  # [B] i32 — context length BEFORE this token
    # inputs
    qkv_ref,  # [1, Hkv, n_rep + 2, D] bf16
    cos_ref,  # [B, half] f32
    sin_ref,  # [B, half]
    qw_ref,  # [1, D]
    kw_ref,  # [1, D]
    k_ref,  # [1, Hkv, ps, D] — ONE WHOLE PAGE, all KV heads
    v_ref,
    # outputs
    o_ref,  # [1, Hkv, n_rep, D]
    ko_ref,  # [1, Hkv, 1, D]
    vo_ref,  # [1, Hkv, 1, D]
    # scratch
    q_s,  # [Hkv, n_rep, D] bf16 — pre-scaled queries, staged at i == 0
    kr_s,  # [Hkv, 1, D] bf16 — current k row, staged at i == 0
    vr_s,  # [Hkv, 1, D] bf16
    m_ref,  # [Hkv, n_rep, 128] f32
    l_ref,
    acc_ref,  # [Hkv, n_rep, D] f32
    *,
    ps: int,
    scale: float,
    eps: float,
):
    """Paged twin of _fused_step_kernel: the page walk follows
    _paged_decode_page_kernel (whole-page [Hkv, ps, D] blocks via
    block-table indirection in the index_map — the scan-safe schedule),
    with the same qkv prep prologue and current-row epilogue. Unlike the
    dense kernel (1-2 live tiles at serving windows), a batched page walk
    runs ~5+ live steps per row, so the query is staged in VMEM scratch
    at i == 0 instead of recomputed per step (a per-tile norm+rope
    recompute measured 11.7 vs 8.0 ms/step on the serving burst). The
    k/v rows are staged too so the epilogue never re-reads the input
    block after the i == 0 output writes (defensive: a custom-call
    output buffer may legally alias a dead input intermediate).

    History note: this kernel was shelved twice for "row-0 corruption"
    in-model while passing every isolated check — that was a FALSE
    ALARM from parity probes comparing IDLE batch slots, whose
    discarded garbage legitimately differs per path (no installed
    requests -> offset 0, -1 pages -> trash-page reads). With real
    requests installed the path is token-exact vs the unfused chain
    (scripts/tpu_smoke.py fused_paged_model_parity)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    Hkv, n_rep, D = acc_ref.shape[0], acc_ref.shape[1], acc_ref.shape[2]
    half = D // 2
    off = offsets_ref[b]  # pages hold [0, off); current row folded below
    cos = cos_ref[pl.ds(b, 1), :].reshape(1, 1, half)
    sin = sin_ref[pl.ds(b, 1), :].reshape(1, 1, half)

    def prep_kv():
        k = qkv_ref[0, :, n_rep : n_rep + 1, :].astype(jnp.float32)
        k = _rms_rope_heads(k, kw_ref[0:1, :], cos, sin, eps)
        return k, qkv_ref[0, :, n_rep + 1 : n_rep + 2, :]

    @pl.when(i == 0)
    def _():
        q = qkv_ref[0, :, :n_rep, :].astype(jnp.float32)
        q = _rms_rope_heads(q, qw_ref[0:1, :], cos, sin, eps)
        q_s[:] = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        k, v = prep_kv()
        kr_s[:] = k
        vr_s[:] = v
        ko_ref[0] = k
        vo_ref[0] = v
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * ps < off)
    def _():
        q = q_s[:]
        sc = jax.lax.dot_general(
            q, k_ref[0],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, R, ps]
        k_pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 2)
        sc = jnp.where(k_pos < off, sc, NEG_INF)
        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(sc - jnp.maximum(m_new, NEG_INF / 2))
        l_new = l_ref[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        k, v = kr_s[:], vr_s[:]
        q = q_s[:].astype(jnp.float32)
        s_cur = jnp.sum(q * k.astype(jnp.float32), axis=2, keepdims=True)
        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_cur - m_new)
        l_new = l_ref[:, :, :1] * alpha + p
        p_b = p.astype(jnp.bfloat16).astype(jnp.float32)
        acc = acc_ref[:] * alpha + p_b * v.astype(jnp.float32)
        o_ref[0] = (acc / l_new).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "eps", "interpret"),
)
def fused_paged_decode_attention(
    qkv_rows: jax.Array,  # [B, Hkv, n_rep + 2, D] bf16
    key_pages: jax.Array,  # [P, Hkv, ps, D] — ONE layer's page buffer
    value_pages: jax.Array,
    block_table: jax.Array,  # [B, maxp] i32, -1 padded
    offsets: jax.Array,  # [B] i32 — context length before this token
    cos_row: jax.Array,  # [B, D // 2] f32
    sin_row: jax.Array,
    q_norm_w: jax.Array,  # [D]
    k_norm_w: jax.Array,  # [D]
    *,
    scale: float,
    eps: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One layer's decode attention over the paged pool from the fused
    qkv row. Returns (attn [B, Hkv, n_rep, D], k_row, v_row [B, Hkv, 1,
    D]); the caller scatters k_row/v_row into the target page slot."""
    B, Hkv, rows, D = qkv_rows.shape
    n_rep = rows - 2
    P, _, ps, _ = key_pages.shape
    maxp = block_table.shape[1]
    half = D // 2

    def qkv_map(b, i, bt_ref, off_ref):
        return (b, 0, 0, 0)

    def rope_map(b, i, bt_ref, off_ref):
        return (0, 0)

    def kv_map(b, i, bt_ref, off_ref):
        # Walk live pages only: clamp at the last page holding [0, off);
        # dead/padded slots re-reference the previous block (DMA elided).
        # The operand is one layer's OWN buffer (the pool is a per-layer
        # tuple, kv/paged.py) — no layer slicing, no stacked-pool
        # aliasing hazards.
        last = jnp.maximum((off_ref[b] + ps - 1) // ps - 1, 0)
        page = bt_ref[b, jnp.minimum(i, last)]
        return (jnp.maximum(page, 0), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, maxp),
        in_specs=[
            pl.BlockSpec((1, Hkv, rows, D), qkv_map),
            pl.BlockSpec((B, half), rope_map),
            pl.BlockSpec((B, half), rope_map),
            pl.BlockSpec((1, D), rope_map),
            pl.BlockSpec((1, D), rope_map),
            pl.BlockSpec((1, Hkv, ps, D), kv_map),
            pl.BlockSpec((1, Hkv, ps, D), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, n_rep, D), lambda b, i, bt, o: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, i, bt, o: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, i, bt, o: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hkv, n_rep, D), jnp.bfloat16),
            pltpu.VMEM((Hkv, 1, D), jnp.bfloat16),
            pltpu.VMEM((Hkv, 1, D), jnp.bfloat16),
            pltpu.VMEM((Hkv, n_rep, 128), jnp.float32),
            pltpu.VMEM((Hkv, n_rep, 128), jnp.float32),
            pltpu.VMEM((Hkv, n_rep, D), jnp.float32),
        ],
    )
    dt = qkv_rows.dtype
    out = pl.pallas_call(
        functools.partial(
            _fused_paged_step_kernel, ps=ps, scale=scale, eps=eps
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep, D), dt),
            jax.ShapeDtypeStruct((B, Hkv, 1, D), dt),
            jax.ShapeDtypeStruct((B, Hkv, 1, D), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * n_rep * maxp * ps * D,
            bytes_accessed=2 * B * Hkv * maxp * ps * D * 2,
            transcendentals=B * Hkv * n_rep * maxp * ps,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        offsets.astype(jnp.int32),
        qkv_rows,
        cos_row.astype(jnp.float32),
        sin_row.astype(jnp.float32),
        q_norm_w.reshape(1, D),
        k_norm_w.reshape(1, D),
        key_pages,
        value_pages,
    )
    return out[0], out[1], out[2]


@functools.partial(
    jax.jit,
    static_argnames=("layer_idx", "scale", "eps", "window", "bs", "interpret"),
)
def fused_decode_attention(
    qkv_rows: jax.Array,  # [B, Hkv, n_rep + 2, D] bf16
    keys: jax.Array,  # [num_layers, B, Hkv, S, D]
    values: jax.Array,
    offsets: jax.Array,  # [B] i32 — context length before this token
    cos_row: jax.Array,  # [B, D // 2] f32 — RoPE table rows at `offsets`
    sin_row: jax.Array,
    q_norm_w: jax.Array,  # [D]
    k_norm_w: jax.Array,  # [D]
    *,
    layer_idx: int,
    scale: float,
    eps: float,
    window: int,
    bs: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One layer's decode attention from the fused qkv row.

    Returns (attn [B, Hkv, n_rep, D], k_row [B, Hkv, 1, D],
    v_row [B, Hkv, 1, D]); the caller scatters k_row/v_row into the slab.
    """
    B, Hkv, rows, D = qkv_rows.shape
    n_rep = rows - 2
    Lyr, S = keys.shape[0], keys.shape[3]
    window = min(window, S)
    # Whole-window tiles measured best at serving windows (<=1024): a
    # window/4 tile cap (so short contexts elide dead-tile DMA) scored
    # 292.9 vs 296.3 tok/s on the whole-model ceiling — the extra grid
    # steps cost more than the elided DMA saves on this relay.
    bs = min(bs, window)
    n_tiles = pl.cdiv(window, bs)
    half = D // 2

    def qkv_map(b, s, off_ref):
        return (b, 0, 0, 0)

    def rope_map(b, s, off_ref):
        return (0, 0)

    def w_map(b, s, off_ref):
        return (0, 0)

    def kv_map(b, s, off_ref):
        # Clamp at the row's last live tile (stream region [0, offsets[b]));
        # fully-masked tiles re-reference the previous block and the
        # pipeline elides their DMA (flash_attention_pallas idiom). The
        # slab's (layer, batch) dims ride flattened in one leading axis.
        last = jnp.maximum((off_ref[b] + bs - 1) // bs - 1, 0)
        return (layer_idx * B + b, 0, jnp.minimum(s, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Hkv, rows, D), qkv_map),
            pl.BlockSpec((B, half), rope_map),
            pl.BlockSpec((B, half), rope_map),
            pl.BlockSpec((1, D), w_map),
            pl.BlockSpec((1, D), w_map),
            pl.BlockSpec((1, Hkv, bs, D), kv_map),
            pl.BlockSpec((1, Hkv, bs, D), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, n_rep, D), lambda b, s, o: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, s, o: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, s, o: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hkv, n_rep, 128), jnp.float32),
            pltpu.VMEM((Hkv, n_rep, 128), jnp.float32),
            pltpu.VMEM((Hkv, n_rep, D), jnp.float32),
        ],
    )
    dt = qkv_rows.dtype
    out = pl.pallas_call(
        functools.partial(_fused_step_kernel, bs=bs, scale=scale, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep, D), dt),
            jax.ShapeDtypeStruct((B, Hkv, 1, D), dt),
            jax.ShapeDtypeStruct((B, Hkv, 1, D), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * n_rep * window * D,
            bytes_accessed=2 * B * Hkv * window * D * 2,
            transcendentals=B * Hkv * n_rep * window,
        ),
        interpret=interpret,
    )(
        offsets.astype(jnp.int32),
        qkv_rows,
        cos_row.astype(jnp.float32),
        sin_row.astype(jnp.float32),
        q_norm_w.reshape(1, D),
        k_norm_w.reshape(1, D),
        keys.reshape(Lyr * B, Hkv, S, D),
        values.reshape(Lyr * B, Hkv, S, D),
    )
    return out[0], out[1], out[2]
