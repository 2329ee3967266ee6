"""Pallas flash attention (dense KV): decode + prefill kernels.

TPU replacement for the reference Metal kernels:
  - decode: week2_kernels.metal:119-235 (online-softmax flash decode) and
    paged_attention.metal:108-244's numerics (running max/sum rescale).
  - prefill: paged_attention.metal:250-506 (BQ x BK tiled FlashAttention
    with causal tile clamp), minus the page indirection (dense buffers).

Schedule notes (TPU-first):
  * Grid iterates KV tiles innermost; m/l/acc live in VMEM scratch across
    tiles of one (batch, head) program — the sequential-grid accumulation
    idiom that replaces the Metal kernels' cross-simdgroup reductions.
  * Per-row context lengths ride in as scalar-prefetch args; the KV
    index_map CLAMPS the tile index at each row's last valid tile, so
    fully-masked tiles re-reference the previous block and the pipeline
    elides their DMA — variable-length batches cost bandwidth proportional
    to their true context, like the reference's page-walk early exit.
  * exp/softmax statistics in f32 on the VPU; QK^T and PV on the MXU with
    f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_inner(
    q,  # [R, D] f32 — query rows (pre-scaled)
    k,  # [BS, D] bf16
    v,  # [BS, D] bf16
    q_pos,  # [R, 1] i32 absolute positions of query rows
    tile_start,  # i32 — absolute position of k[0]
    m_ref,  # [R, 128] f32 scratch (running max, broadcast on lanes)
    l_ref,  # [R, 128] f32 scratch (running denominator)
    acc_ref,  # [R, D] f32 scratch
    mask_tile=None,  # [R, BS] f32 additive mask (explicit-mask path)
):
    """One KV tile of online-softmax attention for R query rows."""
    BS = k.shape[0]
    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, BS]
    k_pos = tile_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    if mask_tile is not None:
        # Additive mask AFTER the length clamp (the reference decode
        # kernel's explicit-mask contract, week2_kernels.py:98-147):
        # -inf entries floor at NEG_INF so masked rows stay identity.
        s = jnp.maximum(s + mask_tile, NEG_INF)

    m_prev = m_ref[:, :1]  # [R, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [R, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # [R, 1]
    # Floor the subtrahend so a fully-masked row (m_new == NEG_INF, every
    # s == NEG_INF) underflows to p == 0 instead of exp(0) == 1 — such
    # rows arise in sequence-parallel prefill when a query tile precedes
    # the KV shard entirely; they must emit the identity state (l == 0).
    p = jnp.exp(s - jnp.maximum(m_new, NEG_INF / 2))  # [R, BS]
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)


def _decode_kernel(
    # scalar prefetch
    lens_ref,  # [B] i32
    # inputs
    q_ref,  # [1, 1, n_rep, L, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,  # [1, 1, BS, D]
    # outputs
    o_ref,  # [1, 1, n_rep, L, D]
    # scratch
    m_ref,
    l_ref,
    acc_ref,
    *,
    bs: int,
    scale: float,
):
    b = pl.program_id(0)
    s = pl.program_id(2)
    n_rep, L, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    ctx = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs < ctx)
    def _():
        q = q_ref[0, 0].reshape(R, D).astype(jnp.float32) * scale
        # Row r = (head_rep, l): absolute query position = ctx - L + l.
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % L
        q_pos = ctx - L + l_idx
        _flash_inner(
            q,
            k_ref[0, 0],
            v_ref[0, 0],
            q_pos,
            s * bs,
            m_ref,
            l_ref,
            acc_ref,
        )

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:] / l_ref[:, :1]
        o_ref[0, 0] = out.reshape(n_rep, L, D).astype(o_ref.dtype)


def _decode_kernel_masked(
    lens_ref,  # [B] i32 (scalar prefetch)
    q_ref,  # [1, 1, n_rep, L, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,
    mask_ref,  # [1, L, BS] f32 additive; per_head: [1, 1, n_rep, L, BS]
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    bs: int,
    scale: float,
    per_head: bool = False,
):
    """Decode kernel with an EXPLICIT additive mask streamed as a third
    tiled input (reference week2 decode kernel contract,
    week2_kernels.py:98-147 / week2_kernels.metal:119-235): the mask
    replaces causality; the per-row length still bounds visibility.
    per_head=True streams one mask block per KV-head group ([B, Hq, L, S]
    masks, round-5 — previously routed to the XLA twin)."""
    b = pl.program_id(0)
    s = pl.program_id(2)
    n_rep, L, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    ctx = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs < ctx)
    def _():
        q = q_ref[0, 0].reshape(R, D).astype(jnp.float32) * scale
        # Explicit mask governs causality; length-only clamp here.
        q_pos = jnp.broadcast_to(ctx - 1, (R, 1))
        if per_head:
            mk = mask_ref[0, 0].astype(jnp.float32).reshape(R, bs)
        else:
            mk = mask_ref[0].astype(jnp.float32)  # [L, BS]
            mk = jnp.broadcast_to(mk[None], (n_rep, L, bs)).reshape(R, bs)
        _flash_inner(
            q, k_ref[0, 0], v_ref[0, 0], q_pos, s * bs,
            m_ref, l_ref, acc_ref, mask_tile=mk,
        )

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = out.reshape(n_rep, L, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "bs", "interpret")
)
def _flash_decode(
    q: jax.Array,  # [B, Hq, L, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,
    lens: jax.Array,  # [B] i32
    scale: float,
    # Swept on v5e (2026-08): 512->2048 is 1.7x at 32K context (426->734
    # GB/s, 90% of HBM peak) — per-tile softmax bookkeeping amortizes;
    # 4096 adds <1%. Short contexts clamp to S anyway.
    bs: int = 2048,
    interpret: bool = False,
    mask: jax.Array | None = None,  # [B, L, S] additive
) -> jax.Array:
    B, Hq, L, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    bs = min(bs, S)
    n_tiles = pl.cdiv(S, bs)
    R = n_rep * L

    def q_map(b, h, s, lens_ref):
        return (b, h, 0, 0, 0)

    def kv_map(b, h, s, lens_ref):
        # Clamp at the row's last valid tile: fully-masked tiles re-fetch
        # the same block and the pipeline elides the DMA.
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, h, jnp.minimum(s, last), 0)

    def mask_map(b, h, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, 0, jnp.minimum(s, last))

    def mask_map_h(b, h, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, h, 0, 0, jnp.minimum(s, last))

    in_specs = [
        pl.BlockSpec((1, 1, n_rep, L, D), q_map),
        pl.BlockSpec((1, 1, bs, D), kv_map),
        pl.BlockSpec((1, 1, bs, D), kv_map),
    ]
    inputs = [lens.astype(jnp.int32), q.reshape(B, Hkv, n_rep, L, D), k, v]
    if mask is not None:
        per_head = mask.ndim == 4
        if per_head:
            # [B, Hq, L, S]: one mask block per (request, KV-head group),
            # streamed alongside the KV tiles (round-5; was XLA-only).
            assert mask.shape == (B, Hq, L, S), mask.shape
            mask = mask.reshape(B, Hkv, n_rep, L, S)
            if S % bs:
                mask = jnp.pad(
                    mask, ((0, 0),) * 4 + ((0, n_tiles * bs - S),)
                )
            in_specs.append(pl.BlockSpec((1, 1, n_rep, L, bs), mask_map_h))
        else:
            assert mask.shape == (B, L, S), mask.shape
            if S % bs:
                mask = jnp.pad(mask, ((0, 0), (0, 0), (0, n_tiles * bs - S)))
            in_specs.append(pl.BlockSpec((1, L, bs), mask_map))
        inputs.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _decode_kernel_masked, bs=bs, scale=scale, per_head=per_head
        )
    else:
        kernel = functools.partial(_decode_kernel, bs=bs, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, n_rep, L, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * S * D,
            bytes_accessed=2 * B * Hkv * S * D * 2,
            transcendentals=B * Hq * L * S,
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, Hq, L, D)


def _decode_state_kernel(
    lens_ref,  # [B] i32 (scalar prefetch)
    q_ref,  # [1, 1, n_rep, L, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,
    o_ref,  # [1, 1, n_rep, L, D]
    m_out,  # [1, 1, n_rep, L] f32 — running-max state
    l_out,  # [1, 1, n_rep, L] f32 — softmax denominator state
    m_ref,
    l_ref,
    acc_ref,
    *,
    bs: int,
    scale: float,
):
    """_decode_kernel that ALSO emits the online-softmax state (m, l) per
    query row — the per-shard half of a cross-shard softmax combine
    (sequence-parallel KV; the Metal kernels' cross-simdgroup epilogue
    math, week2_kernels.metal:206-234, lifted to the mesh level). Rows
    with zero local context emit (o=0, m=-inf, l=0), the identity of the
    combine."""
    b = pl.program_id(0)
    s = pl.program_id(2)
    n_rep, L, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    ctx = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs < ctx)
    def _():
        q = q_ref[0, 0].reshape(R, D).astype(jnp.float32) * scale
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % L
        q_pos = ctx - L + l_idx
        _flash_inner(
            q, k_ref[0, 0], v_ref[0, 0], q_pos, s * bs, m_ref, l_ref, acc_ref
        )

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)  # 0-context shards: o = 0
        o_ref[0, 0] = (acc_ref[:] / denom).reshape(n_rep, L, D).astype(o_ref.dtype)
        m_out[0, 0] = m_ref[:, :1].reshape(n_rep, L)
        l_out[0, 0] = l_ref[:, :1].reshape(n_rep, L)


@functools.partial(
    jax.jit, static_argnames=("scale", "bs", "interpret")
)
def flash_decode_state_pallas(
    q: jax.Array,  # [B, Hq, L, D]
    k: jax.Array,  # [B, Hkv, S_local, D]
    v: jax.Array,
    lens: jax.Array,  # [B] i32 — LOCAL valid KV length per row
    scale: float,
    bs: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Flash decode over a LOCAL KV shard, returning (o, m, l):
    o [B,Hq,L,D] normalized within the shard, m/l [B,Hq,L] f32 softmax
    state. Combine across shards with combine_softmax_states()."""
    B, Hq, L, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    bs = min(bs, S)
    n_tiles = pl.cdiv(S, bs)

    def q_map(b, h, s, lens_ref):
        return (b, h, 0, 0, 0)

    def st_map(b, h, s, lens_ref):
        return (b, h, 0, 0)

    def kv_map(b, h, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, h, jnp.minimum(s, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_rep, L, D), q_map),
            pl.BlockSpec((1, 1, bs, D), kv_map),
            pl.BlockSpec((1, 1, bs, D), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n_rep, L, D), q_map),
            pl.BlockSpec((1, 1, n_rep, L), st_map),
            pl.BlockSpec((1, 1, n_rep, L), st_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rep * L, 128), jnp.float32),
            pltpu.VMEM((n_rep * L, 128), jnp.float32),
            pltpu.VMEM((n_rep * L, D), jnp.float32),
        ],
    )
    qg = q.reshape(B, Hkv, n_rep, L, D)
    kernel = functools.partial(_decode_state_kernel, bs=bs, scale=scale)
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, n_rep, L), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, n_rep, L), jnp.float32),
        ],
        interpret=interpret,
    )(lens.astype(jnp.int32), qg, k, v)
    return (
        o.reshape(B, Hq, L, D),
        m.reshape(B, Hq, L),
        l.reshape(B, Hq, L),
    )


def _prefill_kernel_masked(
    lens_ref,  # [B] i32
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,
    mask_ref,  # [1, BQ, BS] f32 additive; per_head: [1, 1, BQ, BS]
    o_ref,  # [1, 1, BQ, D]
    m_ref,
    l_ref,
    acc_ref,
    *,
    bq: int,
    bs: int,
    L: int,
    scale: float,
    per_head: bool = False,
):
    """Prefill kernel with an explicit additive mask streamed as a third
    tiled input: the mask replaces causality (reference
    week2_kernels.py:60-95), the per-row length still bounds visibility.
    per_head=True streams the (b, h, iq, s) block of a [B, Hq, L, S]
    mask (round-5 — the prefill grid is already per-q-head)."""
    b = pl.program_id(0)
    s = pl.program_id(3)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    ctx = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs <= ctx - 1)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        q_pos = jnp.broadcast_to(ctx - 1, (BQ, 1))
        mk = (mask_ref[0, 0] if per_head else mask_ref[0]).astype(jnp.float32)
        _flash_inner(
            q, k_ref[0, 0], v_ref[0, 0], q_pos, s * bs,
            m_ref, l_ref, acc_ref, mask_tile=mk,
        )

    @pl.when(s == pl.num_programs(3) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _prefill_kernel(
    lens_ref,  # [B] i32
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,
    o_ref,  # [1, 1, BQ, D]
    m_ref,
    l_ref,
    acc_ref,
    *,
    bq: int,
    bs: int,
    L: int,
    scale: float,
    causal: bool,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    s = pl.program_id(3)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    ctx = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Causal clamp: this q tile's max absolute position.
    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)  # in [0, L)
    q_pos = ctx - L + row
    if causal:
        tile_max_pos = ctx - L + (iq + 1) * bq - 1
    else:
        q_pos = jnp.broadcast_to(ctx - 1, (BQ, 1))
        tile_max_pos = ctx - 1
    live = s * bs <= jnp.minimum(tile_max_pos, ctx - 1)

    @pl.when(live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        _flash_inner(
            q, k_ref[0, 0], v_ref[0, 0], q_pos, s * bs, m_ref, l_ref, acc_ref
        )

    @pl.when(s == pl.num_programs(3) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "bq", "bs", "interpret")
)
def _flash_prefill(
    q: jax.Array,  # [B, Hq, L, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,
    lens: jax.Array,
    scale: float,
    causal: bool,
    # Swept on v5e at 8K (benches): (1024, 1024) is 3.1x over (256, 512)
    # — per-tile softmax/bookkeeping overhead dominates below ~1K tiles.
    bq: int = 1024,
    bs: int = 1024,
    interpret: bool = False,
    mask: jax.Array | None = None,  # [B, L, S] additive
) -> jax.Array:
    B, Hq, L, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    bq = min(bq, L)
    bs = min(bs, S)
    nq = pl.cdiv(L, bq)
    ns = pl.cdiv(S, bs)

    def q_map(b, h, iq, s, lens_ref):
        return (b, h, iq, 0)

    def kv_map(b, h, iq, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, h // n_rep, jnp.minimum(s, last), 0)

    def mask_map(b, h, iq, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, iq, jnp.minimum(s, last))

    def mask_map_h(b, h, iq, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, h, iq, jnp.minimum(s, last))

    in_specs = [
        pl.BlockSpec((1, 1, bq, D), q_map),
        pl.BlockSpec((1, 1, bs, D), kv_map),
        pl.BlockSpec((1, 1, bs, D), kv_map),
    ]
    inputs = [lens.astype(jnp.int32), q, k, v]
    if mask is not None:
        per_head = mask.ndim == 4
        pad_l = nq * bq - L
        pad_s = ns * bs - S
        if per_head:
            assert mask.shape == (B, Hq, L, S), mask.shape
            if pad_l or pad_s:
                mask = jnp.pad(
                    mask, ((0, 0), (0, 0), (0, pad_l), (0, pad_s))
                )
            in_specs.append(pl.BlockSpec((1, 1, bq, bs), mask_map_h))
        else:
            assert mask.shape == (B, L, S), mask.shape
            if pad_l or pad_s:
                mask = jnp.pad(mask, ((0, 0), (0, pad_l), (0, pad_s)))
            in_specs.append(pl.BlockSpec((1, bq, bs), mask_map))
        inputs.append(mask.astype(jnp.float32))
        kernel = functools.partial(
            _prefill_kernel_masked, bq=bq, bs=bs, L=L, scale=scale,
            per_head=per_head,
        )
    else:
        kernel = functools.partial(
            _prefill_kernel, bq=bq, bs=bs, L=L, scale=scale, causal=causal
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hq, nq, ns),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * S * D,
            bytes_accessed=2 * B * Hkv * S * D * 2 + 2 * B * Hq * L * D * 2,
            transcendentals=B * Hq * L * S,
        ),
        interpret=interpret,
    )(*inputs)
    return out


def _prefill_state_kernel(
    lens_ref,  # [B] i32
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BS, D]
    v_ref,
    o_ref,  # [1, 1, BQ, D]
    m_out,  # [1, 1, 1, BQ] f32 (unit dim: TPU block-shape alignment)
    l_out,  # [1, 1, 1, BQ] f32
    m_ref,
    l_ref,
    acc_ref,
    *,
    bq: int,
    bs: int,
    L: int,
    scale: float,
    causal: bool,
):
    """_prefill_kernel that ALSO emits per-row online-softmax state (m, l)
    — the chunk-local half of a split (prefix ⊕ chunk) attention, or the
    per-shard half of a sequence-parallel prefill combine. Rows with no
    visible key emit the combine identity (o=0, m=NEG_INF, l=0)."""
    b = pl.program_id(0)
    iq = pl.program_id(2)
    s = pl.program_id(3)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    ctx = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
    q_pos = ctx - L + row
    if causal:
        tile_max_pos = ctx - L + (iq + 1) * bq - 1
    else:
        q_pos = jnp.broadcast_to(ctx - 1, (BQ, 1))
        tile_max_pos = ctx - 1
    live = s * bs <= jnp.minimum(tile_max_pos, ctx - 1)

    @pl.when(live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        _flash_inner(
            q, k_ref[0, 0], v_ref[0, 0], q_pos, s * bs, m_ref, l_ref, acc_ref
        )

    @pl.when(s == pl.num_programs(3) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)
        m_out[0, 0, 0] = m_ref[:, 0]
        l_out[0, 0, 0] = l_ref[:, 0]


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "bq", "bs", "interpret")
)
def flash_prefill_state_pallas(
    q: jax.Array,  # [B, Hq, L, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,
    lens: jax.Array,  # [B] i32 — valid KV length per row
    scale: float,
    causal: bool = True,
    bq: int = 1024,
    bs: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Flash prefill returning (o, m, l): o [B,Hq,L,D] locally normalized,
    m/l [B,Hq,L] f32 softmax state. Combine partial contexts with
    combine_state_pair() (kernels/split_prefill.py) or across mesh shards
    with parallel.sp_attention.combine_softmax_states()."""
    B, Hq, L, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    bq = min(bq, L)
    bs = min(bs, S)
    nq = pl.cdiv(L, bq)
    ns = pl.cdiv(S, bs)

    def q_map(b, h, iq, s, lens_ref):
        return (b, h, iq, 0)

    def st_map(b, h, iq, s, lens_ref):
        return (b, h, 0, iq)

    def kv_map(b, h, iq, s, lens_ref):
        last = jnp.maximum((lens_ref[b] + bs - 1) // bs - 1, 0)
        return (b, h // n_rep, jnp.minimum(s, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hq, nq, ns),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), q_map),
            pl.BlockSpec((1, 1, bs, D), kv_map),
            pl.BlockSpec((1, 1, bs, D), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), q_map),
            pl.BlockSpec((1, 1, 1, bq), st_map),
            pl.BlockSpec((1, 1, 1, bq), st_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_state_kernel, bq=bq, bs=bs, L=L, scale=scale, causal=causal
    )
    # States carry a unit axis ([B, Hq, 1, L]) so the block's last two
    # dims are (1, bq) — TPU-alignable for any head count.
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, 1, L), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * S * D,
            bytes_accessed=2 * B * Hkv * S * D * 2 + 2 * B * Hq * L * D * 2,
            transcendentals=B * Hq * L * S,
        ),
        interpret=interpret,
    )(lens.astype(jnp.int32), q, k, v)
    return o, m.reshape(B, Hq, L), l.reshape(B, Hq, L)


# ---------------------------------------------------------------------------
# Public entry points used by kernels/flash_attention.py dispatch.
# ---------------------------------------------------------------------------


def flash_decode_attention_pallas(
    q, k, v, lens, scale=None, interpret: bool = False
):
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else scale
    return _flash_decode(q, k, v, lens, scale=float(scale), interpret=interpret)


def flash_attention_pallas(
    q, k, v, scale=None, mask=None, lens=None, interpret: bool = False
):
    B, Hq, L, D = q.shape
    S = k.shape[2]
    scale = (D**-0.5) if scale is None else scale
    if lens is None:
        lens = jnp.full((B,), S, jnp.int32)
    causal = mask == "causal" or mask is None
    mask_arr = None
    if isinstance(mask, jax.Array):
        # Explicit additive masks stream through the kernels as a third
        # tiled input (VERDICT round-2 item #6; reference decode kernel
        # contract week2_kernels.py:98-147). Canonical shapes per
        # flash_attention.normalize_mask. Per-head masks ([B, Hq, L, S])
        # stream one block per (request, head group) — round 5; they cost
        # Hq x the shared mask's HBM traffic, which is inherent to the
        # shape, not to this path (the former XLA twin read the same).
        from .flash_attention import normalize_mask

        m4 = normalize_mask(mask, B, L, S)
        if m4.shape[1] != 1:
            if m4.shape[1] != Hq:
                raise ValueError(
                    f"per-head mask head axis {m4.shape[1]} != Hq {Hq}"
                )
            mask_arr = m4  # [B, Hq, L, S]
        else:
            mask_arr = jnp.broadcast_to(m4[:, 0], (B, L, S))
        causal = False
    if L <= 16:
        return _flash_decode(
            q, k, v, lens, scale=float(scale), interpret=interpret,
            mask=mask_arr,
        )
    return _flash_prefill(
        q, k, v, lens, scale=float(scale), causal=causal, interpret=interpret,
        mask=mask_arr,
    )
