"""Pallas paged attention: flash decode + prefill over a page pool.

The flagship kernels — TPU replacement for
/root/reference/src/extensions_ref/src/paged_attention.metal:
  - paged_attention_decode (:108-244): online-softmax flash decode walking
    the block table, skipping -1 pages, causal visible-context clamp.
  - paged_attention_mma_bf16_d128 (:250-506): BQ-tiled flash prefill with
    per-tile page gather and causal tile limit.

TPU-first design: the page INDIRECTION lives in the BlockSpec index_map —
block_table and context_lens ride in as scalar-prefetch args, and each KV
tile's index_map returns the physical page id directly, so the Pallas
pipeline DMAs exactly the logical pages in order, double-buffered, with
out-of-range tiles clamped to re-fetch the previous page (elided DMA).
That replaces the Metal kernels' hand-written page-walk gather loops with
the machinery the hardware already has.

Page layout [P, H_kv, page_size, D]: one (page, head) tile is a contiguous
[page_size, D] block — page_size x 256 B bursts, ideal for DMA (and the
reason the pool keeps the reference's H-major layout).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention_pallas import NEG_INF, _flash_inner

# Trace-time marker: true while tracing a lax.scan decode-burst body
# (models/qwen3.py forward_decode_burst_paged). See the dispatch note in
# paged_attention_pallas() for why scan bodies avoid the gather kernel.
_IN_SCAN = [False]


@contextlib.contextmanager
def scan_scope():
    """Mark pallas paged-decode dispatch as inside a scan body."""
    prev = _IN_SCAN[0]
    _IN_SCAN[0] = True
    try:
        yield
    finally:
        _IN_SCAN[0] = prev


def _paged_decode_kernel(
    bt_ref,  # [B, maxp] i32 (scalar prefetch)
    lens_ref,  # [B] i32 (scalar prefetch)
    q_ref,  # [1, 1, n_rep, L, D]
    k_ref,  # [1, 1, ps, D] — one page, one head
    v_ref,
    o_ref,  # [1, 1, n_rep, L, D]
    m_ref,
    l_ref,
    acc_ref,
    *,
    ps: int,
    scale: float,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    n_rep, L, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    ctx = lens_ref[b]

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * ps < ctx)
    def _():
        q = q_ref[0, 0].reshape(R, D).astype(jnp.float32) * scale
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % L
        q_pos = ctx - L + l_idx
        _flash_inner(q, k_ref[0, 0], v_ref[0, 0], q_pos, i * ps, m_ref, l_ref, acc_ref)

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:] / l_ref[:, :1]
        o_ref[0, 0] = out.reshape(n_rep, L, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_flash_decode(
    q: jax.Array,  # [B, Hq, L, D]
    key_pages: jax.Array,  # [P, Hkv, ps, D]
    value_pages: jax.Array,
    block_table: jax.Array,  # [B, maxp] i32, -1 padded
    context_lens: jax.Array,  # [B] i32
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, L, D = q.shape
    P, Hkv, ps, _ = key_pages.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    R = n_rep * L

    def q_map(b, h, i, bt_ref, lens_ref):
        return (b, h, 0, 0, 0)

    def kv_map(b, h, i, bt_ref, lens_ref):
        # Clamp past each row's last live page -> re-fetch, DMA elided;
        # -1 padding maps to page 0 (its scores are masked by ctx).
        last = jnp.maximum((lens_ref[b] + ps - 1) // ps - 1, 0)
        page = bt_ref[b, jnp.minimum(i, last)]
        return (jnp.maximum(page, 0), h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, maxp),
        in_specs=[
            pl.BlockSpec((1, 1, n_rep, L, D), q_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, n_rep, L, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, D), jnp.float32),
        ],
    )
    qg = q.reshape(B, Hkv, n_rep, L, D)
    kernel = functools.partial(_paged_decode_kernel, ps=ps, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * maxp * ps * D,
            bytes_accessed=2 * B * Hkv * maxp * ps * D * 2,
            transcendentals=B * Hq * L * maxp * ps,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qg,
        key_pages,
        value_pages,
    )
    return out.reshape(B, Hq, L, D)


def _paged_decode_page_kernel(
    bt_ref,  # [B, maxp] i32 (scalar prefetch)
    lens_ref,  # [B] i32 (scalar prefetch)
    q_ref,  # [1, Hkv, n_rep, L, D]
    k_ref,  # [1, Hkv, ps, D] — ONE WHOLE PAGE, all KV heads
    v_ref,
    o_ref,  # [1, Hkv, n_rep, L, D]
    m_ref,  # VMEM [Hkv, R, 128] f32
    l_ref,
    acc_ref,  # VMEM [Hkv, R, D] f32
    *,
    ps: int,
    scale: float,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    Hkv, n_rep, L, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    ctx = lens_ref[b]

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * ps < ctx)
    def _():
        # All-heads batched online softmax: one [Hkv, R, ps] batched MXU
        # dot + vectorized state updates. The per-head _flash_inner loop
        # ran 2*Hkv tiny dots and Hkv separate [R, ps] softmax passes per
        # page; with decode-sized R (= n_rep * L, typically 4-8 rows) the
        # kernel was BOOKKEEPING-bound, not DMA-bound (measured 354 GB/s
        # at 32K where the 256 KiB page DMA alone would sustain ~800).
        q = (q_ref[0].reshape(Hkv, R, D).astype(jnp.float32) * scale).astype(
            jnp.bfloat16
        )
        s = jax.lax.dot_general(
            q, k_ref[0],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, R, ps]
        k_pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        l_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % L
        q_pos = ctx - L + l_idx
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_prev = m_ref[:, :, :1]  # [Hkv, R, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        # Same fully-masked-row floor as _flash_inner: p underflows to 0.
        p = jnp.exp(s - jnp.maximum(m_new, NEG_INF / 2))
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
        out = acc_ref[:] / jnp.maximum(l_ref[:, :, :1], 1e-30)
        o_ref[0] = out.reshape(Hkv, n_rep, L, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_flash_decode_pages(
    q: jax.Array,  # [B, Hq, L, D]
    key_pages: jax.Array,  # [P, Hkv, ps, D]
    value_pages: jax.Array,
    block_table: jax.Array,  # [B, maxp] i32, -1 padded
    context_lens: jax.Array,  # [B] i32
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Whole-page BlockSpec walk: the scan-safe fast decode schedule.

    The original walk kernel (paged_flash_decode) DMAs one (page, head)
    tile of ps*D*2 = 32 KiB per grid step, which caps long-context
    throughput at ~140-370 GB/s; the manual-DMA gather kernel fixes that
    but probabilistically faults the TPU worker on the current relay
    when dispatched inside lax.scan decode bursts (the serving campaign
    crashes where every synthetic probe passes —
    benches/probe_model_burst.py). This kernel takes the gather's key
    idea — move WHOLE PAGES across all KV heads, one contiguous
    [Hkv, ps, D] block (256 KiB at the Qwen3 pool shape) — but
    expresses the indirection in the BlockSpec index_map, so the DMA
    pipeline is Mosaic's own double-buffered machinery: no manual
    semaphores, nothing the scan transform has faulted on. Grid
    (B, maxp) instead of (B, Hkv, maxp): Hkv-fold fewer, Hkv-fold
    larger transfers at identical total traffic."""
    B, Hq, L, D = q.shape
    P, Hkv, ps, _ = key_pages.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    R = n_rep * L

    def q_map(b, i, bt_ref, lens_ref):
        return (b, 0, 0, 0, 0)

    def kv_map(b, i, bt_ref, lens_ref):
        last = jnp.maximum((lens_ref[b] + ps - 1) // ps - 1, 0)
        page = bt_ref[b, jnp.minimum(i, last)]
        return (jnp.maximum(page, 0), 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, maxp),
        in_specs=[
            pl.BlockSpec((1, Hkv, n_rep, L, D), q_map),
            pl.BlockSpec((1, Hkv, ps, D), kv_map),
            pl.BlockSpec((1, Hkv, ps, D), kv_map),
        ],
        out_specs=pl.BlockSpec((1, Hkv, n_rep, L, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, R, 128), jnp.float32),
            pltpu.VMEM((Hkv, R, 128), jnp.float32),
            pltpu.VMEM((Hkv, R, D), jnp.float32),
        ],
    )
    qg = q.reshape(B, Hkv, n_rep, L, D)
    kernel = functools.partial(_paged_decode_page_kernel, ps=ps, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * maxp * ps * D,
            bytes_accessed=2 * B * Hkv * maxp * ps * D * 2,
            transcendentals=B * Hq * L * maxp * ps,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qg,
        key_pages,
        value_pages,
    )
    return out.reshape(B, Hq, L, D)


def _paged_decode_gather_kernel(
    bt_ref,  # [B, maxp] i32 (scalar prefetch)
    lens_ref,  # [B] i32 (scalar prefetch)
    q_ref,  # [1, Hkv, n_rep, L, D] — all heads of one request
    k_hbm,  # [P, Hkv, ps, D] — stays in HBM, gathered manually
    v_hbm,
    o_ref,  # [1, Hkv, n_rep, L, D]
    k_tile,  # VMEM [NBUF, G, Hkv, ps, D] scratch (multi-buffered)
    v_tile,
    m_ref,  # VMEM [Hkv, R, 128] f32
    l_ref,
    acc_ref,  # VMEM [Hkv, R, D] f32
    k_sems,  # DMA sems [NBUF, G]
    v_sems,
    *,
    ps: int,
    G: int,
    NBUF: int,
    scale: float,
):
    """Multi-page gather flash decode (VERDICT round-1 item #3).

    The BlockSpec-pipelined kernel above DMAs ONE (page, head) tile of
    ps*D*2 bytes per grid step — at ps=128 that is a 32 KiB DMA plus a
    full pipeline step of bookkeeping per page, which caps long-context
    throughput at ~140 GB/s. This kernel instead walks the block table
    inside the body: each super-tile gathers G whole pages ACROSS ALL KV
    HEADS (one contiguous [Hkv, ps, D] DMA per page — 8x larger bursts,
    Hkv-fold fewer descriptors), double-buffers the gathers against
    compute, and bounds the walk by the request's live page count, so
    dead block-table slots cost nothing (the Metal decode kernel's
    page_id < 0 skip, paged_attention.metal:108-244, taken to its
    bandwidth-optimal form).
    """
    b = pl.program_id(0)
    Hkv, n_rep, L, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    S = G * ps
    ctx = lens_ref[b]
    n_pages = (ctx + ps - 1) // ps
    n_super = (n_pages + G - 1) // G
    last = jnp.maximum(n_pages - 1, 0)

    def page_dma(src, dst_tile, slot, g, pid, sems):
        return pltpu.make_async_copy(
            src.at[pid], dst_tile.at[slot, g], sems.at[slot, g]
        )

    def issue(jj, slot):
        # Dead tail slots re-fetch the last live page (clamped index)
        # rather than being skipped: their scores are masked, but the V
        # tile MUST hold finite data — the PV dot multiplies masked rows
        # by p == 0, and 0 * NaN from uninitialized scratch would poison
        # the accumulator. Only the final super-tile pays, < G pages.
        for g in range(G):  # static unroll: G concurrent page gathers
            pid = jnp.maximum(bt_ref[b, jnp.minimum(jj * G + g, last)], 0)
            page_dma(k_hbm, k_tile, slot, g, pid, k_sems).start()
            page_dma(v_hbm, v_tile, slot, g, pid, v_sems).start()

    def wait(jj, slot):
        for g in range(G):
            pid = jnp.maximum(bt_ref[b, jnp.minimum(jj * G + g, last)], 0)
            page_dma(k_hbm, k_tile, slot, g, pid, k_sems).wait()
            page_dma(v_hbm, v_tile, slot, g, pid, v_sems).wait()

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    # Prime the pipeline NBUF-1 super-tiles deep: with light decode
    # compute the kernel is DMA-latency bound, and more gathers in
    # flight is the lever (measured on the v5e: 2->3 buffers helps).
    for jj in range(NBUF - 1):
        @pl.when(jj < n_super)
        def _():
            issue(jj, jj % NBUF)

    l_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % L
    q_pos = ctx - L + l_idx

    def body(j, _):
        slot = jax.lax.rem(j, NBUF)
        ahead = j + NBUF - 1

        @pl.when(ahead < n_super)
        def _():
            issue(ahead, jax.lax.rem(ahead, NBUF))

        wait(j, slot)
        # Tail super-tile: garbage slots keep stale data; their k_pos is
        # >= ctx > every q_pos, so _flash_inner masks them out.
        for h in range(Hkv):
            q = q_ref[0, h].reshape(R, D).astype(jnp.float32) * scale
            k = k_tile[slot, :, h].reshape(S, D)
            v = v_tile[slot, :, h].reshape(S, D)
            _flash_inner(
                q, k, v, q_pos, j * S,
                m_ref.at[h], l_ref.at[h], acc_ref.at[h],
            )
        return 0

    jax.lax.fori_loop(0, n_super, body, 0)
    for h in range(Hkv):
        out = acc_ref[h] / jnp.maximum(l_ref[h, :, :1], 1e-30)
        o_ref[0, h] = out.reshape(n_rep, L, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "pages_per_tile", "num_buffers", "interpret"))
def paged_flash_decode_gather(
    q: jax.Array,  # [B, Hq, L, D]
    key_pages: jax.Array,  # [P, Hkv, ps, D]
    value_pages: jax.Array,
    block_table: jax.Array,  # [B, maxp] i32, -1 padded
    context_lens: jax.Array,  # [B] i32
    scale: float,
    pages_per_tile: int = 8,
    num_buffers: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Paged flash decode with multi-page gather tiles (see kernel doc)."""
    B, Hq, L, D = q.shape
    P, Hkv, ps, _ = key_pages.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    R = n_rep * L
    G = max(1, min(pages_per_tile, maxp))

    def q_map(b, bt_ref, lens_ref):
        return (b, 0, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, n_rep, L, D), q_map),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hkv, n_rep, L, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((num_buffers, G, Hkv, ps, D), key_pages.dtype),
            pltpu.VMEM((num_buffers, G, Hkv, ps, D), value_pages.dtype),
            pltpu.VMEM((Hkv, R, 128), jnp.float32),
            pltpu.VMEM((Hkv, R, 128), jnp.float32),
            pltpu.VMEM((Hkv, R, D), jnp.float32),
            pltpu.SemaphoreType.DMA((num_buffers, G)),
            pltpu.SemaphoreType.DMA((num_buffers, G)),
        ],
    )
    qg = q.reshape(B, Hkv, n_rep, L, D)
    kernel = functools.partial(
        _paged_decode_gather_kernel, ps=ps, G=G, NBUF=num_buffers, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * maxp * ps * D,
            bytes_accessed=2 * B * Hkv * maxp * ps * D * 2,
            transcendentals=B * Hq * L * maxp * ps,
        ),
        compiler_params=pltpu.CompilerParams(
            # 2 double-buffered [G, Hkv, ps, D] bf16 tiles for K and V
            # (G=8: 4 MiB each) + per-head f32 state; cap well above that
            # so Mosaic's default budget never rejects the tile shape.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qg,
        key_pages,
        value_pages,
    )
    return out.reshape(B, Hq, L, D)


def _paged_prefill_kernel(
    bt_ref,
    lens_ref,
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, ps, D]
    v_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    ps: int,
    bq: int,
    L: int,
    scale: float,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    i = pl.program_id(3)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    ctx = lens_ref[b]

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
    q_pos = ctx - L + row
    tile_max_pos = ctx - L + (iq + 1) * bq - 1
    live = i * ps <= jnp.minimum(tile_max_pos, ctx - 1)

    @pl.when(live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        _flash_inner(q, k_ref[0, 0], v_ref[0, 0], q_pos, i * ps, m_ref, l_ref, acc_ref)

    @pl.when(i == pl.num_programs(3) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "interpret"))
def paged_flash_prefill(
    q: jax.Array,  # [B, Hq, L, D] — last L tokens of each context
    key_pages: jax.Array,  # [P, Hkv, ps, D]
    value_pages: jax.Array,
    block_table: jax.Array,
    context_lens: jax.Array,
    scale: float,
    bq: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, L, D = q.shape
    P, Hkv, ps, _ = key_pages.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    bq = min(bq, L)
    nq = pl.cdiv(L, bq)

    def q_map(b, h, iq, i, bt_ref, lens_ref):
        return (b, h, iq, 0)

    def kv_map(b, h, iq, i, bt_ref, lens_ref):
        last = jnp.maximum((lens_ref[b] + ps - 1) // ps - 1, 0)
        page = bt_ref[b, jnp.minimum(i, last)]
        return (jnp.maximum(page, 0), h // n_rep, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, nq, maxp),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), q_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_prefill_kernel, ps=ps, bq=bq, L=L, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * L * maxp * ps * D,
            bytes_accessed=2 * B * Hkv * maxp * ps * D * 2 + 2 * B * Hq * L * D * 2,
            transcendentals=B * Hq * L * maxp * ps,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        q,
        key_pages,
        value_pages,
    )
    return out


def _paged_decode_state_kernel(
    base_ref,  # [1] i32 (scalar prefetch) — first GLOBAL page id owned here
    bt_ref,  # [B, maxp] i32 (scalar prefetch) — GLOBAL page ids
    lens_ref,  # [B] i32 (scalar prefetch)
    q_ref,  # [1, 1, n_rep, L, D]
    k_ref,  # [1, 1, ps, D] — one LOCAL page
    v_ref,
    o_ref,  # [1, 1, n_rep, L, D]
    m_out,  # [1, 1, n_rep, L] f32
    l_out,  # [1, 1, n_rep, L] f32
    m_ref,
    l_ref,
    acc_ref,
    *,
    ps: int,
    p_loc: int,
    scale: float,
):
    """Flash decode over the shard-LOCAL slice of a sequence-sharded page
    pool, emitting online-softmax state. The shard owns global pages
    [base, base + p_loc); block-table entries outside that range are
    skipped (their tokens live on other shards — the mesh-level analog of
    the Metal decode kernel's page_id < 0 skip,
    paged_attention.metal:108-244). Combine across shards with
    combine_softmax_states(). Shards owning none of a row's pages emit
    the identity (o=0, m=NEG_INF, l=0)."""
    b = pl.program_id(0)
    i = pl.program_id(2)
    n_rep, L, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    R = n_rep * L
    ctx = lens_ref[b]
    page = bt_ref[b, i]
    local = page - base_ref[0]
    owned = (local >= 0) & (local < p_loc)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i * ps < ctx) & owned)
    def _():
        q = q_ref[0, 0].reshape(R, D).astype(jnp.float32) * scale
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % L
        q_pos = ctx - L + l_idx
        _flash_inner(q, k_ref[0, 0], v_ref[0, 0], q_pos, i * ps, m_ref, l_ref, acc_ref)

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).reshape(n_rep, L, D).astype(o_ref.dtype)
        m_out[0, 0] = m_ref[:, :1].reshape(n_rep, L)
        l_out[0, 0] = l_ref[:, :1].reshape(n_rep, L)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_state(
    q: jax.Array,  # [B, Hq, L, D] — decode rows (L small)
    key_pages: jax.Array,  # [P_loc, Hkv, ps, D] — the shard's LOCAL pages
    value_pages: jax.Array,
    block_table: jax.Array,  # [B, maxp] i32 — GLOBAL page ids
    context_lens: jax.Array,  # [B] i32 — GLOBAL context length
    page_base: jax.Array,  # [] or [1] i32 — first global page id owned here
    scale: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(o, m, l) of decode attention over the locally-owned pages only."""
    B, Hq, L, D = q.shape
    P_loc, Hkv, ps, _ = key_pages.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    R = n_rep * L

    def q_map(b, h, i, base_ref, bt_ref, lens_ref):
        return (b, h, 0, 0, 0)

    def st_map(b, h, i, base_ref, bt_ref, lens_ref):
        return (b, h, 0, 0)

    def kv_map(b, h, i, base_ref, bt_ref, lens_ref):
        # Clamp non-owned / padded pages into range; the kernel body skips
        # them, and repeated indices elide the DMA.
        local = bt_ref[b, i] - base_ref[0]
        return (jnp.clip(local, 0, P_loc - 1), h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, maxp),
        in_specs=[
            pl.BlockSpec((1, 1, n_rep, L, D), q_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n_rep, L, D), q_map),
            pl.BlockSpec((1, 1, n_rep, L), st_map),
            pl.BlockSpec((1, 1, n_rep, L), st_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, D), jnp.float32),
        ],
    )
    qg = q.reshape(B, Hkv, n_rep, L, D)
    kernel = functools.partial(
        _paged_decode_state_kernel, ps=ps, p_loc=P_loc, scale=scale
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, n_rep, L), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, n_rep, L), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(page_base, jnp.int32).reshape(1),
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qg,
        key_pages,
        value_pages,
    )
    return (
        o.reshape(B, Hq, L, D),
        m.reshape(B, Hq, L),
        l.reshape(B, Hq, L),
    )


def _paged_prefix_state_kernel(
    bt_ref,
    lens_ref,  # [B] i32 — PREFIX length (tokens before the chunk)
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, ps, D]
    v_ref,
    o_ref,  # [1, 1, BQ, D]
    m_out,  # [1, 1, 1, BQ] f32 (unit dim: TPU block-shape alignment)
    l_out,  # [1, 1, 1, BQ] f32
    m_ref,
    l_ref,
    acc_ref,
    *,
    ps: int,
    scale: float,
):
    """Non-causal attention of a chunk's queries over its PREFIX pages,
    emitting online-softmax state per query row.

    Every chunk query comes after the whole prefix, so all prefix keys are
    visible to all rows — no causal clamp; the mask `k_pos < prefix_len`
    only excludes chunk tokens already written into the prefix's tail page
    (offsets need not be page-aligned). Rows with prefix_len == 0 emit the
    combine identity (o=0, m=NEG_INF, l=0). Combine with the chunk-local
    causal state via combine_state_pair() — the split that replaces the
    reference prefill kernel's per-key page walk over the chunk's own
    tokens (paged_attention.metal:332-385 single-page fast path attacks
    the same cost)."""
    b = pl.program_id(0)
    i = pl.program_id(3)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    ctx = lens_ref[b]

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_pos = jnp.broadcast_to(ctx - 1, (BQ, 1))

    @pl.when(i * ps < ctx)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        _flash_inner(q, k_ref[0, 0], v_ref[0, 0], q_pos, i * ps, m_ref, l_ref, acc_ref)

    @pl.when(i == pl.num_programs(3) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)
        m_out[0, 0, 0] = m_ref[:, 0]
        l_out[0, 0, 0] = l_ref[:, 0]


@functools.partial(jax.jit, static_argnames=("scale", "bq", "interpret"))
def paged_prefix_state(
    q: jax.Array,  # [B, Hq, L, D] — one prefill chunk's queries
    key_pages: jax.Array,  # [P, Hkv, ps, D]
    value_pages: jax.Array,
    block_table: jax.Array,  # [B, maxp] i32, -1 padded
    prefix_lens: jax.Array,  # [B] i32 — tokens BEFORE the chunk
    scale: float,
    # No causal clamp -> no wasted work from big q tiles; bq=2048 keeps
    # whole serving chunks resident so each prefix page is DMA'd once
    # per (b, h). VMEM at bq=2048, D=128: q 0.5 + acc 1 + m/l 2 MiB.
    bq: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(o, m, l) of chunk queries attending non-causally to prefix pages."""
    B, Hq, L, D = q.shape
    P, Hkv, ps, _ = key_pages.shape
    n_rep = Hq // Hkv
    maxp = block_table.shape[1]
    bq = min(bq, L)
    nq = pl.cdiv(L, bq)

    def q_map(b, h, iq, i, bt_ref, lens_ref):
        return (b, h, iq, 0)

    def st_map(b, h, iq, i, bt_ref, lens_ref):
        return (b, h, 0, iq)

    def kv_map(b, h, iq, i, bt_ref, lens_ref):
        last = jnp.maximum((lens_ref[b] + ps - 1) // ps - 1, 0)
        page = bt_ref[b, jnp.minimum(i, last)]
        return (jnp.maximum(page, 0), h // n_rep, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, nq, maxp),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), q_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
            pl.BlockSpec((1, 1, ps, D), kv_map),
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
    kernel = functools.partial(_paged_prefix_state_kernel, ps=ps, scale=scale)
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
            flops=4 * B * Hq * L * maxp * ps * D,
            bytes_accessed=2 * B * Hkv * maxp * ps * D * 2 + 2 * B * Hq * L * D * 2,
            transcendentals=B * Hq * L * maxp * ps,
        ),
        interpret=interpret,
    )(
        block_table.astype(jnp.int32),
        prefix_lens.astype(jnp.int32),
        q,
        key_pages,
        value_pages,
    )
    return o, m.reshape(B, Hq, L), l.reshape(B, Hq, L)


def paged_attention_pallas(
    q, key_pages, value_pages, block_table, context_lens,
    scale=None, mask="causal", interpret: bool = False,
):
    """Dispatch: decode kernel for short query blocks, prefill otherwise.

    Mirrors the reference's L<=8 decode / MMA prefill split
    (paged_attention.cpp:168-224) with a TPU-appropriate threshold.
    """
    D = q.shape[-1]
    L = q.shape[2]
    scale = (D**-0.5) if scale is None else scale
    assert mask in ("causal", None), "paged attention supports causal masking"
    if L <= 16:
        # Multi-page gather tiles: ~4 MiB of pages per super-tile (G=16
        # at the Qwen3 pool shape) measured 769 GB/s at 32K vs 138 for
        # the one-page-per-grid-step kernel (benchmark_results/
        # v5e-paged-decode-gather-2026-08-20.json). The manual page DMAs
        # need a lane-aligned head dim (Mosaic memref slicing: D must be
        # a multiple of 128 — caught by scripts/tpu_smoke.py at D=64);
        # odd head sizes stay on the BlockSpec-walk decode kernel.
        _, Hkv, ps, _ = key_pages.shape
        # Schedule choice (override with TLT_PAGED_DECODE=gather|pages|
        # walk globally, or TLT_PAGED_DECODE_SCAN=... for scan scope):
        #   single-step dispatch -> manual-DMA multi-page gather (769
        #     GB/s at 32K, the long-context path).
        #   inside a lax.scan decode burst (scan_scope) -> the
        #     whole-page BlockSpec walk (paged_flash_decode_pages):
        #     the gather kernel PROBABILISTICALLY faults the TPU worker
        #     on the current relay when scan-wrapped under sustained
        #     serving load (every synthetic probe passes — stages 1-10
        #     of benches/probe_scan_gather_fault.py and 2/36-layer
        #     model campaigns in probe_model_burst.py — but bench.py
        #     --mode serving crashes minutes in, reproducibly across
        #     two runs). The page-walk keeps the gather's whole-page
        #     256 KiB DMA granularity but uses Mosaic's own BlockSpec
        #     pipeline, which has never faulted under scan.
        #   odd head dims (D % 128 != 0) -> the per-(page, head) walk
        #     (Mosaic memref slicing needs lane-aligned D for the
        #     larger blocks' index maps at this layout).
        import os

        forced = (
            os.environ.get("TLT_PAGED_DECODE_SCAN") if _IN_SCAN[0] else None
        ) or os.environ.get("TLT_PAGED_DECODE")
        if forced in ("gather", "pages", "walk"):
            schedule = forced
        elif _IN_SCAN[0]:
            schedule = "pages"
        else:
            schedule = "gather"
        if D % 128 != 0:
            schedule = "walk"
        if schedule == "gather":
            page_bytes = Hkv * ps * D * key_pages.dtype.itemsize
            g = max(1, min((4 << 20) // page_bytes, block_table.shape[1]))
            return paged_flash_decode_gather(
                q, key_pages, value_pages, block_table, context_lens,
                scale=float(scale), pages_per_tile=g, interpret=interpret,
            )
        if schedule == "pages":
            return paged_flash_decode_pages(
                q, key_pages, value_pages, block_table, context_lens,
                scale=float(scale), interpret=interpret,
            )
        return paged_flash_decode(
            q, key_pages, value_pages, block_table, context_lens,
            scale=float(scale), interpret=interpret,
        )
    return paged_flash_prefill(
        q, key_pages, value_pages, block_table, context_lens,
        scale=float(scale), interpret=interpret,
    )
