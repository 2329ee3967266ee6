"""Collective matmul: manual comm/compute overlap for TP decode.

The reference has nothing to port here (SURVEY.md §2.8: no distributed
execution); the single-chip semantics these preserve are just `linear`
(reference basics.py:10). Under tensor parallelism the decode step has
two collective points per layer: QKV/gate/up consume a gathered
activation (all-gather -> column-sharded matmul) and o_proj/down_proj
produce a partial sum over the sharded contraction axis (row-sharded
matmul -> reduce). XLA's collectives are async, but a monolithic
all_gather/all_reduce still serializes against the one matmul that
consumes or produces it. These kernels decompose the matmul into
per-shard chunks threaded through a `ppermute` ring so each chunk's ICI
transfer hides behind the previous chunk's MXU work — the "collective
matmul" pattern (Wang et al., ASPLOS'23), written with jax.lax
collectives inside shard_map per the scaling-book recipe.

Both are numerically exact (fp32 accumulation; no softmax-style state
merging): outputs match the unsharded matmul to reduction-order rounding.
Wired into the TP decode step via `overlapped_tp_matmuls`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map


def _ring_perm(axis: str):
    n = jax.lax.axis_size(axis)
    return [(i, (i + 1) % n) for i in range(n)], n


def allgather_matmul(
    x_local: jax.Array, w_local: jax.Array, axis: str
) -> jax.Array:
    """y_local = all_gather(x, axis) @ w_local, gather hidden behind compute.

    The QKV / gate-up pattern. Per-shard shapes: x_local [B, K/n] (the
    residual sharded on its feature axis), w_local [K, N/n] (weights
    column-sharded over heads / ffn). Each ring step matmuls the x chunk
    currently held against the matching K-row band of the local column
    shard while `ppermute` ships the next chunk — the gathered [B, K]
    activation never materializes. Returns [B, N/n] (stays column-sharded).
    """
    perm, n = _ring_perm(axis)
    idx = jax.lax.axis_index(axis)
    b, k_local = x_local.shape
    n_local = w_local.shape[1]
    # Row band r of the local weight shard multiplies global x chunk r.
    w_bands = w_local.reshape(n, k_local, n_local)

    def body(i, carry):
        acc, chunk = carry
        src = (idx - i) % n  # which global chunk `chunk` holds right now
        w_rows = jax.lax.dynamic_index_in_dim(w_bands, src, keepdims=False)
        nxt = jax.lax.ppermute(chunk, axis, perm)
        acc = acc + jnp.dot(chunk, w_rows, preferred_element_type=jnp.float32)
        return acc, nxt

    acc0 = jnp.zeros((b, n_local), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, n, body, (acc0, x_local))
    return acc.astype(x_local.dtype)


def matmul_reducescatter(
    x_local: jax.Array, w_local: jax.Array, axis: str
) -> jax.Array:
    """y_local = reduce_scatter(x_local @ w_local, axis) with overlap.

    The o_proj / down_proj pattern. Per-shard shapes: x_local [B, K/n]
    (attention heads / ffn activations, column-sharded), w_local [K/n, N]
    (weights row-sharded); the true product is sum_s x_s @ w_s. Instead
    of one big psum, a running partial for each output column chunk rides
    the ring: at step i this shard adds its contribution for output chunk
    (idx - i) mod n to the partial that just arrived, then forwards it.
    Accumulator A_j starts on shard j, visits every shard collecting that
    shard's x @ W[:, chunk j], and after n hops lands back home — so the
    result arrives scattered: shard j holds y[:, chunk j] ([B, N/n]).
    """
    perm, n = _ring_perm(axis)
    idx = jax.lax.axis_index(axis)
    b, _ = x_local.shape
    n_total = w_local.shape[1]
    assert n_total % n == 0, (n_total, n)
    w_chunks = w_local.reshape(w_local.shape[0], n, n_total // n)

    def body(i, acc):
        tgt = (idx - i) % n  # the chunk the arriving accumulator collects
        part = jnp.dot(
            x_local, w_chunks[:, tgt, :], preferred_element_type=jnp.float32
        )
        return jax.lax.ppermute(acc + part, axis, perm)

    acc0 = jnp.zeros((b, n_total // n), jnp.float32)
    acc = jax.lax.fori_loop(0, n, body, acc0)
    return acc.astype(x_local.dtype)


def overlapped_tp_matmuls(mesh: Mesh, axis: str = "tp"):
    """shard_map-wrapped (allgather_matmul, matmul_reducescatter) pair
    operating on NamedSharding'd global arrays — drop-in TP linears.

    qkv_style(x [B,K] sharded on dim1, w [K,N] sharded on dim1) -> [B,N] sharded on dim1
    oproj_style(x [B,K] sharded on dim1, w [K,N] sharded on dim0) -> [B,N] sharded on dim1
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def qkv_style(x, w):
        return allgather_matmul(x, w, axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def oproj_style(x, w):
        return matmul_reducescatter(x, w, axis)

    return qkv_style, oproj_style
