"""Expert-parallel MoE with explicit token routing (SURVEY.md §2.8:
"shard experts over mesh axis; all-to-all token routing replacing the
sort + gather_qmm trick").

The reference simulates expert parallelism on one device with a sorted
grouped matmul (moe.py:7-33). Across a mesh, this layer keeps that exact
numerics while moving only TOKENS, never expert weights:

  1. Routing is computed replicated (router weights are tiny), so every
     shard knows the full sorted token order and group sizes.
  2. Each shard slices the contiguous segment of sorted tokens destined
     for ITS experts (activations are replicated at the MoE input — the
     TP/decode regime — so the "send" all-to-all is a local slice) and
     runs the full local gate/up/act/down chain with the ragged
     grouped-matmul kernel on its expert shard.
  3. One `psum` of the [T, D] down-projection outputs merges the
     disjoint per-shard segments — the "receive" half of the all-to-all,
     one collective per MoE layer (not per projection).

Capacity semantics: with `capacity_factor=None` the layer is dropless
(per-shard buffer = T rows, exact vs the single-device reference). A
finite capacity_factor bounds the buffer at ceil(T/n · f) rows per
shard; overflowing tokens are dropped (standard switch-style capacity),
their contribution becomes zero before the expert_scores weighting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.basics import silu
from ..ops.moe import grouped_matmul, route_topk
from ..ops.quantize import QuantizedTensor
from .sharding import ShardingConfig

shard_map = jax.shard_map


def _num_experts(w) -> int:
    return (w.packed if isinstance(w, QuantizedTensor) else w).shape[0]


class EPMoE:
    """Expert-parallel sparse MLP over one mesh axis.

    Weights may be global arrays/QuantizedTensors (sharded or not — the
    shard_map in_specs assign the expert axis); `__call__` matches
    ops.moe.moe_forward(x) -> [B, L, D].
    """

    def __init__(
        self,
        scfg: ShardingConfig,
        w_router,
        w_gate,
        w_up,
        w_down,
        num_experts_per_tok: int,
        norm_topk_prob: bool = False,
        capacity_factor: float | None = None,
        axis: str | None = None,
        impl: str | None = None,
    ):
        self.scfg = scfg
        self.axis = axis or scfg.tp_axis
        self.n = scfg.mesh.shape[self.axis]
        self.E = _num_experts(w_gate)
        assert self.E % self.n == 0, (
            f"num_experts {self.E} must divide over {self.n} shards"
        )
        self.E_loc = self.E // self.n
        self.w_router = w_router
        self.w_gate = w_gate
        self.w_up = w_up
        self.w_down = w_down
        self.k = num_experts_per_tok
        self.norm_topk_prob = norm_topk_prob
        self.capacity_factor = capacity_factor
        self.impl = impl

    def _capacity(self, T: int) -> int:
        if self.capacity_factor is None:
            return T  # dropless
        import math

        return min(T, max(1, math.ceil(T * self.capacity_factor / self.n)))

    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, D = x.shape
        k, E, E_loc, axis = self.k, self.E, self.E_loc, self.axis
        T = B * L * k
        C = int(self._capacity(T))
        norm_topk = self.norm_topk_prob
        impl = self.impl

        def body(x, w_router, w_gate, w_up, w_down):
            _, ids, scores = route_topk(x, w_router, k, norm_topk)
            expanded = jnp.broadcast_to(
                x[:, :, None, :], (B, L, k, D)
            ).reshape(T, D)
            flat_ids = ids.reshape(T)
            sort_idx = jnp.argsort(flat_ids, stable=True)
            grouped = jnp.take(expanded, sort_idx, axis=0)
            group_sizes = jnp.bincount(flat_ids, length=E)  # [E] replicated

            s = jax.lax.axis_index(axis)
            sizes_loc = jax.lax.dynamic_slice(
                group_sizes, (s * E_loc,), (E_loc,)
            )
            csum = jnp.cumsum(group_sizes)
            start = jnp.where(
                s == 0, 0,
                jax.lax.dynamic_index_in_dim(csum, s * E_loc - 1, keepdims=False),
            )
            # Capacity clamp: truncate trailing rows of overflowing groups.
            cl = jnp.minimum(jnp.cumsum(sizes_loc), C)
            sizes_loc = jnp.diff(cl, prepend=0).astype(jnp.int32)
            n_loc = cl[-1]

            padded = jnp.concatenate(
                [grouped, jnp.zeros((C, D), grouped.dtype)], axis=0
            )
            rows = jax.lax.dynamic_slice(padded, (start, 0), (C, D))
            gate = grouped_matmul(rows, w_gate, sizes_loc, impl=impl)
            up = grouped_matmul(rows, w_up, sizes_loc, impl=impl)
            down = grouped_matmul(
                silu(gate) * up, w_down, sizes_loc, impl=impl
            )  # [C, D]
            live = jnp.arange(C, dtype=jnp.int32)[:, None] < n_loc
            down = jnp.where(live, down, 0).astype(x.dtype)

            # Scatter the shard's disjoint segment into the full [T, D]
            # frame; one psum merges all shards (the combine half of the
            # all-to-all).
            frame = jnp.zeros((T + C, D), down.dtype)
            frame = jax.lax.dynamic_update_slice(frame, down, (start, 0))
            out = jax.lax.psum(frame[:T], axis)

            inv = jnp.argsort(sort_idx)
            out = jnp.take(out, inv, axis=0).reshape(B, L, k, D)
            out = out.astype(jnp.float32) * scores[..., None]
            return jnp.sum(out, axis=-2).astype(x.dtype)

        expert_spec = lambda w: jax.tree.map(lambda _: P(axis), w)
        repl_spec = lambda w: jax.tree.map(lambda _: P(), w)
        return shard_map(
            body,
            mesh=self.scfg.mesh,
            in_specs=(
                P(),
                repl_spec(self.w_router),
                expert_spec(self.w_gate),
                expert_spec(self.w_up),
                expert_spec(self.w_down),
            ),
            out_specs=P(),
            check_vma=False,
        )(x, self.w_router, self.w_gate, self.w_up, self.w_down)
