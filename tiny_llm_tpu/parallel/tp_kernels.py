"""shard_map'd Pallas attention under tensor parallelism.

The GSPMD TP path (sharding.py) runs the XLA attention twins because
GSPMD cannot partition a `pallas_call` automatically. This module closes
that gap: attention is embarrassingly parallel over the head axis under
the TP rules (whole H_q / H_kv head groups per shard, KV pages never
cross shards), so a `jax.shard_map` over the mesh runs the single-chip
Pallas kernels shard-locally with zero collectives — the kernel sees
per-shard shapes and never knows it is sharded.

Usage: pass a `TPAttention` instance as the model's `attn_impl`; the
kernel dispatchers (kernels/flash_attention.py, kernels/paged_attention.py)
route callables straight through. Works inside a GSPMD-jitted step —
shard_map composes with jit over the same mesh, forcing the annotated
sharding on its operands.

Reference parity note: the reference has no distributed execution
(SURVEY.md §2.8); this is new TPU-native capability layered over the
reference's single-chip attention semantics.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
from jax.sharding import PartitionSpec as P

from ..kernels.flash_attention import flash_attention
from ..kernels.paged_attention import paged_attention
from .sharding import ShardingConfig


@dataclasses.dataclass(frozen=True)
class TPAttention:
    """Attention callables that shard_map the Pallas kernels over `tp`.

    inner: implementation used per shard ("pallas" on TPU; "xla" lets the
      same plumbing run anywhere). interpret: forwarded to Pallas for
      CPU-mesh testing.
    """

    scfg: ShardingConfig
    inner: str = "pallas"
    interpret: bool = False

    def _heads_spec(self) -> P:
        return P(self.scfg.dp_axis, self.scfg.tp_axis, None, None)

    def flash(self, q, k, v, scale=None, mask=None, lens=None):
        """Dense-KV attention: q [B,Hq,L,D], k/v [B,Hkv,S,D] sharded on
        heads; lens [B] replicated. Handles prefill and decode."""
        hs = self._heads_spec()
        assert not isinstance(mask, jax.Array), (
            "TPAttention.flash supports mask=None/'causal' (per-shard "
            "array masks would need their own spec)"
        )
        lens_specs = () if lens is None else (P(self.scfg.dp_axis),)

        @functools.partial(
            jax.shard_map,
            mesh=self.scfg.mesh,
            in_specs=(hs, hs, hs) + lens_specs,
            out_specs=hs,
            check_vma=False,
        )
        def run(q, k, v, *maybe_lens):
            lens_local = maybe_lens[0] if maybe_lens else None
            return self._flash_local(q, k, v, scale, mask, lens_local)

        args = (q, k, v) if lens is None else (q, k, v, lens)
        return run(*args)

    def _flash_local(self, q, k, v, scale, mask, lens):
        if self.inner == "pallas":
            from ..kernels.flash_attention_pallas import flash_attention_pallas

            return flash_attention_pallas(
                q, k, v, scale=scale, mask=mask, lens=lens,
                interpret=self.interpret,
            )
        return flash_attention(q, k, v, scale=scale, mask=mask, lens=lens,
                               impl=self.inner)

    def paged(self, q, key_pages, value_pages, block_table, context_lens,
              scale=None, mask="causal"):
        """Paged attention: pages [Pg,Hkv,ps,D] sharded on the head axis,
        block table and lens replicated (page ids are shard-invariant)."""
        hs = self._heads_spec()
        pages_spec = P(None, self.scfg.tp_axis, None, None)
        bspec = P(self.scfg.dp_axis)  # batch-leading: table + lens

        @functools.partial(
            jax.shard_map,
            mesh=self.scfg.mesh,
            in_specs=(hs, pages_spec, pages_spec, bspec, bspec),
            out_specs=hs,
            check_vma=False,
        )
        def run(q, kp, vp, bt, lens):
            if self.inner == "pallas":
                from ..kernels.paged_attention_pallas import paged_attention_pallas

                return paged_attention_pallas(
                    q, kp, vp, bt, lens, scale=scale, mask=mask,
                    interpret=self.interpret,
                )
            return paged_attention(q, kp, vp, bt, lens, scale=scale,
                                   mask=mask, impl=self.inner)

        return run(q, key_pages, value_pages, block_table, context_lens)


def paged_pool_spec(scfg: ShardingConfig) -> P:
    """Per-layer [Pg, H_kv, page_size, D] pool buffer: KV heads on tp
    (the pool is a tuple of per-layer buffers, kv/paged.py)."""
    return P(None, scfg.tp_axis, None, None)
