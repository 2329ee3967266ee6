"""Serving metrics ledger.

Parity: ServingMetrics in the reference benches (bench.py:33-50) plus the
cache/pool counters it reads (paged_kv_cache.py:37-40, kv_cache.py:127,
249). The TPU design makes most of the reference's copy counters
structurally zero (no concat growth, no batch reconstruction, no pool
realloc); they are still reported so the ledger shows *why* they are zero.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ServingMetrics:
    requests_completed: int = 0
    prefill_tokens: int = 0
    output_tokens: int = 0
    decode_steps: int = 0
    batched_decode_slots: int = 0  # sum over steps of active slots
    peak_active_requests: int = 0
    peak_live_pages: int = 0
    pool_capacity_pages: int = 0
    page_size: int = 0
    tail_waste_slots: int = 0  # allocated-but-unused page slots at peak
    reused_page_allocations: int = 0
    wall_s: float = 0.0
    # Structurally-zero-by-design counters (reference ledger columns):
    growth_copy_bytes: int = 0  # dense concat growth — preallocated slabs
    staging_copy_bytes: int = 0  # batch reconstruction — slot masks instead
    copied_bytes_on_growth: int = 0  # pool realloc — fixed pool

    @property
    def peak_kv_bytes(self) -> int:
        return self.peak_live_pages * self.page_size * self._bytes_per_slot

    _bytes_per_slot: int = 0

    def observe_step(self, active_slots: int, pool=None) -> None:
        self.decode_steps += 1
        self.batched_decode_slots += active_slots
        self.peak_active_requests = max(self.peak_active_requests, active_slots)
        if pool is not None:
            self.peak_live_pages = max(self.peak_live_pages, pool.live_pages)
            self.reused_page_allocations = pool.reused_page_allocations

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("_bytes_per_slot", None)
        if self.decode_steps:
            d["mean_batch_occupancy"] = round(
                self.batched_decode_slots / self.decode_steps, 2
            )
        if self.wall_s:
            d["output_tok_s"] = round(self.output_tokens / self.wall_s, 2)
            d["req_s"] = round(self.requests_completed / self.wall_s, 3)
        return d
