"""Pool-near-capacity serving stress on device (round-5, VERDICT #5b).

The round-4 admission-backpressure path (serving/batch.py: PoolExhausted
-> defer, retry after retirements) was exercised only by the CPU unit
test. This probe drives the REAL jitted serving path on the TPU with a
pool deliberately sized for ~1.5 concurrent requests, so admission hits
exhaustion repeatedly mid-campaign:

  * every request must still complete (backpressure, not crash),
  * the pool must drain to zero live pages at the end,
  * the number of deferral events is reported.

Usage: python benches/probe_pool_stress.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from tiny_llm_tpu.kv import paged as paged_mod
    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )
    from tiny_llm_tpu.serving import batch_generate
    from tiny_llm_tpu.tokenizer import ByteTokenizer
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    cfg = QWEN3_CONFIGS["qwen3-0.6b"]
    max_seq = 704
    ps = 64
    model = Qwen3Model(
        synthetic_quantized_params(cfg, key=0), cfg, max_seq_len=max_seq
    )
    # ONE request's worth of pages: each ~600-token prompt reserves 10 of
    # the 11 usable pages (1 is the trash page), so the NEXT admission is
    # guaranteed to hit PoolExhausted while the first request is live —
    # deterministic backpressure, not a race with retirements.
    model.enable_paged_attention(num_pages=12, page_size=ps)
    pool = model.page_pool

    # Count deferrals at the RESERVATION boundary: the native index
    # reserves via request_ensure (not allocate_page), so hooking
    # ensure_capacity covers both the C++ and pure-Python pools.
    exhausted = {"n": 0}
    orig_ensure = paged_mod.PagedKVCache.ensure_capacity

    def counting_ensure(self, *a, **kw):
        try:
            return orig_ensure(self, *a, **kw)
        except paged_mod.PoolExhausted:
            exhausted["n"] += 1
            raise

    paged_mod.PagedKVCache.ensure_capacity = counting_ensure

    class NoEosTok(ByteTokenizer):
        eos_token_id = -1

    tok = NoEosTok()
    rng = np.random.default_rng(0)
    prompts = ["x" * int(n) for n in rng.integers(560, 621, size=4)]

    from tiny_llm_tpu.serving import ServingMetrics

    metrics = ServingMetrics(pool_capacity_pages=12, page_size=ps)
    t0 = time.perf_counter()
    results = batch_generate(
        model, tok, prompts, max_seq_len=max_seq, batch_size=4,
        prefill_step=64, max_output_tokens=16, decode_burst=8,
        metrics=metrics,
    )
    wall = time.perf_counter() - t0

    assert len(results) == len(prompts), (len(results), len(prompts))
    # Synthetic-weight argmax tokens decode lossily (ByteTokenizer drops
    # out-of-range ids), so completion is asserted on COUNTED tokens.
    assert metrics.output_tokens == 16 * len(prompts), metrics.output_tokens
    assert pool.live_pages == 0, pool.live_pages
    assert exhausted["n"] > 0, "pool never hit capacity; shrink it"
    doc = {
        "metric": "pool_stress_serving",
        "requests": len(prompts),
        "completed": len(results),
        "pool_pages": pool.num_pages,
        "page_size": ps,
        "exhaustion_deferrals": exhausted["n"],
        "live_pages_at_end": pool.live_pages,
        "wall_s": round(wall, 2),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
