"""Device-trace attribution of one long-context paged decode step.

Host timing says a 64K decode step takes ~8.7 ms — impossible if the
fused attention truly streams 9.7 GB of KV at the v5e's 819 GB/s
(needs >= 11.8 ms for KV alone). The capacity probe pinned the chip at
16 GB (a real v5e), so either the kernel moves fewer bytes than the
model assumes or the device is faster than the datasheet. The device
timeline is ground truth: trace ONE forward_step_paged call at the
target context and report each kernel family's actual duration and
call count.

Usage: python benches/probe_trace_64k.py [--context N] [out.json]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    args = sys.argv[1:]
    ctx = 65536
    out_path = None
    if "--context" in args:
        i = args.index("--context")
        ctx = int(args[i + 1])
        del args[i : i + 2]
    if args:
        out_path = args[0]

    cfg = QWEN3_CONFIGS["qwen3-4b"]
    max_seq = ctx + 64
    model = Qwen3Model(
        synthetic_quantized_params(cfg, key=0), cfg, max_seq_len=max_seq
    )
    model.enable_paged_attention(num_pages=max_seq // 128 + 2, page_size=128)
    cache = model.create_batching_kv_cache(max_active_requests=1)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=ctx, dtype=np.int64)
    off = 0
    while off < ctx:
        chunk = prompt[off : off + 2048]
        model(jnp.asarray(chunk[None], jnp.int32), [off], cache,
              logits_to_keep=1)
        off += len(chunk)
    tok = jnp.asarray([[7]], jnp.int32)
    # Warm the single-step program.
    jax.block_until_ready(model(tok, ctx, cache, logits_to_keep=1))

    trace_dir = "/tmp/tlt-trace-64k"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for i in range(4):
            out = model(tok, ctx + 1 + i, cache, logits_to_keep=1)
        jax.block_until_ready(out)

    # Parse the newest trace.json.gz: bucket device events by name.
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    assert paths, "no trace captured"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    buckets: dict[str, list[float]] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        pid_name = str(ev.get("pid", ""))
        buckets.setdefault(name, []).append(float(ev["dur"]))
    rows = []
    for name, durs in sorted(buckets.items(), key=lambda kv: -sum(kv[1])):
        total_us = sum(durs)
        if total_us < 50:
            continue
        rows.append({"name": name[:90], "calls": len(durs),
                     "total_us": round(total_us, 1),
                     "us_per_call": round(total_us / len(durs), 1)})
    doc = {"probe": "trace_64k", "context": ctx, "steps_traced": 4,
           "kv_gb_per_step": round(
               2 * cfg.num_hidden_layers * cfg.num_key_value_heads
               * ctx * cfg.head_dim * 2 / 1e9, 2),
           "top": rows[:20]}
    for r in rows[:14]:
        print(f"{r['calls']:5d} x {r['us_per_call']:9.1f} us = "
              f"{r['total_us']:10.1f} us  {r['name']}", flush=True)
    print(json.dumps(doc)[:2000])
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
