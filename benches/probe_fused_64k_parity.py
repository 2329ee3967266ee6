"""Fused one-kernel vs 3-launch paged decode at 64K (round-5 coverage).

probe_64k_coverage proved the pages-walk KERNEL exact at 513 pages on
device, but the model's default decode path is the FUSED one-kernel
(fused_paged_decode_attention), and the measured 64K step time implies
bandwidth the chip does not have. This probe settles whether the fused
path reads the whole context: two models with identical weights prefill
the same 64K prompt; one decodes with the fused kernel, the other with
TLT_PAGED_FUSED_ONE=0 (3-launch: prep + DUS + validated pages walk).
Greedy token sequences must be identical; per-step times are reported
for both.

Usage: python benches/probe_fused_64k_parity.py [out.json] [--context N]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def run_path(fused_one: bool, ctx: int, steps: int):
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )

    os.environ["TLT_PAGED_FUSED_ONE"] = "1" if fused_one else "0"
    cfg = QWEN3_CONFIGS["qwen3-4b"]
    max_seq = ctx + steps + 32
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
        logits = model(
            jnp.asarray(chunk[None], jnp.int32), [off], cache, logits_to_keep=1
        )
        off += len(chunk)
    tok = np.asarray(
        jax.device_get(jnp.argmax(logits[:, -1].astype(jnp.float32), -1)),
        np.int32,
    )
    toks = [int(tok[0])]
    # First burst compiles AND is part of the recorded sequence (the
    # cache advances with it); the second burst of the SAME length is
    # timed compile-free and continues from the first's last token.
    out1 = model.decode_burst(cache, tok, steps)
    seq1 = [int(t) for t in np.asarray(out1).reshape(-1)]
    t0 = time.perf_counter()
    out2 = model.decode_burst(cache, np.asarray([seq1[-1]], np.int32), steps)
    dt = time.perf_counter() - t0
    seq2 = [int(t) for t in np.asarray(out2).reshape(-1)]
    return toks + seq1 + seq2, dt / steps * 1e3


def main() -> None:
    out_path = None
    ctx = 64 * 1024
    args = sys.argv[1:]
    if args and not args[0].startswith("--"):
        out_path = args.pop(0)
    if args[:1] == ["--context"]:
        ctx = int(args[1])
    steps = 32
    seq_fused, ms_fused = run_path(True, ctx, steps)
    seq_three, ms_three = run_path(False, ctx, steps)
    agree = seq_fused == seq_three
    n_common = sum(1 for a, b in zip(seq_fused, seq_three) if a == b)
    doc = {
        "probe": "fused_64k_parity",
        "context": ctx,
        "steps": steps,
        "tokens_equal": agree,
        "matching_prefix": n_common,
        "fused_ms_per_step": round(ms_fused, 2),
        "three_launch_ms_per_step": round(ms_three, 2),
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
