"""Qwen3-8B INT4 long-context (32K) paged FlashAttention — single chip.

BASELINE.json config #4 ("Qwen3-8B INT4 long-context (32K) paged
FlashAttention, KV sharded across 2 hosts"): the KV-sharding half lives
in the multi-chip dryrun (parallel/sp_attention.py + __graft_entry__
dryrun_multichip); this bench measures the single-chip half — a real
32K-token context built through the production chunked-prefill path
(paged pool, split-attention state combine), then decode bursts over
the paged pool at full context.

Reports chunked-prefill tok/s and 32K-context decode tok/s, one JSON
line. The reference has no direct 8B row; the 4B long-context
attention-ceiling sweep (m4-pro-...-long-context) is its nearest
published anchor, so `vs_baseline` is omitted here.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-8b")
    p.add_argument("--context", type=int, default=32768)
    p.add_argument("--chunk", type=int, default=2048)
    p.add_argument("--decode", type=int, default=64)
    p.add_argument("--burst", type=int, default=16)
    p.add_argument("--page-size", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = QWEN3_CONFIGS[args.model]
    max_seq = args.context + args.decode + args.burst
    model = Qwen3Model(
        synthetic_quantized_params(cfg, key=0), cfg, max_seq_len=max_seq
    )
    pages = max_seq // args.page_size + 2
    model.enable_paged_attention(num_pages=pages, page_size=args.page_size)
    cache = model.create_batching_kv_cache(max_active_requests=1)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=args.context, dtype=np.int64)

    # Chunked prefill through the production path (offset>0 chunks take
    # the split-attention prefix stream).
    t0 = time.perf_counter()
    off = 0
    logits = None
    while off < args.context:
        chunk = prompt[off : off + args.chunk]
        logits = model(
            jnp.asarray(chunk[None], jnp.int32), [off], cache, logits_to_keep=1
        )
        off += len(chunk)
    tok = np.asarray(
        jax.device_get(jnp.argmax(logits[:, -1].astype(jnp.float32), -1)),
        np.int32,
    )
    prefill_s = time.perf_counter() - t0
    prefill_tok_s = args.context / prefill_s

    # Decode bursts at full context (scan-path paged kernel).
    model.decode_burst(cache, tok, args.burst)  # compile
    done = args.burst
    t0 = time.perf_counter()
    while done < args.decode:
        k = min(args.burst, args.decode - done)
        toks = model.decode_burst(cache, tok, k)
        tok = np.asarray(toks[-1], np.int32)
        done += k
    decode_s = time.perf_counter() - t0
    decode_tok_s = (args.decode - args.burst) / decode_s

    kv_bytes = 2 * cfg.num_hidden_layers * cfg.num_key_value_heads * (
        args.context * cfg.head_dim * 2
    )
    print(
        json.dumps(
            {
                "metric": f"decode_tok_s_{args.model.replace('-', '_')}_32k_paged",
                "value": round(decode_tok_s, 2),
                "unit": "tok/s",
                "context": args.context,
                "prefill_tok_s": round(prefill_tok_s, 1),
                "chunk": args.chunk,
                "page_size": args.page_size,
                "kv_gib": round(kv_bytes / 2**30, 2),
                "decode_steps": args.decode - args.burst,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
