"""Chunked prefill A/B: causal page-walk vs split-attention combine.

The serving scheduler prefills long prompts in fixed-size chunks
(reference batch.py:42-66). Every chunk after the first attends to a
prefix that already lives in KV pages; this bench measures the full
chunked prefill of one long prompt, comparing

  - paged:  each chunk runs the causal paged-prefill kernel over ALL its
    pages (prefix + the chunk's own) — the reference's structure.
  - split:  chunk-local causal flash at dense tiles ⊕ non-causal prefix
    page stream, merged by exact softmax-state combine
    (kernels/split_prefill.py).

Usage: PYTHONPATH=/root/repo python benches/bench_chunked_prefill.py
           [--prompt-len 8192] [--chunks 512,1024,2048] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params


def chunked_prefill(model: Qwen3Model, prompt: np.ndarray, chunk: int) -> float:
    """One full chunked prefill; returns seconds (fetch-synced)."""
    L = prompt.shape[1]
    cache = model.create_kv_cache()
    t0 = time.perf_counter()
    logits = None
    for start in range(0, L, chunk):
        piece = prompt[:, start : start + chunk]
        logits = model(piece, offset=start, cache=cache, logits_to_keep=1)
    np.asarray(
        jax.device_get(jnp.argmax(logits[:, -1, :].astype(jnp.float32)))
    )
    dt = time.perf_counter() - t0
    cache.release()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3-4b")
    ap.add_argument("--prompt-len", type=int, default=8192)
    ap.add_argument("--chunks", default="128,512,1024,2048")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    cfg = QWEN3_CONFIGS[args.model]
    params = synthetic_quantized_params(cfg, key=0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(
        0, cfg.vocab_size, size=(1, args.prompt_len)
    ).astype(np.int32)

    model = Qwen3Model(params, cfg, max_seq_len=args.prompt_len)
    model.enable_paged_attention(
        num_pages=args.prompt_len // 128 + 2, page_size=128
    )

    rows = []
    for chunk in [int(c) for c in args.chunks.split(",")]:
        row = {"chunk": chunk}
        for split in (False, True):
            model.split_prefill = split
            chunked_prefill(model, prompt, chunk)  # compile
            dt = min(chunked_prefill(model, prompt, chunk)
                     for _ in range(args.repeats))
            row["split" if split else "paged"] = round(args.prompt_len / dt, 1)
        row["speedup"] = round(row["split"] / row["paged"], 2)
        rows.append(row)
        print(json.dumps({"metric": "chunked_prefill_tok_s",
                          "prompt_len": args.prompt_len, **row,
                          "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
