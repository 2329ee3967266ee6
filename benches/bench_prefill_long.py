"""Static long-prompt prefill diagnostic.

Parity: the reference's 8K static prefill diagnostic
(book/src/appendix-performance.md:517-522 — paged flash 427.01 vs MLX
568.74 tok/s on the M4 Pro). Measures one full-prompt prefill through the
production cached-step path (dense slab and paged pool variants), fetch-
synced, fresh cache per repeat.

Usage: PYTHONPATH=/root/repo python benches/bench_prefill_long.py
           [--prompt-len 8192] [--repeats 3] [--model qwen3-4b]
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

REFERENCE_8K = 427.01  # reference paged-flash prefill tok/s (M4 Pro)


def measure(model: Qwen3Model, prompt: jax.Array, repeats: int) -> float:
    L = prompt.shape[1]

    def once() -> float:
        cache = model.create_kv_cache()
        t0 = time.perf_counter()
        logits = model(prompt, 0, cache, logits_to_keep=1)
        # Fetch a data-dependent scalar: the only sync that provably
        # awaits remote completion on this relay (benches/probe_sync.py).
        np.asarray(
            jax.device_get(jnp.argmax(logits[:, -1, :].astype(jnp.float32)))
        )
        dt = time.perf_counter() - t0
        cache.release()
        return dt

    once()  # compile
    return L / min(once() for _ in range(repeats))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3-4b")
    ap.add_argument("--prompt-len", type=int, default=8192)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    cfg = QWEN3_CONFIGS[args.model]
    params = synthetic_quantized_params(cfg, key=0)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, args.prompt_len)), jnp.int32
    )

    dense = Qwen3Model(params, cfg, max_seq_len=args.prompt_len)
    dense_tok_s = measure(dense, prompt, args.repeats)

    paged = Qwen3Model(params, cfg, max_seq_len=args.prompt_len)
    paged.enable_paged_attention(
        num_pages=args.prompt_len // 128 + 2, page_size=128
    )
    paged_tok_s = measure(paged, prompt, args.repeats)

    print(
        json.dumps(
            {
                "metric": f"prefill_{args.prompt_len}_tok_s",
                "dense_flash": round(dense_tok_s, 1),
                "paged_flash": round(paged_tok_s, 1),
                "vs_reference_paged": round(paged_tok_s / REFERENCE_8K, 2)
                if args.prompt_len == 8192
                else None,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
