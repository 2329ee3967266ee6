"""End-to-end benchmark (driver entry point).

Measures the reference's week-2 acceptance shape on TPU: Qwen3-4B W4A16,
128-token prompt prefill + 128 timed decode steps with the dense KV cache
(BASELINE.md: reference decode = 75.41 tok/s on M4 Pro; MLX denominator
89.37). Prints ONE JSON line with decode tok/s as the headline metric.

Usage: python bench.py [--model qwen3-4b] [--prompt-len 128] [--decode 128]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_DECODE_TOK_S = 75.41  # BASELINE.md week-2 final (M4 Pro)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--decode", type=int, default=128)
    p.add_argument("--max-seq", type=int, default=1024)
    p.add_argument("--impl", default=None, choices=[None, "xla", "pallas"])
    args = p.parse_args()

    from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params

    cfg = QWEN3_CONFIGS[args.model]
    params = synthetic_quantized_params(cfg, key=0)
    model = Qwen3Model(params, cfg, max_seq_len=args.max_seq, attn_impl=args.impl)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, args.prompt_len)), dtype=jnp.int32
    )

    # Warmup: compile prefill + decode programs.
    cache = model.create_kv_cache()
    logits = model(prompt, 0, cache, logits_to_keep=1)
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    _ = model(tok[None], args.prompt_len, cache, logits_to_keep=1)
    jax.block_until_ready(_)
    cache.release()

    # Timed prefill.
    cache = model.create_kv_cache()
    t0 = time.perf_counter()
    logits = model(prompt, 0, cache, logits_to_keep=1)
    jax.block_until_ready(logits)
    prefill_s = time.perf_counter() - t0
    prefill_tok_s = args.prompt_len / prefill_s

    # Timed decode: feed argmax back without host sync inside the loop.
    tok = jnp.argmax(logits[:, -1, :].astype(jnp.float32), axis=-1).astype(jnp.int32)
    offset = args.prompt_len
    t0 = time.perf_counter()
    for _ in range(args.decode):
        logits = model(tok[None], offset, cache, logits_to_keep=1)
        tok = jnp.argmax(logits[:, -1, :].astype(jnp.float32), axis=-1).astype(
            jnp.int32
        )
        offset += 1
    jax.block_until_ready(tok)
    decode_s = time.perf_counter() - t0
    decode_tok_s = args.decode / decode_s

    print(
        json.dumps(
            {
                "metric": f"decode_tok_s_{args.model.replace('-', '_')}_w4a16",
                "value": round(decode_tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(decode_tok_s / REFERENCE_DECODE_TOK_S, 3),
                "prefill_tok_s": round(prefill_tok_s, 2),
                "prompt_len": args.prompt_len,
                "decode_steps": args.decode,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
