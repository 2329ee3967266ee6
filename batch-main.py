"""Continuous-batching serving CLI.

Parity: /root/reference/batch-main.py — serve a list of prompts through
the continuous-batching scheduler (paged KV by default).
"""

from __future__ import annotations

import argparse
import time

from tiny_llm_tpu.serving import batch_generate

DEFAULT_PROMPTS = [
    "Why is the sky blue?",
    "Write a haiku about autumn.",
    "Explain KV caching in one paragraph.",
    "What is 17 * 23?",
    "Name three uses of a paged KV cache.",
    "Describe the MXU in one sentence.",
]


def main() -> None:
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-0.6b")
    p.add_argument("--checkpoint-path", default=None)
    p.add_argument("--prompts-file", default=None, help="one prompt per line")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-seq-len", type=int, default=512)
    p.add_argument("--prefill-step", type=int, default=128)
    p.add_argument("--max-output-tokens", type=int, default=None)
    p.add_argument("--dense", action="store_true", help="disable paged KV")
    p.add_argument("--impl", default=None, choices=["xla", "pallas"])
    args = p.parse_args()

    from main import build_model

    model, tok = build_model(
        args.model, args.checkpoint_path, args.max_seq_len,
        paged=not args.dense, impl=args.impl,
    )
    if model.page_pool is None and not args.dense:
        model.enable_paged_attention()

    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [line.rstrip("\n") for line in f if line.strip()]
    else:
        prompts = DEFAULT_PROMPTS

    t0 = time.monotonic()
    results = batch_generate(
        model,
        tok,
        prompts,
        max_seq_len=args.max_seq_len,
        batch_size=args.batch_size,
        prefill_step=args.prefill_step,
        max_output_tokens=args.max_output_tokens,
    )
    dt = time.monotonic() - t0
    for idx, text in sorted(results):
        preview = text.replace("\n", " ")[:100]
        print(f"[{idx}] {preview}")
    n_out = sum(len(tok.encode(t)) for _, t in results)
    print(f"-- {len(results)} requests, {n_out} output tokens, "
          f"{dt:.1f}s, {n_out / dt:.1f} tok/s")


if __name__ == "__main__":
    main()
