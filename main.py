"""Single-request generation CLI.

Parity: /root/reference/main.py (model/draft/sampler/paged flags). Loads a
HF checkpoint directory if given, else builds the named architecture with
synthetic quantized weights (zero-egress environments) and a byte
tokenizer — the pipeline is identical either way.
"""

from __future__ import annotations

import argparse

from tiny_llm_tpu.generate import (
    simple_generate,
    simple_generate_with_kv_cache,
    speculative_generate,
)
from tiny_llm_tpu.models import (
    QWEN3_CONFIGS,
    Qwen3Model,
    load_params,
    synthetic_quantized_params,
)
from tiny_llm_tpu.ops import make_sampler
from tiny_llm_tpu.tokenizer import ByteTokenizer, load_tokenizer


def build_model(
    name: str,
    checkpoint: str | None,
    max_seq_len: int,
    paged: bool,
    impl: str | None,
):
    if checkpoint:
        params, cfg = load_params(checkpoint)
        tok = load_tokenizer(checkpoint)
    else:
        cfg = QWEN3_CONFIGS[name]
        params = synthetic_quantized_params(cfg, key=0)
        tok = ByteTokenizer()
        # Synthetic weights don't know the real vocab; byte ids fit anyway.
    model = Qwen3Model(params, cfg, max_seq_len=max_seq_len, attn_impl=impl)
    if paged:
        model.enable_paged_attention()
    return model, tok


def main() -> None:
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-0.6b", help="shortcut name")
    p.add_argument("--checkpoint-path", default=None, help="HF checkpoint dir")
    p.add_argument("--draft-model", default=None)
    p.add_argument("--draft-checkpoint-path", default=None)
    p.add_argument(
        "--no-spec-guard",
        action="store_true",
        help="run speculative decoding even if the measured draft/target "
        "step-time ratio cannot break even",
    )
    p.add_argument("--prompt", default="Give me a short introduction to LLMs.")
    p.add_argument("--max-tokens", type=int, default=256)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--no-cache", action="store_true", help="week-1 style loop")
    p.add_argument("--paged", action="store_true", help="paged KV (week-3 path)")
    p.add_argument("--impl", default=None, choices=["xla", "pallas"])
    p.add_argument("--temp", type=float, default=0.0)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    args = p.parse_args()

    model, tok = build_model(
        args.model, args.checkpoint_path, args.max_seq_len, args.paged, args.impl
    )

    def stream(text: str) -> None:
        print(f"\r{text[-100:]}", end="", flush=True)

    if args.draft_model or args.draft_checkpoint_path:
        draft, draft_tok = build_model(
            args.draft_model or args.model,
            args.draft_checkpoint_path,
            args.max_seq_len,
            args.paged,
            args.impl,
        )
        out = speculative_generate(
            draft, model, draft_tok, tok, args.prompt, max_tokens=args.max_tokens,
            on_token=stream, auto_disable=not args.no_spec_guard,
        )
    elif args.no_cache:
        sampler = make_sampler(args.temp, args.top_p, args.top_k)
        out = simple_generate(
            model, tok, args.prompt, sampler=sampler,
            max_tokens=args.max_tokens, on_token=stream,
        )
    else:
        sampler = make_sampler(args.temp, args.top_p, args.top_k)
        out = simple_generate_with_kv_cache(
            model, tok, args.prompt, sampler=sampler,
            max_tokens=args.max_tokens, on_token=stream,
        )
    print()
    print(out)


if __name__ == "__main__":
    main()
