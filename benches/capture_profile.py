"""Device trace capture for one workload.

Parity: /root/reference/benches/capture_week2_shader.py (Metal/Xcode GPU
capture) — on TPU the equivalent is a jax.profiler trace viewable in
XProf/Perfetto/TensorBoard. Captures a pinned workload (decode step,
prefill, quantized projection, or decode attention) at Qwen3-4B shapes.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="decode_step",
                   choices=["decode_step", "prefill", "qmatmul", "decode_attn"])
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--out", default="/tmp/tlt-profile")
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()

    from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params

    cfg = QWEN3_CONFIGS[args.model]

    if args.workload in ("decode_step", "prefill"):
        model = Qwen3Model(synthetic_quantized_params(cfg, key=0), cfg,
                           max_seq_len=1024)
        cache = model.create_kv_cache()
        prompt = jnp.zeros((1, 128), jnp.int32)
        model(prompt, 0, cache, logits_to_keep=1)  # warm/compile
        tok = jnp.asarray([[1]], jnp.int32)
        model(tok, 128, cache, logits_to_keep=1)

        os.makedirs(args.out, exist_ok=True)
        with jax.profiler.trace(args.out):
            if args.workload == "prefill":
                cache2 = model.create_kv_cache()
                jax.block_until_ready(
                    model(prompt, 0, cache2, logits_to_keep=1)
                )
            else:
                off = 129
                for i in range(args.steps):
                    out = model(tok, off + i, cache, logits_to_keep=1)
                jax.block_until_ready(out)
    elif args.workload == "qmatmul":
        from tiny_llm_tpu.ops import quantize
        from tiny_llm_tpu.kernels import quantized_matmul

        qt = quantize(jax.random.normal(jax.random.key(0),
                                        (cfg.intermediate_size, cfg.hidden_size)) * 0.02)
        x = jnp.ones((1, cfg.hidden_size), jnp.bfloat16)
        quantized_matmul(x, qt).block_until_ready()
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                out = quantized_matmul(x, qt)
            jax.block_until_ready(out)
    else:
        from tiny_llm_tpu.kernels.flash_attention import flash_decode_attention

        S = 2048
        k = jnp.ones((1, cfg.num_key_value_heads, S, cfg.head_dim), jnp.bfloat16)
        v = jnp.ones_like(k)
        q = jnp.ones((1, cfg.num_attention_heads, 1, cfg.head_dim), jnp.bfloat16)
        lens = jnp.asarray([S], jnp.int32)
        flash_decode_attention(q, k, v, lens).block_until_ready()
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                out = flash_decode_attention(q, k, v, lens)
            jax.block_until_ready(out)

    print(f"trace written to {args.out} — open with XProf/TensorBoard")


if __name__ == "__main__":
    main()
