"""Operator-family attribution profile at real per-token dispatch counts.

Parity: /root/reference/benches/profile_week2_kernels.py — measure each
operator family at the model's actual shapes, multiply by the real
per-decode-token dispatch counts, and compare the summed attribution
against the measured end-to-end step. The gap column is what the profiler
cannot see (fusion, scheduling, dispatch overhead) — the reference's
"replay in dependency order" discipline adapted to one jitted step.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _time_loop(fn, x, iters=30):
    @jax.jit
    def run(x0):
        def body(i, carry):
            s, xx = carry
            y = fn(xx)
            return (s + y.astype(jnp.float32).sum(), xx * 1.0000001)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))
    run(x)[0].block_until_ready()
    t0 = time.perf_counter()
    run(x)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--context", type=int, default=512)
    args = p.parse_args()

    from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params
    from tiny_llm_tpu.kernels import quantized_matmul
    from tiny_llm_tpu.kernels.flash_attention import flash_decode_attention
    from tiny_llm_tpu.ops import rms_norm, swiglu, quantize

    cfg = QWEN3_CONFIGS[args.model]
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    S = args.context

    key = jax.random.key(0)
    x = jax.random.normal(key, (1, D), jnp.bfloat16)

    families = {}
    # Projections (per layer: q,k,v,o + gate,up,down; plus lm head once).
    qts = {
        "q": quantize(jax.random.normal(key, (Hq * Dh, D)) * 0.02),
        "kv": quantize(jax.random.normal(key, (Hkv * Dh, D)) * 0.02),
        "o": quantize(jax.random.normal(key, (D, Hq * Dh)) * 0.02),
        "mlp_in": quantize(jax.random.normal(key, (I, D)) * 0.02),
        "mlp_out": quantize(jax.random.normal(key, (D, I)) * 0.02),
        "lm": quantize(jax.random.normal(key, (cfg.vocab_size, D)) * 0.02),
    }
    proj = 0.0
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["q"]), x) * L
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["kv"]), x) * 2 * L
    xo = jax.random.normal(key, (1, Hq * Dh), jnp.bfloat16)
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["o"]), xo) * L
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["mlp_in"]), x) * 2 * L
    xi = jax.random.normal(key, (1, I), jnp.bfloat16)
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["mlp_out"]), xi) * L
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["lm"]), x)
    families["projections"] = proj

    # Attention (per layer: one flash decode at context S).
    kbuf = jax.random.normal(key, (1, Hkv, S, Dh), jnp.bfloat16)
    vbuf = jax.random.normal(key, (1, Hkv, S, Dh), jnp.bfloat16)
    lens = jnp.asarray([S], jnp.int32)
    q = jax.random.normal(key, (1, Hq, 1, Dh), jnp.bfloat16)
    families["attention"] = (
        _time_loop(lambda qq: flash_decode_attention(qq, kbuf, vbuf, lens), q) * L
    )

    # Pointwise (per layer: 2 block norms + 2 qk norms + swiglu; final norm).
    wn = jnp.ones((D,), jnp.bfloat16)
    t_norm = _time_loop(lambda xx: rms_norm(xx, wn), x)
    gate = jax.random.normal(key, (1, I), jnp.bfloat16)
    t_swiglu = _time_loop(lambda xx: swiglu(xx, xx + 1), gate)
    families["pointwise"] = (4 * t_norm + t_swiglu) * L + t_norm

    # Whole-step measurement for the gap column.
    params = synthetic_quantized_params(cfg, key=0)
    model = Qwen3Model(params, cfg, max_seq_len=max(1024, S))
    cache = model.create_kv_cache()
    import numpy as np

    prompt = jnp.asarray(np.zeros((1, S), np.int32))
    model(prompt, 0, cache, logits_to_keep=1)
    tok = jnp.asarray([[1]], jnp.int32)
    model(tok, S, cache, logits_to_keep=1)  # compile decode
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        model(tok, S + 1 + i, cache, logits_to_keep=1)
    jax.block_until_ready(model(tok, S + 1 + n, cache, logits_to_keep=1))
    step = (time.perf_counter() - t0) / n

    total_attr = sum(families.values())
    report = {
        "metric": "operator_attribution_per_token",
        "context": S,
        **{k: round(v * 1e3, 3) for k, v in families.items()},
        "attributed_ms": round(total_attr * 1e3, 3),
        "measured_step_ms": round(step * 1e3, 3),
        "unattributed_ms": round((step - total_attr) * 1e3, 3),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
