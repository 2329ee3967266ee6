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


def _timed(fn, x, iters):
    @jax.jit
    def run(x0):
        def body(i, carry):
            s, xx = carry
            y = fn(xx)
            # Serialize: next input data-depends on this output (XLA may
            # not reorder or elide any call), with a numerically-inert bump.
            bump = (y.astype(jnp.float32).sum() * 1e-12).astype(xx.dtype)
            return (s + jnp.float32(1), xx + bump)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))

    import numpy as np

    float(np.asarray(jax.device_get(run(x)[1].reshape(-1)[0])))  # compile+sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(run(x)[1].reshape(-1)[0])))
        best = min(best, time.perf_counter() - t0)
    return best


def _time_loop(fn, x, iters=50):
    """Per-call seconds by SLOPE over two iteration counts — cancels the
    relay's ~25 ms dispatch+fetch floor that a single-dispatch timing
    would smear over every op (the failure mode this profiler had before;
    cf. PERFORMANCE.md 'Environment characterization'). The 400-iteration
    span keeps the slope signal well above relay jitter for ops down to
    a few microseconds."""
    lo, hi = iters, iters + 400
    return (_timed(fn, x, hi) - _timed(fn, x, lo)) / (hi - lo)


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
    # Fused dispatch counts (models/qwen3.py fuse_projections): per layer
    # one [q;k;v], one o, one [gate;up], one down; plus the LM head once.
    qts = {
        "qkv": quantize(jax.random.normal(key, ((Hq + 2 * Hkv) * Dh, D)) * 0.02),
        "o": quantize(jax.random.normal(key, (D, Hq * Dh)) * 0.02),
        "gate_up": quantize(jax.random.normal(key, (2 * I, D)) * 0.02),
        "mlp_out": quantize(jax.random.normal(key, (D, I)) * 0.02),
        "lm": quantize(jax.random.normal(key, (cfg.vocab_size, D)) * 0.02),
    }
    proj = 0.0
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["qkv"]), x) * L
    xo = jax.random.normal(key, (1, Hq * Dh), jnp.bfloat16)
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["o"]), xo) * L
    proj += _time_loop(lambda xx: quantized_matmul(xx, qts["gate_up"]), x) * L
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

    cache.release()
    prompt = jnp.asarray(np.zeros((1, S), np.int32))
    tok0 = np.asarray([1], np.int32)
    # Device-side step: slope over two burst lengths, fresh cache per
    # timing, prefill fetch-synced before the timer (the burst scan is
    # the production decode; the slope cancels the relay round trip).
    n_lo, n_hi = 16, 128

    def burst(n):
        c = model.create_kv_cache()
        logits = model(prompt, 0, c, logits_to_keep=1)
        np.asarray(jax.device_get(logits[:, -1, :1]))  # sync prefill
        t0 = time.perf_counter()
        model.decode_burst_dense(c, tok0, n)  # fetches tokens (synced)
        dt = time.perf_counter() - t0
        c.release()
        return dt

    burst(n_lo), burst(n_hi)  # compile both shapes
    t_lo = min(burst(n_lo) for _ in range(3))
    t_hi = min(burst(n_hi) for _ in range(3))
    step = (t_hi - t_lo) / (n_hi - n_lo)

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
