"""Operator microbenchmarks at Qwen3-4B shapes: XLA vs Pallas.

Parity: /root/reference/benches/bench_week2_operators.py — per-operator
readable-vs-optimized comparison with execution-order rotation to defeat
clock/caching drift, reporting medians. Adapted to TPU: every variant
loops inside one jit (the axon tunnel costs ~1 ms per dispatch, which
would otherwise swamp sub-millisecond kernels).

Run: PYTHONPATH=/root/repo python benches/bench_operators.py [--iters 50]
"""

from __future__ import annotations

import argparse
import itertools
import json
import statistics
import time

import jax
import jax.numpy as jnp

HIDDEN, INTER, VOCAB = 2560, 9728, 151936
HQ, HKV, D = 32, 8, 128


CHAIN = 16  # applications per loop body: amortizes the runtime's ~1.25 ms
# per-iteration floor (serial dependency through the input keeps Mosaic/XLA
# from CSE-ing the chain away).


def _loop(fn, x, iters):
    @jax.jit
    def run(x0):
        def body(i, carry):
            s, xx = carry
            for _ in range(CHAIN):
                y = fn(xx)
                # Fold a data-dependent perturbation back into the input.
                s = s + y.astype(jnp.float32).sum()
                xx = xx + (s * 1e-20).astype(xx.dtype)
            return (s, xx)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))
    return run


def _time(fn, x, iters):
    run = _loop(fn, x, iters)
    run(x)[0].block_until_ready()
    t0 = time.perf_counter()
    run(x)[0].block_until_ready()
    return (time.perf_counter() - t0) / (iters * CHAIN)


def build_cases(iters):
    from tiny_llm_tpu.ops import quantize, swiglu, rms_norm
    from tiny_llm_tpu.kernels import quantized_matmul
    from tiny_llm_tpu.kernels.flash_attention import flash_decode_attention

    cases = {}
    key = jax.random.key(0)

    # Decode / prefill quantized projections.
    for name, rows, n, k in [
        ("qkv_matvec", 1, HQ * D, HIDDEN),
        ("down_matvec", 1, HIDDEN, INTER),
        ("qkv_matmul_128", 128, HQ * D, HIDDEN),
        ("lm_head_matvec", 1, VOCAB, HIDDEN),
    ]:
        w = jax.random.normal(jax.random.fold_in(key, hash(name) % 2**31),
                              (n, k), jnp.float32) * 0.02
        qt = quantize(w)
        x = jax.random.normal(key, (rows, k), jnp.bfloat16)
        cases[name] = {
            "xla": (lambda xx, qt=qt: quantized_matmul(xx, qt, impl="xla"), x),
            "pallas": (lambda xx, qt=qt: quantized_matmul(xx, qt, impl="pallas"), x),
            "bytes": qt.packed.size * 4,
        }

    # Decode attention, context 2048.
    S = 2048
    kbuf = jax.random.normal(key, (1, HKV, S, D), jnp.bfloat16)
    vbuf = jax.random.normal(key, (1, HKV, S, D), jnp.bfloat16)
    lens = jnp.asarray([S], jnp.int32)
    q = jax.random.normal(key, (1, HQ, 1, D), jnp.bfloat16)
    cases["decode_attn_2k"] = {
        "xla": (lambda qq: flash_decode_attention(qq, kbuf, vbuf, lens, impl="xla"), q),
        "pallas": (lambda qq: flash_decode_attention(qq, kbuf, vbuf, lens, impl="pallas"), q),
        "bytes": 2 * HKV * S * D * 2,
    }

    # Pointwise chain at decode shape (XLA fusion is the 'optimized' story).
    wnorm = jnp.ones((HIDDEN,), jnp.bfloat16)
    xb = jax.random.normal(key, (1, HIDDEN), jnp.bfloat16)
    cases["rmsnorm"] = {
        "xla": (lambda xx: rms_norm(xx, wnorm), xb),
        "bytes": HIDDEN * 2 * 2,
    }
    gate = jax.random.normal(key, (1, INTER), jnp.bfloat16)
    cases["swiglu"] = {
        "xla": (lambda xx: swiglu(xx, xx + 1), gate),
        "bytes": INTER * 2 * 3,
    }
    return cases


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    cases = build_cases(args.iters)
    # Order rotation: permute case order across repeats (reference
    # benchmark_comparison's permutation discipline).
    names = list(cases)
    samples: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.repeats):
        order = names[rep % len(names):] + names[:rep % len(names)]
        for name in order:
            for variant in ("xla", "pallas"):
                if variant not in cases[name]:
                    continue
                fn, x = cases[name][variant]
                dt = _time(fn, x, args.iters)
                samples.setdefault((name, variant), []).append(dt)

    rows = []
    for name in names:
        row = {"op": name}
        for variant in ("xla", "pallas"):
            if (name, variant) in samples:
                med = statistics.median(samples[(name, variant)])
                row[variant + "_us"] = round(med * 1e6, 1)
                row[variant + "_gb_s"] = round(cases[name]["bytes"] / med / 1e9, 1)
        if "xla_us" in row and "pallas_us" in row:
            row["speedup"] = round(row["xla_us"] / row["pallas_us"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "operator_microbench", "rows": rows}))


if __name__ == "__main__":
    main()
