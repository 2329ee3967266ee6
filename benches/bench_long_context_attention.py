"""Long-context decode-attention ceiling sweep.

Parity: /root/reference/benches/bench_long_context_attention.py — measure
decode attention alone at the Qwen3-4B shape (32 q heads / 8 kv heads,
D=128, one query token) across context lengths, and report the
attention-only decode ceiling tok/s = 1000 / (layers * ms_per_layer).
Baseline (M4 Pro, BASELINE.md): 2K -> 195.3, 8K -> 96.7, 32K -> 30.3.

Amortizes the dispatch latency of the TPU tunnel by looping inside jit.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

BASELINE_CEILING = {2048: 195.3, 8192: 96.7, 32768: 30.3, 65536: 16.1,
                    131072: 7.6, 300000: 2.93}


def measure(impl: str, S: int, iters: int = 10, chain: int = 36) -> float:
    """Chained-dependency methodology: the runtime has a ~1.25 ms floor
    per loop ITERATION, so each body applies the kernel `chain` times in
    a serial dependency chain (like the model's layer loop) and the
    reported figure is per-application."""
    from tiny_llm_tpu.kernels.flash_attention import flash_decode_attention

    B, Hq, Hkv, D = 1, 32, 8, 128
    k = jnp.zeros((B, Hkv, S, D), jnp.bfloat16)
    v = jnp.zeros((B, Hkv, S, D), jnp.bfloat16)
    q = jnp.ones((B, Hq, 1, D), jnp.bfloat16)
    lens = jnp.asarray([S], jnp.int32)

    @jax.jit
    def loop(q0):
        def body(i, carry):
            s, qq = carry
            for _ in range(chain):
                o = flash_decode_attention(qq, k, v, lens, impl=impl)
                qq = (qq + o).astype(jnp.bfloat16)  # serial dependency
            return (s + o.astype(jnp.float32).sum(), qq)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), q0))

    loop(q)[0].block_until_ready()
    t0 = time.perf_counter()
    loop(q)[0].block_until_ready()
    return (time.perf_counter() - t0) / (iters * chain) * 1e3  # ms per call


def main() -> None:
    p = argparse.ArgumentParser()
    # 300,000 is the reference's measured ceiling row
    # (ref: benchmark_results/m4-pro-qwen3-4b-long-context-mlx-0.32.0.json
    # results[5]: 9.49 ms/layer = 2.93 tok/s).
    p.add_argument("--contexts", type=int, nargs="*",
                   default=[2048, 8192, 32768, 65536, 131072, 300000])
    p.add_argument("--impl", default=None, choices=["xla", "pallas"])
    p.add_argument("--layers", type=int, default=36)
    args = p.parse_args()

    rows = []
    for S in args.contexts:
        ms = measure(args.impl or "pallas", S)
        ceiling = 1000.0 / (args.layers * ms)
        base = BASELINE_CEILING.get(S)
        rows.append({
            "context": S,
            "ms_per_layer": round(ms, 3),
            "ceiling_tok_s": round(ceiling, 1),
            "kv_gib": round(2 * 8 * S * 128 * 2 / 2**30, 2),
            "vs_baseline": round(ceiling / base, 2) if base else None,
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "long_context_attention_sweep", "rows": rows}))


if __name__ == "__main__":
    main()
