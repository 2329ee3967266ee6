"""Speculative decoding benchmark with controlled acceptance rates.

The reference ships speculative decoding but no benchmark for it; with
synthetic weights a real draft/target pair has a degenerate acceptance
rate (random-weight models never agree), so this harness pins the
per-position acceptance probability instead: the accept/reject comparison is
replaced by a pinned Bernoulli(alpha) pattern while every forward pass,
cache write, and offset update stays the production code path
(tiny_llm_tpu/speculative.py `forced_reject`). The measured tok/s is
what a real draft with per-position agreement alpha would deliver.

Baseline is plain greedy decode of the target bursted at the same
dispatch granularity (tokens-per-host-roundtrip parity), so the
comparison isolates the algorithm, not the tunnel.

Usage:
  python benches/bench_speculative.py [--target qwen3-4b] [--draft qwen3-0.6b]
      [--k 4] [--rounds 4] [--max-tokens 128] [--alphas 0.6,0.8,0.9,1.0]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from tiny_llm_tpu.models import QWEN3_CONFIGS, synthetic_quantized_params
from tiny_llm_tpu.models.qwen3 import forward_step
from tiny_llm_tpu.speculative import SpecModel, speculative_decode_device

PROMPT_LEN = 64


def build(name: str, key: int, max_seq: int, layers: int | None = None) -> SpecModel:
    """--target-layers truncates the target (e.g. 30B-A3B at full E=128
    per-layer shapes: the full 48-layer W4 stack exceeds one v5e HBM —
    see benches/bench_moe_model.py)."""
    import dataclasses

    cfg = QWEN3_CONFIGS[name]
    if layers is not None:
        cfg = dataclasses.replace(cfg, num_hidden_layers=layers)
    params = synthetic_quantized_params(cfg, key=key)
    return SpecModel.build(params, cfg, max_seq)


def bench_baseline(target: SpecModel, prompt, max_tokens, burst, max_seq):
    """Greedy decode bursted `burst` tokens per dispatch — the same
    host-roundtrip granularity the speculative path pays."""
    window = max_seq

    def burst_fn(model, last, off, keys, values):
        def body(carry, _):
            tok, off, keys, values = carry
            logits, keys, values = forward_step(
                model.params, model.cfg, model.rope_tabs,
                tok[None, None], off[None], keys, values,
                window=window, logits_to_keep=1,
            )
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (nxt, off + 1, keys, values), nxt

        (last, off, keys, values), toks = jax.lax.scan(
            body, (last, off, keys, values), None, length=burst
        )
        return toks, last, off, keys, values

    jfn = jax.jit(burst_fn, donate_argnums=(3, 4))
    prefill = jax.jit(
        lambda m, t, o, k, v: forward_step(
            m.params, m.cfg, m.rope_tabs, t, o, k, v,
            window=window, logits_to_keep=1,
        ),
        donate_argnums=(3, 4),
    )

    def run():
        keys, values = target.empty_slabs(max_seq)
        logits, keys, values = prefill(
            target, jnp.asarray([prompt], jnp.int32),
            jnp.zeros((1,), jnp.int32), keys, values,
        )
        last = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        off = jnp.asarray(len(prompt), jnp.int32)
        emitted = 1
        while emitted < max_tokens:
            toks, last, off, keys, values = jfn(target, last, off, keys, values)
            _ = jax.device_get(toks)  # the per-burst host fetch
            emitted += burst
        return emitted

    run()  # warmup (compile)
    t0 = time.perf_counter()
    n = run()
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="qwen3-4b")
    ap.add_argument("--draft", default="qwen3-0.6b")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--alphas", default="0.6,0.8,0.9,1.0")
    ap.add_argument("--target-layers", type=int, default=None)
    args = ap.parse_args()

    alphas = [float(a) for a in args.alphas.split(",")]
    max_seq = 1024
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(10, 1000, size=PROMPT_LEN)]

    target = build(args.target, key=0, max_seq=max_seq, layers=args.target_layers)
    draft = build(args.draft, key=1, max_seq=max_seq)

    base_tok_s = bench_baseline(
        target, prompt, args.max_tokens, burst=args.rounds * 2, max_seq=max_seq
    )
    print(json.dumps({
        "metric": "baseline_greedy_tok_s",
        "value": round(base_tok_s, 2),
        "target": args.target,
        "burst": args.rounds * 2,
    }))

    for alpha in alphas:
        spec = functools.partial(
            speculative_decode_device,
            draft, target, prompt,
            max_tokens=args.max_tokens,
            proposal_length=args.k,
            rounds_per_dispatch=args.rounds,
            max_seq=max_seq,
            forced_alpha=alpha,
        )
        stats = {}
        spec(stats=stats)  # warmup (compile)
        stats = {}
        t0 = time.perf_counter()
        out = spec(stats=stats)
        dt = time.perf_counter() - t0
        tok_s = len(out) / dt
        print(json.dumps({
            "metric": "speculative_tok_s",
            "alpha": alpha,
            "k": args.k,
            "rounds_per_dispatch": args.rounds,
            "value": round(tok_s, 2),
            "speedup_vs_greedy": round(tok_s / base_tok_s, 3),
            "dispatches": stats["dispatches"],
            "tokens": len(out),
            "draft": args.draft,
            "target": args.target,
        }))


if __name__ == "__main__":
    main()
