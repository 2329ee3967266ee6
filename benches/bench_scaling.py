"""Scaling-efficiency harness: serving throughput across mesh sizes.

North-star requirement (BASELINE.json): >= 85% scaling efficiency to 2+
hosts, reported as tok/s/chip at 1 chip / 1 host / N hosts. This harness
is the measurement path: it runs the SAME continuous-batching serving
workload as `bench.py --mode serving` on a sequence of device meshes and
emits one JSON with per-config output tok/s, tok/s/chip, and efficiency
vs the single-chip baseline.

Layouts per mesh size N:
  single — plain unsharded model on 1 device (the efficiency denominator)
  dp     — data-parallel paged serving (parallel/dp.py): weights
           replicated, page pool dp-striped, decode collective-free.
           WEAK scaling: requests and batch_size scale with N, so
           per-chip work is constant and efficiency = tok/s/(N * base).
  tp     — tensor-parallel: weights + KV heads sharded over tp (GSPMD).
           STRONG scaling: fixed workload, efficiency = tok/s/(N * base).

Backend field: "cpu-mesh" (xla_force_host_platform_device_count virtual
devices — a PLUMBING validation, `is_perf_number: false`; CPU-mesh
timings are compile/host-bound and say nothing about ICI) or "tpu"
(real chips — the number the north star asks for). The script is
identical in both modes; on hardware, run e.g.

    python benches/bench_scaling.py --devices 1,4 --model qwen3-4b \
        --requests 16 --batch-size 4 --max-seq 1280

CPU-mesh plumbing run (checked-in benchmark_results/cpu-mesh-scaling-*.json):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benches/bench_scaling.py --devices 1,2,4,8

There is no reference counterpart (the reference is single-device); the
harness exists so day-one multi-chip access produces the efficiency
table with zero new code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _force_cpu_if_virtual() -> None:
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def tiny_cfg():
    from tiny_llm_tpu.models import Qwen3Config

    return Qwen3Config(
        num_hidden_layers=2,
        hidden_size=256,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=64,
        intermediate_size=512,
        vocab_size=512,
        rope_theta=10000.0,
        max_position_embeddings=4096,
    )


def build_serving_model(layout: str, n: int, cfg, args, inner: str):
    """Model + paged pool for one (layout, mesh-size) config."""
    import jax
    from jax.sharding import NamedSharding

    from tiny_llm_tpu.models import Qwen3Model
    from tiny_llm_tpu.parallel import (
        DPPagedAttention,
        DPServing,
        ShardingConfig,
        make_mesh,
        shard_params,
    )
    from tiny_llm_tpu.parallel.tp_kernels import paged_pool_spec

    params = _params(cfg, args)
    ps = args.page_size
    pages_per_req = args.max_seq // ps
    batch = args.batch_size * (n if layout == "dp" else 1)

    if layout == "single":
        assert n == 1
        model = Qwen3Model(params, cfg, max_seq_len=args.max_seq, attn_impl=inner)
        model.enable_paged_attention(
            num_pages=(batch + 2) * pages_per_req + 9, page_size=ps
        )
        return model, batch

    devices = jax.devices()[:n]
    if layout == "dp":
        mesh = make_mesh(dp=n, tp=1, devices=devices)
        scfg = ShardingConfig(mesh)
        model = Qwen3Model(
            shard_params(params, scfg), cfg, max_seq_len=args.max_seq,
            attn_impl=DPPagedAttention(scfg, inner=inner),
        )
        per_stripe = (batch // n + 2) * pages_per_req + 5
        model.enable_paged_attention(num_pages=n * per_stripe, page_size=ps)
        return DPServing(model, scfg), batch
    if layout == "tp":
        mesh = make_mesh(dp=1, tp=n, devices=devices)
        scfg = ShardingConfig(mesh)
        model = Qwen3Model(
            shard_params(params, scfg), cfg, max_seq_len=args.max_seq,
            attn_impl=inner,
        )
        model.enable_paged_attention(
            num_pages=(batch + 2) * pages_per_req + 9, page_size=ps
        )
        pool = model.page_pool
        sharding = NamedSharding(mesh, paged_pool_spec(scfg))
        pool.update_tensors(
            jax.device_put(pool.key_pages, sharding),
            jax.device_put(pool.value_pages, sharding),
        )
        return model, batch
    raise ValueError(f"unknown layout {layout!r}")


_PARAM_CACHE = {}


def _params(cfg, args):
    key = id(cfg)
    if key not in _PARAM_CACHE:
        if args.model == "tiny":
            from tiny_llm_tpu.models import random_params

            _PARAM_CACHE[key] = random_params(cfg, key=0, quantized=True)
        else:
            from tiny_llm_tpu.models import synthetic_quantized_params

            _PARAM_CACHE[key] = synthetic_quantized_params(cfg, key=0)
    return _PARAM_CACHE[key]


def run_campaign(model, batch: int, n: int, layout: str, args):
    """One serving campaign; returns the metrics row."""
    import numpy as np

    from tiny_llm_tpu.serving import ServingMetrics, batch_generate
    from tiny_llm_tpu.tokenizer import ByteTokenizer

    class NoEosTok(ByteTokenizer):
        eos_token_id = -1  # synthetic weights: run to the output cap

    tok = NoEosTok()
    rng = np.random.default_rng(0)
    # Weak scaling on dp: the request list scales with the replica count
    # so per-chip work is constant; tp/single keep the base workload.
    n_requests = args.requests * (n if layout == "dp" else 1)
    lens = rng.integers(args.min_prompt, args.max_prompt + 1, size=n_requests)
    prompts = ["x" * int(c) for c in lens]

    # Warmup compiles the prefill ladder + the batched decode shape.
    batch_generate(
        model, tok, ["x" * min(255, args.max_prompt), "x" * args.max_prompt],
        max_seq_len=args.max_seq, batch_size=batch,
        prefill_step=args.prefill_step, max_output_tokens=args.decode_burst,
        decode_burst=args.decode_burst,
    )

    metrics = ServingMetrics()
    t0 = time.perf_counter()
    results = batch_generate(
        model, tok, prompts, max_seq_len=args.max_seq, batch_size=batch,
        prefill_step=args.prefill_step, max_output_tokens=args.max_output,
        decode_burst=args.decode_burst, metrics=metrics,
    )
    metrics.wall_s = time.perf_counter() - t0
    assert len(results) == n_requests
    d = metrics.as_dict()
    return {
        "layout": layout,
        "n_devices": n,
        "requests": n_requests,
        "batch_size": batch,
        "wall_s": round(metrics.wall_s, 3),
        "output_tok_s": d.get("output_tok_s", 0.0),
        "tok_s_per_chip": round(d.get("output_tok_s", 0.0) / n, 2),
        "ttft_p50_ms": d.get("ttft_p50_ms"),
        "request_latency_p50_ms": d.get("request_latency_p50_ms"),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8",
                   help="comma-separated mesh sizes to sweep")
    p.add_argument("--layouts", default="single,dp,tp")
    p.add_argument("--model", default=None,
                   help="registry name, or 'tiny' (default: tiny on cpu, "
                        "qwen3-4b on tpu)")
    p.add_argument("--requests", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-seq", type=int, default=None)
    p.add_argument("--page-size", type=int, default=None)
    p.add_argument("--prefill-step", type=int, default=None)
    p.add_argument("--decode-burst", type=int, default=8)
    p.add_argument("--max-output", type=int, default=None)
    p.add_argument("--min-prompt", type=int, default=None)
    p.add_argument("--max-prompt", type=int, default=None)
    p.add_argument("--out", default=None, help="write JSON here too")
    args = p.parse_args(argv)

    _force_cpu_if_virtual()
    import jax

    backend = "cpu-mesh" if jax.default_backend() == "cpu" else "tpu"
    if args.model is None:
        args.model = "tiny" if backend == "cpu-mesh" else "qwen3-4b"
    # Workload defaults: tiny shapes for the CPU plumbing run, the
    # bench.py serving-campaign shape for hardware.
    tiny = args.model == "tiny"
    args.requests = args.requests or (4 if tiny else 16)
    args.batch_size = args.batch_size or (2 if tiny else 4)
    args.max_seq = args.max_seq or (96 if tiny else 1280)
    args.page_size = args.page_size or (8 if tiny else 128)
    args.prefill_step = args.prefill_step or (32 if tiny else 128)
    args.max_output = args.max_output or (16 if tiny else 80)
    args.min_prompt = args.min_prompt or (16 if tiny else 128)
    args.max_prompt = args.max_prompt or (64 if tiny else 1024)

    if tiny:
        cfg = tiny_cfg()
        inner = "xla"
    else:
        from tiny_llm_tpu.models import QWEN3_CONFIGS

        cfg = QWEN3_CONFIGS[args.model]
        inner = "pallas"

    sizes = [int(s) for s in args.devices.split(",")]
    avail = len(jax.devices())
    layouts = args.layouts.split(",")

    rows = []
    base_per_chip: float | None = None
    for n in sizes:
        if n > avail:
            print(f"# skip n={n}: only {avail} devices", file=sys.stderr)
            continue
        for layout in layouts:
            if layout == "single" and n != 1:
                continue
            if layout != "single" and n == 1:
                continue  # n=1 sharded layouts are the same program; skip
            model, batch = build_serving_model(layout, n, cfg, args, inner)
            row = run_campaign(model, batch, n, layout, args)
            if layout == "single":
                base_per_chip = row["tok_s_per_chip"]
            if base_per_chip:
                row["efficiency_vs_single_chip"] = round(
                    row["tok_s_per_chip"] / base_per_chip, 3
                )
            rows.append(row)
            print(f"# {row}", file=sys.stderr)

    result = {
        "bench": "scaling_efficiency",
        "backend": backend,
        # CPU-mesh virtual devices share host cores and have no ICI:
        # these rows validate that the sharded serving path RUNS at every
        # mesh size, nothing more. Only backend == "tpu" rows are
        # performance numbers.
        "is_perf_number": backend == "tpu",
        "model": args.model,
        "date": time.strftime("%Y-%m-%d"),
        "workload": {
            "requests_base": args.requests,
            "batch_size_base": args.batch_size,
            "prompt_tokens": [args.min_prompt, args.max_prompt],
            "max_output_tokens": args.max_output,
            "max_seq": args.max_seq,
            "page_size": args.page_size,
            "prefill_step": args.prefill_step,
            "decode_burst": args.decode_burst,
            "scaling": {"dp": "weak (requests x N)", "tp": "strong (fixed)"},
        },
        "efficiency_definition": (
            "output_tok_s / (n_devices * single_chip_output_tok_s); "
            "north star: >= 0.85 at 2+ hosts"
        ),
        "rows": rows,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    main()
