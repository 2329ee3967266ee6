"""Bench-harness self-tests (parity: the reference's benches/test_*.py
keep its benchmark harnesses importable and correct, SURVEY.md §2.7).

Every bench module must import cleanly (no TPU required at import time),
and the pure helpers — expert stacking, case construction, chained-loop
builders — must produce correct shapes/values on CPU.
"""

import importlib.util
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

BENCH_MODULES = [
    "bench_operators",
    "bench_long_context_attention",
    "bench_moe_gqmm",
    "bench_progression",
    "bench_speculative",
    "profile_operators",
    "probe_qmm_stages",
    "capture_profile",
    "bench_scaling",
    "probe_scan_gather_fault",
    "probe_model_burst",
    "bench_moe_model",
    "bench_8b_32k",
    "probe_fatn",
    "probe_fused_attn",
    # round 5
    "probe_pool_stress",
    "probe_64k_coverage",
    "probe_64k_logits",
    "probe_fused_64k_parity",
    "probe_hbm_bandwidth",
    "probe_weight_stream",
    "probe_trace_64k",
    # round 5, session 2
    "probe_pair_qmm",
    "probe_mxu_rate",
]


def load(name: str):
    spec = importlib.util.spec_from_file_location(name, REPO / "benches" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", BENCH_MODULES)
def test_bench_module_imports(name):
    mod = load(name)
    assert hasattr(mod, "main")


def test_moe_bench_expert_stack_roundtrips():
    mod = load("bench_moe_gqmm")
    from tiny_llm_tpu.ops.quantize import dequantize

    E, N, K = 4, 16, 256
    qt = mod.stack_experts(E, N, K, seed=3)
    assert qt.packed.shape[0] == E and qt.out_features == N
    # Stacked-expert quantization must equal per-expert quantization of
    # the same rows: dequantize and check finite, right shape.
    w = dequantize(qt, jnp.float32)
    assert w.shape == (E, N, K)
    assert bool(jnp.all(jnp.isfinite(w)))


def test_moe_bench_xla_oracle_matches_kernel_inputs():
    mod = load("bench_moe_gqmm")
    E, N, K, T = 4, 16, 256, 8
    qt = mod.stack_experts(E, N, K, seed=0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(T, K)), jnp.bfloat16)
    sizes = jnp.asarray([3, 2, 2, 1], jnp.int32)
    out = mod.xla_grouped(x, qt, sizes)
    assert out.shape == (T, N)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_operator_bench_cases_build_and_time():
    mod = load("bench_operators")
    cases = mod.build_cases(iters=2)
    assert len(cases) >= 3
    # cases: name -> impl -> (thunk, input). The XLA thunks must run on
    # CPU (compiled Pallas thunks are TPU-only; the kernel suites cover
    # them in interpret mode).
    for name, impls in list(cases.items())[:2]:
        fn, x = impls["xla"]
        out = fn(x)
        assert bool(jnp.all(jnp.isfinite(jnp.asarray(out, jnp.float32))))


def test_scaling_bench_runs_on_cpu_mesh():
    """The scaling-efficiency harness must run end-to-end on the
    virtual CPU mesh (the plumbing-validation mode): rows for every
    layout, per-chip efficiency relative to the single row, and the
    not-a-perf-number label."""
    mod = load("bench_scaling")
    result = mod.main([
        "--devices", "1,2", "--layouts", "single,dp,tp",
        "--requests", "2", "--batch-size", "2", "--max-seq", "64",
        "--max-output", "4", "--min-prompt", "8", "--max-prompt", "24",
        "--decode-burst", "4",
    ])
    assert result["backend"] == "cpu-mesh"
    assert result["is_perf_number"] is False
    layouts = {(r["layout"], r["n_devices"]) for r in result["rows"]}
    assert layouts == {("single", 1), ("dp", 2), ("tp", 2)}
    for row in result["rows"]:
        assert row["output_tok_s"] > 0
        assert row["efficiency_vs_single_chip"] > 0
        if row["layout"] == "dp":
            assert row["requests"] == 4  # weak scaling: 2 x dp
        assert row["tok_s_per_chip"] == pytest.approx(
            row["output_tok_s"] / row["n_devices"], rel=1e-6, abs=0.01
        )


def test_speculative_bench_baseline_runs_tiny():
    mod = load("bench_speculative")
    from tiny_llm_tpu.models import random_params, tiny_test_config
    from tiny_llm_tpu.speculative import SpecModel

    cfg = tiny_test_config(num_hidden_layers=2)
    target = SpecModel.build(random_params(cfg, key=0), cfg, 128)
    tok_s = mod.bench_baseline(target, [3, 5, 7], max_tokens=8, burst=4, max_seq=128)
    assert tok_s > 0
