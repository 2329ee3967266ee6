"""End-to-end MoE decode-STEP A/B (VERDICT round-2 item #2, last leg).

Times one full sparse-MLP layer step — router top-k, expert sort,
gate/up/down grouped quantized matmuls, weighted combine
(ops/moe.py moe_forward) — at the Qwen3-30B-A3B layer shape with B=8
decode rows (x top-8 experts = 64 grouped rows), by two-point slope (1 vs 2 calls; 3-call bodies exceed the relay's
remote-compile payload cap)
(the ~480 us dispatch floor cancelled, benches/probe_dispatch_floor.py).

A/B arms:
  * dispatch  — production per-shape kernel dispatch (gather for
    gate/up where K >= N, walk for down)
  * walk-only — GATHER_MAX_T forced to 0 (round-2 behavior for down;
    all projections on the BlockSpec walk)
  * xla       — dequantize + ragged_dot fallback

Usage: python benches/bench_moe_layer_e2e.py [out.json]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.kernels import moe_matmul
from tiny_llm_tpu.ops.moe import moe_forward
from tiny_llm_tpu.ops.quantize import quantize_stacked

ITERS = 30
HBM_GBS = 819.0
# 30B-A3B layer dims with a HALVED expert count: three closed-over
# expert stacks at E=128 exceed the relay's remote-compile payload cap
# (HTTP 413) and argument-passed weights mis-measure on this relay, so
# E=64 keeps the serialized program under the cap. B*topk <= 64 routed
# rows make the kernel work per step nearly identical to E=128.
E, D, I, TOPK, B = 64, 2048, 768, 8, 8
import os as _os
B = int(_os.environ.get("TLT_MOE_E2E_B", B))  # B=1 probes the T=topk row regime


def main():
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)
    qz = jax.jit(quantize_stacked, static_argnames=("group_size", "bits", "layout"))

    def stack(n, k, seed):
        w = jnp.asarray(
            np.random.default_rng(seed).normal(size=(E, n, k)).astype(np.float32)
            * 0.05
        )
        return qz(w, layout="magic_t")

    w_gate = stack(I, D, 1)
    w_up = stack(I, D, 2)
    w_down = stack(D, I, 3)
    w_router = jnp.asarray(rng.normal(size=(E, D)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.bfloat16)

    def slope(impl, wg=None, wu=None, wd=None):
        wg = w_gate if wg is None else wg
        wu = w_up if wu is None else wu
        wd = w_down if wd is None else wd

        def make_run(ncalls):
            @jax.jit
            def run(x0):
                def body(i, xx):
                    for _ in range(ncalls):
                        y = moe_forward(
                            xx, w_router, wg, wu, wd,
                            num_experts_per_tok=TOPK, norm_topk_prob=True,
                            impl=impl,
                        )
                        # Non-vanishing chain: a pure additive epsilon
                        # underflows in bf16; scale instead.
                        xx = xx * (1.0 + jnp.sum(y[:1, :1, :1]) * 1e-6).astype(
                            xx.dtype
                        )
                    return xx

                return jax.lax.fori_loop(0, ITERS, body, x0)

            return run

        t = {}
        for n in (1, 2):
            run = make_run(n)
            jax.block_until_ready(run(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(x))
                best = min(best, (time.perf_counter() - t0) / ITERS)
            t[n] = best
        print(f"    raw: 1-call {t[1]*1e6:.1f} us, 2-call {t[2]*1e6:.1f} us",
              flush=True)
        return max(t[2] - t[1], 1e-9)

    # Weights a decode step must stream: routed experts of all three
    # projections (<= B*TOPK distinct experts, typically ~40-50 of 128).
    per_expert = (I * D // 2 + D * I // 2 + I * D // 2) + 3 * 2 * 16 * max(I, D)
    results = {}
    print(f"B={B} topk={TOPK} layer E={E} D={D} I={I}", flush=True)
    # Round-5: the production dispatch IS the walk (see
    # grouped_quantized_matmul); the gather arm forces the retired
    # manual-DMA schedule via its env hatch for the ongoing A/B record.
    import os

    from tiny_llm_tpu.ops.quantize import convert_layout_stacked

    pair = {
        n: jax.jit(convert_layout_stacked, static_argnames=("layout",))(
            w, layout="pair_t"
        )
        for n, w in (("g", w_gate), ("u", w_up), ("d", w_down))
    }
    for name, setup in [
        ("dispatch", None),
        ("pair_a8", "pair"),
        ("gather_forced", "gather"),
        ("xla", "xla"),
    ]:
        if setup == "gather":
            os.environ["TLT_MOE_DECODE"] = "gather"
        impl = "xla" if setup == "xla" else None
        try:
            if setup == "pair":
                # round-5 session 2: int8-pair walk, a8 at decode T
                dt = slope(None, pair["g"], pair["u"], pair["d"])
            else:
                dt = slope(impl)
        finally:
            os.environ.pop("TLT_MOE_DECODE", None)
        results[name] = round(dt * 1e6, 1)
        print(f"  {name:10s}: {dt*1e6:9.1f} us/layer-step", flush=True)
    results["dispatch_vs_gather"] = round(
        results["gather_forced"] / results["dispatch"], 2
    )
    results["dispatch_vs_xla"] = round(results["xla"] / results["dispatch"], 2)
    print(f"  dispatch(walk) vs gather {results['dispatch_vs_gather']}x, "
          f"vs xla {results['dispatch_vs_xla']}x", flush=True)
    doc = {"bench": "moe_layer_e2e", "shape": {"E": E, "D": D, "I": I,
           "topk": TOPK, "B": B}, "iters": ITERS,
           "device": jax.devices()[0].device_kind, "results": results}
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
