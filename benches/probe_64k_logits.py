"""64K single-step logits parity + raw pages-kernel bandwidth (round-5).

Token sequences can diverge from bf16 argmax tie-flips without any
coverage bug, so this probe compares one decode step's LOGITS at 64K
context between the fused one-kernel path and the 3-launch path
(prep + DUS + the pages walk the full-scale parity already validated),
and times the raw pages kernel by two-point slope to get its true
sustained bandwidth at 513 pages.

Usage: python benches/probe_64k_logits.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build(ctx: int, fused_one: bool):
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )

    os.environ["TLT_PAGED_FUSED_ONE"] = "1" if fused_one else "0"
    cfg = QWEN3_CONFIGS["qwen3-4b"]
    max_seq = ctx + 64
    model = Qwen3Model(
        synthetic_quantized_params(cfg, key=0), cfg, max_seq_len=max_seq
    )
    model.enable_paged_attention(num_pages=max_seq // 128 + 2, page_size=128)
    cache = model.create_batching_kv_cache(max_active_requests=1)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=ctx, dtype=np.int64)
    off = 0
    while off < ctx:
        chunk = prompt[off : off + 2048]
        logits = model(
            jnp.asarray(chunk[None], jnp.int32), [off], cache, logits_to_keep=1
        )
        off += len(chunk)
    return model, cache, logits


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    ctx = 64 * 1024
    doc = {"probe": "64k_logits", "context": ctx}

    # --- single-step logits parity ------------------------------------
    step_logits = {}
    prefill_last = {}
    for fused in (True, False):
        model, cache, pl_logits = build(ctx, fused)
        prefill_last[fused] = np.asarray(pl_logits[:, -1], np.float32)
        logits = model(
            jnp.asarray([[7]], jnp.int32), ctx, cache, logits_to_keep=1
        )
        step_logits[fused] = np.asarray(logits[:, -1], np.float32)
        del model, cache
    dp = float(np.abs(prefill_last[True] - prefill_last[False]).max())
    dd = float(np.abs(step_logits[True] - step_logits[False]).max())
    scale = float(np.abs(step_logits[False]).max())
    doc["prefill_logits_max_diff"] = dp
    doc["decode_step_logits_max_diff"] = dd
    doc["decode_step_logits_scale"] = scale
    same_argmax = bool(
        np.argmax(step_logits[True]) == np.argmax(step_logits[False])
    )
    doc["decode_step_argmax_equal"] = same_argmax
    print(f"prefill max diff {dp:.4f}; decode-step max diff {dd:.4f} "
          f"(scale {scale:.1f}); argmax equal: {same_argmax}", flush=True)

    # --- raw pages-kernel slope at 513 pages --------------------------
    from tiny_llm_tpu.kernels.paged_attention_pallas import (
        paged_flash_decode_pages,
    )

    rng = np.random.default_rng(1)
    P, Hkv, ps, D = 516, 8, 128, 128
    n_pages = 513
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)) * 0.3, jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)) * 0.3, jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(1, 16, 1, D)) * 0.3, jnp.bfloat16)
    table = jnp.asarray(
        rng.permutation(np.arange(1, P))[:n_pages][None, :].astype(np.int32)
    )
    lens = jnp.asarray([n_pages * ps - 11], jnp.int32)
    scale_a = D**-0.5

    def make_run(ncalls):
        import functools

        @jax.jit
        def run(q):
            def body(i, qq):
                for _ in range(ncalls):
                    o = paged_flash_decode_pages(
                        qq, kp, vp, table, lens, scale_a
                    )
                    qq = qq + (o * 1e-3).astype(qq.dtype)
                return qq

            return jax.lax.fori_loop(0, 8, body, q)

        return run

    t = {}
    for n in (1, 3):
        run = make_run(n)
        jax.block_until_ready(run(q0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(q0))
            best = min(best, (time.perf_counter() - t0) / 8)
        t[n] = best
    per_call = max((t[3] - t[1]) / 2, 1e-9)
    kv_bytes = 2 * n_pages * ps * Hkv * D * 2
    doc["pages_kernel_call_us"] = round(per_call * 1e6, 1)
    doc["pages_kernel_gb_s"] = round(kv_bytes / per_call / 1e9, 1)
    print(f"pages kernel at 513 pages: {per_call*1e6:.0f} us/call, "
          f"{kv_bytes/per_call/1e9:.0f} GB/s over {kv_bytes/1e6:.0f} MB",
          flush=True)
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
