"""64K decode coverage + scaling probe (round-5).

The first 4B-64K decode row measured 115 tok/s, implying ~1.34 TB/s of
KV+weight traffic — ABOVE the chip's measured ~920 GB/s floor, which is
physically impossible for real reads. Two hypotheses: (a) the compiled
pages walk / fused kernel silently truncates long block tables (the
interpret-mode parity at 520 pages passes, so the index logic is right
— this would be a Mosaic-level bug), or (b) session timing artifact.

This probe settles it ON DEVICE:
  1. kernel-level parity at full 64K scale: paged_flash_decode_pages
     and fused_paged_decode_attention vs the XLA gather oracle over a
     512-page table (any truncation -> large mismatch);
  2. a context-scaling curve (16K/32K/64K) of the model decode burst:
     honest streaming must scale ms/step ~ linearly with KV bytes.

Usage: python benches/probe_64k_coverage.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.kernels.paged_attention_pallas import (
        paged_flash_decode_pages,
    )
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    doc = {"probe": "64k_coverage", "backend": jax.default_backend()}

    # --- 1. full-scale kernel parity -----------------------------------
    rng = np.random.default_rng(0)
    P, Hkv, ps, D = 515, 8, 128, 128
    ctx = 64 * 1024 + 37
    n_pages = (ctx + ps - 1) // ps  # 513
    maxp = n_pages
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)) * 0.3, jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)) * 0.3, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(1, 16, 1, D)) * 0.3, jnp.bfloat16)
    ids = rng.permutation(np.arange(1, P))[:n_pages]
    table = jnp.asarray(ids[None, :].astype(np.int32))
    lens = jnp.asarray([ctx], jnp.int32)
    scale = D**-0.5

    got = np.asarray(
        paged_flash_decode_pages(q, kp, vp, table, lens, scale), np.float32
    )

    # XLA gather oracle, fp32 accumulate, head-chunked to bound memory.
    k_all = np.asarray(kp, np.float32)[ids].transpose(1, 0, 2, 3).reshape(
        Hkv, n_pages * ps, D
    )[:, :ctx]
    v_all = np.asarray(vp, np.float32)[ids].transpose(1, 0, 2, 3).reshape(
        Hkv, n_pages * ps, D
    )[:, :ctx]
    qf = np.asarray(q, np.float32)[0, :, 0, :].reshape(Hkv, 2, D)
    want = np.empty((Hkv, 2, D), np.float32)
    for h in range(Hkv):
        s = qf[h] @ k_all[h].T * scale  # [2, ctx]
        s -= s.max(axis=1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=1, keepdims=True)
        want[h] = p @ v_all[h]
    diff = float(np.abs(got[0, :, 0, :].reshape(Hkv, 2, D) - want).max())
    doc["pages_kernel_64k_max_diff"] = diff
    print(f"pages kernel 64K parity: max diff {diff:.4f}", flush=True)
    assert diff < 0.08, "pages kernel truncates/mismatches at 64K scale"

    # --- 2. model context-scaling curve --------------------------------
    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )

    cfg = QWEN3_CONFIGS["qwen3-4b"]
    rows = []
    for ctx_k in (16, 32, 64):
        ctx = ctx_k * 1024
        max_seq = ctx + 96
        model = Qwen3Model(
            synthetic_quantized_params(cfg, key=0), cfg, max_seq_len=max_seq
        )
        model.enable_paged_attention(
            num_pages=max_seq // 128 + 2, page_size=128
        )
        cache = model.create_batching_kv_cache(max_active_requests=1)
        prompt = rng.integers(0, cfg.vocab_size, size=ctx, dtype=np.int64)
        off = 0
        while off < ctx:
            chunk = prompt[off : off + 2048]
            logits = model(
                jnp.asarray(chunk[None], jnp.int32), [off], cache,
                logits_to_keep=1,
            )
            off += len(chunk)
        tok = np.asarray(
            jax.device_get(jnp.argmax(logits[:, -1].astype(jnp.float32), -1)),
            np.int32,
        )
        model.decode_burst(cache, tok, 16)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            toks = model.decode_burst(cache, tok, 16)
            best = min(best, time.perf_counter() - t0)
            tok = np.asarray(toks[-1], np.int32)
        kv_gb = 2 * cfg.num_hidden_layers * cfg.num_key_value_heads * (
            ctx * cfg.head_dim * 2
        ) / 1e9
        ms = best / 16 * 1e3
        rows.append(
            {"context": ctx, "ms_per_step": round(ms, 2),
             "kv_gb": round(kv_gb, 2),
             "implied_gb_s": round((kv_gb + 2.0) / (ms / 1e3), 0)}
        )
        print(f"ctx {ctx_k}K: {ms:.2f} ms/step, KV {kv_gb:.1f} GB, "
              f"implied {(kv_gb + 2.0) / (ms / 1e3):.0f} GB/s", flush=True)
        del model, cache
    doc["scaling"] = rows
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
