"""Direct HBM bandwidth characterization (round-5, v2).

The 64K decode rows imply ~1.3 TB/s of KV streaming, above the v5e
datasheet's 819 GB/s — yet 64K logits parity is exact, so nothing is
skipped. Either the bandwidth assumption is wrong for this chip (the
relay labels it "TPU v5 lite") or the in-model timing is. Measures:

  1. pure HBM stream: one bf16 multiply per CARRIED fori_loop iteration
     over 1/4 GiB arrays (cross-iteration dependence defeats constant
     folding — the v1 probe's in-body chains folded to a single op and
     read as 500 TB/s);
  2. the pages-walk decode kernel at 32K (264 pages) and 64K (513
     pages), pools generated INSIDE the jit (a closure of 270 MB trips
     the relay's HTTP 413 payload cap; argument-passed operands
     mis-measure on this relay), chained 12 deep per iteration.

Usage: python benches/probe_hbm_bandwidth.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    doc = {"probe": "hbm_bandwidth", "backend": jax.default_backend(),
           "device": str(jax.devices()[0])}
    rows = []

    # --- 1. read+write stream (carried dependence) --------------------
    ITERS = 24
    for gib in (1, 4):
        n = gib * (1 << 29)  # bf16 elements
        x = jnp.ones((n,), jnp.bfloat16)

        @jax.jit
        def run(x0):
            def body(i, xx):
                # One multiply per iteration; the carry dependence keeps
                # every iteration's full read+write in the program.
                return xx * jnp.bfloat16(1.0000305)

            return jax.lax.fori_loop(0, ITERS, body, x0)

        jax.block_until_ready(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x))
            best = min(best, time.perf_counter() - t0)
        per_iter = best / ITERS
        bw = 2 * n * 2 / per_iter / 1e9
        rows.append({"kind": f"stream_rw_{gib}gib",
                     "us_per_iter": round(per_iter * 1e6, 1),
                     "gb_s": round(bw, 0)})
        print(f"stream r+w {gib} GiB: {per_iter*1e6:.0f} us/iter, "
              f"{bw:.0f} GB/s", flush=True)
        del x

    # --- 2. pages walk at 32K and 64K (in-jit pools) ------------------
    from tiny_llm_tpu.kernels.paged_attention_pallas import (
        paged_flash_decode_pages,
    )

    Hkv, ps, D = 8, 128, 128
    CHAIN, LOOPS = 12, 4
    for label, n_pages in (("32k", 264), ("64k", 513)):
        P = n_pages + 3
        rng = np.random.default_rng(1)
        table = jnp.asarray(
            rng.permutation(np.arange(1, P))[:n_pages][None, :].astype(np.int32)
        )
        lens = jnp.asarray([n_pages * ps - 11], jnp.int32)
        q0 = jnp.asarray(rng.normal(size=(1, 16, 1, D)) * 0.3, jnp.bfloat16)
        sc = D**-0.5

        @jax.jit
        def run(qq):
            key = jax.random.PRNGKey(0)
            kp = jax.random.normal(key, (P, Hkv, ps, D), jnp.bfloat16)
            vp = jax.random.normal(
                jax.random.PRNGKey(1), (P, Hkv, ps, D), jnp.bfloat16
            )

            def body(i, q_in):
                for _ in range(CHAIN):
                    o = paged_flash_decode_pages(q_in, kp, vp, table, lens, sc)
                    q_in = (q_in + o * 1e-3).astype(jnp.bfloat16)
                return q_in

            return jax.lax.fori_loop(0, LOOPS, body, qq)

        jax.block_until_ready(run(q0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(q0))
            best = min(best, time.perf_counter() - t0)
        per_call = best / (CHAIN * LOOPS)
        kv_bytes = 2 * n_pages * ps * Hkv * D * 2
        rows.append({"kind": f"pages_walk_{label}", "pages": n_pages,
                     "us_per_call": round(per_call * 1e6, 1),
                     "gb_s": round(kv_bytes / per_call / 1e9, 0),
                     "kv_mb": round(kv_bytes / 1e6, 0)})
        print(f"pages walk {label} ({n_pages}p): {per_call*1e6:.0f} us/call, "
              f"{kv_bytes/per_call/1e9:.0f} GB/s over {kv_bytes/1e6:.0f} MB",
              flush=True)

    doc["rows"] = rows
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
