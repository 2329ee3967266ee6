"""Paged flash-decode kernel A/B: BlockSpec page-walk vs multi-page gather.

Measures the paged decode kernel at the Qwen3-4B shape across contexts
and page sizes, reporting achieved HBM GB/s against the dense flash
decode rate at the same context (the spec to beat per VERDICT round-1
item #3: 128-token pages reached 140 GB/s at 32K vs 734 dense).

Chained-dependency methodology (see PERFORMANCE.md): each loop body
applies the kernel `chain` times with a serial dependency; sync is a
data-dependent device_get.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure_paged(kernel_name: str, S: int, ps: int, G: int, NB: int = 2,
                  iters: int = 10, chain: int = 36) -> float:
    from tiny_llm_tpu.kernels import paged_attention_pallas as pap

    B, Hq, Hkv, D = 1, 32, 8, 128
    n_pages = -(-S // ps)
    P = n_pages + 8
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (P, Hkv, ps, D), jnp.bfloat16)
    vp = jax.random.normal(key, (P, Hkv, ps, D), jnp.bfloat16)
    q = jnp.ones((B, Hq, 1, D), jnp.bfloat16)
    rng = np.random.default_rng(0)
    bt = np.full((B, n_pages), -1, np.int32)
    bt[0] = rng.permutation(P)[:n_pages]
    bt = jnp.asarray(bt)
    lens = jnp.asarray([S], jnp.int32)
    scale = float(D ** -0.5)

    if kernel_name == "gather":
        def call(qq):
            return pap.paged_flash_decode_gather(
                qq, kp, vp, bt, lens, scale=scale, pages_per_tile=G,
                num_buffers=NB)
    elif kernel_name == "pages":
        # Whole-page BlockSpec walk — the scan-safe fast schedule.
        def call(qq):
            return pap.paged_flash_decode_pages(
                qq, kp, vp, bt, lens, scale=scale)
    else:
        def call(qq):
            return pap.paged_flash_decode(qq, kp, vp, bt, lens, scale=scale)

    @jax.jit
    def loop(q0):
        def body(i, carry):
            s, qq = carry
            for _ in range(chain):
                o = call(qq)
                qq = (qq + o).astype(jnp.bfloat16)
            return (s + o.astype(jnp.float32).sum(), qq)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), q0))

    jax.device_get(loop(q)[0])
    t0 = time.perf_counter()
    jax.device_get(loop(q)[0])
    return (time.perf_counter() - t0) / (iters * chain) * 1e6  # us per call


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--contexts", type=int, nargs="*", default=[8192, 32768])
    p.add_argument("--page-sizes", type=int, nargs="*", default=[128])
    p.add_argument("--gs", type=int, nargs="*", default=[4, 8, 16])
    p.add_argument("--bufs", type=int, nargs="*", default=[2])
    p.add_argument("--skip-old", action="store_true")
    p.add_argument("--skip-pages", action="store_true")
    args = p.parse_args()

    Hkv, D = 8, 128
    rows = []
    for S in args.contexts:
        kv_bytes = 2 * Hkv * S * D * 2  # K+V bf16
        for ps in args.page_sizes:
            if not args.skip_old:
                us = measure_paged("blockspec", S, ps, 0)
                rows.append({"context": S, "page_size": ps, "kernel": "blockspec",
                             "us_per_op": round(us, 1),
                             "gb_s": round(kv_bytes / us / 1e3)})
                print(json.dumps(rows[-1]), flush=True)
            if not args.skip_pages:
                us = measure_paged("pages", S, ps, 0)
                rows.append({"context": S, "page_size": ps, "kernel": "pages",
                             "us_per_op": round(us, 1),
                             "gb_s": round(kv_bytes / us / 1e3)})
                print(json.dumps(rows[-1]), flush=True)
            for G in args.gs:
                for NB in args.bufs:
                    us = measure_paged("gather", S, ps, G, NB)
                    rows.append({"context": S, "page_size": ps,
                                 "kernel": f"gather-G{G}-N{NB}",
                                 "us_per_op": round(us, 1),
                                 "gb_s": round(kv_bytes / us / 1e3)})
                    print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "paged_decode_kernel_ab", "rows": rows}))


if __name__ == "__main__":
    main()
