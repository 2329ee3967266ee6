"""Direct HBM bandwidth characterization (round-5).

The 64K decode rows imply ~1.3 TB/s of KV streaming, above the v5e
datasheet's 819 GB/s — yet the fused/3-launch logits parity at 64K is
exact, so nothing is skipped. Either the ledger's bandwidth assumption
is wrong for this chip (the axon relay labels it "TPU v5 lite") or the
timing is. This probe measures, with two-point slope inside one jit:

  1. pure HBM streams: bf16 elementwise y = x * c over 1-4 GiB arrays
     (read + write), and a read-heavy 8-way sum reduction;
  2. the raw pages-walk decode kernel over 513 pages (~269 MB KV read),
     with pages passed as ARGUMENTS (a closure bakes 270 MB into the
     program and trips the relay's HTTP 413 payload cap).

Usage: python benches/probe_hbm_bandwidth.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def slope_time(make_run, arg, iters=8):
    import jax

    t = {}
    for n in (1, 3):
        run = make_run(n)
        jax.block_until_ready(run(arg))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(arg))
            best = min(best, (time.perf_counter() - t0) / iters)
        t[n] = best
    return max((t[3] - t[1]) / 2, 1e-9)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    doc = {"probe": "hbm_bandwidth", "backend": jax.default_backend(),
           "device": str(jax.devices()[0])}

    # --- 1a. read+write stream ----------------------------------------
    rows = []
    for gib in (1, 4):
        n = gib * (1 << 29)  # bf16 elements
        x = jnp.ones((n,), jnp.bfloat16)

        def make_run(ncalls):
            @jax.jit
            def run(x0):
                def body(i, xx):
                    for j in range(ncalls):
                        xx = xx * jnp.bfloat16(1.0000305)
                    return xx

                return jax.lax.fori_loop(0, 8, body, x0)

            return run

        dt = slope_time(make_run, x)
        bw = 2 * n * 2 / dt / 1e9  # read + write
        rows.append({"kind": f"stream_rw_{gib}gib", "us": round(dt * 1e6, 1),
                     "gb_s": round(bw, 0)})
        print(f"stream r+w {gib} GiB: {dt*1e6:.0f} us, {bw:.0f} GB/s",
              flush=True)
        del x

    # --- 1b. read-dominated reduction ---------------------------------
    n = 1 << 30  # 2 GiB bf16
    x = jnp.ones((8, n // 8), jnp.bfloat16)

    def make_red(ncalls):
        @jax.jit
        def run(x0):
            def body(i, carry):
                xx, acc = carry
                for j in range(ncalls):
                    acc = acc + jnp.sum(xx, axis=1, dtype=jnp.float32)
                return (xx, acc)

            _, acc = jax.lax.fori_loop(
                0, 8, body, (x0, jnp.zeros((8,), jnp.float32))
            )
            return acc

        return run

    dt = slope_time(make_red, x)
    bw = n * 2 / dt / 1e9
    rows.append({"kind": "reduce_read_2gib", "us": round(dt * 1e6, 1),
                 "gb_s": round(bw, 0)})
    print(f"read reduction 2 GiB: {dt*1e6:.0f} us, {bw:.0f} GB/s", flush=True)
    del x

    # --- 2. raw pages-walk kernel at 513 pages ------------------------
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
    sc = D**-0.5

    def make_kernel_run(ncalls):
        @jax.jit
        def run(args):
            qq, kpp, vpp = args

            def body(i, q_in):
                for _ in range(ncalls):
                    o = paged_flash_decode_pages(q_in, kpp, vpp, table, lens, sc)
                    q_in = q_in + (o * 1e-3).astype(q_in.dtype)
                return q_in

            return jax.lax.fori_loop(0, 8, body, qq)

        return run

    dt = slope_time(make_kernel_run, (q0, kp, vp))
    kv_bytes = 2 * n_pages * ps * Hkv * D * 2
    rows.append({"kind": "pages_walk_513p", "us": round(dt * 1e6, 1),
                 "gb_s": round(kv_bytes / dt / 1e9, 0),
                 "kv_mb": round(kv_bytes / 1e6, 0)})
    print(f"pages walk 513p: {dt*1e6:.0f} us/call, "
          f"{kv_bytes/dt/1e9:.0f} GB/s over {kv_bytes/1e6:.0f} MB", flush=True)
    doc["rows"] = rows
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
