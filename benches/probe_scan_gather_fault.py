"""Minimal + escalating repro for the scan-wrapped paged-gather TPU fault.

Incident: the manual-DMA multi-page gather decode kernel
(kernels/paged_attention_pallas.py:paged_flash_decode_gather) can crash
the TPU worker when dispatched inside a `lax.scan` body (first seen on
the 2026-08-21 axon relay; the serving campaign with gather-in-scan
reproduces it while tiny-shape scans PASS). This probe escalates from
the tiny always-passing case toward the exact serving configuration one
ingredient at a time, so the LAST "stage N ..." line printed before a
worker crash names the faulting construct.

Run (serialize with other TPU work):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 590 \
        python benches/probe_scan_gather_fault.py [--stages 1,2,...] \
        [--b 4 --hq 32 --hkv 8 --g 16 --maxp 10 --ctx 1150 --steps 16]

Stages:
    1. tiny walk standalone          (control)
    2. tiny gather standalone        (control)
    3. tiny walk in scan             (control)
    4. tiny gather in scan           (passes on fixed relays)
    5. PROD-shape gather standalone  (B=4 Hq=32 Hkv=8 G=16 maxp=10)
    6. PROD-shape gather in scan     (pure attention, no page writes)
    7. PROD-shape gather in scan + in-scan page writes (DUS carry)
    8. stage 7 + donated page buffers (the real serving burst aliasing)
    9. --layers gather calls PER scan iteration (the model runs 36/step;
       chained q updates, one shared pool) — resource-scaling check
   10. stage 9 over a LAYERED pool [L, P, Hkv, ps, D] with per-layer
       slices + per-layer page writes (the full burst memory pattern)

If every stage passes, the relay is healthy: keep the gather as the
scan-scope default. If stage N faults, bisect with --stages/--b/--g/...
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from tiny_llm_tpu.kernels.paged_attention_pallas import (
    paged_flash_decode,
    paged_flash_decode_gather,
)


def make_pool(key, B, Hq, Hkv, D, ps, pages, maxp, ctx):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Hq, 1, D), jnp.bfloat16)
    kp = jax.random.normal(kk, (pages, Hkv, ps, D), jnp.bfloat16)
    vp = jax.random.normal(kv, (pages, Hkv, ps, D), jnp.bfloat16)
    # Permuted live pages + dead (-1) tail slots, like a real pool.
    perm = jax.random.permutation(jax.random.PRNGKey(7), pages)
    lens = jnp.asarray(
        [max(1, ctx - 37 * b) for b in range(B)], jnp.int32
    )
    rows = []
    for b in range(B):
        need = (int(lens[b]) + ps - 1) // ps
        row = [int(perm[(b * maxp + i) % pages]) for i in range(need)]
        row += [-1] * (maxp - need)
        rows.append(row)
    bt = jnp.asarray(rows, jnp.int32)
    return q, kp, vp, bt, lens


def run_standalone(fn, name, args):
    out = fn(*args)
    print(f"PASS {name}: sum={float(jnp.sum(out.astype(jnp.float32))):.3f}",
          flush=True)


def run_scan(fn, name, args, steps, page_writes=False, donate=False):
    q, kp, vp, bt, lens = args
    ps = kp.shape[2]

    def burst(q0, kp, vp):
        def body(carry, _):
            qc, kp, vp, lens_c = carry
            if page_writes:
                # Mimic forward_step_paged's per-step KV append: write one
                # new token row into each request's current page (DUS on
                # the carried pool), THEN attend over it.
                pos = lens_c  # [B]
                page_slot = pos // ps
                widx = jnp.take_along_axis(bt, page_slot[:, None], 1)[:, 0]
                inpage = pos % ps
                newk = qc[:, : kp.shape[1], 0, :]  # [B, Hkv, D] stand-in
                for b in range(q0.shape[0]):
                    kp = jax.lax.dynamic_update_slice(
                        kp,
                        newk[b][:, None, :].astype(kp.dtype)[None],
                        (widx[b], jnp.int32(0), inpage[b], jnp.int32(0)),
                    )
                    vp = jax.lax.dynamic_update_slice(
                        vp,
                        newk[b][:, None, :].astype(vp.dtype)[None],
                        (widx[b], jnp.int32(0), inpage[b], jnp.int32(0)),
                    )
                lens_c = lens_c + 1
            o = fn(qc, kp, vp, bt, lens_c)
            return (
                (qc + 0.001 * o).astype(qc.dtype), kp, vp, lens_c
            ), jnp.sum(o.astype(jnp.float32))

        (_, kp, vp, _), sums = jax.lax.scan(
            body, (q0, kp, vp, lens), None, length=steps
        )
        return sums, kp, vp

    jb = jax.jit(burst, donate_argnums=(1, 2) if donate else ())
    sums, kp2, vp2 = jb(q, kp, vp)
    sums = jax.device_get(sums)
    print(f"PASS {name}: sums[0]={float(sums[0]):.3f} "
          f"sums[-1]={float(sums[-1]):.3f}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="1,2,3,4,5,6,7,8")
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--hq", type=int, default=32)
    p.add_argument("--hkv", type=int, default=8)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--ps", type=int, default=128)
    p.add_argument("--g", type=int, default=16)
    p.add_argument("--maxp", type=int, default=10)
    p.add_argument("--pages", type=int, default=48)
    p.add_argument("--ctx", type=int, default=1150)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--layers", type=int, default=36)
    a = p.parse_args()
    stages = {int(s) for s in a.stages.split(",")}

    print(f"jax {jax.__version__} devices={jax.devices()}", flush=True)

    tiny = make_pool(jax.random.PRNGKey(0), 2, 4, 2, 128, 128, 16, 8, 915)
    prod = make_pool(
        jax.random.PRNGKey(1), a.b, a.hq, a.hkv, a.d, a.ps, a.pages, a.maxp,
        a.ctx,
    )

    def walk(q, kp, vp, bt, lens):
        return paged_flash_decode(q, kp, vp, bt, lens, scale=a.d**-0.5)

    def gather_tiny(q, kp, vp, bt, lens):
        return paged_flash_decode_gather(
            q, kp, vp, bt, lens, scale=128**-0.5, pages_per_tile=4
        )

    def gather_prod(q, kp, vp, bt, lens):
        return paged_flash_decode_gather(
            q, kp, vp, bt, lens, scale=a.d**-0.5, pages_per_tile=a.g
        )

    if 1 in stages:
        print("stage 1: tiny walk standalone ...", flush=True)
        run_standalone(walk, "tiny walk standalone", tiny)
    if 2 in stages:
        print("stage 2: tiny gather standalone ...", flush=True)
        run_standalone(gather_tiny, "tiny gather standalone", tiny)
    if 3 in stages:
        print("stage 3: tiny walk in scan ...", flush=True)
        run_scan(walk, "tiny walk in scan", tiny, 4)
    if 4 in stages:
        print("stage 4: tiny gather in scan ...", flush=True)
        run_scan(gather_tiny, "tiny gather in scan", tiny, 4)
    if 5 in stages:
        print("stage 5: prod gather standalone ...", flush=True)
        run_standalone(gather_prod, "prod gather standalone", prod)
    if 6 in stages:
        print("stage 6: prod gather in scan ...", flush=True)
        run_scan(gather_prod, "prod gather in scan", prod, a.steps)
    if 7 in stages:
        print("stage 7: prod gather in scan + page writes ...", flush=True)
        run_scan(gather_prod, "prod gather in scan + writes", prod, a.steps,
                 page_writes=True)
    if 8 in stages:
        print("stage 8: stage 7 + donated pages ...", flush=True)
        run_scan(gather_prod, "prod gather scan writes donated", prod,
                 a.steps, page_writes=True, donate=True)
    if 9 in stages:
        print(f"stage 9: {a.layers} gather calls per scan step ...",
              flush=True)
        q, kp, vp, bt, lens = prod

        @jax.jit
        def multi(q0):
            def body(qc, _):
                s = jnp.float32(0)
                for _i in range(a.layers):
                    o = gather_prod(qc, kp, vp, bt, lens)
                    qc = (qc + 0.001 * o).astype(qc.dtype)
                    s = s + jnp.sum(o.astype(jnp.float32))
                return qc, s

            _, sums = jax.lax.scan(body, q0, None, length=a.steps)
            return sums

        sums = jax.device_get(multi(q))
        print(f"PASS stage 9: sums[0]={float(sums[0]):.3f} "
              f"sums[-1]={float(sums[-1]):.3f}", flush=True)
    if 10 in stages:
        print(f"stage 10: layered pool, {a.layers} layers, writes ...",
              flush=True)
        q, kp, vp, bt, lens = prod
        ps = kp.shape[2]
        kpl = jnp.stack([kp] * a.layers)  # [L, P, Hkv, ps, D]
        vpl = jnp.stack([vp] * a.layers)

        @jax.jit
        def layered(q0, kpl, vpl):
            def body(carry, _):
                qc, kpl, vpl, lc = carry
                pos = lc
                page_slot = pos // ps
                widx = jnp.take_along_axis(bt, page_slot[:, None], 1)[:, 0]
                inpage = pos % ps
                s = jnp.float32(0)
                for li in range(a.layers):
                    newk = qc[:, : kp.shape[1], 0, :]
                    kl, vl = kpl[li], vpl[li]
                    for b in range(q.shape[0]):
                        row = newk[b][:, None, :].astype(kp.dtype)[None]
                        kl = jax.lax.dynamic_update_slice(
                            kl, row, (widx[b], jnp.int32(0), inpage[b],
                                      jnp.int32(0)))
                        vl = jax.lax.dynamic_update_slice(
                            vl, row, (widx[b], jnp.int32(0), inpage[b],
                                      jnp.int32(0)))
                    kpl = jax.lax.dynamic_update_slice(
                        kpl, kl[None], (li, 0, 0, 0, 0))
                    vpl = jax.lax.dynamic_update_slice(
                        vpl, vl[None], (li, 0, 0, 0, 0))
                    o = gather_prod(qc, kpl[li], vpl[li], bt, lc + 1)
                    qc = (qc + 0.001 * o).astype(qc.dtype)
                    s = s + jnp.sum(o.astype(jnp.float32))
                return (qc, kpl, vpl, lc + 1), s

            (_, kpl, vpl, _), sums = jax.lax.scan(
                body, (q0, kpl, vpl, lens), None, length=a.steps)
            return sums

        sums = jax.device_get(layered(q, kpl, vpl))
        print(f"PASS stage 10: sums[0]={float(sums[0]):.3f} "
              f"sums[-1]={float(sums[-1]):.3f}", flush=True)
    print("ALL SELECTED STAGES PASS", flush=True)


if __name__ == "__main__":
    main()
