"""Ground-truth sync probe for the axon tunnel.

Question: does `jax.block_until_ready` actually await remote completion on
this backend? Method: time K chained decode steps (each step's input token
depends on the previous step's logits, so no reordering is possible) ended
by a `jax.device_get` of the final token — the fetch provably awaits
completion. Per-step cost = slope of T(K) over K, which cancels the fixed
fetch RTT and dispatch overheads. Compare with the block_until_ready-based
timing bench.py currently uses.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_llm_tpu.models import QWEN3_CONFIGS, Qwen3Model, synthetic_quantized_params
from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache


def main() -> None:
    enable_compilation_cache()
    cfg = QWEN3_CONFIGS["qwen3-4b"]
    params = synthetic_quantized_params(cfg, key=0)
    model = Qwen3Model(params, cfg, max_seq_len=1024)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 128)), jnp.int32)

    # --- fetch RTT of a trivially-ready scalar ---
    x = jnp.zeros((), jnp.int32)
    jax.device_get(x)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(x)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"fetch RTT (ready scalar): {rtt*1e3:.1f} ms (all: {[f'{r*1e3:.1f}' for r in rtts]})")

    # --- warm up compile: prefill + decode ---
    cache = model.create_kv_cache()
    logits = model(prompt, 0, cache, logits_to_keep=1)
    tok = jnp.argmax(logits[:, -1, :].astype(jnp.float32), axis=-1).astype(jnp.int32)
    _ = model(tok[None], 128, cache, logits_to_keep=1)
    jax.device_get(jnp.argmax(_[:, -1, :].astype(jnp.float32), axis=-1).astype(jnp.int32))
    cache.release()

    def run_chain(k: int, sync: str) -> float:
        cache = model.create_kv_cache()
        logits = model(prompt, 0, cache, logits_to_keep=1)
        tok = jnp.argmax(logits[:, -1, :].astype(jnp.float32), axis=-1).astype(jnp.int32)
        jax.device_get(tok)  # ensure prefill is fully done before timing
        offset = 128
        t0 = time.perf_counter()
        for _ in range(k):
            logits = model(tok[None], offset, cache, logits_to_keep=1)
            tok = jnp.argmax(logits[:, -1, :].astype(jnp.float32), axis=-1).astype(jnp.int32)
            offset += 1
        if sync == "fetch":
            jax.device_get(tok)
        else:
            jax.block_until_ready(tok)
        dt = time.perf_counter() - t0
        cache.release()
        return dt

    results = {}
    for sync in ("fetch", "block"):
        times = {}
        for k in (8, 32, 128):
            ts = [run_chain(k, sync) for _ in range(3)]
            times[k] = float(np.median(ts))
            print(f"sync={sync} K={k}: {[f'{t*1e3:.0f}' for t in ts]} ms, median {times[k]*1e3:.0f} ms")
        slope = (times[128] - times[32]) / 96
        results[sync] = {"times_ms": {k: round(v * 1e3, 1) for k, v in times.items()},
                         "per_step_ms": round(slope * 1e3, 3),
                         "tok_s_slope": round(1 / slope, 1)}
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2), **results}, indent=2))


if __name__ == "__main__":
    main()
