"""Model-level Qwen3-30B-A3B MoE decode at E=128 (round-4 VERDICT #5).

Round 3 measured the MoE kernels (gather 591-759 GB/s) and a single
sparse layer e2e at E=64 ("three E=128 stacks exceed the relay's
remote-compile payload cap" — that harness baked the expert stacks into
the jitted program as closure constants). This bench goes through the
MODEL path instead: expert stacks are ordinary params pytree leaves,
i.e. jit ARGUMENTS living in HBM, so the compile payload is just HLO —
the E=128 cap never applies.

The full 48-layer 30B-A3B in W4A16 is ~16 GB of packed weights and does
NOT fit one v5e's 16 GB HBM (the reference runs it on a 48 GB
unified-memory M4 Pro; multi-chip TP/EP is this framework's fit — see
parallel/ep_moe.py and the dryrun). So this bench measures a
layer-truncated model at FULL E=128 per-layer shapes and reports:
  - measured decode tok/s for the truncated stack,
  - per-layer decode attribution (slope between two depths),
  - an extrapolated full-48-layer figure, clearly labeled estimate
    (layers are identical, so depth-slope extrapolation is exact up to
    the fixed lm-head/embed cost it already separates out).

Reference anchor: ref:src/tiny_llm_ref/moe.py:68-89 (routing semantics);
the reference publishes no 30B-A3B model-level decode number either.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def measure_decode(model, cfg, prompt_len, steps, burst, repeats=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, prompt_len)), jnp.int32
    )

    def run():
        cache = model.create_kv_cache()
        logits = model(prompt, 0, cache, logits_to_keep=1)
        tok = np.asarray(
            jax.device_get(jnp.argmax(logits[:, -1].astype(jnp.float32), -1)),
            np.int32,
        )
        t0 = time.perf_counter()
        done = 0
        while done < steps:
            k = min(burst, steps - done)
            toks = model.decode_burst_dense(cache, tok, k)
            tok = np.asarray(toks[-1], np.int32)
            done += k
        dt = time.perf_counter() - t0
        cache.release()
        return steps / dt

    run()  # compile
    return sorted(run() for _ in range(repeats))[repeats // 2]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-30b-a3b")
    p.add_argument("--layers", type=int, nargs="*", default=[12, 24])
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--decode", type=int, default=64)
    p.add_argument("--burst", type=int, default=16)
    p.add_argument("--act-quant", default=None, choices=["bf16", "int8"])
    args = p.parse_args()

    import jax

    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    base = QWEN3_CONFIGS[args.model]
    rows = []
    for n in sorted(args.layers):
        cfg = dataclasses.replace(base, num_hidden_layers=n)
        # pair_t synthetic construction (random bits: identical cost to
        # magic_t) instead of post-hoc conversion, which OOMed at 24
        # layers holding both layouts + int32 unpack temporaries.
        params = synthetic_quantized_params(
            cfg, key=0,
            layout="pair_t" if args.act_quant == "int8" else None,
        )
        model = Qwen3Model(
            params, cfg, max_seq_len=512, act_quant=args.act_quant,
        )
        tok_s = measure_decode(
            model, cfg, args.prompt_len, args.decode, args.burst
        )
        rows.append({"layers": n, "tok_s": round(tok_s, 2),
                     "ms_per_step": round(1000.0 / tok_s, 3)})
        print(json.dumps(rows[-1]), flush=True)
        del model

    out = {
        "metric": f"decode_tok_s_{args.model.replace('-', '_')}_"
        f"{'w4a8' if args.act_quant == 'int8' else 'w4a16'}",
        "num_experts": base.num_experts,
        "experts_per_tok": base.num_experts_per_tok,
        "rows": rows,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if len(rows) >= 2:
        # Depth slope: identical layers, so ms/layer is exact; the
        # intercept is the fixed embed + lm-head + host-burst cost.
        a, b = rows[0], rows[-1]
        ms_per_layer = (b["ms_per_step"] - a["ms_per_step"]) / (
            b["layers"] - a["layers"]
        )
        fixed_ms = a["ms_per_step"] - ms_per_layer * a["layers"]
        full_ms = fixed_ms + ms_per_layer * base.num_hidden_layers
        out["ms_per_moe_layer"] = round(ms_per_layer, 3)
        out["fixed_ms"] = round(fixed_ms, 3)
        out["extrapolated_full_model_tok_s"] = round(1000.0 / full_ms, 2)
        out["extrapolation_note"] = (
            f"full {base.num_hidden_layers}-layer W4A16 model is ~16 GB and"
            " does not fit one v5e HBM; figure is depth-slope extrapolated"
            " from the measured truncated stacks at full E=128 shapes"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
