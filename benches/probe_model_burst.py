"""Model-level escalation of the scan-gather fault repro.

probe_scan_gather_fault.py isolates the paged-gather kernel in
synthetic scan harnesses — all its stages PASS on the current relay,
yet the full serving campaign (bench.py --mode serving) crashes the TPU
worker when decode bursts dispatch the gather kernel. This probe closes
the remaining distance: it runs the REAL serving path (Qwen3-4B dims,
synthetic W4A16 weights, chunked prefill + paged pool + scan decode
bursts via serving.batch_generate) with a layer-count knob, so the
crash can be bisected between "any model burst" and "the 36-layer
program".

    PYTHONPATH=/root/repo:/root/.axon_site timeout 590 \
        python benches/probe_model_burst.py --layers 2 [--walk]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=36)
    p.add_argument("--requests", type=int, default=4)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--burst", type=int, default=16)
    p.add_argument("--max-seq", type=int, default=1280)
    p.add_argument("--walk", action="store_true",
                   help="force the walk kernel (control arm)")
    p.add_argument("--skip-warmup-ladder", action="store_true",
                   help="single long prompts only: no power-of-two prefill "
                        "ladder compiles before the burst")
    a = p.parse_args()

    import os

    if a.walk:
        os.environ["TLT_PAGED_DECODE"] = "walk"

    import jax

    from tiny_llm_tpu.models import (
        QWEN3_CONFIGS,
        Qwen3Model,
        synthetic_quantized_params,
    )
    from tiny_llm_tpu.serving import batch_generate
    from tiny_llm_tpu.tokenizer import ByteTokenizer
    from tiny_llm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"jax {jax.__version__} devices={jax.devices()} "
          f"layers={a.layers} impl={'walk' if a.walk else 'gather'}",
          flush=True)

    base = QWEN3_CONFIGS["qwen3-4b"]
    import dataclasses

    cfg = dataclasses.replace(base, num_hidden_layers=a.layers)
    params = synthetic_quantized_params(cfg, key=0)
    model = Qwen3Model(params, cfg, max_seq_len=a.max_seq, attn_impl="pallas")
    ps = 128
    pages = (a.max_seq // ps) * (a.batch + 2) + 9
    model.enable_paged_attention(num_pages=pages, page_size=ps)

    class NoEosTok(ByteTokenizer):
        eos_token_id = -1

    tok = NoEosTok()
    if not a.skip_warmup_ladder:
        print("warmup (prefill ladder + burst shapes) ...", flush=True)
        batch_generate(
            model, tok, ["x" * 255, "x" * 1024], max_seq_len=a.max_seq,
            batch_size=a.batch, prefill_step=128,
            max_output_tokens=max(8, a.burst), decode_burst=a.burst,
        )
        print("warmup ok", flush=True)

    rng = np.random.default_rng(0)
    lens = rng.integers(128, 1025, size=a.requests)
    prompts = ["x" * int(n) for n in lens]
    print(f"campaign: {a.requests} requests, lens={lens.tolist()} ...",
          flush=True)
    results = batch_generate(
        model, tok, prompts, max_seq_len=a.max_seq, batch_size=a.batch,
        prefill_step=128, max_output_tokens=80, decode_burst=a.burst,
    )
    assert len(results) == a.requests
    print(f"PASS model burst campaign (layers={a.layers}, "
          f"{'walk' if a.walk else 'gather'})", flush=True)


if __name__ == "__main__":
    main()
