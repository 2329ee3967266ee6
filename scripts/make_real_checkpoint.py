#!/usr/bin/env python
"""Build a *genuine* Qwen3 checkpoint artifact without network access.

The reference CI downloads Qwen/Qwen3-0.6B and runs e2e against it
(/root/reference/.github/workflows/macos.yml:17-44); its real-model tests
gate on a local HF cache probe (tests_refsol/utils.py:119-149). This
environment has zero egress, so the artifact is constructed locally from
the *independent* HF `transformers` Qwen3 implementation:

* weights: `transformers.Qwen3ForCausalLM` (or Qwen3MoeForCausalLM),
  seeded random init, saved with `save_pretrained` → real config.json +
  model.safetensors with the real HF key names, shapes, and layout;
* tokenizer: a real byte-level BPE trained with the `tokenizers` library
  on this repository's own documentation/source text, wrapped in
  `PreTrainedTokenizerFast`, with Qwen-style ChatML special tokens
  (<|im_start|>/<|im_end|>/<|endoftext|>) and a ChatML chat template.

What this proves: the loader (models/loader.py), the HF-fast-tokenizer
adapter (tokenizer.py), the chat template path, and quantize-at-load all
work on genuine HF artifacts — key names, shardable safetensors, special
tokens, multi-byte BPE merges.  What it cannot prove (stated per
VERDICT.md #1): numerics against the *trained* Qwen3 weight distribution
(outlier channels, real logit scales) and the production 151k-token
vocabulary — those need the downloadable checkpoint.
"""

from __future__ import annotations

import argparse
import glob
import os

# ChatML template: structurally the Qwen3 conversation format (im_start
# role / content / im_end, generation prompt opens an assistant turn).
CHAT_TEMPLATE = (
    "{%- for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content']"
    " + '<|im_end|>' + '\n' }}"
    "{%- endfor %}"
    "{%- if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{%- endif %}"
)


def _corpus_files(repo_root: str) -> list[str]:
    pats = ["*.md", "docs/*.md", "tiny_llm_tpu/**/*.py", "scripts/*.py"]
    files: list[str] = []
    for p in pats:
        files.extend(glob.glob(os.path.join(repo_root, p), recursive=True))
    return sorted(set(files))


def train_tokenizer(out_dir: str, vocab_size: int = 2048):
    """Train a byte-level BPE on the repo's own text; save HF-fast format."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import PreTrainedTokenizerFast

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    texts = []
    for f in _corpus_files(repo_root):
        try:
            with open(f, encoding="utf-8") as fh:
                texts.append(fh.read())
        except OSError:
            continue
    # A little multilingual/multi-byte text so merges cross UTF-8
    # boundaries (exercises the incremental detokenizer edge cases).
    texts.append("naïve café — 你好世界 こんにちは мир 🌍 émojis\n" * 50)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(texts, trainer=trainer)

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|im_end|>",
        pad_token="<|endoftext|>",
        additional_special_tokens=["<|im_start|>"],
        chat_template=CHAT_TEMPLATE,
    )
    fast.save_pretrained(out_dir)
    return fast


def write_oracle(out_dir: str, max_new_tokens: int = 64) -> None:
    """Greedy-decode reference outputs from the just-saved HF model.

    Saved next to the checkpoint so the JAX tests never import torch:
    torch's OpenMP runtime and XLA:CPU's threadpool deadlock when both
    execute in one process (observed: jax device_get hangs after any
    torch forward), so the oracle is computed here, in the torch-only
    builder subprocess. The oracle is the independent implementation the
    round-1 verdict asked for (reference analog:
    tests_refsol/test_week_1_day_5.py:89-175 comparing vs mlx_lm).
    """
    import json

    import numpy as np
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(out_dir)
    model = AutoModelForCausalLM.from_pretrained(out_dir, dtype=torch.float32).eval()

    messages = [
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user", "content": "Explain paged attention on TPU — 请用中文."},
    ]
    prompt_text = tok.apply_chat_template(
        messages, tokenize=False, add_generation_prompt=True
    )
    prompt_ids = tok.encode(prompt_text, add_special_tokens=False)
    with torch.no_grad():
        full = model.generate(
            torch.tensor([prompt_ids]),
            do_sample=False,
            max_new_tokens=max_new_tokens,
            eos_token_id=None,  # random-init model: take all 64 steps
        )[0].tolist()
        prefix_logits = model(torch.tensor([prompt_ids])).logits[0].numpy()
    greedy_ids = full[len(prompt_ids):]
    assert len(greedy_ids) == max_new_tokens
    os.makedirs(os.path.join(out_dir, "oracle"), exist_ok=True)
    with open(os.path.join(out_dir, "oracle", "greedy.json"), "w") as f:
        json.dump(
            {
                "messages": messages,
                "prompt_text": prompt_text,
                "prompt_ids": prompt_ids,
                "greedy_ids": greedy_ids,
                # full-vocab artifacts: random-init argmax can land on
                # ids above the trained tokenizer's range; decode only
                # the representable ones (parity tests compare ids).
                "greedy_text": tok.decode([i for i in greedy_ids if i < len(tok)]),
            },
            f,
        )
    np.save(
        os.path.join(out_dir, "oracle", "prefix_logits.npy"),
        prefix_logits.astype(np.float32),
    )


def build_checkpoint(
    out_dir: str,
    moe: bool = False,
    seed: int = 0,
    vocab_size: int = 2048,
    num_hidden_layers: int = 4,
    model_vocab_size: int | None = None,
) -> str:
    """Construct tokenizer + seeded random-init Qwen3 weights in out_dir.

    model_vocab_size > len(tokenizer) builds an over-provisioned
    embedding/LM head — the production Qwen3 pattern (151,936 rows vs
    ~151k used ids). Set 151936 to exercise the production
    embedding/LM-head shapes through loader -> forward (VERDICT.md
    round-2 item #5)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    os.makedirs(out_dir, exist_ok=True)
    tok = train_tokenizer(out_dir, vocab_size=vocab_size)
    v = len(tok)  # actual vocab (trainer may undershoot vocab_size)
    if model_vocab_size is not None:
        assert model_vocab_size >= v
        v = model_vocab_size

    torch.manual_seed(seed)
    common = dict(
        vocab_size=v,
        hidden_size=256,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=64,
        intermediate_size=512,
        max_position_embeddings=2048,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        attention_bias=False,
        eos_token_id=tok.eos_token_id,
        # Keep init noise large enough that bf16 logit gaps are resolvable
        # but activations stay well-conditioned through 4 layers.
        initializer_range=0.05,
    )
    if moe:
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

        cfg = Qwen3MoeConfig(
            **common,
            num_experts=8,
            num_experts_per_tok=2,
            moe_intermediate_size=128,
            decoder_sparse_step=1,
            mlp_only_layers=[],
            norm_topk_prob=True,
        )
        model = Qwen3MoeForCausalLM(cfg)
    else:
        model = Qwen3ForCausalLM(Qwen3Config(**common))
    model = model.to(torch.float32).eval()
    model.save_pretrained(out_dir, safe_serialization=True)
    write_oracle(out_dir)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=".artifacts/qwen3-tiny-real")
    ap.add_argument("--moe", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--full-vocab", action="store_true",
        help="production 151,936-row embedding/LM head (2 layers to keep "
             "the artifact small)",
    )
    args = ap.parse_args()
    kw = {}
    if args.full_vocab:
        kw = dict(model_vocab_size=151_936, num_hidden_layers=2)
    path = build_checkpoint(args.out, moe=args.moe, seed=args.seed, **kw)
    print(f"wrote checkpoint to {path}")


if __name__ == "__main__":
    main()
