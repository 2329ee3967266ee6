"""Checkpoint loading and synthetic initialization.

The reference loads MLX checkpoints via mlx_lm (main.py:97); the TPU-native
equivalent ingests HF safetensors directly (config.json + *.safetensors)
and either keeps BF16 dense weights or quantizes to W4A16 g128 at load
(SURVEY.md §5.4: the added weight-conversion step). `random_params`
builds Qwen3-shaped synthetic checkpoints for tests and benchmarks — the
analog of the reference's tiny_qwen3_mlx_model fixture
(tests_refsol/utils.py:12-69), scaled to any config.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quantize import (
    QuantizedTensor,
    convert_layout,
    from_mlx_packing,
    quantize,
    quantize_stacked,
)
from .qwen3 import (
    AttentionParams,
    BlockParams,
    MLPParams,
    MoEParams,
    Qwen3Config,
    Qwen3Params,
)


def _maybe_quantize(
    w: jax.Array,
    quantized: bool,
    group_size: int,
    bits: int,
    layout: str | None = None,
    dtype=jnp.bfloat16,
):
    if not quantized:
        return w.astype(dtype)
    if w.ndim == 2:
        return quantize(w, group_size=group_size, bits=bits, layout=layout)
    # Stacked expert weights [E, N, K] — both ragged-kernel layouts work;
    # magic_t is the fast one (kernels/moe_matmul.py).
    return quantize_stacked(w, group_size=group_size, bits=bits, layout=layout)


def random_params(
    cfg: Qwen3Config,
    key: jax.Array | int = 0,
    quantized: bool = True,
    group_size: int = 128,
    bits: int = 4,
    scale: float = 0.02,
) -> Qwen3Params:
    """Random Qwen3-shaped params (normal * scale), optionally quantized."""
    if isinstance(key, int):
        key = jax.random.key(key)
    counter = [0]

    def nxt():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def rand(shape):
        return jax.random.normal(nxt(), shape, dtype=jnp.float32) * scale

    def lin(n, k):
        return _maybe_quantize(rand((n, k)), quantized, group_size, bits)

    D = cfg.hidden_size
    Dh = cfg.head_dim
    layers = []
    for i in range(cfg.num_hidden_layers):
        attn = AttentionParams(
            wq=lin(cfg.num_attention_heads * Dh, D),
            wk=lin(cfg.num_key_value_heads * Dh, D),
            wv=lin(cfg.num_key_value_heads * Dh, D),
            wo=lin(D, cfg.num_attention_heads * Dh),
            q_norm=jnp.ones((Dh,), jnp.bfloat16),
            k_norm=jnp.ones((Dh,), jnp.bfloat16),
        )
        if cfg.is_moe_layer(i):
            E, I = cfg.num_experts, cfg.moe_intermediate_size
            mlp = MoEParams(
                w_router=lin(E, D),
                w_gate=_maybe_quantize(rand((E, I, D)), quantized, group_size, bits),
                w_up=_maybe_quantize(rand((E, I, D)), quantized, group_size, bits),
                w_down=_maybe_quantize(rand((E, D, I)), quantized, group_size, bits),
            )
        else:
            mlp = MLPParams(
                w_gate=lin(cfg.intermediate_size, D),
                w_up=lin(cfg.intermediate_size, D),
                w_down=lin(D, cfg.intermediate_size),
            )
        layers.append(
            BlockParams(
                input_layernorm=jnp.ones((D,), jnp.bfloat16),
                post_attention_layernorm=jnp.ones((D,), jnp.bfloat16),
                attn=attn,
                mlp=mlp,
            )
        )
    embedding = _maybe_quantize(
        rand((cfg.vocab_size, D)), quantized, group_size, bits, layout="sg"
    )
    if cfg.tie_word_embeddings:
        # Tied head: keep a magic_t copy so the hot LM-head matvec uses the
        # transposed kernel while the embedding keeps fast row gathers.
        lm_head = (
            convert_layout(embedding, "magic_t")
            if isinstance(embedding, QuantizedTensor) and bits == 4
            else None
        )
    else:
        lm_head = lin(cfg.vocab_size, D)
    return Qwen3Params(
        embedding=embedding,
        layers=tuple(layers),
        final_norm=jnp.ones((D,), jnp.bfloat16),
        lm_head=lm_head,
    )


def synthetic_quantized_params(
    cfg: Qwen3Config, key: jax.Array | int = 0, group_size: int = 128,
    bits: int = 4, layout: str | None = None,
) -> Qwen3Params:
    """Random params in the quantized storage format directly (no float
    master weights, no quantization pass) — fast construction of
    real-architecture models for benchmarking, where only shapes and
    bandwidth matter. Scales are small so activations stay finite.
    `layout` overrides the projection storage layout (e.g. "pair_t" for
    the W4A8 tier) — the packed words are random bits, so constructing
    directly in the target layout is equivalent to converting and costs
    no extra HBM (the 30B a8 bench OOMed holding both layouts)."""
    if isinstance(key, int):
        key = jax.random.key(key)
    counter = [0]

    def nxt():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    from ..ops.quantize import supergroup_values

    sg = supergroup_values(group_size, bits)
    vpw = 32 // bits

    def qlin(*shape, layout: str | None = None):
        *lead, N, K = shape
        if layout is None:
            layout = "magic_t" if (bits == 4 and group_size == 128) else "sg"
        from ..ops.quantize import MAGIC_SUPERGROUP

        pad_to = MAGIC_SUPERGROUP if layout == "magic_t" else sg
        k_padded = ((K + pad_to - 1) // pad_to) * pad_to
        if layout == "magic_t":
            packed = jax.random.bits(
                nxt(), (*lead, k_padded // vpw, N), dtype=jnp.uint32
            )
            scales = (
                jax.random.uniform(nxt(), (*lead, k_padded // group_size, N)) * 0.004
                + 0.001
            ).astype(jnp.bfloat16)
            biases = (-7.5 * scales.astype(jnp.float32)).astype(jnp.bfloat16)
        else:
            packed = jax.random.bits(
                nxt(), (*lead, N, k_padded // vpw), dtype=jnp.uint32
            )
            scales = (
                jax.random.uniform(nxt(), (*lead, N, k_padded // group_size)) * 0.004
                + 0.001
            ).astype(jnp.bfloat16)
            biases = (-7.5 * scales).astype(jnp.bfloat16)
        return QuantizedTensor(
            packed=packed,
            scales=scales,
            biases=biases,
            group_size=group_size,
            bits=bits,
            out_features=N,
            in_features=K,
            k_padded=k_padded,
            layout=layout,
        )

    D, Dh = cfg.hidden_size, cfg.head_dim
    layers = []
    for i in range(cfg.num_hidden_layers):
        attn = AttentionParams(
            wq=qlin(cfg.num_attention_heads * Dh, D),
            wk=qlin(cfg.num_key_value_heads * Dh, D),
            wv=qlin(cfg.num_key_value_heads * Dh, D),
            wo=qlin(D, cfg.num_attention_heads * Dh),
            q_norm=jnp.ones((Dh,), jnp.bfloat16),
            k_norm=jnp.ones((Dh,), jnp.bfloat16),
        )
        if cfg.is_moe_layer(i):
            E, I = cfg.num_experts, cfg.moe_intermediate_size
            mlp = MoEParams(
                # Router + LM head keep full W4A16 numerics whatever
                # proj_layout says (routing/logit precision; mirrors
                # models/qwen3.py convert_projection_layouts).
                w_router=qlin(
                    E, D,
                    layout="magic_t"
                    if (bits == 4 and group_size == 128)
                    else "sg",
                ),
                w_gate=qlin(E, I, D),
                w_up=qlin(E, I, D),
                w_down=qlin(E, D, I),
            )
        else:
            mlp = MLPParams(
                w_gate=qlin(cfg.intermediate_size, D),
                w_up=qlin(cfg.intermediate_size, D),
                w_down=qlin(D, cfg.intermediate_size),
            )
        layers.append(
            BlockParams(
                input_layernorm=jnp.ones((D,), jnp.bfloat16),
                post_attention_layernorm=jnp.ones((D,), jnp.bfloat16),
                attn=attn,
                mlp=mlp,
            )
        )
    embedding = qlin(cfg.vocab_size, D, layout="sg")
    if cfg.tie_word_embeddings:
        lm_head = (
            convert_layout(embedding, "magic_t")
            if bits == 4 and group_size == 128
            else None
        )
    else:
        lm_head = qlin(
            cfg.vocab_size, D,
            layout="magic_t" if (bits == 4 and group_size == 128) else "sg",
        )
    return Qwen3Params(
        embedding=embedding,
        layers=tuple(layers),
        final_norm=jnp.ones((D,), jnp.bfloat16),
        lm_head=lm_head,
    )


def tiny_test_config(num_hidden_layers: int = 1, **overrides) -> Qwen3Config:
    """The reference's fake-checkpoint shape (tests_refsol/utils.py:26-38)."""
    d = dict(
        num_hidden_layers=num_hidden_layers,
        hidden_size=128,
        vocab_size=128,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=64,
        intermediate_size=128,
        rms_norm_eps=1e-5,
        max_position_embeddings=256,
        rope_theta=10000,
        tie_word_embeddings=True,
    )
    d.update(overrides)
    return Qwen3Config(**d)


# ---------------------------------------------------------------------------
# HF checkpoint loading (safetensors). Supports BF16 checkpoints
# (quantize at load) and MLX-4bit exports (weight/scales/biases triplets).
# ---------------------------------------------------------------------------


def _load_moe_mlp(t, p, cfg, quantized, group_size, bits, dtype=jnp.bfloat16):
    """MoE layer from either checkpoint convention:

    * MLX switch_mlp export (reference qwen3_week3.py:258-272): stacked
      `{p}.mlp.switch_mlp.{gate,up,down}_proj` tensors [E, N, K(/8)], plus
      `{p}.mlp.gate` router.
    * HF transformers: per-expert `{p}.mlp.experts.{e}.{name}.weight`.
    """
    import jax.numpy as jnp

    from ..ops.quantize import from_mlx_packing, from_mlx_packing_stacked

    E = cfg.num_experts

    def router():
        prefix = f"{p}.mlp.gate"
        if f"{prefix}.scales" in t:
            return from_mlx_packing(
                jnp.asarray(t[f"{prefix}.weight"]),
                jnp.asarray(t[f"{prefix}.scales"]),
                jnp.asarray(t[f"{prefix}.biases"]),
                group_size,
                bits,
            )
        w = jnp.asarray(np.asarray(t[f"{prefix}.weight"]).astype(np.float32))
        # Router stays dense: E x D is tiny and routing logits are
        # precision-sensitive (argpartition boundaries).
        return w.astype(dtype)

    sw = f"{p}.mlp.switch_mlp"

    def stacked(name: str):
        key = f"{sw}.{name}.weight"
        if key in t:
            if f"{sw}.{name}.scales" in t:
                return from_mlx_packing_stacked(
                    jnp.asarray(t[key]),
                    jnp.asarray(t[f"{sw}.{name}.scales"]),
                    jnp.asarray(t[f"{sw}.{name}.biases"]),
                    group_size,
                    bits,
                )
            w = jnp.asarray(np.asarray(t[key]).astype(np.float32))
        else:  # HF per-expert tensors
            w = jnp.asarray(
                np.stack(
                    [
                        np.asarray(t[f"{p}.mlp.experts.{e}.{name}.weight"]).astype(
                            np.float32
                        )
                        for e in range(E)
                    ]
                )
            )
        return _maybe_quantize(w, quantized, group_size, bits, dtype=dtype)

    return MoEParams(
        w_router=router(),
        w_gate=stacked("gate_proj"),
        w_up=stacked("up_proj"),
        w_down=stacked("down_proj"),
    )


def load_config(model_dir: str) -> Qwen3Config:
    with open(os.path.join(model_dir, "config.json")) as f:
        return Qwen3Config.from_hf_dict(json.load(f))


def _load_safetensors(model_dir: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    for name in sorted(os.listdir(model_dir)):
        if not name.endswith(".safetensors"):
            continue
        with safe_open(os.path.join(model_dir, name), framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    if not tensors:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    return tensors


def load_params(
    model_dir: str,
    cfg: Qwen3Config | None = None,
    quantized: bool = True,
    group_size: int = 128,
    bits: int = 4,
    dtype=jnp.bfloat16,
) -> tuple[Qwen3Params, Qwen3Config]:
    """Load a HF-format Qwen3 checkpoint into a params pytree.

    `dtype` applies to dense (non-quantized) weights and norm vectors:
    bfloat16 for serving; float32 for oracle-equivalence tests against an
    independent f32 reference forward (VERDICT.md round-1 item #1)."""
    cfg = cfg or load_config(model_dir)
    t = _load_safetensors(model_dir)

    def get_linear(prefix: str, layout: str | None = None):
        w_key = f"{prefix}.weight"
        if f"{prefix}.scales" in t:
            # MLX 4-bit export: uint32 weight + scales + biases.
            return from_mlx_packing(
                jnp.asarray(t[w_key]),
                jnp.asarray(t[f"{prefix}.scales"]),
                jnp.asarray(t[f"{prefix}.biases"]),
                group_size,
                bits,
                layout=layout,
            )
        w = jnp.asarray(np.asarray(t[w_key]).astype(np.float32))
        return _maybe_quantize(w, quantized, group_size, bits, layout=layout, dtype=dtype)

    def get_array(name: str) -> jax.Array:
        return jnp.asarray(np.asarray(t[name]).astype(np.float32)).astype(dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        attn = AttentionParams(
            wq=get_linear(f"{p}.self_attn.q_proj"),
            wk=get_linear(f"{p}.self_attn.k_proj"),
            wv=get_linear(f"{p}.self_attn.v_proj"),
            wo=get_linear(f"{p}.self_attn.o_proj"),
            q_norm=get_array(f"{p}.self_attn.q_norm.weight"),
            k_norm=get_array(f"{p}.self_attn.k_norm.weight"),
        )
        if cfg.is_moe_layer(i):
            mlp = _load_moe_mlp(t, p, cfg, quantized, group_size, bits, dtype=dtype)
        else:
            mlp = MLPParams(
                w_gate=get_linear(f"{p}.mlp.gate_proj"),
                w_up=get_linear(f"{p}.mlp.up_proj"),
                w_down=get_linear(f"{p}.mlp.down_proj"),
            )
        layers.append(
            BlockParams(
                input_layernorm=get_array(f"{p}.input_layernorm.weight"),
                post_attention_layernorm=get_array(
                    f"{p}.post_attention_layernorm.weight"
                ),
                attn=attn,
                mlp=mlp,
            )
        )
    embedding = get_linear("model.embed_tokens", layout="sg")
    if cfg.tie_word_embeddings:
        lm_head = (
            convert_layout(embedding, "magic_t")
            if isinstance(embedding, QuantizedTensor)
            and embedding.bits == 4
            and embedding.group_size == 128
            else None
        )
    else:
        lm_head = get_linear("lm_head")
    params = Qwen3Params(
        embedding=embedding,
        layers=tuple(layers),
        final_norm=get_array("model.norm.weight"),
        lm_head=lm_head,
    )
    return params, cfg
