"""Checkpoint loader round-trip: write a tiny HF-format checkpoint
(config.json + safetensors), load it, and check the model matches the
in-memory original. Covers both BF16 (quantize-at-load) and MLX-4bit
(weight/scales/biases triplet) layouts."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.models import Qwen3Model, load_params, tiny_test_config
from .utils import assert_allclose

safetensors = pytest.importorskip("safetensors.numpy")


def write_checkpoint(tmp_path, cfg, quantized_export: bool):
    rng = np.random.default_rng(0)
    D, Dh, I, V = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size, cfg.vocab_size
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads

    tensors: dict[str, np.ndarray] = {}

    def lin(name, n, k):
        w = (rng.normal(size=(n, k)) * 0.05).astype(np.float32)
        if quantized_export:
            # MLX-style export: affine q4 g128, consecutive little-endian.
            gs = 128
            wg = w.reshape(n, k // gs, gs)
            mx, mn = wg.max(-1), wg.min(-1)
            scale = np.where(mx > mn, (mx - mn) / 15, 1.0).astype(np.float32)
            q = np.clip(np.round((wg - mn[..., None]) / scale[..., None]), 0, 15)
            q = q.reshape(n, k).astype(np.uint32)
            words = np.zeros((n, k // 8), np.uint32)
            for i in range(8):
                words |= q[:, i::8] << (4 * i)
            # careful: MLX packs consecutive values: value 8p+i in nibble i
            words = np.zeros((n, k // 8), np.uint32)
            for pp in range(k // 8):
                for i in range(8):
                    words[:, pp] |= q[:, 8 * pp + i] << (4 * i)
            tensors[f"{name}.weight"] = words
            tensors[f"{name}.scales"] = scale
            tensors[f"{name}.biases"] = mn.astype(np.float32)
        else:
            tensors[f"{name}.weight"] = w
        return w

    def vec(name, dim):
        v = np.ones(dim, np.float32)
        tensors[f"{name}.weight"] = v
        return v

    lin("model.embed_tokens", V, D)
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        lin(f"{p}.self_attn.q_proj", Hq * Dh, D)
        lin(f"{p}.self_attn.k_proj", Hkv * Dh, D)
        lin(f"{p}.self_attn.v_proj", Hkv * Dh, D)
        lin(f"{p}.self_attn.o_proj", D, Hq * Dh)
        vec(f"{p}.self_attn.q_norm", Dh)
        vec(f"{p}.self_attn.k_norm", Dh)
        lin(f"{p}.mlp.gate_proj", I, D)
        lin(f"{p}.mlp.up_proj", I, D)
        lin(f"{p}.mlp.down_proj", D, I)
        vec(f"{p}.input_layernorm", D)
        vec(f"{p}.post_attention_layernorm", D)
    vec("model.norm", D)

    cfg_dict = {
        "num_hidden_layers": cfg.num_hidden_layers,
        "hidden_size": D,
        "num_attention_heads": Hq,
        "num_key_value_heads": Hkv,
        "head_dim": Dh,
        "intermediate_size": I,
        "vocab_size": V,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": True,
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    safetensors.save_file(tensors, str(tmp_path / "model.safetensors"))


@pytest.mark.parametrize("quantized_export", [False, True], ids=["bf16", "mlx4bit"])
def test_load_checkpoint_roundtrip(tmp_path, quantized_export):
    cfg = tiny_test_config(num_hidden_layers=1)
    write_checkpoint(tmp_path, cfg, quantized_export)
    params, loaded_cfg = load_params(str(tmp_path))
    assert loaded_cfg.hidden_size == cfg.hidden_size
    model = Qwen3Model(params, loaded_cfg, max_seq_len=64)
    logits = model(jnp.asarray([[1, 2, 3]], jnp.int32))
    assert logits.shape == (1, 3, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_bf16_vs_mlx_export_agree(tmp_path):
    """Loading the SAME weights via the bf16 path (quantize at load) and
    the MLX-4bit path must give closely matching logits (both are q4 g128
    of identical float weights)."""
    cfg = tiny_test_config(num_hidden_layers=1)
    d1 = tmp_path / "bf16"
    d2 = tmp_path / "mlx"
    d1.mkdir()
    d2.mkdir()
    write_checkpoint(d1, cfg, quantized_export=False)
    write_checkpoint(d2, cfg, quantized_export=True)
    p1, c1 = load_params(str(d1))
    p2, c2 = load_params(str(d2))
    m1 = Qwen3Model(p1, c1, max_seq_len=64)
    m2 = Qwen3Model(p2, c2, max_seq_len=64)
    t = jnp.asarray([[5, 1, 7, 2]], jnp.int32)
    assert_allclose(
        np.asarray(m1(t), np.float32), np.asarray(m2(t), np.float32),
        jnp.bfloat16, atol=0.1,
    )


# ---------------------------------------------------------------------------
# MoE checkpoint loading: MLX switch_mlp stacked export + HF per-expert.
# ---------------------------------------------------------------------------


def _moe_cfg():
    return tiny_test_config(
        num_hidden_layers=1, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=128, norm_topk_prob=True,
    )


def _write_moe_checkpoint(d, cfg, style: str):
    """style: 'hf' per-expert bf16 tensors; 'mlx' stacked 4-bit export."""
    rng = np.random.default_rng(3)
    D, Dh, I, V = cfg.hidden_size, cfg.head_dim, cfg.moe_intermediate_size, cfg.vocab_size
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    tensors = {}

    def dense(name, n, k):
        tensors[f"{name}.weight"] = (rng.normal(size=(n, k)) * 0.05).astype(np.float32)

    def q4_stacked(name, w):
        e, n, k = w.shape
        gs = 128
        wg = w.reshape(e, n, k // gs, gs)
        mx, mn = wg.max(-1), wg.min(-1)
        scale = np.where(mx > mn, (mx - mn) / 15, 1.0).astype(np.float32)
        q = np.clip(np.round((wg - mn[..., None]) / scale[..., None]), 0, 15)
        q = q.reshape(e, n, k).astype(np.uint32)
        words = np.zeros((e, n, k // 8), np.uint32)
        for pp in range(k // 8):
            for i in range(8):
                words[:, :, pp] |= q[:, :, 8 * pp + i] << (4 * i)
        tensors[f"{name}.weight"] = words
        tensors[f"{name}.scales"] = scale
        tensors[f"{name}.biases"] = mn.astype(np.float32)

    dense("model.embed_tokens", V, D)
    p = "model.layers.0"
    dense(f"{p}.self_attn.q_proj", Hq * Dh, D)
    dense(f"{p}.self_attn.k_proj", Hkv * Dh, D)
    dense(f"{p}.self_attn.v_proj", Hkv * Dh, D)
    dense(f"{p}.self_attn.o_proj", D, Hq * Dh)
    tensors[f"{p}.self_attn.q_norm.weight"] = np.ones(Dh, np.float32)
    tensors[f"{p}.self_attn.k_norm.weight"] = np.ones(Dh, np.float32)
    tensors[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
    tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
    tensors["model.norm.weight"] = np.ones(D, np.float32)
    dense(f"{p}.mlp.gate", cfg.num_experts, D)  # router
    E = cfg.num_experts
    # Identical rng draws for both styles: one stacked draw per tensor.
    for name, (n, k) in (("gate_proj", (I, D)), ("up_proj", (I, D)),
                         ("down_proj", (D, I))):
        w = (rng.normal(size=(E, n, k)) * 0.05).astype(np.float32)
        if style == "mlx":
            q4_stacked(f"{p}.mlp.switch_mlp.{name}", w)
        else:
            for e in range(E):
                tensors[f"{p}.mlp.experts.{e}.{name}.weight"] = w[e]
    cfg_d = {
        "num_hidden_layers": cfg.num_hidden_layers,
        "hidden_size": D, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": Dh,
        "intermediate_size": cfg.intermediate_size, "vocab_size": V,
        "rope_theta": 10000, "max_position_embeddings": 256,
        "tie_word_embeddings": True, "rms_norm_eps": 1e-5,
        "num_experts": E, "num_experts_per_tok": cfg.num_experts_per_tok,
        "moe_intermediate_size": I, "norm_topk_prob": True,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg_d, f)
    safetensors.save_file(tensors, os.path.join(d, "model.safetensors"))


@pytest.mark.parametrize("style", ["hf", "mlx"])
def test_moe_checkpoint_loads_and_runs(tmp_path, style):
    from tiny_llm_tpu.models.qwen3 import MoEParams

    cfg = _moe_cfg()
    d = tmp_path / style
    d.mkdir()
    _write_moe_checkpoint(str(d), cfg, style)
    params, lcfg = load_params(str(d))
    assert lcfg.num_experts == cfg.num_experts
    assert isinstance(params.layers[0].mlp, MoEParams)
    model = Qwen3Model(params, lcfg, max_seq_len=64)
    logits = model(jnp.asarray([[3, 1, 4]], jnp.int32))
    arr = np.asarray(logits, np.float32)
    assert arr.shape == (1, 3, cfg.vocab_size)
    assert np.isfinite(arr).all()


def test_moe_hf_vs_mlx_export_agree(tmp_path):
    """The same float experts loaded via per-expert HF tensors
    (quantize-at-load) and via the MLX stacked 4-bit export must agree."""
    cfg = _moe_cfg()
    d1, d2 = tmp_path / "hf", tmp_path / "mlx"
    d1.mkdir(); d2.mkdir()
    _write_moe_checkpoint(str(d1), cfg, "hf")
    _write_moe_checkpoint(str(d2), cfg, "mlx")
    p1, c1 = load_params(str(d1))
    p2, c2 = load_params(str(d2))
    m1 = Qwen3Model(p1, c1, max_seq_len=64)
    m2 = Qwen3Model(p2, c2, max_seq_len=64)
    t = jnp.asarray([[5, 1, 7, 2]], jnp.int32)
    assert_allclose(
        np.asarray(m1(t), np.float32), np.asarray(m2(t), np.float32),
        jnp.bfloat16, atol=0.1,
    )
