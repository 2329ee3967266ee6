"""Multi-device sharding tests on the forced 8-device CPU mesh.

The distributed analog of the reference's cross-implementation equality
tests (SURVEY.md §4): sharded execution must produce the same logits as
single-device execution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tiny_llm_tpu.models import Qwen3Model, Qwen3Config, random_params
from tiny_llm_tpu.parallel import (
    ShardingConfig,
    make_mesh,
    param_shardings,
    shard_params,
)
from tiny_llm_tpu.parallel.sharding import kv_cache_spec, shard_kv_cache
from .utils import assert_allclose

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tp_config():
    return Qwen3Config(
        num_hidden_layers=2,
        hidden_size=256,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=64,
        intermediate_size=512,
        vocab_size=512,
        rope_theta=10000.0,
        max_position_embeddings=128,
    )


@pytest.mark.parametrize("quantized", [False, True], ids=["dense", "quant"])
def test_tp_sharded_logits_match_single_device(quantized):
    cfg = tp_config()
    params = random_params(cfg, key=0, quantized=quantized)
    single = Qwen3Model(params, cfg, max_seq_len=128, attn_impl="xla")
    tokens = jnp.asarray([[5, 3, 8, 1, 9, 2]], jnp.int32)
    base = np.asarray(single.forward_full(tokens), np.float32)

    mesh = make_mesh(dp=1, tp=8)
    scfg = ShardingConfig(mesh)
    sharded_params = shard_params(params, scfg)
    tp_model = Qwen3Model(sharded_params, cfg, max_seq_len=128, attn_impl="xla")
    got = np.asarray(tp_model.forward_full(tokens), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)


def test_tp_sharding_specs_cover_params():
    """Every leaf gets a spec with the expected partitioned axes."""
    cfg = tp_config()
    params = random_params(cfg, key=0, quantized=True)
    specs = param_shardings(params, ShardingConfig(make_mesh(dp=1, tp=8)))
    layer = specs.layers[0]
    # magic_t stores weights transposed ([K*, N]): logical N-sharding lands
    # on the second (lane) axis, K-sharding on the first.
    assert layer.attn.wq.packed == P(None, "tp")
    assert layer.attn.wo.packed == P("tp", None)
    assert layer.mlp.w_gate.packed == P(None, "tp")
    assert layer.mlp.w_down.packed == P("tp", None)
    assert layer.input_layernorm == P(None)


def test_tp_cached_decode_matches_single_device():
    cfg = tp_config()
    params = random_params(cfg, key=1, quantized=False)
    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    ids = [5, 3, 8, 1, 9, 2, 7, 4]
    tokens = jnp.asarray([ids], jnp.int32)
    sc = single.create_kv_cache()
    single(tokens[:, :5], 0, sc)
    base = np.asarray(
        single(tokens[:, 5:6], 5, sc, logits_to_keep=1), np.float32
    )

    mesh = make_mesh(dp=1, tp=8)
    scfg = ShardingConfig(mesh)
    tp_model = Qwen3Model(shard_params(params, scfg), cfg, max_seq_len=64,
                          attn_impl="xla")
    tc = tp_model.create_kv_cache()
    shard_kv_cache(tc, scfg)
    tp_model(tokens[:, :5], 0, tc)
    got = np.asarray(tp_model(tokens[:, 5:6], 5, tc, logits_to_keep=1), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)
    # KV stays sharded over heads after the step (the compiler may drop
    # size-1/replicated axes like dp=1 from the reported spec).
    spec = tuple(tc.keys.sharding.spec) + (None,) * 5
    assert spec[2] == "tp", spec


def test_dp_mesh_batch_sharding():
    """dp=2 x tp=4: batched forward with batch sharded over dp."""
    cfg = tp_config()
    params = random_params(cfg, key=2, quantized=False)
    mesh = make_mesh(dp=2, tp=4)
    scfg = ShardingConfig(mesh)
    model = Qwen3Model(shard_params(params, scfg), cfg, max_seq_len=64,
                       attn_impl="xla")
    tokens = jnp.asarray([[5, 3, 8], [1, 9, 2]], jnp.int32)
    tokens = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    out = model.forward_full(tokens)
    assert out.shape == (2, 3, cfg.vocab_size)
    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    base = np.asarray(single.forward_full(jnp.asarray([[5, 3, 8], [1, 9, 2]])), np.float32)
    assert_allclose(np.asarray(out, np.float32), base, jnp.bfloat16, atol=5e-2)


def test_sequence_parallel_kv_decode_matches_single_device():
    """SP/CP: KV sharded along the SEQUENCE axis (the north-star 32K
    config, SURVEY.md §2.8). Under GSPMD the online-softmax reductions
    over the sharded axis lower to cross-shard collectives — numerics
    must match the single-device result exactly (the cross-shard combine
    is the reference decode kernels' cross-simdgroup merge rule)."""
    cfg = tp_config()
    params = random_params(cfg, key=3, quantized=False)
    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    ids = [5, 3, 8, 1, 9, 2, 7, 4]
    tokens = jnp.asarray([ids], jnp.int32)
    sc = single.create_kv_cache()
    single(tokens[:, :7], 0, sc)
    base = np.asarray(single(tokens[:, 7:8], 7, sc, logits_to_keep=1), np.float32)

    mesh = make_mesh(dp=1, tp=8)
    sp_model = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    tc = sp_model.create_kv_cache()
    kv_shard = NamedSharding(mesh, P(None, None, None, "tp", None))  # S axis
    tc.keys = jax.device_put(tc.keys, kv_shard)
    tc.values = jax.device_put(tc.values, kv_shard)
    sp_model(tokens[:, :7], 0, tc)
    got = np.asarray(sp_model(tokens[:, 7:8], 7, tc, logits_to_keep=1), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)


def test_expert_parallel_moe_matches_single_device():
    """EP: experts sharded over the mesh; routing + grouped matmul under
    GSPMD must match the single-device MoE layer."""
    from tiny_llm_tpu.models import tiny_test_config

    cfg = tiny_test_config(
        num_hidden_layers=1,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=128,
        norm_topk_prob=True,
    )
    params = random_params(cfg, key=4, quantized=True)
    single = Qwen3Model(params, cfg, max_seq_len=32)
    tokens = jnp.asarray([[5, 3, 8, 1]], jnp.int32)
    base = np.asarray(single.forward_full(tokens), np.float32)

    mesh = make_mesh(dp=1, tp=8)
    scfg = ShardingConfig(mesh)
    ep_model = Qwen3Model(shard_params(params, scfg), cfg, max_seq_len=32)
    got = np.asarray(ep_model.forward_full(tokens), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)


def _a3b_shaped_config(layers=2):
    """30B-A3B architecture scaled down: GQA (8q/4kv) + QK-norm + MoE on
    every layer, head/expert/feature counts divisible for a
    (dp=1, ep=2, tp=4) mesh — the north-star config-#5 shape."""
    return Qwen3Config(
        num_hidden_layers=layers,
        hidden_size=256,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=64,
        intermediate_size=512,
        vocab_size=512,
        rope_theta=10000.0,
        max_position_embeddings=128,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=512,
        norm_topk_prob=True,
    )


@pytest.mark.parametrize("quantized", [False, True], ids=["dense", "quant"])
def test_composed_ep_tp_moe_matches_single_device(quantized):
    """Round-5 (VERDICT r4 weak #5): composed EP x TP — experts sharded
    over a dedicated `ep` mesh axis AND each expert's rows/cols sharded
    over `tp`, attention TP-sharded on the same mesh. Full-forward and
    decoded-KV-step logits must match single-device execution."""
    cfg = _a3b_shaped_config()
    params = random_params(cfg, key=6, quantized=quantized)
    single = Qwen3Model(params, cfg, max_seq_len=32, attn_impl="xla")
    tokens = jnp.asarray([[5, 3, 8, 1]], jnp.int32)
    base = np.asarray(single.forward_full(tokens), np.float32)

    mesh = make_mesh(dp=1, ep=2, tp=4)
    assert mesh.shape == {"dp": 1, "ep": 2, "tp": 4}
    scfg = ShardingConfig(mesh, ep_axis="ep")
    model = Qwen3Model(
        shard_params(params, scfg), cfg, max_seq_len=32, attn_impl="xla"
    )
    got = np.asarray(model.forward_full(tokens), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)

    # Decode step with the TP-sharded KV slab (heads on tp).
    sc = single.create_kv_cache()
    single(tokens, 0, sc)
    base_step = np.asarray(
        single(jnp.asarray([[7]], jnp.int32), 4, sc, logits_to_keep=1),
        np.float32,
    )
    mc = model.create_kv_cache()
    kv_shard = NamedSharding(mesh, kv_cache_spec(scfg))
    mc.keys = jax.device_put(mc.keys, kv_shard)
    mc.values = jax.device_put(mc.values, kv_shard)
    model(tokens, 0, mc)
    got_step = np.asarray(
        model(jnp.asarray([[7]], jnp.int32), 4, mc, logits_to_keep=1),
        np.float32,
    )
    assert_allclose(got_step, base_step, jnp.bfloat16, atol=5e-2)


def test_composed_ep_tp_specs_place_expert_and_feature_axes():
    """The composed spec must put the expert axis on ep and the per-expert
    feature axes on tp (gate/up row-parallel, down column-parallel)."""
    cfg = _a3b_shaped_config(layers=1)
    params = random_params(cfg, key=6, quantized=False)
    mesh = make_mesh(dp=1, ep=2, tp=4)
    specs = param_shardings(params, ShardingConfig(mesh, ep_axis="ep"))
    mlp = specs.layers[0].mlp
    assert mlp.w_gate == P("ep", "tp", None)
    assert mlp.w_up == P("ep", "tp", None)
    assert mlp.w_down == P("ep", None, "tp")
    # Without ep_axis the round-1 rule stands: experts over tp alone.
    specs1 = param_shardings(params, ShardingConfig(make_mesh(dp=1, tp=8)))
    assert specs1.layers[0].mlp.w_gate == P("tp", None, None)


def test_speculative_under_composed_ep_tp_target():
    """North-star pairing: speculative decoding with a small dense draft
    under the EP x TP-sharded MoE target. Greedy speculation is lossless,
    so the emitted text must token-equal BOTH the sharded target's own
    greedy continuation and the single-device speculative run."""
    from tiny_llm_tpu.generate import (
        simple_generate_with_kv_cache,
        speculative_generate,
    )
    from tiny_llm_tpu.models import tiny_test_config
    from .utils import FakeTokenizer

    cfg = _a3b_shaped_config()
    params = random_params(cfg, key=8, quantized=False)
    dcfg = tiny_test_config(num_hidden_layers=1)
    draft = Qwen3Model(random_params(dcfg, key=9), dcfg, max_seq_len=64)
    tok = FakeTokenizer()

    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    want_greedy = simple_generate_with_kv_cache(single, tok, "hello", max_tokens=8)
    want_spec = speculative_generate(
        draft, single, tok, tok, "hello", proposal_length=3, max_tokens=8,
        auto_disable=False,
    )
    assert want_spec == want_greedy  # losslessness on the single device

    mesh = make_mesh(dp=1, ep=2, tp=4)
    scfg = ShardingConfig(mesh, ep_axis="ep")
    target = Qwen3Model(
        shard_params(params, scfg), cfg, max_seq_len=64, attn_impl="xla"
    )
    got = speculative_generate(
        draft, target, tok, tok, "hello", proposal_length=3, max_tokens=8,
        auto_disable=False,
    )
    assert got == want_spec


def test_dryrun_multichip_entrypoint():
    """The driver's dryrun hook must compile+run on the virtual mesh."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_pipeline_parallel_matches_single_device():
    """Layer-stage PP across 4 devices must reproduce single-device
    logits; only the residual stream crosses stages."""
    from tiny_llm_tpu.parallel.pipeline import PipelinedQwen3, split_stages

    cfg = tp_config()
    params = random_params(cfg, key=5, quantized=True)
    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    tokens = jnp.asarray([[5, 3, 8, 1, 9]], jnp.int32)
    base = np.asarray(single.forward_full(tokens), np.float32)

    stages = split_stages(params, 2)
    assert sum(len(s) for s in stages) == cfg.num_hidden_layers
    pp = PipelinedQwen3(params, cfg, devices=jax.devices()[:2], num_stages=2)
    got = np.asarray(pp(tokens), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)
    # Stage params actually live on distinct devices.
    d0 = next(iter(jax.tree.leaves(pp._stages[0][1]))).devices()
    d1 = next(iter(jax.tree.leaves(pp._stages[1][1]))).devices()
    assert d0 != d1


def test_tp_pallas_attention_dense_matches_single_device():
    """shard_map'd Pallas flash attention under TP (interpret mode on the
    CPU mesh): sharded cached decode must match single-device XLA logits.
    This is the plumbing that lets the single-chip Pallas kernels run
    under tensor parallelism (GSPMD cannot partition a pallas_call)."""
    from tiny_llm_tpu.parallel import TPAttention

    cfg = tp_config()
    params = random_params(cfg, key=6, quantized=False)
    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    ids = [5, 3, 8, 1, 9, 2, 7, 4]
    tokens = jnp.asarray([ids], jnp.int32)
    sc = single.create_kv_cache()
    single(tokens[:, :5], 0, sc)
    base = np.asarray(single(tokens[:, 5:6], 5, sc, logits_to_keep=1), np.float32)

    mesh = make_mesh(dp=1, tp=8)
    scfg = ShardingConfig(mesh)
    attn = TPAttention(scfg, inner="pallas", interpret=True)
    tp_model = Qwen3Model(shard_params(params, scfg), cfg, max_seq_len=64,
                          attn_impl=attn)
    tc = tp_model.create_kv_cache()
    shard_kv_cache(tc, scfg)
    tp_model(tokens[:, :5], 0, tc)
    got = np.asarray(tp_model(tokens[:, 5:6], 5, tc, logits_to_keep=1), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)


def test_tp_pallas_attention_paged_matches_single_device():
    """shard_map'd Pallas PAGED attention under TP: page pool sharded on
    the KV-head axis, block table replicated."""
    from tiny_llm_tpu.parallel import TPAttention
    from tiny_llm_tpu.parallel.tp_kernels import paged_pool_spec
    from jax.sharding import NamedSharding

    cfg = tp_config()
    params = random_params(cfg, key=7, quantized=False)
    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    single.enable_paged_attention(num_pages=32, page_size=8)
    ids = [5, 3, 8, 1, 9, 2, 7, 4]
    tokens = jnp.asarray([ids], jnp.int32)
    sc = single.create_kv_cache()
    single(tokens[:, :5], 0, sc)
    base = np.asarray(single(tokens[:, 5:6], 5, sc, logits_to_keep=1), np.float32)

    mesh = make_mesh(dp=1, tp=8)
    scfg = ShardingConfig(mesh)
    attn = TPAttention(scfg, inner="pallas", interpret=True)
    tp_model = Qwen3Model(shard_params(params, scfg), cfg, max_seq_len=64,
                          attn_impl=attn)
    tp_model.enable_paged_attention(num_pages=32, page_size=8)
    pool = tp_model.page_pool
    pool_sharding = NamedSharding(mesh, paged_pool_spec(scfg))
    pool.update_tensors(
        jax.device_put(pool.key_pages, pool_sharding),
        jax.device_put(pool.value_pages, pool_sharding),
    )
    tc = tp_model.create_kv_cache()
    tp_model(tokens[:, :5], 0, tc)
    got = np.asarray(tp_model(tokens[:, 5:6], 5, tc, logits_to_keep=1), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)


@pytest.mark.parametrize("quantized", [False, True], ids=["dense", "quant"])
@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 4)])
def test_microbatched_pipeline_matches_single_device(quantized, stages, microbatches):
    """GPipe-scheduled PP (shard_map + ppermute rotation): logits must
    match the single-device forward for every (S, M) schedule shape."""
    from tiny_llm_tpu.parallel.pipeline import MicrobatchedPipeline

    cfg = Qwen3Config(
        num_hidden_layers=4, hidden_size=256, num_attention_heads=8,
        num_key_value_heads=8, head_dim=64, intermediate_size=512,
        vocab_size=512, rope_theta=10000.0, max_position_embeddings=128,
    )
    params = random_params(cfg, key=8, quantized=quantized)
    single = Qwen3Model(params, cfg, max_seq_len=128, attn_impl="xla")
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 512, size=(8, 6)), jnp.int32
    )
    base = np.asarray(single.forward_full(tokens), np.float32)
    pp = MicrobatchedPipeline(
        params, cfg, num_stages=stages, num_microbatches=microbatches
    )
    got = np.asarray(pp(tokens), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)
    # Stage params are actually sharded over the pp mesh axis.
    leaf = jax.tree.leaves(pp._layers)[0]
    assert len(leaf.sharding.device_set) == stages


# ---------------------------------------------------------------------------
# Sequence-parallel sharded-KV decode (parallel/sp_attention.py)
# ---------------------------------------------------------------------------


def _sp_setup(S=64, L=1):
    B, Hq, Hkv, D = 2, 8, 4, 64
    key = jax.random.key(11)
    q = jax.random.normal(key, (B, Hq, L, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, Hkv, S, D), jnp.bfloat16)
    lens = jnp.asarray([S - 3, S // 2 - 1][:B], jnp.int32)
    return q, k, v, lens


@pytest.mark.parametrize("inner", ["xla", "pallas"])
def test_sp_decode_matches_single_device(inner):
    """Sharded-KV decode with cross-shard softmax combine == unsharded
    flash decode, per-row lengths crossing shard boundaries."""
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.parallel import SPAttention

    q, k, v, lens = _sp_setup()
    ref = flash_attention(q, k, v, mask="causal", lens=lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    sp = SPAttention(scfg, inner=inner, interpret=True)
    got = sp.flash(q, k, v, mask="causal", lens=lens)
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        jnp.bfloat16, atol=5e-2,
    )


def test_sp_decode_zero_length_shards():
    """Rows whose context lives entirely in the first shard: later shards
    contribute the combine identity (no NaNs)."""
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.parallel import SPAttention

    q, k, v, _ = _sp_setup()
    lens = jnp.asarray([5, 2], jnp.int32)  # both inside shard 0 (S_loc=8)
    ref = flash_attention(q, k, v, mask="causal", lens=lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    got = SPAttention(scfg, inner="xla").flash(q, k, v, mask="causal", lens=lens)
    arr = np.asarray(got, np.float32)
    assert np.isfinite(arr).all()
    assert_allclose(arr, np.asarray(ref, np.float32), jnp.bfloat16, atol=5e-2)


@pytest.mark.parametrize("inner", ["xla", "pallas", "gather"])
def test_sp_prefill_chunk_matches_single_device(inner):
    """Sharded prefill (state combine per KV shard with virtual lengths;
    'gather' = legacy all-gather path) == unsharded causal flash. The
    chunk spans shard boundaries: row 0's queries live in shards 6-7
    (earlier shards contribute non-causal full-visibility states), row
    1's in shards 3-4."""
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.parallel import SPAttention

    q, k, v, lens = _sp_setup(L=8)
    ref = flash_attention(q, k, v, mask="causal", lens=lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    got = SPAttention(scfg, inner=inner, interpret=True).flash(
        q, k, v, mask="causal", lens=lens
    )
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        jnp.bfloat16, atol=5e-2,
    )


@pytest.mark.parametrize("inner", ["xla", "pallas"])
def test_sp_prefill_chunk_inside_first_shard(inner):
    """A chunk whose whole context fits in shard 0: every other shard
    must emit the identity state (fully-masked query rows, the
    _flash_inner underflow guard), no NaNs."""
    from tiny_llm_tpu.kernels.flash_attention import flash_attention
    from tiny_llm_tpu.parallel import SPAttention

    q, k, v, _ = _sp_setup(L=4)
    lens = jnp.asarray([7, 5], jnp.int32)  # inside shard 0 (S_loc=8)
    ref = flash_attention(q, k, v, mask="causal", lens=lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    got = SPAttention(scfg, inner=inner, interpret=True).flash(
        q, k, v, mask="causal", lens=lens
    )
    arr = np.asarray(got, np.float32)
    assert np.isfinite(arr).all()
    assert_allclose(arr, np.asarray(ref, np.float32), jnp.bfloat16, atol=5e-2)


def test_flash_decode_state_matches_xla_oracle():
    from tiny_llm_tpu.kernels.flash_attention_pallas import (
        flash_decode_state_pallas,
    )
    from tiny_llm_tpu.parallel.sp_attention import decode_state_xla

    q, k, v, lens = _sp_setup()
    scale = q.shape[-1] ** -0.5
    o1, m1, l1 = flash_decode_state_pallas(q, k, v, lens, scale=scale, interpret=True)
    o2, m2, l2 = decode_state_xla(q, k, v, lens, scale)
    assert_allclose(np.asarray(o1, np.float32), np.asarray(o2, np.float32),
                    jnp.bfloat16, atol=5e-2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# Sequence-sharded PAGED decode (distributed paged-KV pool, SURVEY §2.8)
# ---------------------------------------------------------------------------


def _sp_paged_setup(P=16, Hq=4, Hkv=2, ps=8, D=64, L=1):
    """Two requests with non-contiguous global pages spanning shards
    (P=16 over 8 shards -> 2 pages/shard): row 0 uses pages 5,2,7,9
    (19 tokens + L), row 1 pages 1,12 (10 tokens + L); -1 padding."""
    rng = np.random.default_rng(13)
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.float32)
    table = jnp.asarray([[5, 2, 7, 9], [1, 12, -1, -1]], jnp.int32)
    lens = jnp.asarray([19 + L, 10 + L], jnp.int32)
    q = jnp.asarray(rng.normal(size=(2, Hq, L, D)), jnp.float32)
    return q, kp, vp, table, lens


@pytest.mark.parametrize("inner", ["xla", "pallas"])
def test_sp_paged_decode_matches_unsharded(inner):
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.parallel import SPAttention

    q, kp, vp, table, lens = _sp_paged_setup()
    ref = paged_attention(q, kp, vp, table, lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    sp = SPAttention(scfg, inner=inner, interpret=True)
    got = sp.paged(q, kp, vp, table, lens)
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        jnp.bfloat16, atol=5e-2,
    )


def test_sp_paged_decode_single_shard_row():
    """A row whose every page lives on ONE shard: all other shards emit
    the identity state; no NaNs."""
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.parallel import SPAttention

    rng = np.random.default_rng(14)
    P, Hq, Hkv, ps, D = 16, 4, 2, 8, 64
    kp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Hkv, ps, D)), jnp.float32)
    table = jnp.asarray([[2, 3, -1]], jnp.int32)  # both pages on shard 1
    lens = jnp.asarray([13], jnp.int32)
    q = jnp.asarray(rng.normal(size=(1, Hq, 1, D)), jnp.float32)
    ref = paged_attention(q, kp, vp, table, lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    got = SPAttention(scfg, inner="xla").paged(q, kp, vp, table, lens)
    arr = np.asarray(got, np.float32)
    assert np.isfinite(arr).all()
    assert_allclose(arr, np.asarray(ref, np.float32), jnp.bfloat16, atol=5e-2)


def test_sp_paged_prefill_chunk_gathers():
    """L > 16 chunks take the all-gather fallback and still match."""
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.parallel import SPAttention

    q, kp, vp, table, lens = _sp_paged_setup(L=24)
    ref = paged_attention(q, kp, vp, table, lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=1, tp=8))
    got = SPAttention(scfg, inner="xla").paged(q, kp, vp, table, lens)
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        jnp.bfloat16, atol=5e-2,
    )


def test_paged_decode_state_pallas_matches_oracle():
    from tiny_llm_tpu.kernels.paged_attention_pallas import paged_decode_state
    from tiny_llm_tpu.parallel.sp_attention import paged_decode_state_xla

    q, kp, vp, table, lens = _sp_paged_setup()
    scale = q.shape[-1] ** -0.5
    P_loc = 4  # pretend 4 shards of 4 pages; test shard 1 (pages 4..7)
    kp_loc, vp_loc = kp[4:8], vp[4:8]
    o1, m1, l1 = paged_decode_state(
        q, kp_loc, vp_loc, table, lens, jnp.int32(4), scale=scale,
        interpret=True,
    )
    o2, m2, l2 = paged_decode_state_xla(
        q, kp_loc, vp_loc, table, lens, 4, scale
    )
    assert_allclose(np.asarray(o1, np.float32), np.asarray(o2, np.float32),
                    jnp.bfloat16, atol=5e-2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=3e-2,
                               atol=3e-2)


# ---------------------------------------------------------------------------
# Data parallelism (VERDICT round-1 item #6)
# ---------------------------------------------------------------------------


def test_dp_serving_batch_generate_matches_single_device():
    """Full continuous-batching run with the decode batch sharded over a
    (dp=2, tp=4) mesh must produce the exact texts of the single-device
    run — the reference scheduler slot semantics (batch.py:120-221) are
    preserved under replica sharding."""
    from tiny_llm_tpu.serving.batch import batch_generate
    from tiny_llm_tpu.parallel import DPServing
    from .utils import FakeTokenizer

    cfg = tp_config()
    params = random_params(cfg, key=0, quantized=False)
    tok = FakeTokenizer()
    prompts = [f"prompt number {i} padding" for i in range(6)]

    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    want = sorted(
        batch_generate(single, tok, list(prompts), max_seq_len=64,
                       batch_size=4, prefill_step=8, max_output_tokens=5)
    )

    mesh = make_mesh(dp=2, tp=4)
    scfg = ShardingConfig(mesh)
    model = Qwen3Model(
        shard_params(params, scfg), cfg, max_seq_len=64, attn_impl="xla"
    )
    dp_model = DPServing(model, scfg)
    got = sorted(
        batch_generate(dp_model, tok, list(prompts), max_seq_len=64,
                       batch_size=4, prefill_step=8, max_output_tokens=5)
    )
    assert got == want


def test_dp_batching_cache_is_sharded_over_dp():
    from tiny_llm_tpu.parallel import DPServing

    cfg = tp_config()
    mesh = make_mesh(dp=2, tp=4)
    scfg = ShardingConfig(mesh)
    model = Qwen3Model(
        shard_params(random_params(cfg, key=0), scfg), cfg,
        max_seq_len=64, attn_impl="xla",
    )
    dp_model = DPServing(model, scfg)
    cache = dp_model.create_batching_kv_cache(max_active_requests=4)
    spec = cache.keys.sharding.spec
    assert spec[1] == scfg.dp_axis  # batch axis sharded over dp
    assert dp_model.slot_replica(0, 4) == 0
    assert dp_model.slot_replica(3, 4) == 1

    with pytest.raises(ValueError, match="divisible"):
        dp_model.create_batching_kv_cache(max_active_requests=3)


def test_dp_paged_requires_strategy_attn():
    """A paged model without DPPagedAttention cannot run stripe-local
    page writes; DPServing must refuse it with guidance."""
    from tiny_llm_tpu.parallel import DPServing

    cfg = tp_config()
    mesh = make_mesh(dp=2, tp=4)
    scfg = ShardingConfig(mesh)
    model = Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=64)
    model.enable_paged_attention(num_pages=8, page_size=8)
    with pytest.raises(ValueError, match="DPPagedAttention"):
        DPServing(model, scfg)


# ---------------------------------------------------------------------------
# DP x paged pool (VERDICT round-2 item #3): dp-striped page allocation,
# stripe-local writes/reads, full serving text equality.
# ---------------------------------------------------------------------------


def test_dp_striped_pool_allocation_pinning():
    from tiny_llm_tpu.kv.paged import PagePool, PagedKVCache

    pool = PagePool(
        num_layers=1, num_pages=16, num_kv_heads=2, page_size=8,
        head_dim=16, dp_shards=2, native=False,
    )
    # Pages 0 and 8 are the per-replica trash pages: never allocated.
    assert pool.reserved_pages == 2
    assert pool.free_pages == 14
    c0 = PagedKVCache(pool, shard=0)
    c1 = PagedKVCache(pool, shard=1)
    c0.ensure_capacity(30)  # 4 pages
    c1.ensure_capacity(20)  # 3 pages
    assert all(1 <= p <= 7 for p in c0.page_ids), c0.page_ids
    assert all(9 <= p <= 15 for p in c1.page_ids), c1.page_ids
    # Exhaustion is per-stripe even when the other stripe has room, and
    # raises the dedicated PoolExhausted type (round-5 ADVICE fix): the
    # scheduler's admission backpressure catches the TYPE, so a DP-pool
    # exhaustion defers admission exactly like a flat-pool one instead
    # of crashing batch_generate on a message-substring mismatch.
    from tiny_llm_tpu.kv.paged import PoolExhausted

    c0.ensure_capacity(7 * 8)
    with pytest.raises(PoolExhausted, match="stripe 0"):
        c0.ensure_capacity(8 * 8)
    # Auto-pinning picks the emptiest stripe.
    c2 = PagedKVCache(pool)
    assert c2.shard == 1
    c0.release()
    c1.release()
    assert pool.free_pages == 14


def _dp_paged_setup(B, P_pages=16, Hq=8, Hkv=4, ps=8, D=64, L=1, seed=0):
    """Block tables obeying the DP pinning invariant for dp=2: rows in
    the first half of the batch use pages [1,8), second half [9,16)."""
    rng = np.random.default_rng(seed)
    kp = jnp.asarray(rng.normal(size=(P_pages, Hkv, ps, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P_pages, Hkv, ps, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, Hq, L, D)), jnp.float32)
    maxp = 3
    P_loc = P_pages // 2
    table = np.full((B, maxp), -1, np.int32)
    lens = np.zeros((B,), np.int32)
    for b in range(B):
        base = 1 if b < B // 2 or B == 1 else P_loc + 1
        n = int(rng.integers(1, maxp + 1))
        pages = rng.choice(np.arange(base, base + P_loc - 1), size=n,
                           replace=False)
        table[b, :n] = pages
        lens[b] = int(rng.integers((n - 1) * ps + 1, n * ps + 1))
    return q, kp, vp, jnp.asarray(table), jnp.asarray(lens)


@pytest.mark.parametrize("B", [4, 1])
def test_dp_paged_attention_matches_single_pool(B):
    """Both regimes (batched dp-sharded decode; B=1 replicated prefill
    combine) must equal the single-pool oracle."""
    from tiny_llm_tpu.kernels.paged_attention import paged_attention
    from tiny_llm_tpu.parallel import DPPagedAttention

    q, kp, vp, table, lens = _dp_paged_setup(B)
    ref = paged_attention(q, kp, vp, table, lens, impl="xla")
    scfg = ShardingConfig(make_mesh(dp=2, tp=4))
    dpa = DPPagedAttention(scfg, inner="xla")
    got = dpa.paged(q, kp, vp, table, lens)
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        jnp.float32, atol=2e-4,
    )


def test_dp_paged_update_is_stripe_local():
    """Writes land in the owning replica's stripe; foreign/idle
    positions land in that replica's local trash page, never a live
    page of another replica."""
    from tiny_llm_tpu.parallel import DPPagedAttention

    scfg = ShardingConfig(make_mesh(dp=2, tp=4))
    dpa = DPPagedAttention(scfg, inner="xla")
    P_pages, Hkv, ps, D = 8, 4, 4, 16
    B, L = 4, 1
    kp = jnp.zeros((P_pages, Hkv, ps, D), jnp.float32)
    vp = jnp.zeros_like(kp)
    k = jnp.ones((B, Hkv, L, D), jnp.float32) * jnp.arange(
        1, B + 1, dtype=jnp.float32
    ).reshape(B, 1, 1, 1)
    v = -k
    # Rows 0-1 (replica 0) write pages 1 and 2; rows 2-3 (replica 1)
    # write pages 5 and 6; page 3 gets an idle -1 write.
    idx = jnp.asarray([[1], [2], [5], [-1]], jnp.int32)
    slot = jnp.asarray([[0], [1], [2], [3]], jnp.int32)
    kp2, vp2 = dpa.paged_update(kp, vp, k, v, idx, slot)
    kp2 = np.asarray(kp2)
    assert kp2[1, 0, 0, 0] == 1.0
    assert kp2[2, 0, 1, 0] == 2.0
    assert kp2[5, 0, 2, 0] == 3.0
    # The idle row (replica 1) wrote its LOCAL trash page 4, not page 0.
    assert kp2[4, 0, 3, 0] == 4.0
    assert kp2[0].sum() == 0  # replica 0's trash page untouched
    # No live page of the other replica was touched.
    assert kp2[3].sum() == 0 and kp2[6].sum() == 0 and kp2[7].sum() == 0


def test_dp_paged_batch_generate_matches_single_device():
    """Full continuous-batching run over the PAGED pool with dp=2 x tp=4
    must produce the exact texts of the single-device paged run."""
    from tiny_llm_tpu.serving.batch import batch_generate
    from tiny_llm_tpu.parallel import DPPagedAttention, DPServing
    from .utils import FakeTokenizer

    cfg = tp_config()
    params = random_params(cfg, key=0, quantized=False)
    tok = FakeTokenizer()
    prompts = [f"prompt number {i} padding" for i in range(6)]

    single = Qwen3Model(params, cfg, max_seq_len=64, attn_impl="xla")
    single.enable_paged_attention(num_pages=33, page_size=8)
    want = sorted(
        batch_generate(single, tok, list(prompts), max_seq_len=64,
                       batch_size=4, prefill_step=8, max_output_tokens=5)
    )

    mesh = make_mesh(dp=2, tp=4)
    scfg = ShardingConfig(mesh)
    model = Qwen3Model(
        shard_params(params, scfg), cfg, max_seq_len=64,
        attn_impl=DPPagedAttention(scfg, inner="xla"),
    )
    model.enable_paged_attention(num_pages=34, page_size=8)
    dp_model = DPServing(model, scfg)
    got = sorted(
        batch_generate(dp_model, tok, list(prompts), max_seq_len=64,
                       batch_size=4, prefill_step=8, max_output_tokens=5)
    )
    assert got == want
    assert model.page_pool.live_pages == 0  # all released, no leaks


def test_tp_sharded_pair_t_matches_single_device():
    """TP-sharded pair_t weights (round-5 W4A8 tier under a mesh): the
    N-axis shard of a pair_t tensor is exact (packing never crosses N),
    and per-shard activation quantization is consistent because x (and
    so its per-row absmax) is replicated across shards. Compares the
    sharded model against the SINGLE-DEVICE pair_t model so both sides
    carry identical a8 semantics."""
    from tiny_llm_tpu.models.qwen3 import convert_projection_layouts

    cfg = tp_config()
    params = random_params(cfg, key=6, quantized=True)
    pair_params = convert_projection_layouts(params, "pair_t")
    single = Qwen3Model(pair_params, cfg, max_seq_len=128, attn_impl="xla",
                        fuse=False)
    tokens = jnp.asarray([[5, 3, 8, 1, 9, 2]], jnp.int32)
    base = np.asarray(single.forward_full(tokens), np.float32)

    mesh = make_mesh(dp=1, tp=8)
    scfg = ShardingConfig(mesh)
    sharded_params = shard_params(pair_params, scfg)
    for layer in sharded_params.layers:
        assert layer.attn.wq.layout == "pair_t"
    tp_model = Qwen3Model(sharded_params, cfg, max_seq_len=128,
                          attn_impl="xla")
    got = np.asarray(tp_model.forward_full(tokens), np.float32)
    assert_allclose(got, base, jnp.bfloat16, atol=5e-2)
