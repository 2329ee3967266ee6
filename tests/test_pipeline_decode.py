"""Decode-time pipeline parallelism: token-for-token equality with the
single-device dense-cache decode (parallel/pipeline.py DecodePipeline).

The distributed analog of the reference's paged-vs-dense equality tests
(test_week_3_day_3.py:305-321): same model, different execution topology,
identical greedy tokens.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_llm_tpu.models import Qwen3Model, random_params, tiny_test_config
from tiny_llm_tpu.parallel import DecodePipeline


def _reference_tokens(params, cfg, prompts, steps):
    """Greedy tokens from the single-device dense-cache path."""
    model = Qwen3Model(params, cfg, max_seq_len=64)
    B, L = prompts.shape
    cache = model.create_kv_cache(batch_size=B)
    logits = model(prompts, offset=0, cache=cache, logits_to_keep=1)
    toks = [np.asarray(jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1))]
    for k in range(steps):
        logits = model(
            np.asarray(toks[-1])[:, None], offset=L + k, cache=cache,
            logits_to_keep=1,
        )
        toks.append(
            np.asarray(jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1))
        )
    return np.stack(toks)  # [steps+1, B]


@pytest.mark.parametrize("stages,bm", [(2, 2), (4, 1)])
def test_decode_pipeline_matches_single_device(stages, bm):
    cfg = tiny_test_config(num_hidden_layers=4)
    params = random_params(cfg, key=0)
    B = stages * bm
    rng = np.random.default_rng(2)
    prompts = rng.integers(0, cfg.vocab_size, size=(B, 6)).astype(np.int32)
    steps = 5

    ref = _reference_tokens(params, cfg, prompts, steps)

    pp = DecodePipeline(params, cfg, num_stages=stages, max_seq_len=64)
    tok0 = np.asarray(pp.prefill(prompts))
    np.testing.assert_array_equal(tok0, ref[0], err_msg="prefill token")
    got = pp.decode(tok0, steps)
    np.testing.assert_array_equal(got, ref[1:], err_msg="decode tokens")


def test_decode_pipeline_two_bursts_continue():
    """A second decode burst continues from the first's KV state."""
    cfg = tiny_test_config(num_hidden_layers=4)
    params = random_params(cfg, key=1)
    stages, bm = 2, 2
    B = stages * bm
    rng = np.random.default_rng(3)
    prompts = rng.integers(0, cfg.vocab_size, size=(B, 4)).astype(np.int32)

    ref = _reference_tokens(params, cfg, prompts, 6)

    pp = DecodePipeline(params, cfg, num_stages=stages, max_seq_len=64)
    tok0 = np.asarray(pp.prefill(prompts))
    first = pp.decode(tok0, 3)
    np.testing.assert_array_equal(first, ref[1:4])
    second = pp.decode(first[-1], 3)
    np.testing.assert_array_equal(second, ref[4:7])
