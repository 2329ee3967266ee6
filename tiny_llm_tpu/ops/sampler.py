"""Token samplers: greedy / temperature / top-k / top-p.

Parity: /root/reference/src/tiny_llm_ref/sampler.py:5-25 — same masking order
(top-k first, then top-p on the masked distribution, then temperature, then
categorical). JAX is functional, so the sampler takes an explicit PRNG key:
sample(logprobs[B, V], key) -> tokens[B]. Everything is jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_top_k(logprobs: jax.Array, top_k: int) -> jax.Array:
    """Keep the top_k largest entries per row, set the rest to -inf."""
    kth = jax.lax.top_k(logprobs, top_k)[0][..., -1:]
    return jnp.where(logprobs >= kth, logprobs, -jnp.inf)


def apply_top_p(logprobs: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filter: keep the smallest prefix of the sorted distribution
    whose cumulative probability reaches top_p.

    Matches the reference rule `cumsum - p_i < top_p` (sampler.py:20): a
    token is kept iff the cumulative mass *before* it is < top_p.
    """
    sorted_lp = jnp.sort(logprobs, axis=-1)[..., ::-1]
    sorted_p = jnp.exp(sorted_lp)
    cum = jnp.cumsum(sorted_p, axis=-1)
    keep_sorted = (cum - sorted_p) < top_p
    # Threshold logprob: smallest kept logprob per row.
    kept_min = jnp.min(
        jnp.where(keep_sorted, sorted_lp, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logprobs >= kept_min, logprobs, -jnp.inf)


def make_sampler(temp: float, top_p: float | None = None, top_k: int | None = None):
    """Returns sample(logprobs[B, V], key) -> int32 tokens [B]."""

    def sample(logprobs: jax.Array, key: jax.Array | None = None) -> jax.Array:
        if temp == 0:
            return jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        assert key is not None, "temperature sampling needs a PRNG key"
        lp = logprobs.astype(jnp.float32)
        if top_k is not None and top_k > 0:
            lp = apply_top_k(lp, top_k)
        if top_p is not None and top_p > 0:
            lp = apply_top_p(lp, top_p)
        lp = lp / temp
        return jax.random.categorical(key, lp, axis=-1).astype(jnp.int32)

    return sample
