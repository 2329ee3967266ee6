"""Installation smoke check.

Parity: /root/reference/scripts/check-installation.py — verify the array
runtime works on every available backend and the package imports.
"""

import jax
import jax.numpy as jnp


def main() -> None:
    print(f"jax {jax.__version__}, default backend: {jax.default_backend()}")
    for device in jax.devices():
        x = jax.device_put(jnp.arange(8.0), device)
        y = jax.device_put(jnp.ones(8), device)
        assert float(jnp.sum(x + y)) == 36.0
        print(f"  ok: {device}")
    import tiny_llm_tpu

    print(f"tiny_llm_tpu {tiny_llm_tpu.__version__} imports cleanly")
    from tiny_llm_tpu.models import tiny_test_config, random_params, Qwen3Model

    cfg = tiny_test_config()
    model = Qwen3Model(random_params(cfg, quantized=True), cfg, max_seq_len=32)
    logits = model(jnp.asarray([[1, 2, 3]]))
    assert logits.shape == (1, 3, cfg.vocab_size)
    print("tiny model forward: ok")


if __name__ == "__main__":
    main()
