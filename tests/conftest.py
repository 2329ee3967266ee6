"""Test configuration.

Tests default to the CPU backend with 8 virtual devices so sharding tests
run anywhere (SURVEY.md §4: the multi-device analog of the reference's
single-machine CI). Set TLT_BACKEND=tpu to run the suite against a real
TPU instead (kernel tests then exercise compiled Pallas, not interpret
mode). This must happen before jax is imported anywhere.
"""

import os

if os.environ.get("TLT_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # override any TPU tunnel platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The container's sitecustomize imports jax and registers the TPU
    # plugin before conftest runs, so the env var alone is too late —
    # force the platform through the live config as well.
    import jax

    jax.config.update("jax_platforms", "cpu")
