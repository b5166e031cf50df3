"""Test configuration: force a fake 8-device CPU backend.

This is the multi-device test strategy from SURVEY.md §4: the reference could
only test multi-GPU placement on real GPUs (tests/ops/test_bootstrap.sh);
we simulate an 8-chip slice on CPU so every sharding path runs in CI.
Must run before jax is imported anywhere.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, jax.devices()
