"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(mesh + shard_map + psum) is exercised without TPU hardware — the standard JAX
trick (XLA_FLAGS=--xla_force_host_platform_device_count=N). Must be set before
jax initializes a backend, hence top of conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
