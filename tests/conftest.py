"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(mesh + shard_map + psum) is exercised without TPU hardware — the standard JAX
trick (XLA_FLAGS=--xla_force_host_platform_device_count=N). Must be set before
jax initializes a backend, hence top of conftest.
"""

import os
import tempfile

# Hermetic per-run XLA compilation cache. test_api.py imports
# mcos_tpu.api.serverless, whose module-level enable_compilation_cache()
# flips the persistent cache ON for the rest of the suite at the
# MCOS_JIT_CACHE path — and two pytest processes sharing that directory
# race on entry files; a torn entry later SEGFAULTS jax's native cache
# reader (observed: zstd decompress crash in compilation_cache.py:238).
# A fresh tmpdir per run makes concurrent suites safe.
os.environ.setdefault(
    "MCOS_JIT_CACHE", tempfile.mkdtemp(prefix="mcos_jit_test_"))

# Force CPU even when the environment pins JAX_PLATFORMS=axon (the TPU
# tunnel): tests must be hermetic and exercise the virtual 8-device mesh.
# Set MCOS_TEST_TPU=1 to run the suite against the real TPU instead (enables
# the TPU-gated Pallas statistics tests).
_USE_TPU = os.environ.get("MCOS_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # The axon TPU plugin in this image overrides the env var; the config
    # update is authoritative.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
