"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(mesh + shard_map + psum) is exercised without TPU hardware — the standard JAX
trick (XLA_FLAGS=--xla_force_host_platform_device_count=N). Must be set before
jax initializes a backend, hence top of conftest.
"""

import os
import tempfile

# Hermetic per-run XLA compilation cache path. test_api.py imports
# mcos_tpu.api.serverless, whose module-level enable_compilation_cache()
# points the persistent cache at MCOS_JIT_CACHE for the rest of the suite;
# a fresh tmpdir keeps concurrent suites from racing on entry files.
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

# The persistent compilation cache's native serializer SEGFAULTS on some
# large 8-virtual-device CPU executables in this image (observed twice,
# deterministically ~87% into the suite, in both put_executable_and_time
# and get_executable_and_time — jax compilation_cache.py:238/265). Tests
# gain nothing from executable persistence; hard-disable it so the
# serverless import (which sets the cache dir at module level) cannot
# re-arm it. Production TPU serving keeps the cache — its executables
# serialize through the TPU backend path, which has run clean all round.
jax.config.update("jax_enable_compilation_cache", False)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_executable_memory():
    """Drop JAX's in-process executable caches after every test module.

    One pytest process compiles thousands of 8-virtual-device CPU
    executables over the full suite; holding all of them alive has twice
    ended the run with a SIGSEGV inside the XLA:CPU backend ~87% in (first
    blamed on the persistent-cache serializer — cache now disabled above —
    then reproduced inside backend_compile_and_load itself). Executables
    are rarely shared across modules (shapes differ), so clearing per
    module bounds memory at near-zero recompile cost.
    """
    yield
    jax.clear_caches()
    gc.collect()
