"""Test harness: force an 8-virtual-device CPU backend so sharding tests run
without TPU hardware (SURVEY.md §4's 'fake backend').

The environment's sitecustomize registers a remote-TPU ("axon") PJRT backend
in every Python process and pins ``jax_platforms`` to it; a pytest plugin
also imports jax before this conftest runs. Env vars alone are therefore not
enough — we override via ``jax.config`` here, which takes effect because no
backend has been initialized yet at collection time. Tests that need the
real TPU are driven outside pytest (bench.py).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # skip axon registration if not yet done
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of large 8-device CPU programs in one
    process; past ~150 tests the XLA:CPU compiler segfaults
    non-deterministically inside backend_compile_and_load (reproduced twice
    at different tests, never in isolation or in an ~40-test subset).
    Dropping the in-process executable cache at module boundaries bounds
    the accumulation; per-module recompiles are seconds on CPU."""
    yield
    jax.clear_caches()
