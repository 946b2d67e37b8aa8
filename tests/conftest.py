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

jax.config.update("jax_platforms", "cpu")
