"""Test harness setup: force an 8-device virtual CPU mesh BEFORE jax import
so sharding / collective tests run without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and
# /root/.axon_site/sitecustomize.py registers the plugin (importing jax) at
# interpreter start — so the env var alone is too late. XLA_FLAGS still works
# because the backend itself only initializes on first use.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache for the CPU test programs (separate dir from
# the TPU cache): the suite is compile-dominated (~15 min, hundreds of
# programs), and one process compiling them all back-to-back has twice hit
# an XLA-CPU-internal abort near the ~300-compile mark in full-suite order
# (reproducible at the same test, absent when the file runs alone). Cache
# hits cut both the runtime and the in-process compile count.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
