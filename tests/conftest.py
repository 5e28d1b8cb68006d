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

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
