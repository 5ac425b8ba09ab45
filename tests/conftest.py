"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 'implication for the build')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env exports JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

# the jaxtyping pytest plugin imports jax before this conftest runs, so the
# JAX_PLATFORMS env above is too late — set the config flag directly too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
