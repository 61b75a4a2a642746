"""Test harness configuration.

Tests run on a virtual 8-device CPU backend (the standard JAX fake-backend
trick) so multi-chip sharding code is exercised without TPU hardware, and
so the suite is fast/deterministic.  Must run before jax is imported.
"""

import os

# Force CPU: the container pre-sets JAX_PLATFORMS=axon (tunneled TPU), so a
# setdefault would silently run every test over the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import numpy as np
import pytest

# Force CPU via jax.config: the container's sitecustomize imports jax with
# JAX_PLATFORMS=axon (tunneled TPU) at interpreter start, so the env edits
# above can be too late — the config update always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(20211202)
