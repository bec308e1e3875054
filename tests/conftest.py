"""Test config: force an 8-device virtual CPU platform before JAX initializes,
so multi-chip sharding tests run without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU-tunnel plugin ignores the JAX_PLATFORMS env var, so the env
# alone does not keep tests off the (slow, single) TPU tunnel; the config
# update is authoritative and must happen before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")

# XLA's DEFAULT matmul precision emulates TPU bf16 passes even on CPU; tests
# verify exact math, so force true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache for the suite (single source of truth shared
# with the spawned multihost workers — see tests/_jax_cache.py docstring for
# the rationale and the TRANSHUMAN_TEST_CACHE override).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _jax_cache  # noqa: E402

_jax_cache.configure(jax)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
