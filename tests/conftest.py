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

# Persistent compilation cache for the suite: the big CLI/train-step tests
# spend most of their wall time in XLA compiles of identical programs run
# after run; caching them cuts repeat suite runs several-fold (first run
# unchanged).  Override/disable with TRANSHUMAN_TEST_CACHE=path|''.
# USER-OWNED dir, never a predictable /tmp path: deserializing compiled
# executables another local user planted is code execution (the same class
# as the k-means cache fix, cli/common.py::_cache_dir).
_cache = os.environ.get(
    "TRANSHUMAN_TEST_CACHE",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "transhuman_tpu", "test_jax_cache",
    ),
)
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
