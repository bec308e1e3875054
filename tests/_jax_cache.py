"""Shared persistent-compile-cache bootstrap for the suite.

One source of truth for conftest.py AND the spawned multihost workers
(multihost_worker.py / multihost_eval_worker.py): the big CLI/train-step
tests spend most of their wall time in XLA compiles of identical programs
run after run; caching them cuts repeat suite runs several-fold (first run
unchanged).  Override/disable with TRANSHUMAN_TEST_CACHE=path|''.

USER-OWNED dir, never a predictable /tmp path: deserializing compiled
executables another local user planted is code execution (the same class
as the k-means cache fix, cli/common.py::_cache_dir).
"""

import os


def cache_dir() -> str:
    return os.environ.get(
        "TRANSHUMAN_TEST_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "transhuman_tpu", "test_jax_cache",
        ),
    )


def configure(jax) -> None:
    d = cache_dir()
    if d:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
