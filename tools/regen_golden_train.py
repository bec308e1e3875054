"""Regenerate tests/golden/train_steps.npz (the golden train-step pin).

Run ONLY after an intentional numerics change, and record why in the
commit message:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/regen_golden_train.py

The computation lives in tests/test_golden_train.py::run_golden so the test
and this script can never disagree about what is pinned.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# mirror tests/conftest.py: true f32 accumulation, not the bf16-like default
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from test_golden_train import GOLDEN, run_golden  # noqa: E402


def main():
    out = run_golden()
    if GOLDEN.exists():
        old = np.load(GOLDEN)
        for k in sorted(out):
            d = float(np.max(np.abs(out[k] - old[k]))) if k in old else float("nan")
            print(f"  {k:24s} max|new-old| = {d:.3e}")
    np.savez(GOLDEN, **out)
    print(f"wrote {GOLDEN} ({GOLDEN.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
