"""C++ marching-tetrahedra backend vs the numpy reference implementation."""

import numpy as np
import pytest

from transhuman_tpu.mesh_ops.marching import (
    _load_native,
    _march_native,
    _marching_tetrahedra_np,
)
from tests.test_mesh_ops import sphere_field


@pytest.fixture(scope="module")
def lib():
    lib = _load_native()
    if lib is None:
        pytest.skip("g++ / native build unavailable")
    return lib


def test_native_matches_numpy(lib):
    field = sphere_field(20, 6.0)
    v_np, t_np = _marching_tetrahedra_np(field, 0.0)
    v_cc, t_cc = _march_native(lib, field, 0.0)
    # same surface: equal vertex sets (order may differ) and triangle count
    assert len(v_cc) == len(v_np)
    assert len(t_cc) == len(t_np)
    a = np.sort(v_np.round(5).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
    b = np.sort(v_cc.round(5).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
    np.testing.assert_array_equal(a, b)
    # triangle geometry: compare sorted centroid multisets
    ca = np.sort(v_np[t_np].mean(1).round(4), axis=0)
    cb = np.sort(v_cc[t_cc].mean(1).round(4), axis=0)
    np.testing.assert_allclose(ca, cb, atol=1e-3)


def test_native_empty(lib):
    v, t = _march_native(lib, np.zeros((4, 4, 4), np.float32), 1.0)
    assert len(v) == 0 and len(t) == 0


def test_native_large_grid_speed(lib):
    import time

    field = sphere_field(96, 40.0)
    t0 = time.perf_counter()
    v, t = _march_native(lib, field, 0.0)
    dt = time.perf_counter() - t0
    assert len(v) > 10000
    assert dt < 5.0
