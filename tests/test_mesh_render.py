"""Mesh rasterizer tests: native vs numpy agreement, geometric sanity."""

import numpy as np
import pytest

from transhuman_tpu.mesh_ops.marching import marching_tetrahedra
from transhuman_tpu.viz.mesh_render import _load, _render_np, render_mesh
from tests.test_mesh_ops import sphere_field


@pytest.fixture(scope="module")
def sphere_mesh():
    field = sphere_field(20, 6.0)
    v, t = marching_tetrahedra(field, 0.0)
    v = (v - (20 - 1) / 2) / 6.0  # unit-ish sphere at origin
    return v.astype(np.float32), t


CAM = dict(
    K=np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32),
    R=np.eye(3, dtype=np.float32),
    T=np.array([0, 0, 3.0], np.float32),
    hw=(64, 64),
)


def test_rasterize_sphere_shape(sphere_mesh):
    v, t = sphere_mesh
    rgb, depth = render_mesh(v, t, **CAM)
    filled = (depth > 0)
    # sphere of radius 1 at distance 3, focal 60 -> radius ~20px circle
    assert 900 < filled.sum() < 1500
    ys, xs = np.nonzero(filled)
    assert abs(ys.mean() - 32) < 2 and abs(xs.mean() - 32) < 2
    # nearest depth ~ 2, silhouette depth ~ 3
    assert abs(depth[filled].min() - 2.0) < 0.15
    # colors are normal-mapped (in [0,1], non-constant)
    assert rgb[filled].std() > 0.05


def test_native_matches_numpy_rasterizer(sphere_mesh):
    if _load() is None:
        pytest.skip("native rasterizer unavailable")
    v, t = sphere_mesh
    rgb_c, dep_c = render_mesh(v, t, **CAM)
    rgb_np, dep_np = _render_np(
        v, t.astype(np.int64), CAM["K"], CAM["R"], CAM["T"], CAM["hw"]
    )
    filled_c = dep_c > 0
    filled_np = dep_np > 0
    # coverage essentially identical (edge pixels may differ by rounding)
    assert (filled_c ^ filled_np).mean() < 0.01
    both = filled_c & filled_np
    # z-fight tie-breaking between coincident faces may pick different
    # winners on a handful of pixels; require near-equality almost everywhere
    frac_off = (np.abs(dep_c[both] - dep_np[both]) > 1e-2).mean()
    assert frac_off < 0.01
