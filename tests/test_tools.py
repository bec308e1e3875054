"""Offline tools: mesh voxelization, debug point clouds, param counting."""

import numpy as np

from transhuman_tpu.mesh_ops.marching import marching_tetrahedra
from transhuman_tpu.tools.voxelize_mesh import voxelize
from transhuman_tpu.utils.debug import param_count, save_point_cloud
from tests.test_mesh_ops import sphere_field


def test_voxelize_sphere():
    field = sphere_field(16, 5.0)
    v, t = marching_tetrahedra(field, 0.0)
    occ, origin = voxelize(v, t, voxel=1.0)
    # interior of a radius-5 sphere: ~(4/3)pi*125 = 524 voxels, grid-coarse
    filled = int(occ.sum())
    assert 300 < filled < 900
    # center voxel filled, corner empty
    c = ((np.array([7.5] * 3) - origin) / 1.0).astype(int)
    assert occ[c[0], c[1], c[2]] == 1
    assert occ[0, 0, 0] == 0


def test_point_cloud_writer(tmp_path, rng):
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    save_point_cloud(p, pts, rgb=np.full((10, 3), 128))
    text = open(p).read()
    assert "element vertex 10" in text and "uchar red" in text


def test_param_count():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert param_count(tree) == 17
