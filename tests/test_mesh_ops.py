"""Mesh extraction tests: iso-surface correctness on an analytic sphere field,
PLY roundtrip."""

import numpy as np

from transhuman_tpu.mesh_ops import marching_tetrahedra, save_ply
from transhuman_tpu.mesh_ops.ply import load_ply


def sphere_field(n=24, radius=8.0):
    g = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2
    return radius - np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)


def test_sphere_surface():
    field = sphere_field()
    verts, tris = marching_tetrahedra(field, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    c = (24 - 1) / 2
    r = np.linalg.norm(verts - c, axis=1)
    # every vertex lies on the iso-surface (within a voxel of interpolation)
    np.testing.assert_allclose(r, 8.0, atol=0.25)
    # triangles index valid vertices and are non-degenerate
    assert tris.max() < len(verts) and tris.min() >= 0
    a, b, d = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, d - a), axis=1)
    assert (areas > 0).all()
    # total area ~ 4 pi r^2
    assert abs(areas.sum() - 4 * np.pi * 64) / (4 * np.pi * 64) < 0.15


def test_empty_and_full_fields():
    v, t = marching_tetrahedra(np.zeros((5, 5, 5), np.float32), 1.0)
    assert len(v) == 0 and len(t) == 0
    v, t = marching_tetrahedra(np.full((5, 5, 5), 10.0, np.float32), 1.0)
    assert len(v) == 0 and len(t) == 0


def test_ply_roundtrip(tmp_path):
    field = sphere_field(12, 4.0)
    verts, tris = marching_tetrahedra(field, 0.0)
    p = str(tmp_path / "m.ply")
    save_ply(p, verts, tris)
    v2, t2 = load_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)
