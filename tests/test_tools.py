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


def test_voxelize_flood_fill_excludes_interior_cavity():
    """The vectorized exterior fill must mark enclosed interior cells as
    occupied (inside) and open exterior cells as free."""
    field = sphere_field(16, 5.0)
    v, t = marching_tetrahedra(field, 0.0)
    occ, origin = voxelize(v, t, voxel=0.5)
    c = ((np.array([7.5] * 3) - origin) / 0.5).astype(int)
    assert occ[c[0], c[1], c[2]] == 1  # cavity interior is occupied
    assert occ[0, 0, 0] == 0  # corner exterior is free


def test_rename_313_covers_mask_trees(tmp_path):
    """Regression: the reference script renames images AND mask/mask_cihp
    (modify_313_315_filename.py:4-9) — zju builds mask paths from the same
    short stem."""
    import os

    from transhuman_tpu.tools.data_fixes import rename_313_315

    long = "CoreView_313_1_Camera (3)_000042_2019.08.23_10:00:00.000"
    for rel, ext in (
        ("Camera (3)", ".jpg"),
        ("mask/Camera (3)", ".png"),
        ("mask_cihp/Camera (3)", ".png"),
    ):
        d = tmp_path / rel
        d.mkdir(parents=True)
        (d / (long + ext)).write_bytes(b"x")
    n = rename_313_315(str(tmp_path))
    assert n == 3
    assert (tmp_path / "Camera (3)" / "000042.jpg").exists()
    assert (tmp_path / "mask" / "Camera (3)" / "000042.png").exists()
    assert (tmp_path / "mask_cihp" / "Camera (3)" / "000042.png").exists()


def test_chumpy_free_smpl_pickle(tmp_path):
    """load_smpl_pickle must unpickle raw chumpy SMPL downloads without
    chumpy installed (clean_ch.py:32-47 semantics): fabricate a pickle whose
    stream references chumpy.ch.Ch, then load it with the module absent."""
    import pickle
    import sys
    import types

    import numpy as np

    mod = types.ModuleType("chumpy")
    sub = types.ModuleType("chumpy.ch")

    class Ch:  # data term in the instance dict under 'x', like chumpy.Ch
        def __init__(self, x):
            self.x = x

    # pickle records classes by (__module__, __qualname__): make the stream
    # reference chumpy.ch.Ch exactly like a real raw SMPL download
    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    sub.Ch = Ch
    mod.ch = sub
    mod.Ch = Ch
    sys.modules["chumpy"] = mod
    sys.modules["chumpy.ch"] = sub
    try:
        arr = np.arange(12, dtype=np.float64).reshape(4, 3)
        p = tmp_path / "smpl.pkl"
        with open(p, "wb") as f:
            pickle.dump({"v_template": Ch(arr), "f": np.zeros((2, 3))}, f)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    from transhuman_tpu.geometry.smpl import load_smpl_pickle

    data = load_smpl_pickle(str(p))
    np.testing.assert_array_equal(data["v_template"], arr)
    assert isinstance(data["v_template"], np.ndarray)

    # the cleansmpl tool writes a plain-numpy pickle loadable anywhere
    from transhuman_tpu.tools.data_fixes import clean_smpl_pickle

    out = clean_smpl_pickle(str(p), str(tmp_path / "out"))
    with open(out, "rb") as f:
        cleaned = pickle.load(f)
    np.testing.assert_array_equal(cleaned["v_template"], arr)


def test_varint_negative_terminates():
    """Regression: protobuf varint of a negative int64 must be the 10-byte
    two's complement, not an infinite loop (-1 >> 7 == -1)."""
    from transhuman_tpu.utils.tb_writer import _varint

    assert _varint(-1) == b"\xff" * 9 + b"\x01"
    assert _varint(0) == b"\x00"


def test_load_ply_rejects_bad_files(tmp_path):
    """Regression: CRLF headers must parse; EOF-without-end_header must
    raise instead of spinning forever on readline() == b''."""
    import pytest

    from transhuman_tpu.mesh_ops.ply import load_ply, save_ply

    field = sphere_field(8, 2.5)
    v, t = marching_tetrahedra(field, 0.0)
    p = tmp_path / "m.ply"
    save_ply(str(p), v, t)
    raw = p.read_bytes()
    head, _, body = raw.partition(b"end_header\n")
    crlf = tmp_path / "crlf.ply"
    crlf.write_bytes(head.replace(b"\n", b"\r\n") + b"end_header\r\n" + body)
    v2, t2 = load_ply(str(crlf))
    np.testing.assert_allclose(v2, v, atol=1e-6)

    trunc = tmp_path / "trunc.ply"
    trunc.write_bytes(b"ply\nformat binary_little_endian 1.0\n")  # no end
    with pytest.raises(ValueError, match="no end_header"):
        load_ply(str(trunc))
    notply = tmp_path / "x.bin"
    notply.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        load_ply(str(notply))


def test_marching_empty_isosurface():
    """Empty iso-surface is a valid (0,3)/(0,3) result, not MemoryError
    (malloc(0) may return NULL on conforming platforms)."""
    from transhuman_tpu.mesh_ops.marching import marching_tetrahedra

    field = np.full((6, 6, 6), -1.0, np.float32)  # entirely below threshold
    for use_native in (True, False):
        v, t = marching_tetrahedra(field, 0.0, use_native=use_native)
        assert v.shape == (0, 3) and t.shape == (0, 3)
