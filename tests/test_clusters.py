import os

import numpy as np
import pytest

from transhuman_tpu.geometry.clusters import ClusterSpec, normalize_positions

REF_KMEANS = "/root/reference/kmeans_dict/kmeans_dict_300.npy"


def test_pool_matrix_is_exact_mean(rng):
    v2c = rng.integers(0, 10, 200).astype(np.int32)
    v2c[:10] = np.arange(10)  # guarantee non-empty clusters
    spec = ClusterSpec(v2c, 10)
    feats = rng.standard_normal((200, 7)).astype(np.float32)
    pooled = spec.pool(feats)
    for c in range(10):
        np.testing.assert_allclose(pooled[c], feats[v2c == c].mean(0), atol=1e-5)


def test_pool_blend_mtx(rng):
    v2c = np.arange(12, dtype=np.int32) % 4
    spec = ClusterSpec(v2c, 4)
    bm = rng.standard_normal((12, 4, 4)).astype(np.float32)
    pooled = spec.pool_blend_mtx(bm)
    assert pooled.shape == (4, 4, 4)
    np.testing.assert_allclose(pooled[1], bm[v2c == 1].mean(0), atol=1e-5)


def test_from_kmeans_assignments_sane(rng):
    verts = rng.standard_normal((500, 3)).astype(np.float32)
    spec = ClusterSpec.from_kmeans(verts, 20, seed=0)
    assert spec.num_clusters == 20
    assert (spec.counts > 0).all()
    assert spec.counts.sum() == 500
    # each vertex is closer to its own cluster center than to the average other
    centers = spec.centers(verts)
    own = np.linalg.norm(verts - centers[spec.vert2cluster], axis=1)
    rand = np.linalg.norm(verts - centers[(spec.vert2cluster + 7) % 20], axis=1)
    assert own.mean() < rand.mean()


def test_roundtrip_reference_format(tmp_path, rng):
    v2c = rng.integers(0, 8, 100).astype(np.int32)
    v2c[:8] = np.arange(8)
    spec = ClusterSpec(v2c, 8)
    p = str(tmp_path / "kd.npy")
    spec.save_reference_dict(p)
    spec2 = ClusterSpec.load_reference_dict(p)
    np.testing.assert_array_equal(spec.vert2cluster, spec2.vert2cluster)


@pytest.mark.skipif(not os.path.exists(REF_KMEANS), reason="reference assets absent")
def test_load_reference_kmeans_300():
    spec = ClusterSpec.load_reference_dict(REF_KMEANS)
    assert spec.num_clusters == 300
    assert spec.vert2cluster.shape == (6890,)
    assert spec.counts.sum() == 6890
    assert spec.counts.min() >= 1


def test_normalize_positions():
    x = np.array([[-1.5, 0.0, 1.5]])
    np.testing.assert_allclose(normalize_positions(x), [[-1.0, 0.0, 1.0]], atol=1e-6)


def test_load_cluster_spec_caches_on_the_fly_kmeans(tmp_path, monkeypatch, capsys):
    """When kmeans_dir has no dict, the on-the-fly k-means result is cached
    (content-keyed, pickle-free npz, user-owned dir) so later CLI invocations
    skip the recluster; the cached spec is identical; a corrupt cache file is
    ignored, not loaded."""
    from transhuman_tpu.cli.common import load_cluster_spec
    from transhuman_tpu.config import Config
    from transhuman_tpu.geometry.smpl import SMPLModel

    monkeypatch.setenv("TRANSHUMAN_CACHE_DIR", str(tmp_path))
    cfg = Config().merge_dict({"kmeans_dir": str(tmp_path / "none"),
                               "num_class": 8})
    smpl = SMPLModel.synthetic(n_verts=60)

    s1 = load_cluster_spec(cfg, smpl)
    assert "running k-means" in capsys.readouterr().out
    cached = list(tmp_path.glob("kmeans_8_*.npz"))
    assert len(cached) == 1

    s2 = load_cluster_spec(cfg, smpl)
    assert "cached on-the-fly k-means" in capsys.readouterr().out
    np.testing.assert_array_equal(s1.vert2cluster, s2.vert2cluster)
    np.testing.assert_array_equal(s1.pool_matrix, s2.pool_matrix)

    # a different template must MISS the cache (content-keyed)
    smpl2 = SMPLModel.synthetic(n_verts=64)
    load_cluster_spec(cfg, smpl2)
    assert "running k-means" in capsys.readouterr().out
    assert len(list(tmp_path.glob("kmeans_8_*.npz"))) == 2

    # a corrupt/planted cache file must be ignored (recluster, no crash)
    cached[0].write_bytes(b"not an npz")
    s3 = load_cluster_spec(cfg, smpl)
    out = capsys.readouterr().out
    assert "ignoring unreadable k-means cache" in out
    np.testing.assert_array_equal(s1.vert2cluster, s3.vert2cluster)
