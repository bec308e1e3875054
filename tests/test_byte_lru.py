"""utils/cache.py ByteLRU — the shared byte-bounded LRU behind the ray-grid,
input-view, and undistort-map caches."""

import threading

import numpy as np

from transhuman_tpu.utils.cache import ByteLRU


def test_lru_eviction_order_and_bound():
    c = ByteLRU(max_bytes=3 * 8)  # three float64 scalars
    for i in range(3):
        c.put(i, np.full(1, float(i)))
    assert len(c) == 3
    c.get(0)  # refresh 0 -> 1 is now oldest
    c.put(3, np.full(1, 3.0))
    assert c.get(1) is None
    assert c.get(0) is not None and c.get(3) is not None


def test_lru_keeps_one_oversized_entry():
    c = ByteLRU(max_bytes=4)
    v = c.put("big", np.zeros(100))
    assert len(c) == 1 and c.get("big") is v


def test_lru_tuple_values_with_none_and_freeze():
    c = ByteLRU(max_bytes=1 << 20)
    v = c.put("k", (np.zeros(4), None, np.ones(2)))
    assert not v[0].flags.writeable  # shared views are read-only
    assert c.get("k") is v
    assert c.get("missing") is None


def test_lru_reput_refreshes_recency():
    c = ByteLRU(max_bytes=2 * 8)
    c.put("a", np.zeros(1))
    c.put("b", np.zeros(1))
    c.put("a", np.ones(1))  # re-put must move 'a' to newest
    c.put("c", np.zeros(1))
    assert c.get("b") is None and c.get("a") is not None


def test_lru_running_byte_counter_on_overwrite():
    """put() keeps a running byte total (no O(n) rescans); overwriting a key
    with a smaller value must free budget and with a larger one consume it."""
    c = ByteLRU(max_bytes=10 * 8)
    c.put("big", np.zeros(8))
    c.put("x", np.zeros(1))
    c.put("big", np.zeros(1))  # shrink: 8 slots freed
    assert c._total == 2 * 8
    for i in range(8):
        c.put(i, np.zeros(1))
    assert len(c) == 10 and c._total == 10 * 8
    c.put("grow", np.zeros(5))  # 5 slots over -> evict oldest 5 entries
    assert c._total <= 10 * 8
    assert c._total == sum(v.nbytes for v in c._d.values())


def test_jit_method_rekeys_on_scalar_attr_change():
    """testing.jit_method includes scalar attributes in the cache key, so a
    mutate-flag-then-call pattern gets a fresh trace (advisor hazard)."""
    import jax.numpy as jnp

    from transhuman_tpu.testing import jit_method

    class P:
        def __init__(self):
            self.scale = 2.0

        def f(self, x):
            return x * self.scale

    p = P()
    f1 = jit_method(p, "f")
    assert float(f1(jnp.float32(3.0))) == 6.0
    p.scale = 5.0
    f2 = jit_method(p, "f")
    assert f2 is not f1
    assert float(f2(jnp.float32(3.0))) == 15.0
    p.scale = 2.0
    assert jit_method(p, "f") is f1  # old snapshot key still cached


def test_lru_rejects_bare_none():
    """get() signals a miss with None — a stored bare None would be a
    permanent 100% miss; the cache rejects it with guidance."""
    import pytest

    c = ByteLRU(max_bytes=64)
    with pytest.raises(ValueError, match="wrap the marker in a tuple"):
        c.put("k", None)
    c.put("k", (None, None))  # tuple-wrapped markers are fine
    assert c.get("k") == (None, None)


def test_profiling_helpers_smoke():
    """device_trace/Stopwatch sinks force a scalar readback of appended
    device outputs (axon-tunnel timing discipline)."""
    import jax.numpy as jnp

    from transhuman_tpu.utils.profiling import Stopwatch

    sw = Stopwatch()
    with sw("scope") as sink:
        sink.append({"x": jnp.ones(3)})
    assert sw.counts["scope"] == 1 and sw.totals["scope"] >= 0.0
    with sw("host_only"):
        pass
    assert sw.counts["host_only"] == 1


def test_lru_thread_safety_smoke():
    c = ByteLRU(max_bytes=64)
    errs = []

    def worker(t):
        try:
            for i in range(300):
                c.put((t, i % 7), np.full(2, i, np.float32))
                c.get((1 - t, i % 7))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(t,)) for t in (0, 1)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs


def test_kmeans_fixup_never_empties_donor():
    """Regression: the empty-cluster fixup must not steal a donor cluster's
    sole member (the constructor would then raise on its own output)."""
    from transhuman_tpu.geometry.clusters import ClusterSpec

    rng = np.random.default_rng(0)
    # num_clusters close to n_verts makes sole-member donors likely
    for seed in range(5):
        verts = rng.normal(size=(12, 3)).astype(np.float32)
        spec = ClusterSpec.from_kmeans(verts, 10, iters=2, seed=seed)
        counts = np.bincount(spec.vert2cluster, minlength=10)
        assert (counts > 0).all()


def test_synthetic_non_patch_sample():
    """SyntheticDataset honors cfg.patch.use_patch_sampling=False (the only
    asset-free dataset must exercise the wired non-patch masked-MSE path)."""
    from transhuman_tpu.config import Config
    from transhuman_tpu.data.synthetic import SyntheticDataset

    cfg = Config().merge_dict(
        {
            "N_rand": 32,
            "num_class": 8,
            "train_num_views": 2,
            "patch": {"use_patch_sampling": False},
            "smpl_dir": "/nonexistent",
            "kmeans_dir": "/nonexistent",
        }
    )
    ds = SyntheticDataset(cfg, "train", n_frames=1, image_hw=(24, 24),
                          n_verts=80)
    ds.set_epoch(0)
    s = ds.get_train_sample(0)
    assert s.target_patches is None and s.ray_pixel_idx is None
    assert s.target_rgb is not None and s.target_rgb.shape == (32, 3)
    assert s.rays.ray_o.shape == (32, 3) and s.rays.mask.sum() > 0
    # ray targets must be the image pixels the rays look through: loss
    # against a constant-color region of the synthetic target is exact
    assert np.isfinite(s.target_rgb).all()
