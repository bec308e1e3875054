"""ZJU dataset layer tests against a fake on-disk dataset in the reference's
directory layout (annots.npy / Camera_BN / mask / new_vertices / new_params /
rasterization visibility)."""

import os

import numpy as np
import pytest

from transhuman_tpu.config import Config
from transhuman_tpu.data.loader import Loader
from transhuman_tpu.data.ray_sampling import sample_eval_rays, sample_train_rays
from transhuman_tpu.data.zju import ZJUDataset
from transhuman_tpu.geometry.smpl import SMPLModel

NC, NF, NV_VERTS = 3, 4, 60
H_FULL, W_FULL = 64, 64


@pytest.fixture(scope="module")
def fake_zju(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("zju")
    human = "CoreView_901"
    hdir = root / human
    rng = np.random.default_rng(0)
    smpl = SMPLModel.synthetic(n_verts=NV_VERTS)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for c in range(NC):
        cams["K"].append(
            np.array([[60.0, 0, W_FULL / 2], [0, 60.0, H_FULL / 2], [0, 0, 1]])
        )
        cams["D"].append(np.zeros((5, 1)))
        th = 2 * np.pi * c / NC
        R = np.array(
            [[np.cos(th), 0, -np.sin(th)], [0, 1, 0], [np.sin(th), 0, np.cos(th)]]
        )
        cam_pos = np.array([-2.5 * np.sin(th), 0, -2.5 * np.cos(th)])
        cams["R"].append(R)
        cams["T"].append((-R @ cam_pos).reshape(3, 1) * 1000.0)

    ims = []
    for f in range(NF):
        frame = {"ims": [f"Camera_B{c + 1}/{f:06d}.jpg" for c in range(NC)]}
        ims.append(frame)
        verts, _, _ = smpl(rng.standard_normal(72) * 0.05, np.zeros(10))
        os.makedirs(hdir / "new_vertices", exist_ok=True)
        os.makedirs(hdir / "new_params", exist_ok=True)
        np.save(hdir / "new_vertices" / f"{f}.npy", verts)
        np.save(
            hdir / "new_params" / f"{f}.npy",
            {
                "poses": rng.standard_normal((1, 72)).astype(np.float32) * 0.05,
                "shapes": np.zeros((1, 10), np.float32),
                "Rh": rng.standard_normal((1, 3)).astype(np.float32) * 0.1,
                "Th": rng.standard_normal((1, 3)).astype(np.float32) * 0.1,
            },
        )
        for c in range(NC):
            cdir = hdir / f"Camera_B{c + 1}"
            os.makedirs(cdir, exist_ok=True)
            img = rng.integers(0, 255, (H_FULL, W_FULL, 3), dtype=np.uint8)
            cv2.imwrite(str(cdir / f"{f:06d}.jpg"), img)
            mdir = hdir / "mask" / f"Camera_B{c + 1}"
            os.makedirs(mdir, exist_ok=True)
            msk = np.zeros((H_FULL, W_FULL), np.uint8)
            msk[16:48, 20:44] = 1
            cv2.imwrite(str(mdir / f"{f:06d}.png"), msk * 255)
            vdir = root / "raster" / human / "visibility" / f"Camera_B{c + 1}"
            os.makedirs(vdir, exist_ok=True)
            np.save(vdir / f"{f:06d}.npy", rng.random(NV_VERTS) > 0.3)

    np.save(hdir / "annots.npy", {"cams": cams, "ims": ims})

    cfg = Config().merge_dict(
        {
            "data_root": str(root),
            "rasterize_root": str(root / "raster"),
            "ratio": 0.5,
            "train_num_views": 2,
            "test": {"input_view": [0, 1], "target_view": [2]},
            "patch": {"N_patches": 2, "size": 8},
        }
    )
    info = {"CoreView_901": {"begin_i": 0, "i_intv": 1, "ni": NF}}
    return cfg, smpl, info


def test_train_sample_contract(fake_zju):
    cfg, smpl, info = fake_zju
    ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    assert len(ds) == NF * NC
    ds.set_epoch(3)
    s = ds.get_train_sample(0)
    v, hw = 2, 32
    assert s.frame.images.shape == (v, hw, hw, 3)
    assert s.frame.vizmaps.shape == (v, NV_VERTS)
    assert s.frame.blend_rot.shape == (NV_VERTS, 3, 3)
    cap = 2 * 8 * 8
    assert s.rays.ray_o.shape == (cap, 3)
    assert s.ray_pixel_idx.shape == (cap,)
    assert s.target_patches.shape == (2, 8, 8, 3)
    # valid rays have pixel indices in range, padding has -1
    m = s.rays.mask
    assert (s.ray_pixel_idx[m] >= 0).all()
    assert (s.ray_pixel_idx[~m] == -1).all()
    assert (s.rays.far[m] > s.rays.near[m]).all()
    # images are background-masked
    assert float(s.frame.images.min()) >= 0.0


def test_train_sample_epoch_determinism(fake_zju):
    cfg, smpl, info = fake_zju
    ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    ds.set_epoch(1)
    a = ds.get_train_sample(2)
    b = ds.get_train_sample(2)
    np.testing.assert_array_equal(a.rays.ray_o, b.rays.ray_o)
    np.testing.assert_array_equal(a.target_patches, b.target_patches)
    ds.set_epoch(2)
    c = ds.get_train_sample(2)
    assert not np.array_equal(a.target_patches, c.target_patches) or not np.array_equal(
        a.frame.images, c.frame.images
    )


def test_eval_item_contract(fake_zju):
    cfg, smpl, info = fake_zju
    ds = ZJUDataset(cfg, "test", smpl=smpl, human_info=info)
    assert len(ds) == NF  # single target view
    item = ds.get_eval_item(0)
    r = item.eval_rays
    assert r.rays.ray_o.shape[0] == r.pix_idx.shape[0] == r.rgb.shape[0]
    assert r.rays.ray_o.shape[0] > 0
    assert r.mask_at_box.shape == (32 * 32,)
    assert item.human_idx == 0 and item.cam_ind == 2
    # rgb values come from the bbox region of the target image
    np.testing.assert_allclose(
        r.rgb, item.target_img.reshape(-1, 3)[r.mask_at_box], atol=0
    )


def test_input_view_cache_equality_and_hits(fake_zju):
    """The processed-input-view LRU (VERDICT r3 #3) must (a) return items
    bit-identical to an uncached build, (b) actually hit for consecutive
    items of the same frame, (c) stay OFF when jitter is on."""
    cfg, smpl, info = fake_zju
    ds_cold = ZJUDataset(cfg, "test", smpl=smpl, human_info=info)
    ds_warm = ZJUDataset(cfg, "test", smpl=smpl, human_info=info)

    def leaves(item):
        f = item.frame
        return [f.images, f.vizmaps, f.K, f.R, f.T, f.verts_world,
                f.tar_verts_smpl, item.target_img]

    calls = {"n": 0}
    orig = ZJUDataset._process

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    ZJUDataset._process = counting
    try:
        warm_items = [ds_warm.get_eval_item(i) for i in range(2)]
        n_after_warm = calls["n"]
        # item 0: 1 target + V inputs processed; item 1 (same frame 0? no —
        # one target view per frame here, so different frames): count just
        # proves the counter works.  The real hit assertion: rebuilding item
        # 0 costs exactly ONE _process call (its target view).
        calls["n"] = 0
        again = ds_warm.get_eval_item(0)
        assert calls["n"] == 1, f"expected only the target re-processed, got {calls['n']}"
    finally:
        ZJUDataset._process = orig
    assert n_after_warm >= 2

    for i, w in enumerate(warm_items):
        ds_cold._iv_cache.clear()
        c = ds_cold.get_eval_item(i)
        for a, b in zip(leaves(c), leaves(w)):
            np.testing.assert_array_equal(a, b)
    for a, b in zip(leaves(ds_cold.get_eval_item(0)), leaves(again)):
        np.testing.assert_array_equal(a, b)

    # jitter on (train items) -> bypass: nothing new lands in the cache
    ds_tr = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    ds_tr.set_epoch(0)
    ds_tr.get_train_sample(0)
    assert len(ds_tr._iv_cache) == 0

    # byte-bound eviction keeps the cache under budget (eviction runs on
    # insert, so start cold)
    ds_warm._iv_cache.clear()
    ds_warm._iv_cache.max_bytes = 1  # every insert evicts down to 1 entry
    ds_warm.get_eval_item(1)
    assert len(ds_warm._iv_cache) == 1


def test_frame_sampler(fake_zju):
    cfg, smpl, info = fake_zju
    ds = ZJUDataset(cfg, "test", smpl=smpl, human_info=info)
    idx_full = ds.frame_sampler_indices(full_eval=True)
    assert len(idx_full) == NF
    idx_dec = ds.frame_sampler_indices(full_eval=False)
    assert len(idx_dec) == 1  # every 30th frame of 4 frames -> just frame 0


def test_loader_orders_and_prefetches(fake_zju):
    cfg, smpl, info = fake_zju
    ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    ds.set_epoch(0)
    out = list(Loader(lambda i: i * 10, range(7), num_workers=3))
    assert out == [0, 10, 20, 30, 40, 50, 60]


def test_random_ray_sampler_contract(fake_zju):
    """Non-patch train branch (sample_ray_h36m train mode,
    if_nerf_data_utils.py:516-614): static n_rays output, body ratio,
    rgb/near-far integrity, epoch-rng determinism."""
    import copy

    from transhuman_tpu.data.ray_sampling import sample_train_rays_random
    from transhuman_tpu.geometry.rays import get_bound_2d_mask

    cfg, smpl, info = fake_zju
    ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    ds.set_epoch(0)
    _, target, _ = ds._build_frame(0, np.random.default_rng(0), jitter=False)
    img, msk, K, R, T, bounds = target

    n_rays = 128
    rr = sample_train_rays_random(
        img, msk, K, R, T.reshape(3, 1), bounds,
        np.random.default_rng(7), n_rays=n_rays, body_ratio=0.5,
    )
    assert rr.rays.ray_o.shape == (n_rays, 3)
    assert rr.rgb.shape == (n_rays, 3)
    assert rr.coord.shape == (n_rays, 2)
    m = rr.rays.mask
    assert m.all()  # real body in frame -> rejection loop fills completely
    assert (rr.rays.far[m] > rr.rays.near[m]).all()
    # rgb targets come from the image at the sampled pixels
    np.testing.assert_array_equal(
        rr.rgb, img[rr.coord[:, 0], rr.coord[:, 1]]
    )
    # all sampled pixels live inside the projected-AABB bound mask
    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bmask = get_bound_2d_mask(bounds, K, pose, img.shape[0], img.shape[1])
    assert bmask[rr.coord[:, 0], rr.coord[:, 1]].all()
    # roughly half the rays sit on the subject (body_sample_ratio=0.5; the
    # uniform half also hits the subject sometimes, so >= 0.4 is safe)
    on_body = (msk * bmask)[rr.coord[:, 0], rr.coord[:, 1]] == 1
    assert on_body.mean() >= 0.4
    # deterministic under the same rng stream
    rr2 = sample_train_rays_random(
        img, msk, K, R, T.reshape(3, 1), bounds,
        np.random.default_rng(7), n_rays=n_rays, body_ratio=0.5,
    )
    np.testing.assert_array_equal(rr.coord, rr2.coord)

    # pathological geometry (AABB behind the camera): the 64-round cap pads
    # and must SAY so (the reference's loop is unbounded,
    # if_nerf_data_utils.py:516-614) — padding rays are loss-masked
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rr_bad = sample_train_rays_random(
            img, msk, K, R, T.reshape(3, 1), bounds + [[1000.0, 1000.0, 0.0]],
            np.random.default_rng(7), n_rays=32, body_ratio=0.5,
        )
    assert "padded" in buf.getvalue()
    assert not rr_bad.rays.mask.any()

    # dataset routing: use_patch_sampling=False fills target_rgb
    cfg2 = copy.deepcopy(cfg)
    cfg2.patch.use_patch_sampling = False
    cfg2.N_rand = 64
    ds2 = ZJUDataset(cfg2, "train", smpl=smpl, human_info=info)
    ds2.set_epoch(0)
    s = ds2.get_train_sample(0)
    assert s.target_patches is None and s.ray_pixel_idx is None
    assert s.target_rgb.shape == (64, 3)
    assert s.rays.ray_o.shape == (64, 3)


def test_rot_ratio_aug_wiring(fake_zju):
    """rot_ratio > 0 sets aug fields on train frames and keeps the invariant
    to_smpl(frame, verts_world) == tar_verts_smpl (the aug'd canonical verts,
    can_smpl.py:244 + if_clight_renderer.py:305-323)."""
    import copy

    from transhuman_tpu.render.pipeline import to_smpl

    cfg, smpl, info = fake_zju
    cfg2 = copy.deepcopy(cfg)
    cfg2.rot_ratio = 1.0
    ds = ZJUDataset(cfg2, "train", smpl=smpl, human_info=info)
    ds.set_epoch(0)
    s = ds.get_train_sample(1)
    assert s.frame.aug_rot is not None
    assert s.frame.aug_rot.shape == (3, 3)
    got = np.asarray(to_smpl(s.frame, s.frame.verts_world))
    np.testing.assert_allclose(got, s.frame.tar_verts_smpl, atol=1e-5)
    # the aug actually moved the canonical verts
    plain = (s.frame.verts_world - s.frame.Th) @ s.frame.Rh
    assert np.abs(plain - s.frame.tar_verts_smpl).max() > 1e-4

    # default rot_ratio=0 and eval frames carry no aug fields
    ds0 = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    ds0.set_epoch(0)
    assert ds0.get_train_sample(1).frame.aug_rot is None
    dse = ZJUDataset(cfg2, "test", smpl=smpl, human_info=info)
    assert dse.get_eval_item(0).frame.aug_rot is None


def test_rasterize_false_gives_all_ones_vizmaps(fake_zju):
    """cfg.rasterize=False skips precomputed visibility entirely
    (if_clight_renderer.py:176-181: every vertex visible)."""
    import copy

    cfg, smpl, info = fake_zju
    cfg2 = copy.deepcopy(cfg)
    cfg2.rasterize = False
    ds = ZJUDataset(cfg2, "train", smpl=smpl, human_info=info)
    ds.set_epoch(0)
    s = ds.get_train_sample(0)
    np.testing.assert_array_equal(s.frame.vizmaps, 1.0)


def test_loader_keeps_workers_busy():
    """The loader must keep num_workers + prefetch fetches in flight —
    in-flight was once capped at `prefetch` alone, silently serializing a
    5-worker loader to 2-wide (r3 regression guard)."""
    import threading
    import time

    peak = 0
    active = 0
    lock = threading.Lock()

    def fetch(i):
        nonlocal peak, active
        with lock:
            active += 1
            peak = max(peak, active)
        time.sleep(0.05)
        with lock:
            active -= 1
        return i

    out = list(Loader(fetch, range(24), num_workers=4, prefetch=2))
    assert out == list(range(24))  # order preserved
    assert peak >= 4, f"only {peak} fetches ever ran concurrently"


def test_loader_early_exit_cancels_queue():
    """Breaking out of a Loader iteration must cancel queued fetches (the
    teardown once ran every in-flight decode to completion after a
    KeyboardInterrupt) and num_workers=1 must still overlap via a worker
    thread instead of silently ignoring prefetch."""
    import threading
    import time

    started = []

    def fetch(i):
        started.append(i)
        time.sleep(0.05)
        return i

    it = iter(Loader(fetch, range(50), num_workers=2, prefetch=2))
    assert next(it) == 0
    it.close()  # generator teardown = early consumer exit
    time.sleep(0.3)  # give any (wrongly) surviving queue time to drain
    assert len(started) <= 10, f"{len(started)} fetches ran after close"

    # num_workers=1: fetches run on a WORKER thread (overlap), not inline
    main = threading.get_ident()
    tids = set()
    out = list(Loader(lambda i: tids.add(threading.get_ident()) or i,
                      range(4), num_workers=1, prefetch=2))
    assert out == [0, 1, 2, 3]
    assert main not in tids
