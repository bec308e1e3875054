"""Compaction-overflow auto-recovery: no code path may ship rgb/mesh holes.

The reference's scatter is always complete (if_clight_renderer.py:468-482,
if_mesh_renderer.py:46-96) because it uses dynamic shapes; our
static-capacity compaction can clip when cfg.compact_ratio is set too
small.  The CLI's FrameRenderer and extract_mesh must detect the overflow
and transparently re-render through the dense (compaction-off) path, so the
written image/mesh equals the dense result bit-for-bit even with a
pathological ratio.
"""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from transhuman_tpu.render.pipeline import RenderPipeline

from test_pipeline import setup  # noqa: F401  (module-scoped fixture)


def _twin(pipe, ratio, cull=None):
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    # drop jits cached on the source pipe: they are bound to ITS methods
    for k in ("_render_sigma_jit", "_render_sigma_dense_jit"):
        c.__dict__.pop(k, None)
    c.compact_ratio = ratio
    if cull is not None:
        c.cull_distance = cull
    return c


def _starved(pipe, ratio=0.01):
    return _twin(pipe, ratio, cull=1e9)  # everything active -> overflow


def _cfg():
    return types.SimpleNamespace(mesh_axis_rays=1, pad_bucket=8)


def test_frame_renderer_recovers_from_overflow(setup, capsys):  # noqa: F811
    from transhuman_tpu.cli.run import FrameRenderer

    pipe, params, frame, rays = setup
    starved = _starved(pipe)
    # dense ground truth with the same (huge) cull distance
    dense = starved.render_frame_dense(params, frame, rays)

    r = FrameRenderer(_cfg(), starved)
    eval_rays = types.SimpleNamespace(rays=rays)
    out = r.fetch(params, r.dispatch(params, frame, eval_rays), eval_rays)
    assert "compaction capacity clipped" in capsys.readouterr().out
    assert "overflow" not in out
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            out[k], np.asarray(dense[k]), atol=2e-5,
            err_msg=f"{k} differs from the dense render after recovery",
        )


def test_frame_renderer_retunes_after_overflow(setup, capsys):  # noqa: F811
    """After one overflow the renderer re-derives the ratio from the
    measured shortfall and rebuilds the compact render, so later frames go
    through the (fast) compact path instead of paying the dense fallback
    forever — while staying bit-equal to the dense result."""
    from transhuman_tpu.cli.run import FrameRenderer

    pipe, params, frame, rays = setup
    starved = _starved(pipe)
    dense = starved.render_frame_dense(params, frame, rays)

    r = FrameRenderer(_cfg(), starved)
    eval_rays = types.SimpleNamespace(rays=rays)
    r.fetch(params, r.dispatch(params, frame, eval_rays), eval_rays)
    msg = capsys.readouterr().out
    assert "auto-tuning compact_ratio" in msg
    assert starved.compact_ratio > 0.01  # grew from the starved setting

    # the NEXT frame uses the re-tuned compact path: no overflow, no dense
    out2 = r.fetch(params, r.dispatch(params, frame, eval_rays), eval_rays)
    msg2 = capsys.readouterr().out
    assert "clipped" not in msg2 and "auto-tuning" not in msg2
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            out2[k], np.asarray(dense[k]), atol=2e-5,
            err_msg=f"{k} differs from dense after the re-tuned compact pass",
        )


def test_retune_skips_inflight_frames(setup, capsys):  # noqa: F811
    """Under pipelining, frame i+1 is dispatched (at the old ratio) before
    frame i's fetch retunes.  Its fetch must compute the need from the ratio
    it actually rendered with and must NOT trigger a second rebuild when the
    retuned ratio already covers it."""
    from transhuman_tpu.cli.run import FrameRenderer

    pipe, params, frame, rays = setup
    starved = _starved(pipe)
    r = FrameRenderer(_cfg(), starved)
    eval_rays = types.SimpleNamespace(rays=rays)

    d0 = r.dispatch(params, frame, eval_rays)
    d1 = r.dispatch(params, frame, eval_rays)  # in flight at the old ratio
    r.fetch(params, d0, eval_rays)
    msg0 = capsys.readouterr().out
    assert msg0.count("auto-tuning") == 1
    tuned = starved.compact_ratio

    out1 = r.fetch(params, d1, eval_rays)
    msg1 = capsys.readouterr().out
    assert "clipped" in msg1              # it rendered starved -> dense path
    assert "auto-tuning" not in msg1      # but no second rebuild
    assert starved.compact_ratio == tuned
    dense = starved.render_frame_dense(params, frame, rays)
    np.testing.assert_allclose(
        out1["rgb_map"], np.asarray(dense["rgb_map"]), atol=2e-5
    )


def test_frame_renderer_no_fallback_when_healthy(setup):  # noqa: F811
    from transhuman_tpu.cli.run import FrameRenderer

    pipe, params, frame, rays = setup
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9
    r = FrameRenderer(_cfg(), c)
    eval_rays = types.SimpleNamespace(rays=rays)
    out = r.fetch(params, r.dispatch(params, frame, eval_rays), eval_rays)
    assert r._dense is None  # healthy run never builds the fallback jit
    base = pipe.render_frame(params, frame, rays)
    np.testing.assert_allclose(
        out["rgb_map"], np.asarray(base["rgb_map"]), atol=2e-5
    )


def test_extract_mesh_recovers_from_overflow(setup, capsys):  # noqa: F811
    from transhuman_tpu.mesh_ops.reconstruct import extract_mesh

    pipe, params, frame, _ = setup
    bounds = np.array([[-0.4, -0.4, -0.4], [0.4, 0.4, 0.4]], np.float32)
    kw = dict(voxel_size=(0.1, 0.1, 0.1), mesh_th=0.05)

    # dense ground truth with the same (huge) cull distance as the starved run
    dense = _twin(pipe, None, cull=1e9)
    verts_d, tris_d, cube_d = extract_mesh(dense, params, frame, bounds, **kw)

    starved = _starved(pipe)
    verts, tris, cube = extract_mesh(starved, params, frame, bounds, **kw)
    msg = capsys.readouterr().out
    assert "compaction capacity clipped" in msg
    assert "auto-tuning compact_ratio" in msg
    assert starved.compact_ratio > 0.01  # retuned from the measured need
    np.testing.assert_allclose(cube, cube_d, atol=1e-6)
    np.testing.assert_allclose(verts, verts_d, atol=1e-6)
    np.testing.assert_array_equal(tris, tris_d)

    # the NEXT frame goes through the (re-jitted) compact sigma pass cleanly
    verts2, tris2, cube2 = extract_mesh(starved, params, frame, bounds, **kw)
    msg2 = capsys.readouterr().out
    assert "clipped" not in msg2 and "auto-tuning" not in msg2
    np.testing.assert_allclose(cube2, cube_d, atol=1e-6)


def test_retune_need_is_per_shard_max(monkeypatch):
    """Under ray sharding (mesh_axis_rays > 1) capacity is PER SHARD
    (pipeline._compact_plan computes it from the local flat count inside
    shard_map), so the retuned ratio must cover the WORST shard — tuning to
    the global average would under-provision a body-concentrated shard and
    re-pay the dense fallback + recompile on every similar frame."""
    import transhuman_tpu.cli.run as run_cli

    monkeypatch.setattr(
        run_cli, "_make_render", lambda cfg, pipe, dense=False: (None, 8)
    )
    pipe = types.SimpleNamespace(n_samples=4, chunk_rays=2, compact_ratio=0.25)
    r = run_cli.FrameRenderer(types.SimpleNamespace(), pipe)
    # 2 shards x 64 rays x 4 samples: local n_flat = 256, chunk = 8
    rays_d = types.SimpleNamespace(ray_o=np.zeros((128, 3), np.float32))
    cap = -(-int(0.25 * 256) // 8) * 8  # 64
    # shard A clipped 100, shard B clipped 4 -> need from the max, not mean
    r._retune(rays_d, np.array([100, 4]), ratio_used=0.25)
    want = min(1.0, 1.15 * (cap + 100) / 256)
    assert pipe.compact_ratio == pytest.approx(want)
    avg_would_be = 1.15 * (cap + 52) / 256
    assert pipe.compact_ratio > avg_would_be
