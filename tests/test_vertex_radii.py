"""Per-vertex cull radii (cfg.cull_radii / render/pipeline.py vertex_radii):
the opt-in replacement of the reference's uniform 0.1 m cull shell
(if_clight_renderer.py:440-443) with measured per-vertex reach.

Contracts tested here:
  * uniform radii == cull_distance reproduces the shell predicate (and the
    full render) exactly — the opt-in is a strict generalization;
  * the cluster prefilter stays a SUPERSET of the biased exact cull under
    arbitrary per-vertex radii (the compaction-capacity correctness lemma);
  * tightened radii only ever DROP points vs the shell (one-sided deltas)
    and the compact and dense paths stay consistent by construction;
  * the measurement tool produces valid radii and its delta report matches
    a from-scratch render comparison.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transhuman_tpu.render.pipeline import RenderPipeline, pad_rays, to_smpl
from transhuman_tpu.testing import init_params, jit_method, synthetic_rays, synthetic_setup

SETUP = dict(n_verts=400, n_clusters=40, image_hw=(64, 64), embed_dim=36,
             vit_depth=2, vit_heads=2, n_samples=8, chunk_rays=64)


@pytest.fixture(scope="module")
def tiny():
    model, pipe, frame, smpl, cluster = synthetic_setup(
        compact_ratio=0.6, **SETUP)
    params = init_params(model, frame, 40, jax.random.PRNGKey(0))
    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(jnp.asarray, pad_rays(synthetic_rays(256),
                                              pipe.chunk_rays))
    return model, pipe, frame, smpl, cluster, params, rays


def _clone_with_radii(pipe, radii):
    # the fine cull partition is geometry-only (radii enter
    # _prefilter_tables per call), so clones share it
    return pipe.clone(vertex_radii=np.asarray(radii, np.float32))


def test_clone_validates_and_shares(tiny):
    """RenderPipeline.clone applies __init__'s radii validation, rejects
    typo'd knobs, and shares the geometry-only precomputes."""
    model, pipe, frame, smpl, cluster, params, rays = tiny
    with pytest.raises(ValueError, match="vertex_radii has"):
        pipe.clone(vertex_radii=np.full(7, 0.1, np.float32))
    with pytest.raises(ValueError, match="positive and finite"):
        pipe.clone(vertex_radii=np.zeros(400, np.float32))
    with pytest.raises(AttributeError, match="trian_cull"):
        pipe.clone(trian_cull=True)  # typo must not create a dead attribute
    c = pipe.clone(compact_ratio=0.5,
                   vertex_radii=np.full(400, 0.05, np.float32))
    assert c is not pipe and c.compact_ratio == 0.5
    assert pipe.compact_ratio == 0.6  # original untouched
    assert c._canon_verts is pipe._canon_verts  # geometry shared, not copied
    assert c.pe_can is pipe.pe_can


def test_uniform_radii_match_shell_render(tiny):
    model, pipe, frame, smpl, cluster, params, rays = tiny
    base = jit_method(pipe, "render_frame")(params, frame, rays)
    uni = _clone_with_radii(pipe, np.full(400, pipe.cull_distance))
    got = jax.jit(uni.render_frame)(params, frame, rays)
    assert int(np.asarray(got["overflow"])[0]) == 0
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(base[k]), rtol=0, atol=1e-6)


def test_cull_uniform_bias_equals_min_dist(tiny):
    model, pipe, frame, smpl, cluster, params, rays = tiny
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (512, 3)), jnp.float32)
    base = pipe._cull(pts, frame.tar_verts_smpl)
    uni = _clone_with_radii(pipe, np.full(400, pipe.cull_distance))
    got = uni._cull(pts, frame.tar_verts_smpl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_prefilter_superset_under_radii(tiny):
    """Every point the biased exact cull keeps must pass the prefilter —
    the compact path's capacity-correctness lemma under per-vertex radii."""
    model, pipe, frame, smpl, cluster, params, rays = tiny
    rng = np.random.default_rng(2)
    radii = rng.uniform(0.02, 0.1, 400).astype(np.float32)
    p2 = _clone_with_radii(pipe, radii)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (4096, 3)), jnp.float32)
    exact = np.asarray(p2._cull(to_smpl(frame, pts), frame.tar_verts_smpl))
    centers, thresh2 = p2._prefilter_tables(frame)
    pre = np.asarray(p2._prefilter_chunk(frame, pts, centers, thresh2))
    assert exact.sum() > 0  # non-vacuous
    assert not (exact & ~pre).any()


def test_tightened_radii_subset_and_path_consistency(tiny):
    """radii < shell: survivors shrink one-sidedly; compact (stream) and
    dense renders of the SAME radii pipe agree (consistency by
    construction), and deltas vs the shell render are bounded by what the
    dropped points contributed."""
    model, pipe, frame, smpl, cluster, params, rays = tiny
    rng = np.random.default_rng(3)
    radii = np.full(400, 0.04, np.float32)
    p2 = _clone_with_radii(pipe, radii)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (2048, 3)), jnp.float32)
    shell = np.asarray(pipe._cull(pts, frame.tar_verts_smpl))
    tight = np.asarray(p2._cull(pts, frame.tar_verts_smpl))
    assert tight.sum() < shell.sum()
    assert not (tight & ~shell).any()  # clipped radii never ADMIT points

    compact = jax.jit(p2.render_frame)(params, frame, rays)
    assert int(np.asarray(compact["overflow"])[0]) == 0
    dense = jax.jit(p2.render_frame_dense)(params, frame, rays)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(compact[k]), np.asarray(dense[k]),
            rtol=0, atol=1e-5)


def test_vertex_radii_validation():
    model, pipe, frame, smpl, cluster = synthetic_setup(**SETUP)
    from transhuman_tpu.geometry.clusters import ClusterSpec

    with pytest.raises(ValueError, match="entries for"):
        RenderPipeline(model, cluster, smpl.v_template, n_samples=8,
                       chunk_rays=64, vertex_radii=np.full(5, 0.05))
    with pytest.raises(ValueError, match="positive and finite"):
        RenderPipeline(model, cluster, smpl.v_template, n_samples=8,
                       chunk_rays=64, vertex_radii=np.zeros(400))


def test_measure_tool_and_cfg_roundtrip(tmp_path):
    """measure_vertex_radii on a tiny synthetic setup: radii land in
    [min_radius, cull_distance], the delta report matches a from-scratch
    comparison, the npz loads through cfg.cull_radii, and a pipe built from
    it renders overflow-free."""
    from transhuman_tpu.tools.measure_vertex_radii import (
        measure, report_deltas, synthetic_items)

    pipe, params, items = synthetic_items(
        2, 256, compact_ratio=0.6, **SETUP)
    radii, report = measure(pipe, params, items, per_vertex=6,
                            alpha_eps=1e-3, margin=0.005, min_radius=0.01)
    assert radii.shape == (400,)
    assert (radii >= 0.01 - 1e-7).all()
    assert (radii <= pipe.cull_distance + 1e-7).all()
    assert 0.0 <= report["significant_frac"] <= 1.0
    # cross-validation rounds ran: round 1 seeds, later fresh draws expand
    assert report["rounds"] >= 2
    assert report["certified"] == (report["uncovered_per_round"][-1] == 0)
    if report["certified"]:
        # a certified result means an INDEPENDENT probe draw found nothing
        # outside the measured reach
        assert report["uncovered_per_round"][-1] == 0

    rows = report_deltas(pipe, params, radii, items)
    assert len(rows) == 2
    # cross-check one row against a from-scratch comparison
    frame, rays = items[0]
    f = jax.tree.map(jnp.asarray, frame)
    r = jax.tree.map(jnp.asarray, rays)
    base = np.asarray(
        jax.jit(pipe.render_frame_dense)(params, f, r)["rgb_map"])
    p2 = _clone_with_radii(pipe, radii)
    got = np.asarray(jax.jit(p2.render_frame_dense)(params, f, r)["rgb_map"])
    assert rows[0]["max_abs_delta"] == pytest.approx(
        float(np.abs(base - got).max()), abs=1e-6)

    # npz -> cfg.cull_radii -> registry builder
    out = tmp_path / "radii.npz"
    np.savez(out, radii=radii, meta=json.dumps(report["radii"]))
    from transhuman_tpu.config import Config
    from transhuman_tpu.registry import RENDERERS

    cfg = Config().merge_dict({
        "cull_radii": str(out), "N_samples": 8, "chunk_size": 512,
        "compact_ratio": 0.6,
    })
    _, _, frame0, smpl, cluster = synthetic_setup(compact_ratio=0.6, **SETUP)
    built = RENDERERS.get(cfg.renderer)(
        pipe.model, cluster, smpl.v_template, cfg)
    np.testing.assert_array_equal(built.vertex_radii, radii)
    out2 = jax.jit(built.render_frame)(
        params, jax.tree.map(jnp.asarray, frame0),
        jax.tree.map(jnp.asarray, items[0][1]))
    assert int(np.asarray(out2["overflow"])[0]) == 0
