"""End-to-end render pipeline smoke tests on tiny synthetic inputs (CPU).

Mirrors BASELINE.json config-1 (single-frame render) at doll-house scale:
random params, synthetic SMPL stand-in, 3 views, a handful of rays.
Checks: shapes, finiteness, train path == chunked inference path on the same
points, masked/padded rays -> exact zeros.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transhuman_tpu.geometry.clusters import ClusterSpec
from transhuman_tpu.geometry.smpl import SMPLModel
from transhuman_tpu.models.network import TransHumanNet
from transhuman_tpu.render.pipeline import (
    FrameInputs,
    RayBundle,
    RenderPipeline,
    pad_rays,
)

V, H, W = 3, 32, 32
NV = 120  # tiny vertex count
NC = 12  # tiny cluster count

# jit wrapper shared per (pipe, method): eager execution of the full render
# costs tens of seconds per call in per-primitive dispatch on this platform,
# while the jitted program executes in ms and its XLA compile persists in
# conftest's compilation cache across suite runs.  Keying on the pipe object
# also lets tests that render the same pipe share one trace+compile.
from transhuman_tpu.testing import jit_method as J  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    smpl = SMPLModel.synthetic(n_verts=NV)
    cluster = ClusterSpec.from_kmeans(smpl.v_template, NC, iters=5)
    model = TransHumanNet(embed_dim=24, vit_depth=2, vit_heads=2, knn_k=4)
    pipe = RenderPipeline(
        model, cluster, smpl.v_template, n_samples=8, chunk_rays=4
    )

    verts, _, T = smpl(np.zeros(72), np.zeros(10))
    Rh = np.eye(3, dtype=np.float32)
    Th = np.zeros(3, dtype=np.float32)

    K = np.tile(
        np.array([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]], np.float32),
        (V, 1, 1),
    )
    Rm = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    Tm = np.tile(np.array([0, 0, 3.0], np.float32), (V, 1))

    frame = FrameInputs(
        images=jnp.asarray(rng.random((V, H, W, 3), dtype=np.float32)),
        vizmaps=jnp.ones((V, NV), jnp.float32),
        K=jnp.asarray(K),
        R=jnp.asarray(Rm),
        T=jnp.asarray(Tm),
        verts_world=jnp.asarray(verts),
        tar_verts_smpl=jnp.asarray(verts),
        blend_rot=jnp.asarray(T[:, :3, :3]),
        Rh=jnp.asarray(Rh),
        Th=jnp.asarray(Th),
    )

    n_rays = 8
    ray_o = np.tile(np.array([0, 0, -2.0], np.float32), (n_rays, 1))
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.05
    dirs[:, 2] += 1.0
    rays = RayBundle(
        ray_o=jnp.asarray(ray_o),
        ray_d=jnp.asarray(dirs),
        near=jnp.full((n_rays,), 1.0, jnp.float32),
        far=jnp.full((n_rays,), 3.0, jnp.float32),
        mask=jnp.ones((n_rays,), bool),
    )

    params = model.init(
        jax.random.PRNGKey(0),
        frame.images,
        jnp.zeros((NC, 3)),
        jnp.zeros((16, 3)),
        jnp.zeros((NC, 3)),
        jnp.zeros((NC, 3, 3)),
        jnp.zeros((16, 27)),
    )
    return pipe, params, frame, rays


def test_train_path_shapes_finite(setup):
    pipe, params, frame, rays = setup
    out = J(pipe, "render_train")(params, frame, rays, rng=jax.random.PRNGKey(1))
    assert out["rgb_map"].shape == (8, 3)
    assert out["acc_map"].shape == (8,)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_train_path_differentiable(setup):
    pipe, params, frame, rays = setup

    def loss(p):
        out = pipe.render_train(p, frame, rays)
        return jnp.mean(out["rgb_map"] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_inference_matches_train_path_without_cull(setup):
    """With the cull distance set huge, the chunked inference path must equal
    the one-shot (deterministic) train path on identical rays."""
    pipe, params, frame, rays = setup
    out_train = J(pipe, "render_train")(params, frame, rays, rng=None)
    big = RenderPipeline.__new__(RenderPipeline)
    big.__dict__.update(pipe.__dict__)
    big.cull_distance = 1e9
    out_inf = J(big)(params, frame, rays)
    np.testing.assert_allclose(
        np.asarray(out_inf["rgb_map"]),
        np.asarray(out_train["rgb_map"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_inf["acc_map"]),
        np.asarray(out_train["acc_map"]),
        atol=1e-4,
    )


def test_padding_rays_render_zero(setup):
    pipe, params, frame, rays = setup
    padded = pad_rays(
        RayBundle(*[np.asarray(x) for x in (rays.ray_o, rays.ray_d, rays.near, rays.far, rays.mask)]),
        12,
    )
    out = J(pipe)(params, frame, jax.tree.map(jnp.asarray, padded))
    assert out["rgb_map"].shape[0] == 12
    np.testing.assert_array_equal(np.asarray(out["rgb_map"][8:]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["acc_map"][8:]), 0.0)


def test_culling_zeroes_far_rays(setup):
    """Rays whose samples are all far from the body must composite to zero."""
    pipe, params, frame, _ = setup
    n = 4
    ray_o = np.tile(np.array([50.0, 50.0, -2.0], np.float32), (n, 1))
    rays = RayBundle(
        ray_o=jnp.asarray(ray_o),
        ray_d=jnp.tile(jnp.asarray([0, 0, 1.0], jnp.float32), (n, 1)),
        near=jnp.ones((n,), jnp.float32),
        far=jnp.full((n,), 3.0, jnp.float32),
        mask=jnp.ones((n,), bool),
    )
    out = J(pipe)(params, frame, rays)
    np.testing.assert_array_equal(np.asarray(out["rgb_map"]), 0.0)


def test_quantized_pixel_features_close_to_fp(setup):
    """int8 pixel-map mode matches the fp path within quantization noise."""
    pipe, params, frame, rays = setup
    base = J(pipe)(params, frame, rays)
    q = RenderPipeline.__new__(RenderPipeline)
    q.__dict__.update(pipe.__dict__)
    q.quantize_pixel_feat = True
    quant = J(q)(params, frame, rays)
    a, b = np.asarray(base["rgb_map"]), np.asarray(quant["rgb_map"])
    assert np.abs(a - b).max() < 0.05
    assert np.abs(a - b).mean() < 0.01


def test_compaction_matches_plain_render_frame(setup):
    """Static-capacity compaction returns bit-comparable maps to the plain
    chunked path (masked points produce raw=0 in both) and reports overflow
    honestly when the capacity is too small."""
    pipe, params, frame, rays = setup
    base = J(pipe)(params, frame, rays)
    assert float(np.abs(np.asarray(base["acc_map"])).sum()) > 0.1  # non-trivial scene
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9
    out = J(c)(params, frame, rays)
    assert int(out["overflow"][0]) == 0
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(base[k]), atol=2e-5
        )

    # starve the capacity -> the overflow count must say so
    tiny = RenderPipeline.__new__(RenderPipeline)
    tiny.__dict__.update(pipe.__dict__)
    tiny.compact_ratio = 0.01
    tiny.cull_distance = 1e9  # everything active
    over = J(tiny)(params, frame, rays)
    assert int(over["overflow"][0]) > 0


def test_sigma_compaction_matches_plain(setup):
    """render_sigma with compaction == plain path on a small grid."""
    pipe, params, frame, _ = setup
    cp = pipe.chunk_rays * pipe.n_samples
    rng = np.random.default_rng(5)
    n = 4 * cp
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    )
    mask = jnp.asarray(rng.random(n) < 0.9)
    base, over0 = J(pipe, "render_sigma")(params, frame, pts, mask)
    assert int(over0[0]) == 0
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9
    got, over = J(c, "render_sigma")(params, frame, pts, mask)
    assert int(over[0]) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-5)


def test_compact_all_rays_masked(setup):
    """A fully masked bundle renders exact zeros with zero overflow."""
    pipe, params, frame, rays = setup
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.5
    import jax.numpy as jnp

    dead = RayBundle(
        ray_o=rays.ray_o, ray_d=rays.ray_d, near=rays.near, far=rays.far,
        mask=jnp.zeros_like(rays.mask),
    )
    out = J(c)(params, frame, dead)
    np.testing.assert_array_equal(np.asarray(out["rgb_map"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["acc_map"]), 0.0)
    assert int(out["overflow"][0]) == 0


def test_compact_respects_aug_fields(setup):
    """Compact render with transform_can_smpl aug fields == plain render
    with the same fields (the aug moves the cull geometry consistently)."""
    import jax.numpy as jnp

    from transhuman_tpu.data.aug import transform_can_smpl

    pipe, params, frame, rays = setup
    rng = np.random.default_rng(11)
    verts_smpl = np.asarray((frame.verts_world - frame.Th) @ frame.Rh)
    aug_verts, center, rot3, trans = transform_can_smpl(verts_smpl, rng, 1.0)
    f2 = frame.replace(
        tar_verts_smpl=jnp.asarray(aug_verts),
        aug_center=jnp.asarray(center),
        aug_rot=jnp.asarray(rot3),
        aug_trans=jnp.asarray(trans),
    )
    base = J(pipe)(params, f2, rays)
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9
    out = J(c)(params, f2, rays)
    assert int(out["overflow"][0]) == 0
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(base[k]), atol=2e-5
        )


def test_one_shot_single_input_view(setup):
    """One-shot generalization: the reference's scripts/test.sh ships a
    `test_input_view="0,"` row (single reference view). Every view axis in
    the pipeline must be genuinely dynamic — same params, V=1 frame."""
    pipe, params, frame, rays = setup
    f1 = frame.replace(
        images=frame.images[:1],
        vizmaps=frame.vizmaps[:1],
        K=frame.K[:1],
        R=frame.R[:1],
        T=frame.T[:1],
    )
    out = J(pipe)(params, f1, rays)
    assert out["rgb_map"].shape == (rays.ray_o.shape[0], 3)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    assert float(np.abs(np.asarray(out["acc_map"])).sum()) > 0.0

    # train path + gradients also work at V=1
    def loss(p):
        return jnp.mean(pipe.render_train(p, f1, rays)["rgb_map"] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


def test_compact_pipe_dense_fallback_equals_pure_dense(setup):
    """The compaction-enabled pipe's dense fallback applies the cluster
    prefilter for compact-vs-dense consistency-by-construction; in exact
    (f32/CPU) arithmetic the prefilter is a superset of the cull, so the
    fallback must be BITWISE equal to a pure-dense pipe's render (any
    difference would mean the 'conservative' prefilter dropped a culled-in
    point — the invariant the bf16 consistency argument rests on)."""
    pipe, params, frame, rays = setup
    pure = J(pipe, "render_frame_dense")(params, frame, rays)
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9
    fallback = J(c, "render_frame_dense")(params, frame, rays)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_array_equal(np.asarray(fallback[k]), np.asarray(pure[k]))
