"""Ray-sharded inference over the virtual 8-device mesh == single device."""

import jax
import jax.numpy as jnp
import numpy as np

from transhuman_tpu.parallel import make_mesh
from transhuman_tpu.parallel.infer import make_sharded_render
from transhuman_tpu.render.pipeline import pad_rays
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup


def test_sharded_render_matches_single():
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(24, 24), n_verts=80, n_clusters=10, n_samples=4,
        chunk_rays=4, embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    frame = jax.tree.map(jnp.asarray, frame)
    mesh = make_mesh(8)
    render, pad_mult = make_sharded_render(pipe, mesh)
    assert pad_mult == 32

    rays = pad_rays(synthetic_rays(40), pad_mult)
    rays = jax.tree.map(jnp.asarray, rays)

    out_sharded = render(params, frame, rays)
    out_single = jax.jit(pipe.render_frame)(params, frame, rays)
    for k in out_single:
        np.testing.assert_allclose(
            np.asarray(out_sharded[k]), np.asarray(out_single[k]), atol=1e-5
        )


def test_sharded_render_with_compaction_matches_single():
    """Ray sharding composes with static-capacity compaction; overflow
    comes back per-shard ((n_dev,) after the concat)."""
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(24, 24), n_verts=80, n_clusters=10, n_samples=4,
        chunk_rays=4, embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3,
        compact_ratio=0.9,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    frame = jax.tree.map(jnp.asarray, frame)
    mesh = make_mesh(8)
    render, pad_mult = make_sharded_render(pipe, mesh)

    rays = pad_rays(synthetic_rays(40), pad_mult)
    rays = jax.tree.map(jnp.asarray, rays)

    out_sharded = render(params, frame, rays)
    assert out_sharded["overflow"].shape == (8,)
    assert int(np.asarray(out_sharded["overflow"]).sum()) == 0
    out_single = jax.jit(pipe.render_frame)(params, frame, rays)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out_sharded[k]), np.asarray(out_single[k]), atol=1e-5
        )


def test_cli_make_render_uses_ray_mesh():
    from transhuman_tpu.cli.run import _make_render
    from transhuman_tpu.config import Config

    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(24, 24), n_verts=80, n_clusters=10, n_samples=4,
        chunk_rays=4, embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3,
    )
    cfg = Config().merge_dict({"mesh_axis_rays": 8, "pad_bucket": 50})
    render, bucket = _make_render(cfg, pipe)
    assert bucket % (8 * pipe.chunk_rays) == 0 and bucket >= 50

    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = pad_rays(synthetic_rays(40), bucket)
    out = render(params, jax.tree.map(jnp.asarray, frame),
                 jax.tree.map(jnp.asarray, rays))
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_sharded_frame_renderer_recovers_and_retunes():
    """FrameRenderer over an 8-way ray mesh with a starved compact ratio:
    the overflow comes back per-shard, the frame falls back to the sharded
    DENSE render (bit-equal), and the retune sizes capacity from the worst
    shard so the NEXT frame takes the compact path cleanly."""
    import types

    from transhuman_tpu.cli.run import FrameRenderer
    from transhuman_tpu.config import Config

    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(24, 24), n_verts=80, n_clusters=10, n_samples=4,
        chunk_rays=4, embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3,
        compact_ratio=0.01,
    )
    pipe.cull_distance = 1e9  # everything survives -> guaranteed overflow
    pipe.cull_assign = pipe.cull_pool = None  # rebuild tables for new cull
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    cfg = Config().merge_dict({"mesh_axis_rays": 8, "pad_bucket": 32})

    r = FrameRenderer(cfg, pipe)
    eval_rays = types.SimpleNamespace(rays=synthetic_rays(40))
    frame_d = jax.tree.map(jnp.asarray, frame)

    dense_fn, _ = __import__(
        "transhuman_tpu.cli.run", fromlist=["_make_render"]
    )._make_render(cfg, pipe, dense=True)
    rays_pad = pad_rays(eval_rays.rays, r.bucket)
    dense = dense_fn(params, frame_d, jax.tree.map(jnp.asarray, rays_pad))

    out = r.fetch(params, r.dispatch(params, frame_d, eval_rays), eval_rays)
    assert pipe.compact_ratio > 0.01  # retuned from the worst shard
    n = eval_rays.rays.ray_o.shape[0]
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            out[k], np.asarray(dense[k])[:n], atol=1e-5,
            err_msg=f"{k} differs from the sharded dense render",
        )
    # next frame: compact path at the retuned ratio, no overflow
    out2 = r.fetch(params, r.dispatch(params, frame_d, eval_rays), eval_rays)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(out2[k], np.asarray(dense[k])[:n], atol=1e-5)
