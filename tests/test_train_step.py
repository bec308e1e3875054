"""Train-step tests on the virtual 8-device CPU mesh.

Checks: a step runs and updates params; the 8-way data-parallel step produces
the same update as the single-device step on the same global batch (= DDP
allreduce semantics); the LR schedule matches the reference shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transhuman_tpu.geometry.clusters import ClusterSpec
from transhuman_tpu.geometry.smpl import SMPLModel
from transhuman_tpu.models.network import TransHumanNet
from transhuman_tpu.parallel import make_mesh, shard_batch
from transhuman_tpu.render.pipeline import FrameInputs, RayBundle, RenderPipeline
from transhuman_tpu.train import (
    TrainSample,
    make_optimizer,
    make_train_step,
    warmup_cosine_epoch_schedule,
)
from transhuman_tpu.train.step import init_state

V, H, W, NV, NC, NR, NS = 3, 16, 16, 60, 8, 16, 4
PS = 4  # patch size; 1 patch of 4x4 = 16 rays


def make_sample(seed):
    rng = np.random.default_rng(seed)
    smpl = SMPLModel.synthetic(n_verts=NV)
    verts, _, T = smpl(np.zeros(72), np.zeros(10))
    frame = FrameInputs(
        images=rng.random((V, H, W, 3)).astype(np.float32),
        vizmaps=np.ones((V, NV), np.float32),
        K=np.tile(np.array([[[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]]], np.float32), (V, 1, 1)),
        R=np.tile(np.eye(3, dtype=np.float32), (V, 1, 1)),
        T=np.tile(np.array([0, 0, 3.0], np.float32), (V, 1)),
        verts_world=verts,
        tar_verts_smpl=verts,
        blend_rot=T[:, :3, :3],
        Rh=np.eye(3, dtype=np.float32),
        Th=np.zeros(3, np.float32),
    )
    dirs = rng.standard_normal((NR, 3)).astype(np.float32) * 0.05
    dirs[:, 2] += 1.0
    rays = RayBundle(
        ray_o=np.tile(np.array([0, 0, -2.0], np.float32), (NR, 1)),
        ray_d=dirs,
        near=np.full(NR, 1.0, np.float32),
        far=np.full(NR, 3.0, np.float32),
        mask=np.ones(NR, bool),
    )
    return TrainSample(
        frame=frame,
        rays=rays,
        target_patches=rng.random((1, PS, PS, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(NR, dtype=np.int32),
    )


@pytest.fixture(scope="module")
def tiny():
    smpl = SMPLModel.synthetic(n_verts=NV)
    cluster = ClusterSpec.from_kmeans(smpl.v_template, NC, iters=3)
    model = TransHumanNet(embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3)
    pipe = RenderPipeline(model, cluster, smpl.v_template, n_samples=NS, chunk_rays=8)
    sample = make_sample(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample.frame.images),
        jnp.zeros((NC, 3)),
        jnp.zeros((4, 3)),
        jnp.zeros((NC, 3)),
        jnp.zeros((NC, 3, 3)),
        jnp.zeros((4, 27)),
    )
    return pipe, params


def stack_samples(samples):
    return jax.tree.map(lambda *xs: np.stack(xs), *samples)


def test_step_runs_and_updates(tiny):
    pipe, params = tiny
    tx, _ = make_optimizer(iters_per_epoch=2)
    step = make_train_step(pipe, tx, donate=False)
    state = init_state(params, tx)
    batch = stack_samples([make_sample(i) for i in range(1)])
    new_state, stats = step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(stats["loss"]))
    diff = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).sum(), state.params, new_state.params)
    assert sum(jax.tree.leaves(diff)) > 0


def test_dp8_matches_single_device(tiny):
    pipe, params = tiny
    samples = [make_sample(i) for i in range(8)]
    batch = stack_samples(samples)

    tx, _ = make_optimizer(iters_per_epoch=2)
    # deterministic comparison: drop stochastic depth jitter by fixed rng
    rng = jax.random.PRNGKey(42)

    step1 = make_train_step(pipe, tx, mesh=make_mesh(1), donate=False)
    state1, _ = step1(init_state(params, tx), batch, rng)

    mesh8 = make_mesh(8)
    step8 = make_train_step(pipe, tx, mesh=mesh8, donate=False)
    state8, _ = step8(init_state(params, tx), shard_batch(mesh8, batch), rng)

    # per-sample rngs fold by *global* index, so both layouts evaluate the
    # exact same stochastic renders; only fp reduction order differs.
    a = jax.tree.leaves(jax.tree.map(lambda x: np.asarray(x), state1.params))
    b = jax.tree.leaves(jax.tree.map(lambda x: np.asarray(x), state8.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-5)


def test_lr_schedule_shape():
    sched = warmup_cosine_epoch_schedule(7e-4, 1e-6, 300, 3000, 500)
    # warmup is linear per epoch
    assert abs(float(sched(0)) - 7e-4 / 300) < 1e-9
    assert abs(float(sched(150 * 500)) - 7e-4 * 151 / 300) < 1e-9
    # end of warmup reaches base lr
    assert abs(float(sched(300 * 500)) - 7e-4) < 1e-7
    # final epoch ~ end_lr
    assert abs(float(sched(2999 * 500)) - 1e-6) < 1e-6
    # monotone decreasing after warmup
    xs = [float(sched(e * 500)) for e in range(300, 3000, 270)]
    assert all(x >= y for x, y in zip(xs, xs[1:]))


def test_masked_mse_matches_torch():
    import torch

    from transhuman_tpu.train.loss import masked_mse

    rng = np.random.default_rng(3)
    pred = rng.random((32, 3)).astype(np.float32)
    tgt = rng.random((32, 3)).astype(np.float32)
    mask = rng.random(32) > 0.3
    got = float(masked_mse(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
    # reference: img2mse(rgb_map[mask], rgb[mask]) (if_nerf_clight.py:77-81)
    want = float(
        torch.mean(
            (torch.from_numpy(pred[mask]) - torch.from_numpy(tgt[mask])) ** 2
        )
    )
    assert abs(got - want) < 1e-6


def make_sample_nonpatch(seed):
    s = make_sample(seed)
    rng = np.random.default_rng(seed + 100)
    mask = np.ones(NR, bool)
    mask[-3:] = False  # exercise the masked padding path
    return TrainSample(
        frame=s.frame,
        rays=s.rays.replace(mask=mask) if hasattr(s.rays, "replace")
        else RayBundle(
            ray_o=s.rays.ray_o, ray_d=s.rays.ray_d,
            near=s.rays.near, far=s.rays.far, mask=mask,
        ),
        target_rgb=rng.random((NR, 3)).astype(np.float32),
    )


def test_step_nonpatch_mode(tiny):
    pipe, params = tiny
    tx, _ = make_optimizer(iters_per_epoch=2)
    step = make_train_step(pipe, tx, donate=False, patch_mode=False)
    state = init_state(params, tx)
    batch = stack_samples([make_sample_nonpatch(0)])
    new_state, stats = step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["img_loss"]))
    diff = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a - b)).sum(), state.params, new_state.params
    )
    assert sum(jax.tree.leaves(diff)) > 0


def test_nonpatch_loss_ignores_l2rec_weight(tiny):
    """The reference's non-patch branch adds img_loss UNWEIGHTED —
    l2rec_weight only scales the patch MSE (if_nerf_clight.py:65-81)."""
    pipe, params = tiny
    tx, _ = make_optimizer(iters_per_epoch=2)
    batch = stack_samples([make_sample_nonpatch(0)])
    state = init_state(params, tx)
    losses = []
    for w in (1.0, 7.0):
        step = make_train_step(
            pipe, tx, donate=False, patch_mode=False, l2_weight=w
        )
        _, stats = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(stats["loss"]))
    assert losses[0] == losses[1]


def test_perturb_zero_is_rng_independent(tiny):
    """perturb=False (cfg.perturb=0) removes the stratified jitter: the loss
    is identical under different rng keys; perturb=True is not
    (if_clight_renderer.py:276 gate)."""
    pipe, params = tiny
    tx, _ = make_optimizer()
    batch = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)[None]), make_sample(3)
    )

    step0 = make_train_step(pipe, tx, donate=False, perturb=False)
    s = init_state(params, tx)
    _, a = step0(s, batch, jax.random.PRNGKey(0))
    _, b = step0(s, batch, jax.random.PRNGKey(9))
    assert float(a["loss"]) == float(b["loss"])

    step1 = make_train_step(pipe, tx, donate=False, perturb=True)
    _, c = step1(s, batch, jax.random.PRNGKey(0))
    _, d = step1(s, batch, jax.random.PRNGKey(9))
    assert float(c["loss"]) != float(d["loss"])


def test_grad_accum_matches_one_shot(tiny):
    """accum_steps splits the local batch into sequential microbatches with
    averaged gradients.  With identical input images across the batch the
    BatchNorm statistics are grouping-independent (pooling identical values
    is the identity), and per-sample rngs fold by global index, so every
    accum_steps must produce the same update up to fp reduction order."""
    pipe, params = tiny
    tx, _ = make_optimizer(iters_per_epoch=2)
    base = make_sample(0)
    batch = stack_samples([base] * 4)
    # vary targets so per-sample grads differ (catches microbatch mixups)
    rng_np = np.random.default_rng(11)
    batch = batch.replace(
        target_patches=rng_np.random((4, 1, PS, PS, 3)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(5)

    results = []
    for accum in (1, 2, 4):
        step = make_train_step(pipe, tx, donate=False, accum_steps=accum)
        st, stats = step(init_state(params, tx), batch, rng)
        results.append((st, float(stats["loss"])))
    (s1, l1), (s2, l2), (s4, l4) = results
    assert abs(l1 - l2) < 1e-6 and abs(l1 - l4) < 1e-6
    for a, b in ((s1, s2), (s1, s4)):
        for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-5
            )


def test_grad_accum_rejects_indivisible_batch(tiny):
    pipe, params = tiny
    tx, _ = make_optimizer(iters_per_epoch=2)
    step = make_train_step(pipe, tx, donate=False, accum_steps=3)
    batch = stack_samples([make_sample(i) for i in range(4)])
    with pytest.raises(ValueError, match="divisible"):
        step(init_state(params, tx), batch, jax.random.PRNGKey(0))


def test_remat_grads_match():
    """cfg.remat rematerializes the point decode in the backward pass;
    gradients are the same program modulo scheduling (jax.checkpoint)."""
    smpl = SMPLModel.synthetic(n_verts=NV)
    cluster = ClusterSpec.from_kmeans(smpl.v_template, NC, iters=3)
    model = TransHumanNet(embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3)
    sample = make_sample(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample.frame.images),
        jnp.zeros((NC, 3)),
        jnp.zeros((4, 3)),
        jnp.zeros((NC, 3)),
        jnp.zeros((NC, 3, 3)),
        jnp.zeros((4, 27)),
    )
    tgt = jnp.asarray(
        np.random.default_rng(2).random((NR, 3)).astype(np.float32)
    )

    def grads(remat):
        pipe = RenderPipeline(
            model, cluster, smpl.v_template, n_samples=NS, chunk_rays=8,
            remat=remat,
        )

        def loss(p):
            out = pipe.render_train(
                p, sample.frame, sample.rays, jax.random.PRNGKey(1)
            )
            return jnp.mean((out["rgb_map"] - tgt) ** 2)

        return jax.jit(jax.grad(loss))(params)

    g0, g1 = grads(False), grads(True)
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def _cull_clone(pipe, ratio, cull_distance=None):
    # the product clone path (validated overrides), not a hand-rolled copy
    kw = dict(train_cull=True, train_cull_ratio=ratio)
    if cull_distance is not None:
        kw["cull_distance"] = cull_distance
    return pipe.clone(**kw)


def test_train_cull_compact_matches_mask_oracle(tiny):
    """train.cull semantics: the compacted decode (gather survivors ->
    decode -> scatter raw back) must produce the same loss AND the same
    parameter update as the mask-only oracle (ratio >= 1.0: every point
    decoded, culled ones masked) when capacity holds — compaction is an
    execution detail, not a semantics knob."""
    pipe, params = tiny
    # cull_distance large enough that some (not all) points survive
    oracle = _cull_clone(pipe, 1.0, cull_distance=0.5)
    compact = _cull_clone(pipe, 0.9, cull_distance=0.5)
    tx, _ = make_optimizer(iters_per_epoch=2)
    batch = stack_samples([make_sample(3)])
    key = jax.random.PRNGKey(7)

    step_o = make_train_step(oracle, tx, donate=False)
    step_c = make_train_step(compact, tx, donate=False)
    state = init_state(params, tx)
    so, stats_o = step_o(state, batch, key)
    sc, stats_c = step_c(state, batch, key)
    assert float(stats_c["overflow"]) == 0.0
    assert "overflow" not in stats_o  # mask-only mode has no capacity
    np.testing.assert_allclose(float(stats_c["loss"]), float(stats_o["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        sc.params, so.params,
    )


def test_train_cull_differs_from_unculled_and_converges(tiny):
    """The flag is a real semantics change (culled != unculled on frames
    with off-body density) and the culled step still optimizes: loss
    decreases over a short overfit."""
    pipe, params = tiny
    culled = _cull_clone(pipe, 0.9, cull_distance=0.5)
    tx, _ = make_optimizer(iters_per_epoch=2)
    batch = stack_samples([make_sample(3)])
    key = jax.random.PRNGKey(7)

    step_u = make_train_step(pipe, tx, donate=False)
    step_c = make_train_step(culled, tx, donate=False)
    state = init_state(params, tx)
    _, stats_u = step_u(state, batch, key)
    _, stats_c = step_c(state, batch, key)
    assert abs(float(stats_u["loss"]) - float(stats_c["loss"])) > 0
    # short overfit under the flag
    st = state
    losses = []
    for i in range(6):
        st, stats = step_c(st, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_train_cull_overflow_reported(tiny):
    """Capacity clips must surface in stats (clipped points silently lose
    gradient otherwise)."""
    pipe, params = tiny
    # cull_distance huge -> every point survives; ratio 0.1 -> m = 8 < 64
    clipped = _cull_clone(pipe, 0.1, cull_distance=100.0)
    tx, _ = make_optimizer(iters_per_epoch=2)
    step = make_train_step(clipped, tx, donate=False)
    state = init_state(params, tx)
    _, stats = step(state, stack_samples([make_sample(3)]),
                    jax.random.PRNGKey(0))
    assert float(stats["overflow"]) == NR * NS - 8


def test_train_cull_composes_with_remat(tiny):
    """remat wraps the culled decode too; grads unchanged."""
    pipe, params = tiny
    base = _cull_clone(pipe, 0.9, cull_distance=0.5)
    rem = _cull_clone(pipe, 0.9, cull_distance=0.5)
    rem.remat = True
    tx, _ = make_optimizer(iters_per_epoch=2)
    batch = stack_samples([make_sample(3)])
    key = jax.random.PRNGKey(1)
    state = init_state(params, tx)
    s0, st0 = make_train_step(base, tx, donate=False)(state, batch, key)
    s1, st1 = make_train_step(rem, tx, donate=False)(state, batch, key)
    np.testing.assert_allclose(float(st0["loss"]), float(st1["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        s0.params, s1.params,
    )


def test_train_cull_auto_sentinel_raises(tiny):
    """train.cull_ratio <= 0 is the CLI's 'auto' sentinel; tracing with it
    would size the capacity at zero and silently drop every gradient, so
    render_train must refuse loudly."""
    import pytest

    pipe, params = tiny
    bad = _cull_clone(pipe, 0.0, cull_distance=0.5)
    sample = make_sample(3)
    with pytest.raises(ValueError, match="auto"):
        bad.render_train(
            params,
            jax.tree.map(jnp.asarray, sample.frame),
            jax.tree.map(jnp.asarray, sample.rays),
            jax.random.PRNGKey(0),
        )


def test_train_cull_fraction_matches_predicate(tiny):
    """train_cull_fraction (what sizes the auto ratio) equals the culled
    decode's own keep-count over the same sample."""
    pipe, params = tiny
    from transhuman_tpu.render.pipeline import to_smpl
    from transhuman_tpu.render.volume import sample_along_rays

    sample = make_sample(5)
    frame = jax.tree.map(jnp.asarray, sample.frame)
    rays = jax.tree.map(jnp.asarray, sample.rays)
    frac = float(jax.jit(pipe.train_cull_fraction)(frame, rays))
    pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far,
                               pipe.n_samples)
    flat = pts.reshape(-1, 3)
    keep = pipe._cull(to_smpl(frame, flat), frame.tar_verts_smpl)
    m = jnp.repeat(rays.mask, pipe.n_samples)
    want = float(jnp.sum(keep & m)) / flat.shape[0]
    np.testing.assert_allclose(frac, want, atol=1e-7)
    assert 0.0 <= frac <= 1.0


def test_train_cull_composes_with_vertex_radii(tiny):
    """train.cull shares the inference cull predicate (_cull), so per-vertex
    radii (cfg.cull_radii) tighten the TRAINING cull too: the radii-culled
    compact step must (a) match its own mask-only oracle to the update
    level when capacity holds, and (b) differ from the uniform-shell culled
    step — the radii actually change which points receive gradient."""
    pipe, params = tiny
    rng = np.random.default_rng(3)
    radii = np.full(NV, 0.05, np.float32)
    radii[rng.choice(NV, NV // 4, replace=False)] = 0.5
    oracle = pipe.clone(train_cull=True, train_cull_ratio=1.0,
                        vertex_radii=radii)
    compact = pipe.clone(train_cull=True, train_cull_ratio=0.9,
                         vertex_radii=radii)
    shell = pipe.clone(train_cull=True, train_cull_ratio=0.9,
                       cull_distance=0.5)
    tx, _ = make_optimizer(iters_per_epoch=2)
    batch = stack_samples([make_sample(3)])
    key = jax.random.PRNGKey(7)
    state = init_state(params, tx)
    so, st_o = make_train_step(oracle, tx, donate=False)(state, batch, key)
    sc, st_c = make_train_step(compact, tx, donate=False)(state, batch, key)
    _, st_s = make_train_step(shell, tx, donate=False)(state, batch, key)
    assert float(st_c["overflow"]) == 0.0
    np.testing.assert_allclose(float(st_c["loss"]), float(st_o["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        sc.params, so.params,
    )
    assert abs(float(st_c["loss"]) - float(st_s["loss"])) > 0


def test_all_reference_optimizers_build_and_step():
    """The reference factory's four options (optimizer.py:4-9) all make a
    working transform."""
    import optax

    p = {"w": jnp.ones((3,))}
    for name in ("adam", "radam", "sgd", "adamw"):
        tx, _ = make_optimizer(optim=name, weight_decay=0.01 if name == "adamw" else 0.0)
        st = tx.init(p)
        up, _ = tx.update({"w": jnp.full((3,), 0.1)}, st, p)
        q = optax.apply_updates(p, up)
        assert np.isfinite(np.asarray(q["w"])).all()
