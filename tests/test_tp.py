"""Tensor-parallel (GSPMD) train step: equality vs the shard_map DP step,
and actual 'model'-axis sharding of params + Adam state.

The reference has no TP (SURVEY.md §2.4); this is the TPU-native extension
for the vit_small/vit_base TransHE factories (vision_transformer.py:404-417).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from transhuman_tpu.parallel.tp import (
    make_tp_mesh,
    make_tp_train_step,
    shard_train_state,
    tp_param_specs,
)
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state


def _setup(axis_name):
    return synthetic_setup(
        image_hw=(16, 16),
        n_verts=64,
        n_clusters=8,
        n_samples=4,
        embed_dim=12,
        vit_depth=1,
        vit_heads=2,
        knn_k=3,
        chunk_rays=16,
        axis_name=axis_name,
    )


def _batch(frame, n_rays=16, ps=4, b=4):
    rng = np.random.default_rng(1)
    sample = TrainSample(
        frame=frame,
        rays=synthetic_rays(n_rays),
        target_patches=rng.random((1, ps, ps, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(n_rays, dtype=np.int32),
    )
    batch = jax.tree.map(
        lambda x: np.broadcast_to(
            np.asarray(x)[None], (b,) + np.asarray(x).shape
        ).copy(),
        sample,
    )
    # vary the targets so per-sample grads differ (catches batch-axis mixups)
    batch = batch.replace(
        target_patches=rng.random((b, 1, ps, ps, 3)).astype(np.float32)
    )
    return batch


def test_tp_step_matches_dp_and_shards_params():
    # reference: the existing shard_map DP step on ONE device (axis size 1)
    model_dp, pipe_dp, frame, _, cluster = _setup(("batch", "data"))
    params = init_params(
        model_dp, frame, cluster.num_clusters, jax.random.PRNGKey(0)
    )
    batch = _batch(frame)
    rng = jax.random.PRNGKey(7)
    tx, _ = make_optimizer(iters_per_epoch=2)

    dp_step = make_train_step(pipe_dp, tx, mesh=None, donate=False)
    dp_state, dp_stats = dp_step(init_state(params, tx), batch, rng)

    # GSPMD TP step over ('data','model') = (2, 2); under plain jit the
    # SyncBN axis is the global vmapped batch, so the model binds only 'batch'
    _, pipe_tp, _, _, _ = _setup(("batch",))
    mesh = make_tp_mesh(2, 2)
    tp_step = make_tp_train_step(pipe_tp, tx, mesh, donate=False)
    state0 = shard_train_state(mesh, init_state(params, tx))
    from transhuman_tpu.parallel import shard_batch

    tp_state, tp_stats = tp_step(state0, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(
        float(tp_stats["loss"]), float(dp_stats["loss"]), rtol=1e-5
    )
    flat_dp = jax.tree_util.tree_leaves_with_path(dp_state.params)
    flat_tp = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(tp_state.params)
    )
    for p, x in flat_dp:
        np.testing.assert_allclose(
            np.asarray(flat_tp[jax.tree_util.keystr(p)]),
            np.asarray(x),
            rtol=2e-4,
            atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )

    # params AND Adam moments really live sharded over 'model'
    qkv = tp_state.params["params"]["transhe"]["block_0"]["attn"]["qkv"]
    assert qkv["kernel"].sharding.spec == P(None, "model")
    assert qkv["bias"].sharding.spec == P("model")
    mu = None
    for part in jax.tree_util.tree_leaves_with_path(tp_state.opt_state):
        s = jax.tree_util.keystr(part[0])
        if s.endswith("['transhe']['block_0']['attn']['qkv']['kernel']") and ".mu" in s:
            mu = part[1]
    assert mu is not None and mu.sharding.spec == P(None, "model")
    assert int(tp_state.step) == 1


def test_tp_checkpoint_roundtrip_resume(tmp_path):
    """Sharded-state checkpointing end to end (VERDICT r3 #5): train 2 steps
    under ('data','model'), save through the ASYNC checkpointer, restart
    into a FRESH mesh exactly the way cli/train.py resumes (init_state +
    replace + shard_train_state), and require (a) bitwise state equality
    after the round trip, (b) a bitwise-identical third step vs the
    uninterrupted sharded run, (c) tolerance-level agreement of the final
    params with an unsharded single-device run of the same 3 steps."""
    from transhuman_tpu.parallel import shard_batch
    from transhuman_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint

    model_dp, pipe_dp, frame, _, cluster = _setup(("batch", "data"))
    params = init_params(
        model_dp, frame, cluster.num_clusters, jax.random.PRNGKey(0)
    )
    batch = _batch(frame)
    tx, _ = make_optimizer(iters_per_epoch=2)
    rngs = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(3)]

    # unsharded oracle: the shard_map DP step on one device, 3 steps
    dp_step = make_train_step(pipe_dp, tx, mesh=None, donate=False)
    dp_state = init_state(params, tx)
    for r in rngs:
        dp_state, _ = dp_step(dp_state, batch, r)

    _, pipe_tp, _, _, _ = _setup(("batch",))
    mesh = make_tp_mesh(2, 2)
    tp_step = make_tp_train_step(pipe_tp, tx, mesh, donate=False)
    tp_batch = shard_batch(mesh, batch)

    # uninterrupted sharded run: 3 steps
    full = shard_train_state(mesh, init_state(params, tx))
    for r in rngs:
        full, _ = tp_step(full, tp_batch, r)

    # interrupted run: 2 steps -> async save -> resume into a fresh mesh
    state = shard_train_state(mesh, init_state(params, tx))
    for r in rngs[:2]:
        state, _ = tp_step(state, tp_batch, r)
    ckpt_dir = str(tmp_path / "model")
    cp = AsyncCheckpointer()
    cp.save(
        ckpt_dir,
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step},
        epoch=0,
    )
    cp.wait()

    mesh2 = make_tp_mesh(2, 2)  # fresh mesh object, same topology
    ckpt = load_checkpoint(ckpt_dir)
    resumed = init_state(ckpt["params"], tx)
    resumed = resumed.replace(
        step=jnp.asarray(ckpt["step"]),
        opt_state=jax.tree.map(jnp.asarray, ckpt["opt_state"]),
    )
    resumed = shard_train_state(mesh2, resumed)

    # (a) bitwise equality of every leaf after the round trip, sharding kept
    def assert_bitwise(a, b):
        fa = jax.tree_util.tree_leaves_with_path(a)
        fb = dict(
            (jax.tree_util.keystr(p), x)
            for p, x in jax.tree_util.tree_leaves_with_path(b)
        )
        assert len(fa) == len(fb)
        for p, x in fa:
            y = fb[jax.tree_util.keystr(p)]
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=jax.tree_util.keystr(p)
            )

    assert_bitwise(state.params, resumed.params)
    assert_bitwise(state.opt_state, resumed.opt_state)
    assert int(resumed.step) == 2
    qkv = resumed.params["params"]["transhe"]["block_0"]["attn"]["qkv"]
    assert qkv["kernel"].sharding.spec == P(None, "model")

    # (b) the continued step is bitwise identical to the uninterrupted run
    resumed, _ = tp_step(resumed, shard_batch(mesh2, batch), rngs[2])
    assert_bitwise(full.params, resumed.params)
    assert_bitwise(full.opt_state, resumed.opt_state)

    # (c) and agrees with the unsharded oracle to numeric tolerance
    flat_dp = jax.tree_util.tree_leaves_with_path(dp_state.params)
    flat_tp = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(resumed.params)
    )
    for p, x in flat_dp:
        np.testing.assert_allclose(
            np.asarray(flat_tp[jax.tree_util.keystr(p)]),
            np.asarray(x),
            rtol=5e-4,
            atol=5e-6,
            err_msg=jax.tree_util.keystr(p),
        )


def test_tp_grad_accum_matches_one_shot():
    """accum_steps under the GSPMD step: the strided microbatch split keeps
    each data shard's rows local, and with identical input images across the
    batch the result must match accum_steps=1 up to fp reduction order
    (train/step.py::accum_value_and_grad)."""
    from transhuman_tpu.parallel import shard_batch

    _, pipe_tp, frame, _, cluster = _setup(("batch",))
    params = init_params(
        pipe_tp.model, frame, cluster.num_clusters, jax.random.PRNGKey(0)
    )
    batch = _batch(frame)
    tx, _ = make_optimizer(iters_per_epoch=2)
    mesh = make_tp_mesh(2, 2)
    rng = jax.random.PRNGKey(7)

    outs = []
    for accum in (1, 2):
        step = make_tp_train_step(pipe_tp, tx, mesh, donate=False,
                                  accum_steps=accum)
        st, stats = step(
            shard_train_state(mesh, init_state(params, tx)),
            shard_batch(mesh, batch), rng,
        )
        outs.append((st, float(stats["loss"])))
    (s1, l1), (s2, l2) = outs
    assert abs(l1 - l2) < 1e-6
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_tp_specs_fall_back_when_not_divisible():
    model, pipe, frame, _, cluster = _setup(("batch",))
    params = init_params(
        model, frame, cluster.num_clusters, jax.random.PRNGKey(0)
    )
    mesh = make_tp_mesh(1, 8)  # qkv dims (12, 36) don't divide by 8
    specs = tp_param_specs(params, mesh)
    blk = specs["params"]["transhe"]["block_0"]
    assert blk["attn"]["qkv"]["kernel"] == P()
    assert blk["mlp_fc1"]["kernel"] == P(None, "model")  # 48 % 8 == 0


def test_tp_step_rejects_manual_axis_models():
    _, pipe, _, _, _ = _setup(("batch", "data"))
    tx, _ = make_optimizer(iters_per_epoch=2)
    with pytest.raises(ValueError, match="axis_name"):
        make_tp_train_step(pipe, tx, make_tp_mesh(2, 2))
