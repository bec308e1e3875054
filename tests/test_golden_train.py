"""Committed golden TRAIN pin — the training-side sibling of
test_golden_frame.py (VERDICT r3 #4 covered inference only).

Every training parity test recomputes both sides at test time; this pin
catches *joint* drift of the whole train step — loss math
(if_nerf_clight.py:60-81), per-sample rng folding, optimizer/scheduler
(lib/train/optimizer.py, warmup-cosine), gradient path through the custom
sampling VJP — against committed numbers from a fixed-seed 3-step run.

If this fails after an INTENTIONAL numerics change, regenerate with:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/regen_golden_train.py

and say in the commit message why the numbers moved."""

from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "golden" / "train_steps.npz"

SCENE = dict(
    image_hw=(32, 32),
    n_verts=128,
    n_clusters=16,
    n_samples=4,
    chunk_rays=16,
    vit_depth=2,
    embed_dim=12,
    vit_heads=2,
    knn_k=3,
    axis_name=("batch", "data"),
)
N_RAYS, PS, BATCH, N_STEPS = 16, 4, 2, 3


def run_golden():
    """The pinned computation: 3 DP train steps (mesh of 1 device) on a
    fixed-seed synthetic batch; returns per-step losses + per-group param
    L2 norms after the last step."""
    import jax
    import jax.numpy as jnp

    from transhuman_tpu.parallel import make_mesh, shard_batch
    from transhuman_tpu.testing import (
        init_params, synthetic_rays, synthetic_setup,
    )
    from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
    from transhuman_tpu.train.step import init_state

    model, pipe, frame, _, cluster = synthetic_setup(**SCENE)
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    sample = TrainSample(
        frame=frame,
        rays=synthetic_rays(N_RAYS),
        target_patches=rng.random((1, PS, PS, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(N_RAYS, dtype=np.int32),
    )
    batch = jax.tree.map(
        lambda x: np.broadcast_to(
            np.asarray(x)[None], (BATCH,) + np.asarray(x).shape
        ).copy(),
        sample,
    )
    batch = batch.replace(
        target_patches=rng.random((BATCH, 1, PS, PS, 3)).astype(np.float32)
    )

    mesh = make_mesh(1)
    tx, _ = make_optimizer(iters_per_epoch=4)
    step = make_train_step(pipe, tx, mesh=mesh, donate=False)
    state = init_state(params, tx)
    batch = shard_batch(mesh, batch)
    losses = []
    for i in range(N_STEPS):
        state, stats = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(stats["loss"]))
    # accumulate on HOST in true f64 (jax_enable_x64 is off, so a device-side
    # f64 cast truncates back to f32 and the sum order would leak into the pin)
    norms = {
        f"norm_{k}": np.float64(
            np.sqrt(
                sum(
                    float((np.asarray(x, np.float64) ** 2).sum())
                    for x in jax.tree_util.tree_leaves(v)
                )
            )
        )
        for k, v in state.params["params"].items()
    }
    return {"losses": np.asarray(losses, np.float64), **norms}


def test_train_matches_committed_golden():
    got = run_golden()
    want = np.load(GOLDEN)
    assert set(want.files) == set(got)
    np.testing.assert_allclose(
        got["losses"], want["losses"], rtol=1e-5,
        err_msg="per-step losses drifted from the committed golden — see "
        "module docstring before regenerating",
    )
    for k in got:
        if k.startswith("norm_"):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)


def test_golden_train_is_nontrivial():
    z = np.load(GOLDEN)
    losses = z["losses"]
    assert losses.shape == (N_STEPS,) and (losses > 0).all()
    # the optimizer must actually be moving the params
    assert losses[0] != losses[-1]
    assert any(k.startswith("norm_") and float(z[k]) > 0 for k in z.files)
