"""End-to-end learning sanity: overfitting a single tiny sample must cut the
loss by a large factor (validates gradient flow through painting -> TransHE
-> DPaRF -> heads -> compositing -> patch loss)."""

import jax
import numpy as np

from transhuman_tpu.config import Config
from transhuman_tpu.data.synthetic import SyntheticDataset
from transhuman_tpu.testing import init_params
from transhuman_tpu.train import make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state
from transhuman_tpu.cli.common import build_runtime
from transhuman_tpu.cli.train import stack_samples


def test_overfit_single_sample():
    cfg = Config().merge_dict(
        {
            "train_num_views": 2,
            "vit_depth": 1,
            "num_class": 8,
            "N_samples": 6,
            "patch": {"N_patches": 1, "size": 6},
            "kmeans_dir": "/nonexistent",
        }
    )
    from transhuman_tpu.geometry.smpl import SMPLModel

    smpl = SMPLModel.synthetic(n_verts=80)
    model, pipe, _, cluster = build_runtime(cfg, smpl=smpl)
    ds = SyntheticDataset(cfg, "train", n_frames=1, image_hw=(24, 24), n_verts=80)
    ds.set_epoch(0)
    sample = ds.get_train_sample(0)
    assert sample.rays.mask.sum() > 0

    params = init_params(model, sample.frame, cluster.num_clusters,
                         jax.random.PRNGKey(0))
    # aggressive constant LR for the overfit
    tx, _ = make_optimizer(lr=1e-3, warmup_epochs=1, decay_epochs=10**6,
                           iters_per_epoch=10**6)
    step = make_train_step(pipe, tx, donate=False)
    state = init_state(params, tx)
    # constant-gray target: body pixels can fit it exactly; background rays
    # are an irreducible floor, so require a solid relative improvement only
    sample = sample.replace(
        target_patches=np.full_like(sample.target_patches, 0.5)
    )
    batch = stack_samples([sample])

    losses = []
    for i in range(60):
        state, stats = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
