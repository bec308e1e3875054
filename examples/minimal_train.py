"""Minimal end-to-end training loop on synthetic data (CPU-friendly).

Runs the real jitted train step — painting, TransHE, DPaRF, NeRF heads,
compositing, patch MSE loss, Adam — on a tiny synthetic body, printing the
loss as it falls. No datasets or pretrained weights required; the same step
scales to real ZJU assets and a multi-chip mesh through the train CLI.

    JAX_PLATFORMS=cpu python examples/minimal_train.py [n_steps]
"""
import sys

import jax
import numpy as np

from transhuman_tpu.cli.common import _honor_jax_platforms_env, build_runtime

_honor_jax_platforms_env()  # some PJRT plugins ignore the env var
from transhuman_tpu.cli.train import stack_samples
from transhuman_tpu.config import Config
from transhuman_tpu.data.synthetic import SyntheticDataset
from transhuman_tpu.geometry.smpl import SMPLModel
from transhuman_tpu.testing import init_params
from transhuman_tpu.train import make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state


def main(n_steps: int = 30):
    cfg = Config().merge_dict(
        {
            "train_num_views": 2,
            "vit_depth": 2,
            "num_class": 16,
            "N_samples": 8,
            "patch": {"N_patches": 2, "size": 8},
            "kmeans_dir": "/nonexistent",  # k-means regenerated on the fly
        }
    )
    smpl = SMPLModel.synthetic(n_verts=120)
    model, pipe, _, cluster = build_runtime(cfg, smpl=smpl)
    ds = SyntheticDataset(cfg, "train", n_frames=4, image_hw=(32, 32),
                          n_verts=120)
    ds.set_epoch(0)

    sample0 = ds.get_train_sample(0)
    params = init_params(model, sample0.frame, cluster.num_clusters,
                         jax.random.PRNGKey(cfg.seed))
    tx, _ = make_optimizer(lr=5e-4, warmup_epochs=1,
                           decay_epochs=10**6, iters_per_epoch=10**6)
    step = make_train_step(pipe, tx, donate=False)
    state = init_state(params, tx)

    rng = jax.random.PRNGKey(cfg.seed)
    for it in range(n_steps):
        batch = stack_samples([ds.get_train_sample(it % len(ds))])
        state, stats = step(state, batch, jax.random.fold_in(rng, it))
        if it % 5 == 0 or it == n_steps - 1:
            print(f"step {it:3d}  " +
                  "  ".join(f"{k}: {float(v):.4f}" for k, v in stats.items()))
    print("done — gradients flow end to end; see cli/train.py for the "
          "sharded, prefetched, checkpointed version of this loop.")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
