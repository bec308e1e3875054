"""Step-level ablation of the stream-scatter d_feat backward.

The kernel wins the ISOLATED vmapped grad-feat (46.7 vs 68.2 ms/iter,
tpu_grad_check2) yet the full chained train step measured 284 vs 212
ms/step with it on — a +72 ms interaction the isolated probe cannot see.
This times the chained base step (no lpips, the bench discipline) under:

  xla            USE_STREAM_SCATTER=False (the shipping path)
  kernel         kernel on, exact (window pass + residual while_loop)
  kernel-noresid kernel on, residual drain dropped (INEXACT — ablation)
  glue-only      kernel on, pallas stubbed AND residual dropped (INEXACT):
                 argsort/takes/slab-build/window-mask/shift-add glue alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_step_ablate.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import transhuman_tpu.experiments.streamscatter as SS
import transhuman_tpu.ops.sampling as sampling
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state


def main():
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=64,
        dtype=jnp.bfloat16)
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(2400)
    rng = np.random.default_rng(0)
    sample = TrainSample(
        frame=frame, rays=rays,
        target_patches=rng.random((6, 20, 20, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(2400, dtype=np.int32))
    batch = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]), sample)
    float(jnp.sum(batch.rays.ray_o))
    tx, _ = make_optimizer()

    def chain_time(step_fn, n_chain=5, n_rep=3):
        s = init_state(params, tx)
        s, st = step_fn(s, batch, jax.random.PRNGKey(0))
        float(st["loss"])
        ts = []
        for r in range(n_rep):
            t0 = time.perf_counter()
            for i in range(n_chain):
                s, st = step_fn(
                    s, batch,
                    jax.random.fold_in(jax.random.PRNGKey(1), r * n_chain + i))
            float(st["loss"])
            ts.append((time.perf_counter() - t0) / n_chain)
        return float(np.median(ts))

    import sys

    variants = [
        ("xla           ", False, False, False),
        ("kernel        ", True, False, False),
        ("kernel-noresid", True, False, True),
        ("glue-only     ", True, True, True),
    ]
    picked = [v for v in variants if v[0].strip() in sys.argv[1:]] or variants
    for label, flag, skip_pallas, skip_resid in picked:
        sampling.USE_STREAM_SCATTER = flag
        SS.DEBUG_SKIP_PALLAS = skip_pallas
        SS.DEBUG_SKIP_RESID = skip_resid
        try:
            fn = make_train_step(pipe, tx, donate=False)
            print(f"{label} {chain_time(fn)*1e3:8.1f} ms/step", flush=True)
        finally:
            sampling.USE_STREAM_SCATTER = None
            SS.DEBUG_SKIP_PALLAS = False
            SS.DEBUG_SKIP_RESID = False


if __name__ == "__main__":
    main()
