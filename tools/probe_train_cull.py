"""On-chip probe: what train.cull buys at the reference train shapes.

Times the chained train step (2400x64 rays, LPIPS in graph — exactly
bench.py's protocol) unculled vs culled at measured capacity, and runs a
short fixed-batch overfit under both so the loss curves land next to the
step times (the convergence evidence docs/SCALING.md cites).

    python tools/probe_train_cull.py [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state


def build(train_cull, ratio):
    model, pipe, frame, smpl, cluster = synthetic_setup(
        image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=64,
        dtype=jnp.bfloat16,
    )
    if train_cull:
        pipe = pipe.clone(train_cull=True, train_cull_ratio=ratio)
    params = init_params(model, frame, 300, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sample = TrainSample(
        frame=frame,
        rays=synthetic_rays(2400),
        target_patches=rng.random((6, 20, 20, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(2400, dtype=np.int32),
    )
    batch = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]), sample)
    from transhuman_tpu.models.lpips import init_lpips_params, make_lpips_fn

    lpips_fn = make_lpips_fn(init_lpips_params(jax.random.PRNGKey(1)))
    tx, _ = make_optimizer()
    step = make_train_step(pipe, tx, lpips_fn=lpips_fn, donate=False)
    return step, init_state(params, tx), batch


def run(step, state, batch, steps, chain=5):
    state, stats = step(state, batch, jax.random.PRNGKey(0))
    float(stats["loss"])
    over = float(np.asarray(stats.get("overflow", 0.0)))
    times, losses = [], [float(stats["loss"])]
    k = 0
    while k < steps:
        t0 = time.perf_counter()
        for _ in range(chain):
            state, stats = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(1), k))
            k += 1
        losses.append(float(stats["loss"]))  # tail readback per chain
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times)), losses, over


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--ratio", type=float, default=0.25)
    args = ap.parse_args()

    for name, cull in (("unculled", False), ("culled", True)):
        step, state, batch = build(cull, args.ratio)
        sec, losses, over = run(step, state, batch, args.steps)
        print(json.dumps({
            "variant": name, "ratio": args.ratio if cull else None,
            "sec_per_step": round(sec, 4),
            "overflow_mean": over,
            "loss_first3": [round(x, 4) for x in losses[:3]],
            "loss_last3": [round(x, 4) for x in losses[-3:]],
        }), flush=True)


if __name__ == "__main__":
    main()
