"""On-chip convergence equivalence for train.cull (the claim behind the knob).

`tools/probe_train_cull.py` times the step and shows a 40-step fixed-batch
overfit; this probe closes the remaining question — does CULLED training
(off-body points receive no gradient, docs/SCALING.md "Culled training
decode") converge to the SAME model quality on a real multi-view task, at
the measured per-step speedup?

Protocol (reuses tools/probe_radii_trained.py's harness):

  1. build the full-scale bf16 model once; both arms start from the SAME
     init and see the SAME 24 multi-view geometric-silhouette batches with
     the SAME per-step rng folding (masked-MSE non-patch loss),
  2. arm A trains unculled (reference semantics,
     if_clight_renderer.py:486-498 decodes every sample point); arm B
     trains with train.cull at --ratio,
  3. after --steps each: render the SAME held-out frontal view through ONE
     shared inference pipe (0.1 m shell cull, compact 0.1875 — inference
     config identical by construction) and report per-arm PSNR vs the
     geometric target, arm-vs-arm PSNR, loss curves, wall minutes.

Expected shape of the result: near-identical loss curves and target PSNRs
(the silhouette's density lives inside the 0.1 m shell, which is exactly
the region culled training still supervises) at ~1.7x the step rate.
Overflow is read back with every loss sample; any clip voids the run.

    python tools/probe_train_cull_convergence.py [--steps 2000 --ratio 0.3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_radii_trained import geometric_targets, multiview_rays  # noqa: E402

from transhuman_tpu.render.pipeline import pad_rays  # noqa: E402
from transhuman_tpu.testing import (  # noqa: E402
    init_params, synthetic_rays, synthetic_setup,
)
from transhuman_tpu.train import (  # noqa: E402
    TrainSample, make_optimizer, make_train_step,
)
from transhuman_tpu.train.step import init_state  # noqa: E402

N_RAYS_EVAL = 65_536
LOG_EVERY = 100


def train_arm(label, pipe, params, batches, steps, lr):
    tx, _ = make_optimizer(lr=lr, warmup_epochs=1, decay_epochs=10,
                           iters_per_epoch=steps)
    step = make_train_step(pipe, tx, donate=False, patch_mode=False)
    state = init_state(params, tx)
    curve, max_overflow = [], 0.0
    t0 = time.perf_counter()
    for k in range(steps):
        state, stats = step(state, batches[k % len(batches)],
                            jax.random.fold_in(jax.random.PRNGKey(1), k))
        if k % LOG_EVERY == 0 or k == steps - 1:
            loss = float(stats["loss"])  # forced readback; certifies overflow
            over = float(np.asarray(stats.get("overflow", 0.0)))
            max_overflow = max(max_overflow, over)
            curve.append(round(loss, 5))
            print(f"[{label}] step {k}: loss {loss:.5f} overflow {over:.0f}",
                  flush=True)
    minutes = (time.perf_counter() - t0) / 60
    return state.params, curve, minutes, max_overflow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n_batches", type=int, default=24)
    ap.add_argument("--surf_eps", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ratio", type=float, default=0.3)
    # CPU smoke-test knobs (full scale by default; the measurement is on-chip)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--n_verts", type=int, default=6890)
    ap.add_argument("--n_clusters", type=int, default=300)
    ap.add_argument("--n_rays", type=int, default=2400)
    ap.add_argument("--n_rays_eval", type=int, default=N_RAYS_EVAL)
    args = ap.parse_args()

    model, pipe, frame, smpl, cluster = synthetic_setup(
        image_hw=(args.hw, args.hw), n_verts=args.n_verts,
        n_clusters=args.n_clusters, n_samples=64,
        dtype=jnp.bfloat16,
    )
    params = init_params(model, frame, args.n_clusters, jax.random.PRNGKey(0))
    frame_d = jax.tree.map(jnp.asarray, frame)

    batches = []
    for i in range(args.n_batches):
        rays = multiview_rays(args.n_rays, seed=i)
        rays_d = jax.tree.map(jnp.asarray, rays)
        tgt = geometric_targets(pipe, frame_d, rays_d, args.surf_eps)
        sample = TrainSample(frame=frame, rays=rays,
                             target_rgb=np.asarray(tgt))
        batches.append(jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)[None]), sample))

    cull_pipe = pipe.clone(train_cull=True, train_cull_ratio=args.ratio)
    p_base, curve_b, min_b, _ = train_arm(
        "base", pipe, params, batches, args.steps, args.lr)
    p_cull, curve_c, min_c, over_c = train_arm(
        "cull", cull_pipe, params, batches, args.steps, args.lr)

    # held-out frontal view, ONE shared inference pipe for both arms
    eval_pipe = pipe.clone(compact_ratio=0.1875)
    rays_e = jax.tree.map(
        jnp.asarray,
        pad_rays(synthetic_rays(args.n_rays_eval), pipe.chunk_rays))
    target_e = np.asarray(
        geometric_targets(pipe, frame_d, rays_e, args.surf_eps), np.float32)
    render = jax.jit(eval_pipe.render_frame)

    def arm_render(p):
        out = render(p, frame_d, rays_e)
        rgb = np.asarray(out["rgb_map"], np.float32)
        return rgb, int(np.asarray(out["overflow"])[0])

    rgb_b, of_b = arm_render(p_base)
    rgb_c, of_c = arm_render(p_cull)
    m = np.asarray(rays_e.mask)

    def psnr(a, b):
        mse = float(np.mean((a[m] - b[m]) ** 2))
        return round(float(-10 * np.log10(max(mse, 1e-12))), 2)

    print(json.dumps({
        "steps": args.steps, "ratio": args.ratio,
        "loss_curve_base": curve_b, "loss_curve_cull": curve_c,
        "minutes": {"base": round(min_b, 1), "cull": round(min_c, 1)},
        "sec_per_step": {"base": round(min_b * 60 / args.steps, 4),
                         "cull": round(min_c * 60 / args.steps, 4)},
        "train_overflow_max": over_c,
        "eval_overflow": [of_b, of_c],
        "psnr_vs_target": {"base": psnr(rgb_b, target_e),
                           "cull": psnr(rgb_c, target_e)},
        "psnr_cull_vs_base": psnr(rgb_c, rgb_b),
    }), flush=True)


if __name__ == "__main__":
    main()
