"""On-chip probe: what cfg.cull_radii buys ON TOP of train.cull (fine-tune).

`train.cull` shares the inference cull predicate, so per-vertex radii
tighten the TRAINING cull too (tests/test_train_step.py::
test_train_cull_composes_with_vertex_radii proves the semantics). This
probe measures the composed step rate in the workflow the knob is for:

  1. train the full-scale model with train.cull (shell) on the multi-view
     geometric-silhouette task until density concentrates,
  2. measure per-vertex radii from the trained density
     (tools/measure_vertex_radii.measure — the tool decides the reach),
  3. re-derive the culled-training capacity from the measured radii-cull
     survivor fraction over the training batches (+ margin),
  4. chain-time the culled train step shell vs radii, then fine-tune under
     radii-cull and report the loss trajectory (still decreasing, zero
     overflow) — the "fine-tune analog of the radii render win"
     (docs/SCALING.md).

    python tools/probe_cull_radii_finetune.py [--steps 1200 --ft_steps 300]
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

from transhuman_tpu.render.pipeline import pad_rays, to_smpl  # noqa: E402
from transhuman_tpu.testing import (  # noqa: E402
    init_params, synthetic_rays, synthetic_setup,
)
from transhuman_tpu.train import (  # noqa: E402
    TrainSample, make_optimizer, make_train_step,
)
from transhuman_tpu.train.step import init_state  # noqa: E402


def cull_fraction(pipe, frame_d, batches):
    """Max over batches of the EXACT train-cull survivor fraction (the
    train decode's capacity is sized by the exact predicate, not the
    prefilter superset — render/pipeline.py train_cull branch)."""
    from transhuman_tpu.render.volume import sample_along_rays

    def frac(frame, rays):
        pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near,
                                   rays.far, pipe.n_samples)
        n = pts.shape[0] * pipe.n_samples
        flat = pts.reshape(n, 3)
        keep = pipe._cull(to_smpl(frame, flat), frame.tar_verts_smpl)
        m = jnp.repeat(rays.mask, pipe.n_samples)
        return jnp.sum(keep & m) / n

    f = jax.jit(frac)
    return max(
        float(f(frame_d, jax.tree.map(lambda x: x[0], b.rays)))
        for b in batches
    )


def chain_time(step, state, batches, n_chain=5, n_rep=3, key=7):
    times = []
    state, stats = step(state, batches[0], jax.random.PRNGKey(0))
    float(stats["loss"])  # compile + drain
    k = 0
    for _ in range(n_rep):
        t0 = time.perf_counter()
        for _ in range(n_chain):
            state, stats = step(state, batches[k % len(batches)],
                                jax.random.fold_in(jax.random.PRNGKey(key), k))
            k += 1
        float(stats["loss"])
        times.append((time.perf_counter() - t0) / n_chain)
    over = float(np.asarray(stats.get("overflow", 0.0)))
    return float(np.median(times)), over


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--ft_steps", type=int, default=300)
    ap.add_argument("--n_batches", type=int, default=24)
    ap.add_argument("--surf_eps", type=float, default=0.02)
    ap.add_argument("--alpha_eps", type=float, default=1e-3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ratio", type=float, default=0.3)
    ap.add_argument("--margin", type=float, default=1.25,
                    help="capacity = measured radii-cull fraction * margin")
    # CPU smoke-test knobs (full scale by default; the measurement is on-chip)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--n_verts", type=int, default=6890)
    ap.add_argument("--n_clusters", type=int, default=300)
    ap.add_argument("--n_rays", type=int, default=2400)
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
        tgt = geometric_targets(pipe, frame_d,
                                jax.tree.map(jnp.asarray, rays),
                                args.surf_eps)
        sample = TrainSample(frame=frame, rays=rays,
                             target_rgb=np.asarray(tgt))
        batches.append(jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)[None]), sample))

    # 1. concentrate density with shell train.cull
    shell_pipe = pipe.clone(train_cull=True, train_cull_ratio=args.ratio)
    tx, _ = make_optimizer(lr=args.lr, warmup_epochs=1, decay_epochs=10,
                           iters_per_epoch=args.steps)
    step_s = make_train_step(shell_pipe, tx, donate=False, patch_mode=False)
    state = init_state(params, tx)
    for k in range(args.steps):
        state, stats = step_s(state, batches[k % len(batches)],
                              jax.random.fold_in(jax.random.PRNGKey(1), k))
        if k % 200 == 0:
            print(f"train step {k}: loss {float(stats['loss']):.5f} "
                  f"overflow {float(np.asarray(stats['overflow'])):.0f}",
                  flush=True)
    loss_trained = float(stats["loss"])

    # 2. tool-measured radii from the trained density
    from transhuman_tpu.tools.measure_vertex_radii import measure

    items = [(frame, pad_rays(synthetic_rays(min(16384, args.n_rays * 8),
                                             seed=100),
                              pipe.chunk_rays))]
    radii, report = measure(pipe, state.params, items, per_vertex=24,
                            alpha_eps=args.alpha_eps)
    print(json.dumps({"measured_radii": report["radii"],
                      "certified": report["certified"],
                      "mean_reach_vs_shell": report["mean_reach_vs_shell"]}),
          flush=True)

    # 3. capacity from the measured radii-cull survivor fraction
    radii_probe = pipe.clone(vertex_radii=radii)
    frac_shell = cull_fraction(pipe, frame_d, batches)
    frac_radii = cull_fraction(radii_probe, frame_d, batches)
    ratio_r = min(1.0, round(frac_radii * args.margin + 1e-3, 4))
    radii_pipe = pipe.clone(train_cull=True, train_cull_ratio=ratio_r,
                            vertex_radii=radii)

    # 4. chained step times: shell at the DEFAULT capacity, shell at its
    # OWN measured capacity (attribution row: separates what capacity
    # sizing buys from what the radii buy on top), and radii-culled
    ratio_s = min(1.0, round(frac_shell * args.margin + 1e-3, 4))
    shell_sized = pipe.clone(train_cull=True, train_cull_ratio=ratio_s)
    step_ss = make_train_step(shell_sized, tx, donate=False,
                              patch_mode=False)
    step_r = make_train_step(radii_pipe, tx, donate=False, patch_mode=False)
    t_shell, over_s = chain_time(step_s, state, batches)
    t_shell_sized, over_ss = chain_time(step_ss, state, batches)
    t_radii, over_r = chain_time(step_r, state, batches)

    # fine-tune under radii-cull: loss keeps decreasing, zero overflow
    ft_losses, max_over = [], 0.0
    st = state
    for k in range(args.ft_steps):
        st, stats = step_r(st, batches[k % len(batches)],
                           jax.random.fold_in(jax.random.PRNGKey(2), k))
        if k % 100 == 0 or k == args.ft_steps - 1:
            ft_losses.append(round(float(stats["loss"]), 5))
            max_over = max(max_over,
                           float(np.asarray(stats["overflow"])))

    print(json.dumps({
        "trained_steps": args.steps, "loss_trained": round(loss_trained, 5),
        "cull_fraction": {"shell": round(frac_shell, 4),
                          "radii": round(frac_radii, 4)},
        "train_cull_ratio": {"shell": args.ratio, "shell_sized": ratio_s,
                             "radii": ratio_r},
        "sec_per_step": {"shell_cull": round(t_shell, 4),
                         "shell_cull_sized": round(t_shell_sized, 4),
                         "radii_cull": round(t_radii, 4)},
        # radii-only attribution: sized-shell vs radii (same sizing rule)
        "speedup_radii_over_sized_shell": round(t_shell_sized / t_radii, 3),
        "speedup_radii_over_shell": round(t_shell / t_radii, 3),
        "chain_overflow": [over_s, over_ss, over_r],
        "finetune_losses": ft_losses,
        "finetune_overflow_max": max_over,
    }), flush=True)


if __name__ == "__main__":
    main()
