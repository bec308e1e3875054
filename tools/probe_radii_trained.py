"""On-chip demonstration: tool-measured per-vertex radii on a model whose
density is actually concentrated (the trained-model regime).

The bench model has random weights, so density fills the whole 0.1 m cull
shell and docs/PERF.md's radii table shows WORST-case image deltas.  This
probe closes the loop for the regime cull_radii is built for:

  1. briefly train the full-scale model (bf16, 2400x64 rays, masked-MSE)
     against a GEOMETRIC target — white where the ray passes within
     `--surf_eps` of the body, black elsewhere — so the optimizer pushes
     density onto the body and kills it in the empty shell,
  2. run tools/measure_vertex_radii.py's measure() on the trained params
     (no hand-picked reach — the tool decides from density),
  3. render shell vs measured-radii and report deltas + throughput.

Expected shape of the result: measured radii well under 0.1 m, PSNR vs
shell far above the random-weight worst case, and a real rays/s win.

    python tools/probe_radii_trained.py [--steps 1500]
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

from transhuman_tpu.render.pipeline import pad_rays
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state

N_RAYS_EVAL = 65_536


def geometric_targets(pipe, frame, rays, surf_eps):
    """(R, 3) white-iff-the-ray-passes-within-surf_eps-of-the-body targets,
    computed with the cull machinery itself (chunked min-dist)."""
    from transhuman_tpu.render.pipeline import to_smpl
    from transhuman_tpu.render.volume import sample_along_rays

    def f(frame, rays):
        pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near,
                                   rays.far, pipe.n_samples)
        r, s, _ = pts.shape
        cp = pipe.chunk_rays * s

        def chunk(c_pts):
            from transhuman_tpu.ops.knn import min_dist

            return min_dist(to_smpl(frame, c_pts), frame.tar_verts_smpl)

        flat = pts.reshape(-1, 3)
        pad = (-flat.shape[0]) % cp
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        d = jax.lax.map(chunk, flat.reshape(-1, cp, 3)).reshape(-1)
        hit = (d[: r * s].reshape(r, s) < surf_eps).any(axis=1)
        return jnp.where(hit[:, None], 1.0, 0.0) * jnp.ones((r, 3))

    return jax.jit(f)(frame, rays)


def multiview_rays(n_rays, seed, spread=0.2):
    """Rays from a random camera on the viewing sphere: training must
    traverse the empty shell from many directions or the optimizer never
    sees (and never zeroes) the off-body density there."""
    from transhuman_tpu.render.pipeline import RayBundle

    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32) * spread
    dirs[:, 2] += 1.0
    th = rng.uniform(0, 2 * np.pi)
    el = rng.uniform(-0.5, 0.5)
    c, s = np.cos(th), np.sin(th)
    ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    ce, se = np.cos(el), np.sin(el)
    rx = np.array([[1, 0, 0], [0, ce, -se], [0, se, ce]], np.float32)
    rot = ry @ rx
    return RayBundle(
        ray_o=np.tile(rot @ np.array([0, 0, -2.5], np.float32), (n_rays, 1)),
        ray_d=(dirs @ rot.T).astype(np.float32),
        near=np.full(n_rays, 1.2, np.float32),
        far=np.full(n_rays, 3.8, np.float32),
        mask=np.ones(n_rays, bool),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n_batches", type=int, default=24)
    ap.add_argument("--surf_eps", type=float, default=0.02)
    ap.add_argument("--alpha_eps", type=float, default=1e-3)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    model, pipe, frame, smpl, cluster = synthetic_setup(
        image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=64,
        dtype=jnp.bfloat16,
    )
    params = init_params(model, frame, 300, jax.random.PRNGKey(0))
    frame_d = jax.tree.map(jnp.asarray, frame)

    # pool of multi-view ray batches with geometric targets: shell coverage
    # from many directions (a frontal-only pool leaves most of the shell
    # untraversed and the random-init density there untouched — r5 note)
    batches = []
    for i in range(args.n_batches):
        rays = multiview_rays(2400, seed=i)
        rays_d = jax.tree.map(jnp.asarray, rays)
        tgt = geometric_targets(pipe, frame_d, rays_d, args.surf_eps)
        sample = TrainSample(frame=frame, rays=rays,
                             target_rgb=np.asarray(tgt))
        batches.append(jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)[None]), sample))

    tx, _ = make_optimizer(lr=args.lr, warmup_epochs=1, decay_epochs=10,
                           iters_per_epoch=args.steps)
    step = make_train_step(pipe, tx, donate=False, patch_mode=False)
    state = init_state(params, tx)
    t0 = time.perf_counter()
    loss0 = None
    for k in range(args.steps):
        state, stats = step(state, batches[k % len(batches)],
                            jax.random.fold_in(jax.random.PRNGKey(1), k))
        if k == 0:
            loss0 = float(stats["loss"])
        if k % 250 == 0:
            print(f"step {k}: loss {float(stats['loss']):.5f}", flush=True)
    loss_end = float(stats["loss"])
    print(json.dumps({"trained_steps": args.steps, "loss0": round(loss0, 5),
                      "loss_end": round(loss_end, 5),
                      "train_minutes": round((time.perf_counter() - t0) / 60, 1)}),
          flush=True)
    tparams = state.params

    # tool-measured radii on the TRAINED density (no hand-picked reach)
    from transhuman_tpu.tools.measure_vertex_radii import measure

    items = [(frame, pad_rays(synthetic_rays(16384, seed=100),
                              pipe.chunk_rays))]
    radii, report = measure(pipe, tparams, items, per_vertex=24,
                            alpha_eps=args.alpha_eps)
    print(json.dumps({"measured_radii": report["radii"],
                      "significant_frac": report["significant_frac"],
                      "rounds": report["rounds"],
                      "uncovered_per_round": report["uncovered_per_round"],
                      "certified": report["certified"],
                      "mean_reach_vs_shell": report["mean_reach_vs_shell"]}),
          flush=True)

    # shell vs measured radii at bench scale: capacity from measured counts
    from transhuman_tpu.tools.measure_compact_ratio import make_counts_fn

    rays_e = jax.tree.map(jnp.asarray,
                          pad_rays(synthetic_rays(N_RAYS_EVAL), 512))
    base_pipe = pipe.clone(compact_ratio=0.1875)

    tight = pipe.clone(vertex_radii=radii)  # partition is geometry-only: share it
    sup, ex, n = make_counts_fn(tight)(frame_d, rays_e)
    frac = float(sup) / int(n)
    tight.compact_ratio = min(0.5, round(frac * 1.12 + 1e-3, 4))

    def timed(fn):
        out = fn(tparams, frame_d, rays_e)
        float(jnp.sum(out["acc_map"]))
        over = int(np.asarray(out.get("overflow", [0]))[0])
        t0 = time.perf_counter()
        prev = None
        for _ in range(8):
            o = fn(tparams, frame_d, rays_e)
            if prev is not None:
                float(jnp.sum(prev["acc_map"]))
            prev = o
        float(jnp.sum(prev["acc_map"]))
        return (time.perf_counter() - t0) / 8, over, prev

    dt_b, over_b, out_b = timed(jax.jit(base_pipe.render_frame))
    dt_t, over_t, out_t = timed(jax.jit(tight.render_frame))
    a = np.asarray(out_b["rgb_map"], np.float32)
    b = np.asarray(out_t["rgb_map"], np.float32)
    mse = float(np.mean((a - b) ** 2))
    print(json.dumps({
        "superset_frac_radii": round(frac, 4),
        "ratio_radii": tight.compact_ratio,
        "shell_rays_per_sec": round(N_RAYS_EVAL / dt_b),
        "radii_rays_per_sec": round(N_RAYS_EVAL / dt_t),
        "overflow": [over_b, over_t],
        "max_abs_delta": round(float(np.abs(a - b).max()), 6),
        "psnr_vs_shell": round(float(-10 * np.log10(max(mse, 1e-12))), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
