"""Measure per-vertex cull radii from a trained model's density.

The reference culls inference points with a UNIFORM 0.1 m shell around the
6,890 SMPL vertices (if_clight_renderer.py:440-443).  A trained model's
density is far more concentrated than that shell almost everywhere (hair
and loose cloth need the full reach; forearms do not), and on the
descriptor-bound TPU render path every survivor point costs gather
descriptors — so the one lever left is decoding FEWER points
(docs/PERF.md).  This tool measures, per vertex, how far significant
density actually extends, so `cfg.cull_radii` can replace the shell with a
conservative per-vertex reach:

  1. sample probe points throughout the 0.1 m shell of each posed body
     (multiple poses; probes assigned to their NEAREST vertex),
  2. evaluate the model's density there and convert to a per-sample alpha
     `1 - exp(-relu(sigma) * spacing)` at the render's sample spacing,
  3. r_v = max distance of any probe with alpha > --alpha_eps assigned to
     v (+ margin), floored at --min_radius, clipped at cull_distance
     (radii never ADMIT points the reference shell culls — deltas are
     one-sided: only sub-eps contributions can be dropped),
  4. CROSS-VALIDATE: draw fresh, independent probe sets and expand the
     radii over any significant probe the current radii fail to cover
     (the cull's own min_excess2 predicate), until a fresh draw finds
     zero uncovered probes — the report's `certified` flag,
  5. optionally render each pose twice (shell vs radii) and report the
     image deltas — the honesty check: commit these numbers with the npz.

The guarantee is sampling-based (probes + sampled poses), hence the
margin, the pose sweep, the cross-validation rounds, and the delta
report; `cfg.cull_radii` stays opt-in.  Output: an npz with key 'radii'
((Nv,) float32 meters) + a JSON report on stdout.

Usage:
    # synthetic varied poses, random weights (mechanism check):
    python -m transhuman_tpu.tools.measure_vertex_radii --out radii.npz
    # against a real trained checkpoint + dataset:
    python -m transhuman_tpu.tools.measure_vertex_radii \
        --cfg_file configs/train_or_eval.yaml --out radii.npz \
        trained_model_dir <dir> [opts ...]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _probe_points(verts, cull_distance, per_vertex, rng):
    """(Nv*per_vertex, 3) probes covering the shell: random directions,
    radius uniform in [0, cull_distance] (denser near the surface, where
    the decision boundary lives)."""
    nv = verts.shape[0]
    d = rng.standard_normal((nv * per_vertex, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    u = rng.uniform(0.0, cull_distance, (nv * per_vertex, 1)).astype(
        np.float32)
    return np.repeat(verts, per_vertex, axis=0) + d * u


def make_probe_fn(pipe, cp):
    """jitted (params, frame, pts_world (N,3), spacing, radii (Nv,)) ->
    (alpha (N,), dist (N,), vert_idx (N,), covered (N,)) — density-derived
    per-sample alpha, nearest-vertex assignment, and whether the CURRENT
    radii already cover the probe (exists v: dist(p,v) <= r_v, via the same
    min_excess2 the cull itself uses), chunked like render_sigma."""
    import jax
    import jax.numpy as jnp

    from ..ops.knn import pairwise_dist2
    from ..render.pipeline import to_smpl

    def probe(params, frame, pts_world, spacing, radii):
        sigma, _ = pipe.render_sigma_dense(
            params, frame, pts_world,
            jnp.ones((pts_world.shape[0],), bool),
        )
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * spacing)
        r2 = radii**2

        def chunk(c_pts):
            d2 = pairwise_dist2(
                to_smpl(frame, c_pts), frame.tar_verts_smpl,
                precision="highest",
            )
            return (
                jnp.sqrt(jnp.min(d2, axis=-1)),
                jnp.argmin(d2, axis=-1).astype(jnp.int32),
                jnp.min(d2 - r2[None, :], axis=-1) <= 0.0,
            )

        dist, vidx, cov = jax.lax.map(chunk, pts_world.reshape(-1, cp, 3))
        return alpha, dist.reshape(-1), vidx.reshape(-1), cov.reshape(-1)

    return jax.jit(probe)


def measure(pipe, params, items, *, per_vertex=24, alpha_eps=1e-3,
            margin=0.005, min_radius=0.01, spacing=None, seed=0,
            max_rounds=6):
    """items: [(frame, rays-or-None)] posed frames.  Returns (radii (Nv,),
    report dict).

    Cross-validated expansion (r5 review finding: a single probe draw
    UNDER-measures when density is diffuse — sampling gaps left
    significant regions outside the measured reach): round 1 seeds the
    radii, then each further round draws FRESH probes (one rng across
    rounds and poses) and expands the radii over any significant probe the
    current radii fail to cover (checked with the cull's own min_excess2
    predicate).  Rounds repeat until a fresh draw finds zero uncovered
    significant probes (or max_rounds); the final round's uncovered count
    is reported — 0 means the radii are certified against an independent
    sample at this probe density."""
    import jax
    import jax.numpy as jnp

    cp = pipe.chunk_rays * pipe.n_samples
    probe_fn = make_probe_fn(pipe, cp)
    nv = np.asarray(items[0][0].tar_verts_smpl).shape[0]
    radii = np.zeros(nv, np.float32)
    n_sig = 0
    n_total = 0
    rng = np.random.default_rng(seed)
    uncovered_per_round = []
    for rnd in range(max_rounds):
        uncovered = 0
        for frame, rays in items:
            verts = np.asarray(frame.tar_verts_smpl, np.float32)
            # probes live in SMPL coords; render_sigma wants world coords
            pts_smpl = _probe_points(verts, pipe.cull_distance, per_vertex,
                                     rng)
            Rh = np.asarray(frame.Rh, np.float32)
            Th = np.asarray(frame.Th, np.float32)
            pts_world = pts_smpl @ Rh.T + Th  # inverse of to_smpl (aug is
            # None on eval frames; training aug never applies here)
            pad = (-pts_world.shape[0]) % cp
            pts_world = np.pad(pts_world, ((0, pad), (0, 0)))
            if spacing is None:
                if rays is None:
                    raise ValueError("need rays (or --spacing) to derive "
                                     "the sample spacing")
                sp = float(np.median(
                    (np.asarray(rays.far) - np.asarray(rays.near))
                    / (pipe.n_samples - 1)
                ))
            else:
                sp = float(spacing)
            alpha, dist, vidx, cov = probe_fn(
                params, jax.tree.map(jnp.asarray, frame),
                jnp.asarray(pts_world), sp, jnp.asarray(radii),
            )
            k = pts_smpl.shape[0]
            alpha = np.asarray(alpha)[:k]
            dist = np.asarray(dist)[:k]
            vidx = np.asarray(vidx)[:k]
            cov = np.asarray(cov)[:k]
            sig = alpha > alpha_eps
            if rnd == 0:
                n_sig += int(sig.sum())
                n_total += k
            miss = sig & ~cov
            uncovered += int(miss.sum())
            np.maximum.at(radii, vidx[miss], dist[miss])
        uncovered_per_round.append(uncovered)
        if rnd > 0 and uncovered == 0:
            break
    radii = np.clip(radii + margin, min_radius, pipe.cull_distance)
    report = {
        "poses": len(items),
        "probes_per_pose_per_round": per_vertex * nv,
        "rounds": len(uncovered_per_round),
        "uncovered_per_round": uncovered_per_round,
        "certified": uncovered_per_round[-1] == 0,
        "significant_frac": round(n_sig / max(n_total, 1), 4),
        "alpha_eps": alpha_eps,
        "margin_m": margin,
        "radii": {
            "min": round(float(radii.min()), 4),
            "mean": round(float(radii.mean()), 4),
            "max": round(float(radii.max()), 4),
        },
        # shell-volume proxy for the survivor shrink: mean(r_v)/0.1 tracks
        # the decode-capacity reduction to first order
        "mean_reach_vs_shell": round(float(radii.mean())
                                     / pipe.cull_distance, 4),
    }
    return radii, report


def report_deltas(pipe, params, radii, items):
    """Render each pose with the shell vs the measured radii (both through
    the dense path — no capacity interplay) and report the image deltas.
    These numbers ARE the correctness contract of the npz: commit them
    alongside it."""
    import jax
    import jax.numpy as jnp

    # the fine cull partition (cull_assign/cull_pool) is geometry-only —
    # radii enter _prefilter_tables per call — so the clone SHARES it
    tight = pipe.clone(vertex_radii=np.asarray(radii, np.float32))

    base_fn = jax.jit(pipe.render_frame_dense)
    tight_fn = jax.jit(tight.render_frame_dense)
    rows = []
    for frame, rays in items:
        if rays is None:
            continue
        f = jax.tree.map(jnp.asarray, frame)
        r = jax.tree.map(jnp.asarray, rays)
        a = np.asarray(base_fn(params, f, r)["rgb_map"], np.float32)
        b = np.asarray(tight_fn(params, f, r)["rgb_map"], np.float32)
        mse = float(np.mean((a - b) ** 2))
        rows.append({
            "max_abs_delta": round(float(np.abs(a - b).max()), 6),
            "mse": mse,
            "psnr_vs_shell": round(float(-10 * np.log10(max(mse, 1e-12))), 2),
        })
    return rows


def synthetic_items(n_frames, n_rays, seed=0, **setup_kw):
    from ..testing import init_params, synthetic_rays, synthetic_setup

    import jax

    model, pipe, frame, smpl, cluster = synthetic_setup(**setup_kw)
    params = init_params(model, frame, cluster.num_clusters,
                         jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n_frames):
        pose = rng.normal(0.0, 0.2, 72).astype(np.float32)
        pose[:3] = 0.0
        verts, _, _ = smpl(pose, np.zeros(10))
        f = frame.replace(
            verts_world=np.asarray(verts, np.float32),
            tar_verts_smpl=np.asarray(verts, np.float32),
        )
        from ..render.pipeline import pad_rays

        items.append((f, pad_rays(synthetic_rays(n_rays, seed=seed + i),
                                  pipe.chunk_rays)))
    return pipe, params, items


def dataset_items(cfg, n_frames):
    from ..cli.common import build_runtime, model_dir
    from ..data.zju import ZJUDataset
    from ..render.pipeline import pad_rays
    from ..train.checkpoint import load_params

    _, pipe, smpl, _ = build_runtime(cfg)
    params, _ = load_params(model_dir(cfg), cfg.test.epoch)
    dataset = ZJUDataset(cfg, "test", smpl=smpl)
    idx = dataset.frame_sampler_indices()[:n_frames]
    cr = pipe.chunk_rays
    bucket = -(-max(cfg.pad_bucket, cr) // cr) * cr
    items = []
    for i in idx:
        it = dataset.get_eval_item(int(i))
        items.append((it.frame, pad_rays(it.eval_rays.rays, bucket)))
    return pipe, params, items


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--cfg_file", default=None,
                   help="measure a real config/checkpoint/dataset "
                        "(default: synthetic varied poses, random weights)")
    p.add_argument("--out", required=True, help="output npz path")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--n_rays", type=int, default=16384)
    p.add_argument("--per_vertex", type=int, default=24,
                   help="probe points per vertex per pose")
    p.add_argument("--alpha_eps", type=float, default=1e-3,
                   help="per-sample alpha below which density is "
                        "insignificant")
    p.add_argument("--margin", type=float, default=0.005,
                   help="additive safety margin (m) on each radius")
    p.add_argument("--min_radius", type=float, default=0.01)
    p.add_argument("--spacing", type=float, default=None,
                   help="ray sample spacing for the alpha conversion "
                        "(default: median (far-near)/(S-1) of the frames)")
    p.add_argument("--skip_deltas", action="store_true",
                   help="skip the shell-vs-radii render comparison")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)

    if args.cfg_file:
        from ..config import Config

        cfg = Config.from_yaml(args.cfg_file).merge_opts(args.opts)
        pipe, params, items = dataset_items(cfg, args.frames)
    else:
        pipe, params, items = synthetic_items(args.frames, args.n_rays,
                                              args.seed)

    radii, report = measure(
        pipe, params, items, per_vertex=args.per_vertex,
        alpha_eps=args.alpha_eps, margin=args.margin,
        min_radius=args.min_radius, spacing=args.spacing, seed=args.seed,
    )
    if not args.skip_deltas:
        report["image_deltas_vs_shell"] = report_deltas(
            pipe, params, radii, items)
    np.savez(args.out, radii=radii,
             meta=json.dumps({k: v for k, v in report.items()
                              if k != "image_deltas_vs_shell"}))
    report["out"] = args.out
    print(json.dumps(report))
    return radii, report


if __name__ == "__main__":
    main()
