"""Measure the compaction capacity (cfg.compact_ratio) a dataset needs.

The compact inference path (render/pipeline.py::_render_frame_compact)
decodes only a static capacity of ``compact_ratio * R * S`` sample points;
capacity is consumed by the conservative cull-prefilter SUPERSET, not by the
exact cull fraction (the cull economics the reference exploits dynamically,
if_clight_renderer.py:440-444).  This tool reports, per sampled frame:

    exact    — fraction of sample points within cull_distance of the body
    superset — fraction passing the cluster-center+radius prefilter
               (what actually needs capacity)

and recommends ``compact_ratio = max(superset) * margin`` so users can set
the ratio from measurement instead of folklore.  Fractions are relative to
the PADDED ray count — the same denominator _compact_plan uses.

Usage:
    # synthetic varied-pose frames (no assets needed):
    python -m transhuman_tpu.tools.measure_compact_ratio --frames 8
    # against a real config/dataset:
    python -m transhuman_tpu.tools.measure_compact_ratio \
        --cfg_file configs/train_or_eval.yaml --frames 8
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def make_counts_fn(pipe):
    """jitted (frame, rays) -> (superset_count, exact_count, n_flat)."""
    import jax
    import jax.numpy as jnp

    from ..render.pipeline import to_smpl
    from ..render.volume import sample_along_rays

    def counts(frame, rays):
        s = pipe.n_samples
        cp = pipe.chunk_rays * s
        pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near,
                                   rays.far, s)
        n = pts.shape[0] * s
        flat = pts.reshape(n, 3)
        m = jnp.repeat(rays.mask, s)
        centers_c, thresh2 = pipe._prefilter_tables(frame)

        def chunk(c_pts):
            pre = pipe._prefilter_chunk(frame, c_pts, centers_c, thresh2)
            exact = pipe._cull(to_smpl(frame, c_pts), frame.tar_verts_smpl)
            return pre, exact

        pre, exact = jax.lax.map(chunk, flat.reshape(-1, cp, 3))
        pre, exact = pre.reshape(n) & m, exact.reshape(n) & m
        return jnp.sum(pre), jnp.sum(exact), n

    return jax.jit(counts)


def synthetic_frames(n_frames: int, n_rays: int, seed: int = 0):
    """Varied-pose synthetic frames: each frame re-poses the procedural SMPL
    body (random axis-angle joints) so the measured superset covers pose
    variation, not a single fixed template."""
    from ..geometry.smpl import SMPLModel
    from ..testing import synthetic_rays, synthetic_setup

    _, pipe, frame, smpl, _ = synthetic_setup(compact_ratio=0.5)
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n_frames):
        pose = rng.normal(0.0, 0.2, 72).astype(np.float32)
        pose[:3] = 0.0  # keep global orient fixed; Rh carries it
        verts, _, _ = smpl(pose, np.zeros(10))
        f = frame.replace(
            verts_world=np.asarray(verts, np.float32),
            tar_verts_smpl=np.asarray(verts, np.float32),
        )
        items.append((f, synthetic_rays(n_rays, seed=seed + i)))
    return pipe, items


def dataset_frames(cfg, n_frames: int):
    from ..cli.common import build_runtime
    from ..data.zju import ZJUDataset
    from ..render.pipeline import pad_rays

    _, pipe, smpl, _ = build_runtime(cfg)
    dataset = ZJUDataset(cfg, "test", smpl=smpl)
    idx = dataset.frame_sampler_indices()[:n_frames]
    # ceil to a chunk multiple like cli/run.py::_make_render (pad_bucket
    # need not divide chunk_rays evenly)
    cr = pipe.chunk_rays
    bucket = -(-max(cfg.pad_bucket, cr) // cr) * cr
    items = []
    for i in idx:
        it = dataset.get_eval_item(int(i))
        items.append((it.frame, pad_rays(it.eval_rays.rays, bucket)))
    return pipe, items


def measure(pipe, items, margin: float = 1.15):
    import jax
    import jax.numpy as jnp

    counts_fn = make_counts_fn(pipe)
    rows = []
    for frame, rays in items:
        sup, ex, n = counts_fn(jax.tree.map(jnp.asarray, frame),
                               jax.tree.map(jnp.asarray, rays))
        n = int(np.asarray(n))
        rows.append((float(np.asarray(sup)) / n, float(np.asarray(ex)) / n))
    sups = [r[0] for r in rows]
    exacts = [r[1] for r in rows]
    rec = max(sups) * margin
    return {
        "frames": len(rows),
        "exact_frac": {"max": max(exacts), "mean": float(np.mean(exacts))},
        "superset_frac": {"max": max(sups), "mean": float(np.mean(sups))},
        "margin": margin,
        "recommended_compact_ratio": round(rec, 4),
        "per_frame": [
            {"superset": round(s, 4), "exact": round(e, 4)} for s, e in rows
        ],
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg_file", default=None,
                   help="measure a real config/dataset (default: synthetic "
                        "varied poses)")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--n_rays", type=int, default=16384,
                   help="rays per synthetic frame")
    p.add_argument("--margin", type=float, default=1.15,
                   help="safety factor over the max measured superset")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)

    if args.cfg_file:
        from ..config import Config

        cfg = Config.from_yaml(args.cfg_file).merge_opts(args.opts)
        pipe, items = dataset_frames(cfg, args.frames)
    else:
        pipe, items = synthetic_frames(args.frames, args.n_rays, args.seed)

    report = measure(pipe, items, args.margin)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
