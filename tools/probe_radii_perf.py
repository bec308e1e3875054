"""On-chip probe: what per-vertex cull radii buy at bench scale.

For each radii setting (uniform reaches + one tool-measured set), measures
the prefilter-superset fraction (= the compaction capacity the render
actually needs), builds a pipe at that capacity (+12% margin), and times
the steady-state pipelined render exactly like bench.py.  Also reports the
image delta vs the 0.1 m shell render so speed and semantics land in the
same table (docs/PERF.md "Per-vertex cull radii").

    python tools/probe_radii_perf.py [--iters 8]
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

N_RAYS = 65_536
N_SAMPLES = 64
CHUNK_RAYS = 512


def clone(pipe, radii, ratio):
    # the fine cull partition is geometry-only (radii enter
    # _prefilter_tables per call), so clones share it
    return pipe.clone(
        vertex_radii=None if radii is None else np.asarray(radii, np.float32),
        compact_ratio=ratio,
    )


def timed(render, params, frame, rays, iters):
    out = render(params, frame, rays)
    float(jnp.sum(out["acc_map"]))
    over = int(np.asarray(out.get("overflow", [0]))[0])
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = render(params, frame, rays)
        if prev is not None:
            float(jnp.sum(prev["acc_map"]))
        prev = out
    float(jnp.sum(prev["acc_map"]))
    dt = (time.perf_counter() - t0) / iters
    return dt, over, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    model, pipe, frame, smpl, cluster = synthetic_setup(
        image_hw=(512, 512), n_verts=6890, n_clusters=300,
        n_samples=N_SAMPLES, chunk_rays=CHUNK_RAYS, dtype=jnp.bfloat16,
        compact_ratio=0.1875,
    )
    params = init_params(model, frame, 300, jax.random.PRNGKey(0))
    frame_d = jax.tree.map(jnp.asarray, frame)
    rays_d = jax.tree.map(jnp.asarray, pad_rays(synthetic_rays(N_RAYS),
                                                CHUNK_RAYS))

    from transhuman_tpu.tools.measure_compact_ratio import make_counts_fn

    # baseline: the shipping shell config
    base_dt, over, base_out = timed(
        jax.jit(pipe.render_frame), params, frame_d, rays_d, args.iters)
    base_rgb = np.asarray(base_out["rgb_map"], np.float32)
    print(json.dumps({"variant": "shell_0.1_ratio_0.1875",
                      "ms": round(base_dt * 1e3, 1),
                      "rays_per_sec": round(N_RAYS / base_dt),
                      "overflow": over}), flush=True)

    for reach in (0.05, 0.03, 0.02):
        radii = np.full(6890, reach, np.float32)
        probe = clone(pipe, radii, 0.5)  # ratio irrelevant for counts
        sup, ex, n = make_counts_fn(probe)(frame_d, rays_d)
        frac_s, frac_e = float(sup) / int(n), float(ex) / int(n)
        ratio = min(0.5, round(frac_s * 1.12 + 1e-3, 4))
        p2 = clone(pipe, radii, ratio)
        dt, over, out = timed(
            jax.jit(p2.render_frame), params, frame_d, rays_d, args.iters)
        rgb = np.asarray(out["rgb_map"], np.float32)
        mse = float(np.mean((rgb - base_rgb) ** 2))
        print(json.dumps({
            "variant": f"radii_{reach}", "superset_frac": round(frac_s, 4),
            "exact_frac": round(frac_e, 4), "ratio": ratio,
            "ms": round(dt * 1e3, 1),
            "rays_per_sec": round(N_RAYS / dt), "overflow": over,
            "max_abs_delta_vs_shell": round(float(np.abs(rgb - base_rgb).max()), 5),
            "psnr_vs_shell": round(float(-10 * np.log10(max(mse, 1e-12))), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
