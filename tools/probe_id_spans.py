"""Id-distribution stats for the Pallas streaming d_feat kernel design.

At train scale (2400x64 rays, 3 views, 512^2 maps), sort the per-view
bilinear base ids exactly as ops/sampling.py's VJP does and report, for
candidate block sizes B and window spans W_SPAN, how many rows would fall
outside a window anchored at the block's first id (aligned down to 8):
those are the residual rows the fallback path must absorb.  The 4 taps
reach id + Wf + 1, so the effective budget inside a window is
W_SPAN - Wf - 2.  Run on CPU or TPU (pure jnp + numpy, tiny arrays out).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from transhuman_tpu.ops.sampling import project_points
from transhuman_tpu.render.pipeline import to_smpl
from transhuman_tpu.render.volume import sample_along_rays
from transhuman_tpu.testing import synthetic_rays, synthetic_setup

R_RAYS, S = 2400, 64
HF = WF = 512


def main():
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=S,
        dtype=jnp.bfloat16)
    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(jnp.asarray, synthetic_rays(R_RAYS))
    pts, z = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far, S)
    pts = pts.reshape(-1, 3)
    uv, _ = project_points(pts, frame.K, frame.R, frame.T)

    fx = jnp.clip(uv[..., 0], 0.0, WF - 1)
    fy = jnp.clip(uv[..., 1], 0.0, HF - 1)
    x0 = jnp.minimum(jnp.floor(fx).astype(jnp.int32), WF - 2)
    y0 = jnp.minimum(jnp.floor(fy).astype(jnp.int32), HF - 2)
    base = np.asarray(y0 * WF + x0)  # (V, N)

    for v in range(base.shape[0]):
        i_s = np.sort(base[v])
        n = i_s.size
        uniq = np.unique(i_s).size
        print(f"view {v}: N={n} unique={uniq} occ={n/uniq:.2f} "
              f"id range [{i_s[0]}, {i_s[-1]}]")
        for B in (512, 1024, 2048):
            nb = n // B
            firsts = (i_s[: nb * B : B] // 8) * 8
            spans = i_s[B - 1 : nb * B : B] - firsts
            for w in (2048, 4096, 8192):
                budget = w - WF - 2
                # rows beyond the budget in each block
                resid = 0
                for b in range(nb):
                    blk = i_s[b * B : (b + 1) * B]
                    resid += int(np.sum(blk - firsts[b] > budget))
                print(
                    f"  B={B:5d} W={w:5d}: span p50={np.median(spans):7.0f} "
                    f"p99={np.percentile(spans, 99):7.0f} max={spans.max():7d} "
                    f"resid={resid} ({resid/n*100:.3f}%)"
                )


if __name__ == "__main__":
    main()
