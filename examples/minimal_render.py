"""Minimal end-to-end novel-view render on synthetic data (CPU-friendly).

Runs the full TransHuman pipeline — ResNet view encoding, SMPL painting,
TransHE token refinement, DPaRF binding, NeRF heads, compositing — on a
synthetic body and random-init weights, then writes a PNG.  No datasets or
pretrained weights required; the same code path scales to the real ZJU
assets via the CLIs (see README).

    JAX_PLATFORMS=cpu python examples/minimal_render.py out.png
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from transhuman_tpu.cli.common import _honor_jax_platforms_env
from transhuman_tpu.render.pipeline import pad_rays
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup

_honor_jax_platforms_env()  # some PJRT plugins ignore the env var


def main(out_path: str = "render.png", n_rays: int = 1024):
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(64, 64), n_verts=400, n_clusters=32, n_samples=16,
        chunk_rays=64, embed_dim=48, vit_depth=2, vit_heads=2,
        compact_ratio=0.5,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))

    side = int(n_rays**0.5)
    rays = pad_rays(synthetic_rays(side * side), pipe.chunk_rays)
    out = jax.jit(pipe.render_frame)(
        params, jax.tree.map(jnp.asarray, frame), jax.tree.map(jnp.asarray, rays)
    )
    rgb = np.asarray(out["rgb_map"])[: side * side].reshape(side, side, 3)
    img = np.clip(rgb * 255, 0, 255).astype(np.uint8)

    import imageio.v2 as imageio

    imageio.imwrite(out_path, img)
    acc = float(np.asarray(out["acc_map"]).mean())
    print(f"wrote {out_path}  ({side}x{side}, mean acc {acc:.3f}, "
          f"overflow {int(np.asarray(out['overflow'])[0])})")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["render.png"]))
