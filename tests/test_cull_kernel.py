"""Fused cull kernel vs the blocked XLA min-dist (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from transhuman_tpu.experiments.cull import TILE_N, min_dist2_fused
from transhuman_tpu.ops.knn import min_dist


def test_fused_min_dist2_matches(rng):
    pts = rng.standard_normal((TILE_N * 2, 3)).astype(np.float32)
    verts = rng.standard_normal((1500, 3)).astype(np.float32) * 0.5
    d2 = np.asarray(min_dist2_fused(jnp.asarray(pts), jnp.asarray(verts), interpret=True))
    want = np.asarray(min_dist(jnp.asarray(pts), jnp.asarray(verts))) ** 2
    np.testing.assert_allclose(d2, want, atol=1e-4)


def test_fused_handles_vert_padding(rng):
    # vert count far from the 1024 block size exercises the sentinel padding
    pts = rng.standard_normal((TILE_N, 3)).astype(np.float32)
    verts = rng.standard_normal((7, 3)).astype(np.float32)
    d2 = np.asarray(min_dist2_fused(jnp.asarray(pts), jnp.asarray(verts), interpret=True))
    brute = ((pts[:, None] - verts[None]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(d2, brute, atol=1e-4)
