"""Fused point->SMPL minimum-distance kernel (Pallas, TPU).

The SMPL-proximity cull (if_clight_renderer.py:440-443; pytorch3d K=1
`knn_points` in the reference) needs only min_j |p - v_j| over the 6,890
vertices.  The XLA formulation (ops/knn.min_dist) materializes the blocked
(N, 6890) distance matrix in HBM just to min-reduce it — ~27 KB of traffic
per point.  Here each (TILE x block) distance tile lives and dies in VMEM:
the MXU computes the cross-term, the VPU folds the running minimum, and HBM
sees only 12 B in + 4 B out per point (measured ~10x on v5e).

Returns squared distances — the cull compares against a threshold, so the
sqrt is hoisted onto the (scalar) threshold instead of N points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024
TILE_V = 1024
_PAD = 1e6  # sentinel coordinate for padded vertex rows


def _kernel(pts_ref, verts_ref, out_ref):
    j = pl.program_id(1)
    p = pts_ref[:]  # (T, 3)
    v = verts_ref[:]  # (B, 3)
    d2 = (
        jnp.sum(p * p, axis=1, keepdims=True)
        + jnp.sum(v * v, axis=1)[None, :]
        - 2.0 * jnp.dot(p, v.T, preferred_element_type=jnp.float32)
    )
    m = jnp.min(d2, axis=1, keepdims=True)  # (T, 1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = m

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.minimum(out_ref[:], m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_dist2_fused(pts, verts, interpret: bool = False):
    """pts (N,3), verts (V,3) -> (N,) squared distance to the nearest vert.
    N must be a multiple of TILE_N."""
    n = pts.shape[0]
    nv = verts.shape[0]
    assert n % TILE_N == 0, f"N={n} not a multiple of {TILE_N}"
    vp = (nv + TILE_V - 1) // TILE_V * TILE_V
    verts_p = jnp.pad(
        verts.astype(jnp.float32), ((0, vp - nv), (0, 0)), constant_values=_PAD
    )
    out = pl.pallas_call(
        _kernel,
        grid=(n // TILE_N, vp // TILE_V),
        in_specs=[
            pl.BlockSpec((TILE_N, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(pts.astype(jnp.float32), verts_p)
    return out[:, 0]
