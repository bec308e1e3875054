"""Mesh reconstruction orchestration: density grid -> iso-surface -> world mesh.

Capability parity with the reference mesh workload
(`lib/networks/renderer/if_mesh_renderer.py:46-113` + grid generation in
`can_smpl_mesh.py:78-95`): a dense voxel grid over the world AABB
(voxel 0.005 m), density inference with SMPL-distance culling, 10-voxel
zero padding, iso-surface at mesh_th=20, index->world vertex transform.
"""

from __future__ import annotations

import numpy as np

from ..render.pipeline import FrameInputs
from .marching import marching_tetrahedra


def make_grid(can_bounds: np.ndarray, voxel_size) -> np.ndarray:
    """(X, Y, Z, 3) world-coordinate grid points (arange semantics of
    can_smpl_mesh.py:78-86: inclusive-ish upper bound)."""
    vs = np.asarray(voxel_size, np.float32)
    axes = [
        np.arange(can_bounds[0, i], can_bounds[1, i] + vs[i], vs[i], dtype=np.float32)
        for i in range(3)
    ]
    return np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)


def extract_mesh(
    pipe,
    params,
    frame: FrameInputs,
    can_bounds: np.ndarray,
    voxel_size=(0.005, 0.005, 0.005),
    mesh_th: float = 20.0,
    pad_voxels: int = 10,
):
    """Returns (vertices_world (N,3), triangles (M,3), cube (padded sigma grid))."""
    import jax
    import jax.numpy as jnp

    grid = make_grid(can_bounds, voxel_size)
    gx, gy, gz, _ = grid.shape
    flat = grid.reshape(-1, 3)
    # pad to a COARSE bucket (8 chunks) so per-frame grid-size variation
    # collapses onto few shapes and the jitted program is reused across
    # frames (per-frame shapes would recompile; eager mode pays the
    # per-op dispatch latency instead)
    bucket = pipe.chunk_rays * pipe.n_samples * 8
    pad = (-flat.shape[0]) % bucket
    flat_p = np.pad(flat, ((0, pad), (0, 0)))
    mask = np.concatenate([np.ones(flat.shape[0], bool), np.zeros(pad, bool)])

    fn = getattr(pipe, "_render_sigma_jit", None)
    if fn is None:  # one persistent wrapper per pipe: jit caches by identity
        fn = jax.jit(pipe.render_sigma)
        pipe._render_sigma_jit = fn
    sigma_flat, overflow = fn(
        params, jax.tree.map(jnp.asarray, frame), jnp.asarray(flat_p), jnp.asarray(mask)
    )
    over = int(np.asarray(overflow)[0])
    if over:
        # overflow auto-recovery: re-run the sigma pass with compaction off
        # so the extracted mesh can never carry capacity holes (the
        # reference's dense grid query is always complete,
        # if_mesh_renderer.py:46-96); the fallback jit is built lazily —
        # healthy runs never pay its compile
        print(f"WARNING: compaction capacity clipped {over} active grid "
              "points; re-running sigma with compaction off")
        dense_fn = getattr(pipe, "_render_sigma_dense_jit", None)
        if dense_fn is None:
            dense_fn = jax.jit(pipe.render_sigma_dense)
            pipe._render_sigma_dense_jit = dense_fn
        sigma_flat, _ = dense_fn(
            params, jax.tree.map(jnp.asarray, frame), jnp.asarray(flat_p),
            jnp.asarray(mask),
        )
        # self-tune like cli/run.py::FrameRenderer._retune: re-derive the
        # ratio from the measured shortfall so LATER frames of a dynamic-
        # mesh run take the compact path again (one recompile via the
        # dropped jit cache); the ratio only grows, so this converges
        cp = pipe.chunk_rays * pipe.n_samples
        cap = -(-int(pipe.compact_ratio * flat_p.shape[0]) // cp) * cp
        new_ratio = min(1.0, 1.15 * (cap + over) / flat_p.shape[0])
        if new_ratio > pipe.compact_ratio:
            print(f"auto-tuning compact_ratio {pipe.compact_ratio:.4f} -> "
                  f"{new_ratio:.4f}; recompiling the sigma pass once")
            pipe.compact_ratio = new_ratio
            del pipe._render_sigma_jit  # next frame re-jits at the new ratio
    sigma = np.asarray(sigma_flat)[: flat.shape[0]].reshape(gx, gy, gz)

    cube = np.pad(sigma, pad_voxels, mode="constant")
    verts_idx, tris = marching_tetrahedra(cube, mesh_th)
    lb = can_bounds[0] - pad_voxels * np.asarray(voxel_size)
    verts_world = verts_idx * np.asarray(voxel_size, np.float32) + lb.astype(np.float32)
    return verts_world, tris, cube
