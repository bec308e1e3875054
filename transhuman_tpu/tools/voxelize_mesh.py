"""Mesh -> occupancy voxel grid (parity: lib/utils/light_stage/
ply_to_occupancy.py — the reference's offline tool producing occupancy
volumes from exported .ply meshes).

    python -m transhuman_tpu.tools.voxelize_mesh in.ply out.npy --voxel 0.005

Method: sample points densely on every triangle, mark their voxels as
surface, then flood-fill the outside from the grid boundary; occupancy =
interior + surface.
"""

from __future__ import annotations

import numpy as np


def voxelize(verts: np.ndarray, tris: np.ndarray, voxel: float = 0.005, pad: int = 2):
    """Returns (occupancy (X,Y,Z) uint8, origin (3,))."""
    lo = verts.min(0) - pad * voxel
    hi = verts.max(0) + pad * voxel
    dims = np.maximum(np.ceil((hi - lo) / voxel).astype(int) + 1, 1)
    occ = np.zeros(dims, np.uint8)

    # surface: supersample each triangle with enough points per voxel
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    edge = np.maximum(
        np.linalg.norm(b - a, axis=1), np.linalg.norm(c - a, axis=1)
    )
    n_side = np.clip(np.ceil(edge / (0.5 * voxel)).astype(int), 1, 64)
    for n in np.unique(n_side):
        sel = n_side == n
        if not sel.any():
            continue
        u = np.linspace(0, 1, n + 1)
        uu, vv = np.meshgrid(u, u)
        m = uu + vv <= 1.0
        uu, vv = uu[m], vv[m]
        pts = (
            a[sel][:, None] * (1 - uu - vv)[None, :, None]
            + b[sel][:, None] * uu[None, :, None]
            + c[sel][:, None] * vv[None, :, None]
        ).reshape(-1, 3)
        idx = np.clip(((pts - lo) / voxel).astype(int), 0, dims - 1)
        occ[idx[:, 0], idx[:, 1], idx[:, 2]] = 1

    # flood fill the exterior (6-connectivity BFS over the free space)
    from collections import deque

    outside = np.zeros(dims, bool)
    dq = deque()

    def push(i, j, k):
        if 0 <= i < dims[0] and 0 <= j < dims[1] and 0 <= k < dims[2]:
            if not outside[i, j, k] and occ[i, j, k] == 0:
                outside[i, j, k] = True
                dq.append((i, j, k))

    for i in range(dims[0]):
        for j in range(dims[1]):
            push(i, j, 0)
            push(i, j, dims[2] - 1)
    for i in range(dims[0]):
        for k in range(dims[2]):
            push(i, 0, k)
            push(i, dims[1] - 1, k)
    for j in range(dims[1]):
        for k in range(dims[2]):
            push(0, j, k)
            push(dims[0] - 1, j, k)
    while dq:
        i, j, k = dq.popleft()
        push(i - 1, j, k)
        push(i + 1, j, k)
        push(i, j - 1, k)
        push(i, j + 1, k)
        push(i, j, k - 1)
        push(i, j, k + 1)

    occupancy = (~outside).astype(np.uint8)
    return occupancy, lo


def main(argv=None):
    import argparse

    from ..mesh_ops.ply import load_ply

    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--voxel", type=float, default=0.005)
    args = p.parse_args(argv)
    verts, tris = load_ply(args.input)
    occ, origin = voxelize(verts, tris, args.voxel)
    np.save(args.output, {"occupancy": occ, "origin": origin, "voxel": args.voxel})
    print(f"wrote {args.output}: grid {occ.shape}, filled {int(occ.sum())}")


if __name__ == "__main__":
    main()
