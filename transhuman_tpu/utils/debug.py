"""Debug helpers mirroring the reference's inline hooks (SURVEY.md §4):
colored point-cloud dumps (vis_utils.write_point_cloud) and parameter
counting (base_utils.count_parameters)."""

from __future__ import annotations

import numpy as np


def save_point_cloud(path: str, xyz: np.ndarray, rgb: np.ndarray = None):
    """Write an ascii PLY point cloud; rgb in [0,255] (optional)."""
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    has_c = rgb is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_c:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        if has_c:
            rgb = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
            for p, c in zip(xyz, rgb):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in xyz:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")


def param_count(params) -> int:
    """Total parameter count of a pytree (base_utils.count_parameters)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
