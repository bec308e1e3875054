"""Camera utilities: world<->SMPL transforms and the spherical freeview path.

Reimplements the math of the reference's `lib/utils/render_utils.py:239-364`
(load_cam / gen_path_virt) and the world<->SMPL coordinate maps used throughout
(`if_clight_renderer.py:289-304`, `can_smpl.py:304-313`).
"""

from __future__ import annotations

import numpy as np


def world2smpl(pts: np.ndarray, Rh: np.ndarray, Th: np.ndarray) -> np.ndarray:
    """World -> SMPL coords: (x - Th) @ Rh.  Rh: (3,3) rotation (from Rodrigues
    of the params' axis-angle), Th: (1,3) or (3,)."""
    return (pts - np.reshape(Th, (1, 3))) @ Rh


def smpl2world(pts: np.ndarray, Rh: np.ndarray, Th: np.ndarray) -> np.ndarray:
    return pts @ np.linalg.inv(Rh) + np.reshape(Th, (1, 3))


def _normalize(x):
    return x / np.linalg.norm(x)


def _viewmatrix(z, up, pos):
    """Build a c2w 3x4 from forward z, up hint, position (render_utils.py)."""
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def _ptstocam(pts, c2w):
    return np.matmul(c2w[:3, :3].T, (pts - c2w[:3, 3])[..., np.newaxis])[..., 0]


def load_cam(ann_file: str, ratio: float = 0.5):
    """Load camera K/RT lists from a ZJU-MoCap annots.npy
    (render_utils.load_cam, render_utils.py:239-260)."""
    annots = np.load(ann_file, allow_pickle=True).item()
    cams = annots["cams"]
    K, RT = [], []
    lower_row = np.array([[0.0, 0.0, 0.0, 1.0]])
    for i in range(len(cams["K"])):
        k = np.array(cams["K"][i]).astype(np.float64).copy()
        k[:2] = k[:2] * ratio
        K.append(k)
        r = np.array(cams["R"][i])
        t = np.array(cams["T"][i]) / 1000.0
        RT.append(np.concatenate([np.concatenate([r, t], 1), lower_row], 0))
    return K, RT


def gen_path_virt(RT, render_views: int, center=None):
    """360-degree spherical w2c path around the subject
    (render_utils.gen_path_virt, render_utils.py:318-364)."""
    lower_row = np.array([[0.0, 0.0, 0.0, 1.0]])
    RT = np.array(RT, dtype=np.float64).copy()
    RT[:] = np.linalg.inv(RT[:])
    RT = np.concatenate(
        [RT[:, :, 1:2], RT[:, :, 0:1], -RT[:, :, 2:3], RT[:, :, 3:4]], 2
    )
    up = _normalize(RT[:, :3, 0].sum(0))
    z = _normalize(RT[0, :3, 2])
    vec1 = _normalize(np.cross(z, up))
    vec2 = _normalize(np.cross(up, vec1))
    z_off = 0.0
    if center is None:
        center = RT[:, :3, 3].mean(0)
        z_off = 1.3
    c2w = np.stack([up, vec1, vec2, center], 1)

    tt = _ptstocam(RT[:, :3, 3], c2w).T
    rads = np.percentile(np.abs(tt), 80, -1) * 1.3
    rads = np.array(list(rads) + [1.0])

    render_w2c = []
    for theta in np.linspace(0.0, 2 * np.pi, render_views + 1)[:-1]:
        cam_pos = np.array([0, np.sin(theta), np.cos(theta), 1] * rads)
        cam_pos_world = np.dot(c2w[:3, :4], cam_pos)
        z = _normalize(
            cam_pos_world - np.dot(c2w[:3, :4], np.array([z_off, 0, 0, 1.0]))
        )
        mat = _viewmatrix(z, up, cam_pos_world)
        mat = np.concatenate(
            [mat[:, 1:2], mat[:, 0:1], -mat[:, 2:3], mat[:, 3:4]], 1
        )
        mat = np.concatenate([mat, lower_row], 0)
        render_w2c.append(np.linalg.inv(mat))
    return render_w2c
