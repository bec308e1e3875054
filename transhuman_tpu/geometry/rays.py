"""Ray generation and ray–AABB intersection (host-side numpy).

Reimplements the math of the reference's
`lib/utils/if_nerf/if_nerf_data_utils.py:11-97` (get_rays / get_near_far /
get_bound_2d_mask).  These run on the host as part of the input pipeline; the
device-side stratified point sampling lives in `render/volume.py`.
"""

from __future__ import annotations

import numpy as np


def get_rays(H: int, W: int, K: np.ndarray, R: np.ndarray, T: np.ndarray):
    """Pinhole rays in world coordinates for every pixel.

    K: (3,3) intrinsics; R: (3,3) world->cam rotation; T: (3,1) translation.
    Returns (rays_o, rays_d), each (H, W, 3).  rays_d is *not* normalized —
    it points from the camera center to the pixel on the z=1 camera plane
    transformed to world (matches reference get_rays, if_nerf_data_utils.py:11-30).
    """
    rays_o = -np.dot(R.T, T).ravel()
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
    pixel_world = np.dot(pixel_camera - T.ravel(), R)
    rays_d = pixel_world - rays_o[None, None]
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def world_bounds(verts_world: np.ndarray, big_box: bool) -> np.ndarray:
    """Body AABB for ray near/far: z-inflated by 0.05 m, or all axes when
    big_box (reference prepare_input, can_smpl.py:225-233).  Shared by the
    dataset and the render server so the inflation lives in one place."""
    mn = verts_world.min(0).copy()
    mx = verts_world.max(0).copy()
    if big_box:
        mn, mx = mn - 0.05, mx + 0.05
    else:
        mn[2] -= 0.05
        mx[2] += 0.05
    return np.stack([mn, mx])


def get_bound_corners(bounds: np.ndarray) -> np.ndarray:
    """(2,3) min/max AABB -> (8,3) corners, reference ordering."""
    min_x, min_y, min_z = bounds[0]
    max_x, max_y, max_z = bounds[1]
    return np.array(
        [
            [min_x, min_y, min_z],
            [min_x, min_y, max_z],
            [min_x, max_y, min_z],
            [min_x, max_y, max_z],
            [max_x, min_y, min_z],
            [max_x, min_y, max_z],
            [max_x, max_y, min_z],
            [max_x, max_y, max_z],
        ]
    )


def project(xyz: np.ndarray, K: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """World points -> pixel coords. RT: (3,4) [R|T]. (base_utils.py:178-187)."""
    xyz = np.dot(xyz, RT[:, :3].T) + RT[:, 3:].T
    xyz = np.dot(xyz, K.T)
    return xyz[:, :2] / xyz[:, 2:]


def get_bound_2d_mask(bounds, K, pose, H, W) -> np.ndarray:
    """Binary mask of the projected 3D AABB (if_nerf_data_utils.py:49-62)."""
    import cv2

    corners_3d = get_bound_corners(bounds)
    corners_2d = project(corners_3d, K, pose)
    corners_2d = np.round(corners_2d).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    cv2.fillPoly(mask, [corners_2d[[0, 1, 3, 2, 0]]], 1)
    cv2.fillPoly(mask, [corners_2d[[4, 5, 7, 6, 5]]], 1)
    cv2.fillPoly(mask, [corners_2d[[0, 1, 5, 4, 0]]], 1)
    cv2.fillPoly(mask, [corners_2d[[2, 3, 7, 6, 2]]], 1)
    cv2.fillPoly(mask, [corners_2d[[0, 2, 6, 4, 0]]], 1)
    cv2.fillPoly(mask, [corners_2d[[1, 3, 7, 5, 1]]], 1)
    return mask


def get_near_far(bounds: np.ndarray, ray_o: np.ndarray, ray_d: np.ndarray):
    """Ray–AABB near/far via 6-plane intersection (if_nerf_data_utils.py:65-97).

    bounds: (2,3); ray_o/ray_d: (N,3).  The box is inflated by 1cm like the
    reference.  Rays count as hits only when exactly 2 of the 6 plane
    intersections land on the box ("mask_at_box"), matching reference behavior
    including its corner-grazing quirks.

    Returns (near, far, mask_at_box): near/far are (M,) over the M=mask.sum()
    intersecting rays; mask_at_box is (N,) bool.

    NOTE: like the reference, this clamps tiny |ray_d| components in place on a
    copy (we do not mutate the caller's array).
    """
    bounds = bounds + np.array([-0.01, 0.01])[:, None]
    ray_d = ray_d.copy()
    ray_d[np.abs(ray_d) < 1e-5] = 1e-5
    nominator = bounds[None] - ray_o[:, None]
    d_intersect = (nominator / ray_d[:, None]).reshape(-1, 6)
    p_intersect = d_intersect[..., None] * ray_d[:, None] + ray_o[:, None]
    min_x, min_y, min_z, max_x, max_y, max_z = bounds.ravel()
    eps = 1e-6
    p_mask_at_box = (
        (p_intersect[..., 0] >= (min_x - eps))
        * (p_intersect[..., 0] <= (max_x + eps))
        * (p_intersect[..., 1] >= (min_y - eps))
        * (p_intersect[..., 1] <= (max_y + eps))
        * (p_intersect[..., 2] >= (min_z - eps))
        * (p_intersect[..., 2] <= (max_z + eps))
    )
    mask_at_box = p_mask_at_box.sum(-1) == 2
    p_intervals = p_intersect[mask_at_box][p_mask_at_box[mask_at_box]].reshape(-1, 2, 3)

    ray_o_m = ray_o[mask_at_box]
    ray_d_m = ray_d[mask_at_box]
    norm_ray = np.linalg.norm(ray_d_m, axis=1)
    d0 = np.linalg.norm(p_intervals[:, 0] - ray_o_m, axis=1) / norm_ray
    d1 = np.linalg.norm(p_intervals[:, 1] - ray_o_m, axis=1) / norm_ray
    near = np.minimum(d0, d1)
    far = np.maximum(d0, d1)
    return near.astype(np.float32), far.astype(np.float32), mask_at_box


from ..utils.cache import ByteLRU as _ByteLRU

_RAY_CACHE = _ByteLRU(256 * 1024 * 1024)  # one 512x512 grid = 6 MB


def get_rays_cached(H, W, K, R, T):
    """Per-camera full-image ray grid, LRU-cached by (size, intrinsics, pose).

    Cameras are fixed for a dataset, so the grid rebuild (~24 ms/sample at
    512x512 on one core) is pure waste on the train input path.  Eviction is
    byte-bounded LRU (a count bound would hold gigabytes at 1024x1024, and
    clearing everything would also evict the cameras currently iterating).
    Returned arrays are shared read-only views — callers must not mutate
    them (get_near_far already copies before its in-place clamp).  ByteLRU
    is locked: Loader worker threads call this concurrently."""
    K = np.asarray(K)
    key = (
        H, W, K.tobytes(), np.asarray(R).tobytes(), np.asarray(T).tobytes()
    )
    hit = _RAY_CACHE.get(key)
    if hit is not None:
        return hit
    # computed outside the lock: the expensive part
    return _RAY_CACHE.put(key, get_rays(H, W, K, R, T))


def get_near_far_hull(bounds, ray_o, ray_d, K, R, T, H, W):
    """`get_near_far` over a full H*W pixel grid, restricted to rays inside
    the dilated projected hull of the inflated AABB — identical outputs at
    ~5x less host work (the full-image 6-plane test was ~118 ms/sample at
    512x512 and sat on the train input path's critical path).

    Soundness: a ray through pixel p that hits the box inflated by 1 cm
    (get_near_far's margin) hits it at a point X that projects exactly to
    p; X lies inside the 2 cm-inflated box, whose projection (box fully in
    front of the camera) is the convex hull of its projected corners — so
    p is inside the hull.  The 2 px dilation absorbs fillPoly's integer
    corner rounding.  If any inflated corner lands at or behind the camera
    the convexity argument fails and the dense test runs instead.

    Returns (near_full (H*W,), far_full (H*W,), mask (H*W,)); near/far are
    0 outside mask.
    """
    import cv2

    n = H * W
    infl = bounds + np.array([-0.02, 0.02])[:, None]
    corners = get_bound_corners(infl)
    z_cam = (corners @ np.asarray(R).T + np.asarray(T).reshape(1, 3))[:, 2]
    near_full = np.zeros(n, np.float32)
    far_full = np.zeros(n, np.float32)
    if np.any(z_cam < 1e-3):
        near, far, mask = get_near_far(bounds, ray_o, ray_d)
        near_full[mask] = near
        far_full[mask] = far
        return near_full, far_full, mask
    pose = np.concatenate(
        [np.asarray(R), np.asarray(T).reshape(3, 1)], axis=1
    )
    hull = get_bound_2d_mask(infl, K, pose, H, W)
    hull = cv2.dilate(hull, np.ones((5, 5), np.uint8)).astype(bool).ravel()
    idx = np.nonzero(hull)[0]
    near_s, far_s, mask_s = get_near_far(bounds, ray_o[idx], ray_d[idx])
    mask = np.zeros(n, bool)
    mask[idx] = mask_s
    sel = idx[mask_s]
    near_full[sel] = near_s
    far_full[sel] = far_s
    return near_full, far_full, mask


def sample_z_vals(near, far, n_samples, rng: "np.random.Generator | None" = None):
    """Stratified depth samples (host variant; device variant in render/volume.py).

    Matches if_clight_renderer.get_sampling_points (if_clight_renderer.py:271-287):
    linear in [near, far]; when rng is given, jitter uniformly inside the
    midpoint intervals.
    """
    t_vals = np.linspace(0.0, 1.0, n_samples, dtype=np.float32)
    z_vals = near[..., None] * (1.0 - t_vals) + far[..., None] * t_vals
    if rng is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = np.concatenate([mids, z_vals[..., -1:]], -1)
        lower = np.concatenate([z_vals[..., :1], mids], -1)
        t_rand = rng.random(z_vals.shape, dtype=np.float32)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals.astype(np.float32)
