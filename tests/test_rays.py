import numpy as np

from transhuman_tpu.geometry import rays


def _simple_camera():
    K = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]], dtype=np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.array([[0.0], [0.0], [2.0]], dtype=np.float32)  # camera at z=-2 world
    return K, R, T


def test_get_rays_center_pixel_points_forward():
    K, R, T = _simple_camera()
    ray_o, ray_d = rays.get_rays(512, 512, K, R, T)
    assert ray_o.shape == (512, 512, 3)
    # camera center in world: -R^T T = (0,0,-2)
    np.testing.assert_allclose(ray_o[0, 0], [0, 0, -2], atol=1e-6)
    # principal-point ray points along +z
    d = ray_d[256, 256]
    np.testing.assert_allclose(d / np.linalg.norm(d), [0, 0, 1], atol=1e-3)


def test_get_rays_pixel_reprojects():
    K, R, T = _simple_camera()
    ray_o, ray_d = rays.get_rays(512, 512, K, R, T)
    # a point along the ray through pixel (100, 200) projects back to it
    y, x = 200, 100
    p = ray_o[y, x] + 1.7 * ray_d[y, x]
    RT = np.concatenate([R, T], axis=1)
    uv = rays.project(p[None], K, RT)[0]
    np.testing.assert_allclose(uv, [x, y], atol=1e-3)


def test_near_far_hits_box():
    K, R, T = _simple_camera()
    ray_o, ray_d = rays.get_rays(512, 512, K, R, T)
    bounds = np.array([[-0.3, -0.3, 0.5], [0.3, 0.3, 1.5]], dtype=np.float32)
    ro = ray_o.reshape(-1, 3)
    rd = ray_d.reshape(-1, 3)
    near, far, mask = rays.get_near_far(bounds, ro, rd)
    assert mask.any() and not mask.all()
    assert (near < far).all()
    # center ray: travels from z=-2, box inflated by 1cm -> near ~ 2.49, far ~ 3.51
    ci = 256 * 512 + 256
    assert mask[ci]
    idx = np.cumsum(mask)[ci] - 1
    np.testing.assert_allclose(near[idx], 2.49, atol=1e-2)
    np.testing.assert_allclose(far[idx], 3.51, atol=1e-2)
    # entry/exit points actually lie on the inflated box boundary
    p_near = ro[mask] + near[:, None] * rd[mask]
    assert (p_near > bounds[0] - 0.011 - 1e-4).all()
    assert (p_near < bounds[1] + 0.011 + 1e-4).all()


def test_bound_2d_mask_covers_projection():
    K, R, T = _simple_camera()
    bounds = np.array([[-0.3, -0.3, 0.5], [0.3, 0.3, 1.5]], dtype=np.float32)
    pose = np.concatenate([R, T], axis=1)
    mask = rays.get_bound_2d_mask(bounds, K, pose, 512, 512)
    assert mask.shape == (512, 512)
    assert mask[256, 256] == 1  # center of box projects to principal point
    assert mask[0, 0] == 0
    # all 8 corners project inside the mask
    for c in rays.get_bound_corners(bounds):
        u, v = rays.project(c[None], K, pose)[0]
        assert mask[int(round(v)), int(round(u))] == 1


def test_sample_z_vals_deterministic_and_stratified():
    near = np.array([1.0, 2.0], dtype=np.float32)
    far = np.array([2.0, 4.0], dtype=np.float32)
    z = rays.sample_z_vals(near, far, 64)
    assert z.shape == (2, 64)
    np.testing.assert_allclose(z[0, 0], 1.0)
    np.testing.assert_allclose(z[0, -1], 2.0)
    assert (np.diff(z, axis=1) > 0).all()
    zp = rays.sample_z_vals(near, far, 64, rng=np.random.default_rng(0))
    assert (zp >= near[:, None] - 1e-6).all() and (zp <= far[:, None] + 1e-6).all()
    assert not np.allclose(z, zp)
    # jittered samples stay within their stratum
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    lower = np.concatenate([z[:, :1], mids], 1)
    upper = np.concatenate([mids, z[:, -1:]], 1)
    assert (zp >= lower - 1e-6).all() and (zp <= upper + 1e-6).all()


def test_near_far_hull_matches_dense():
    """get_near_far_hull is exactly get_near_far scattered to the full grid,
    including the 2-intersections mask quirk — over several camera poses
    (front-facing and a behind-camera fallback case)."""
    from transhuman_tpu.geometry.rays import (
        get_near_far, get_near_far_hull, get_rays)

    rng = np.random.default_rng(3)
    H = W = 64
    bounds = np.array([[-0.4, -0.9, -0.3], [0.4, 0.9, 0.3]], np.float32)
    for k in range(4):
        th = rng.uniform(0, 2 * np.pi)
        R = np.array(
            [[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
             [np.sin(th), 0, np.cos(th)]], np.float32)
        # k==3: camera INSIDE the box -> corners behind -> dense fallback
        dist = 0.1 if k == 3 else 2.5
        cam_pos = np.array([-dist * np.sin(th), 0.1, -dist * np.cos(th)])
        T = (-R @ cam_pos).astype(np.float32)
        K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]],
                     np.float32)
        ray_o, ray_d = get_rays(H, W, K, R, T)
        ray_o, ray_d = ray_o.reshape(-1, 3), ray_d.reshape(-1, 3)
        near, far, mask = get_near_far(bounds, ray_o, ray_d)
        nf, ff, mh = get_near_far_hull(bounds, ray_o, ray_d, K, R, T, H, W)
        np.testing.assert_array_equal(mh, mask)
        np.testing.assert_array_equal(nf[mask], near)
        np.testing.assert_array_equal(ff[mask], far)
        assert mask.sum() > 0
