"""Feature sampling + projection vs torch.grid_sample oracle.

The oracle reproduces the reference's exact call pattern
(if_clight_renderer.py:186-208): normalize uv with
``uv * (S_f/(S_f-1))*2/S_img - 1`` then grid_sample(align_corners=True,
padding_mode="border").
"""

import numpy as np
import torch
import torch.nn.functional as F

from transhuman_tpu.ops.sampling import project_points, sample_feature_map


def torch_oracle(feat_vhwc, uv, image_shape):
    v, h, w, c = feat_vhwc.shape
    feat = torch.from_numpy(feat_vhwc).permute(0, 3, 1, 2)  # VCHW
    scale = np.array([w, h]) / (np.array([w, h]) - 1) * 2.0 / np.array(
        [image_shape[1], image_shape[0]]
    )
    grid = torch.from_numpy(uv * scale - 1.0).float().unsqueeze(2)  # (V,N,1,2)
    out = F.grid_sample(
        feat, grid, align_corners=True, mode="bilinear", padding_mode="border"
    )
    return out[:, :, :, 0].permute(0, 2, 1).numpy()  # (V, N, C)


def test_sample_matches_grid_sample(rng):
    v, h, w, c = 2, 16, 24, 5
    feat = rng.standard_normal((v, h, w, c)).astype(np.float32)
    img_shape = (32, 48)  # feature map at half image res
    uv = np.stack(
        [
            rng.uniform(-4, img_shape[1] + 4, (v, 100)),  # x, deliberately OOB
            rng.uniform(-4, img_shape[0] + 4, (v, 100)),  # y
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(sample_feature_map(feat, uv, img_shape))
    want = torch_oracle(feat, uv, img_shape)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_exact_at_integer_coords(rng):
    feat = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    xs, ys = np.meshgrid(np.arange(8), np.arange(8))
    uv = np.stack([xs.ravel(), ys.ravel()], -1)[None].astype(np.float32)
    got = np.asarray(sample_feature_map(feat, uv, (8, 8)))
    want = feat[0, ys.ravel(), xs.ravel()]
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_project_points_matches_manual(rng):
    K = np.array([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]], np.float32)
    theta = 0.3
    R = np.array(
        [[[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]],
        np.float32,
    )
    T = np.array([[0.1, -0.2, 3.0]], np.float32)
    xyz = rng.standard_normal((50, 3)).astype(np.float32)
    uv, z = project_points(xyz, K, R, T)
    cam = xyz @ R[0].T + T[0]
    pix = cam @ K[0].T
    np.testing.assert_allclose(np.asarray(uv)[0], pix[:, :2] / pix[:, 2:], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z)[0], cam[:, 2], rtol=1e-5)


def test_half_pixel_sampling_matches_torch(rng):
    from transhuman_tpu.ops.sampling import sample_half_pixel

    v, h, w, c = 2, 10, 12, 3
    feat = rng.standard_normal((v, h, w, c)).astype(np.float32)
    uv = np.stack(
        [rng.uniform(-2, w + 2, (v, 64)), rng.uniform(-2, h + 2, (v, 64))], -1
    ).astype(np.float32)
    got = np.asarray(sample_half_pixel(feat, uv, (h, w)))
    # oracle: reference convention uv/S*2-1 into default grid_sample
    tfeat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    grid = torch.from_numpy(
        np.stack([uv[..., 0] / w * 2 - 1, uv[..., 1] / h * 2 - 1], -1)
    ).unsqueeze(2)
    want = (
        F.grid_sample(tfeat, grid, align_corners=False, padding_mode="zeros")
        .permute(0, 2, 3, 1)[:, :, 0]
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depth_visibility(rng):
    from transhuman_tpu.ops.sampling import depth_visibility

    # one camera at origin looking +z; two verts at z=2 and z=5; depth map 2.1
    K = np.array([[[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]]], np.float32)
    R = np.eye(3, dtype=np.float32)[None]
    T = np.zeros((1, 3), np.float32)
    depth = np.full((1, 16, 16), 2.1, np.float32)
    verts = np.array([[0, 0, 2.0], [0, 0, 5.0]], np.float32)
    vis = np.asarray(depth_visibility(depth, verts, K, R, T, det=0.07))
    np.testing.assert_array_equal(vis[0], [1.0, 0.0])


def test_custom_vjp_matches_autodiff(rng):
    """The sorted-segment-sum backward equals jax autodiff of the raw math."""
    import jax
    import jax.numpy as jnp
    from transhuman_tpu.ops.sampling import _lerp, _sample_taps, sample_feature_map

    v, h, w, c = 2, 9, 11, 4
    feat = rng.standard_normal((v, h, w, c)).astype(np.float32)
    uv = np.stack(
        [rng.uniform(0, 21, (v, 40)), rng.uniform(0, 17, (v, 40))], -1
    ).astype(np.float32)
    g = rng.standard_normal((v, 40, c)).astype(np.float32)

    def raw(feat, uv):
        p, wx, wy, _, _ = _sample_taps(feat, uv, (18, 22))
        return _lerp(p, wx, wy)

    def loss_custom(f, u):
        return jnp.sum(sample_feature_map(f, u, (18, 22)) * g)

    def loss_raw(f, u):
        return jnp.sum(raw(f, u) * g)

    gf_c, gu_c = jax.grad(loss_custom, argnums=(0, 1))(
        jnp.asarray(feat), jnp.asarray(uv)
    )
    gf_r, gu_r = jax.grad(loss_raw, argnums=(0, 1))(
        jnp.asarray(feat), jnp.asarray(uv)
    )
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gu_c), np.asarray(gu_r), atol=1e-3)


def test_int8_quantized_sampling_keeps_bilinear_fractions():
    """Regression: the bilinear fractions must never be cast to the int8
    feature dtype (that truncates every fraction to 0 — corner snapping).
    Sample exactly halfway between two texels of a high-contrast int8 map
    and require the midpoint value, which corner snapping cannot produce."""
    import jax.numpy as jnp

    from transhuman_tpu.ops.sampling import quantize_feature_map

    h = w = 8
    feat = np.zeros((1, h, w, 1), np.float32)
    feat[:, :, 4::1, :] = 1.0  # step edge between x=3 and x=4
    q, scale = quantize_feature_map(jnp.asarray(feat))
    assert q.dtype == jnp.int8
    # image coords == feature coords (same shape); x=3.5 is mid-edge
    uv = np.array([[[3.5, 2.0]]], np.float32)  # (V=1, N=1, 2)
    out = np.asarray(
        sample_feature_map(q, jnp.asarray(uv), (h, w)), np.float32
    ) * np.asarray(scale)
    np.testing.assert_allclose(out.ravel(), [0.5], atol=1.0 / 127)
