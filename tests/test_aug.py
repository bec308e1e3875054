"""transform_can_smpl augmentation vs a verbatim numpy oracle of the
reference (if_nerf_data_utils.py:660-688) and device-side consistency of
render.pipeline.to_smpl (transform_sampling_points,
if_clight_renderer.py:305-323)."""

import jax.numpy as jnp
import numpy as np

from transhuman_tpu.data.aug import identity_aug, transform_can_smpl
from transhuman_tpu.render.pipeline import FrameInputs, to_smpl


def _oracle(xyz, rng, rot_ratio):
    """Line-for-line reference math (2x2 rotation on the [0, 2] columns)."""
    center = np.array([0, 0, 0]).astype(np.float32)
    rot = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    trans = np.array([0, 0, 0]).astype(np.float32)
    if rng.uniform() > rot_ratio:
        return xyz, center, rot, trans
    xyz = xyz.copy()
    t = rng.uniform(-np.pi / 32, np.pi / 32)
    rot = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]], np.float32)
    center = np.mean(xyz, axis=0)
    xyz = xyz - center
    xyz[:, [0, 2]] = np.dot(xyz[:, [0, 2]], rot.T)
    xyz = xyz + center
    x_trans = rng.uniform(-0.05, 0.05)
    z_trans = rng.uniform(-0.025, 0.025)
    trans = np.array([x_trans, 0, z_trans]).astype(np.float32)
    xyz = xyz + trans
    return xyz, center, rot, trans


def test_matches_reference_oracle():
    base = np.random.default_rng(7).standard_normal((50, 3)).astype(np.float32)
    for seed in range(5):
        got, c, r3, tr = transform_can_smpl(
            base, np.random.default_rng(seed), rot_ratio=1.0
        )
        want, c_o, r2, tr_o = _oracle(base, np.random.default_rng(seed), 1.0)
        np.testing.assert_allclose(got, want, atol=2e-6)
        np.testing.assert_allclose(c, c_o, atol=1e-7)
        np.testing.assert_allclose(tr, tr_o, atol=1e-7)
        # the 2x2 xz block of rot3 is the oracle's rot, y row/col identity
        np.testing.assert_allclose(r3[np.ix_([0, 2], [0, 2])], r2, atol=1e-7)
        np.testing.assert_allclose(r3[1], [0, 1, 0])


def test_rot_ratio_zero_is_identity():
    base = np.random.default_rng(1).standard_normal((20, 3)).astype(np.float32)
    got, c, r3, tr = transform_can_smpl(base, np.random.default_rng(0), 0.0)
    np.testing.assert_array_equal(got, base)
    ic, ir, it = identity_aug()
    np.testing.assert_array_equal(c, ic)
    np.testing.assert_array_equal(r3, ir)
    np.testing.assert_array_equal(tr, it)


def _frame(Rh, Th, aug=None):
    z = np.zeros
    kw = {}
    if aug is not None:
        kw = dict(aug_center=jnp.asarray(aug[0]), aug_rot=jnp.asarray(aug[1]),
                  aug_trans=jnp.asarray(aug[2]))
    return FrameInputs(
        images=z((1, 4, 4, 3), np.float32), vizmaps=z((1, 5), np.float32),
        K=z((1, 3, 3), np.float32), R=z((1, 3, 3), np.float32),
        T=z((1, 3), np.float32), verts_world=z((5, 3), np.float32),
        tar_verts_smpl=z((5, 3), np.float32),
        blend_rot=z((5, 3, 3), np.float32),
        Rh=jnp.asarray(Rh), Th=jnp.asarray(Th), **kw,
    )


def test_to_smpl_applies_the_same_transform_on_device():
    rng = np.random.default_rng(3)
    pts_world = rng.standard_normal((40, 3)).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    Rh = q.astype(np.float32)
    Th = rng.standard_normal(3).astype(np.float32) * 0.1

    pts_smpl = (pts_world - Th) @ Rh
    _, center, rot3, trans = transform_can_smpl(
        pts_smpl, np.random.default_rng(11), rot_ratio=1.0
    )
    want = (pts_smpl - center) @ rot3.T + center + trans

    got = to_smpl(_frame(Rh, Th, aug=(center, rot3, trans)), jnp.asarray(pts_world))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # no aug fields -> plain world->smpl
    got0 = to_smpl(_frame(Rh, Th), jnp.asarray(pts_world))
    np.testing.assert_allclose(np.asarray(got0), pts_smpl, atol=1e-6)
