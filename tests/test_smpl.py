import numpy as np
import pytest

from transhuman_tpu.geometry.smpl import SMPLModel, lbs_jnp, rodrigues


@pytest.fixture(scope="module")
def model():
    return SMPLModel.synthetic(seed=0)


def test_rodrigues_basic():
    # zero rotation -> identity
    R = rodrigues(np.zeros((1, 3)))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    # pi/2 about z
    R = rodrigues(np.array([[0, 0, np.pi / 2]]))[0]
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)
    # orthonormality for random axes
    Rs = rodrigues(np.random.default_rng(0).standard_normal((10, 3)))
    for R in Rs:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rest_pose_is_near_identity_transform(model):
    """Zero pose, zero shape: blend matrices must be the identity map
    (T @ v_posed == verts), since no joint rotates."""
    verts, joints, T = model(np.zeros(72), np.zeros(10))
    np.testing.assert_allclose(T[:, :3, :3], np.tile(np.eye(3), (6890, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(T[:, :3, 3], 0, atol=1e-5)
    np.testing.assert_allclose(verts, model.v_template, atol=1e-5)


def test_blend_matrices_map_canonical_to_observed(model):
    """Defining property consumed by DPaRF: T maps the pose-blendshaped rest
    vertices to the posed vertices."""
    rng = np.random.default_rng(1)
    pose = rng.uniform(-0.4, 0.4, 72)
    beta = rng.uniform(-1, 1, 10)
    verts, joints, T = model(pose, beta)
    # reconstruct v_posed (shape+pose blendshaped rest mesh) independently
    v_shaped = model.shapedirs.reshape(-1, 10) @ beta
    v_shaped = v_shaped.reshape(6890, 3) + model.v_template
    R = rodrigues(pose.reshape(24, 3))
    lrotmin = (R[1:] - np.eye(3)[None]).reshape(-1, 1)
    v_posed = v_shaped + (model.posedirs.reshape(-1, 207) @ lrotmin).reshape(6890, 3)
    v_h = np.concatenate([v_posed, np.ones((6890, 1))], 1)
    got = np.einsum("vab,vb->va", T, v_h)[:, :3]
    np.testing.assert_allclose(got, verts, atol=1e-4)


def test_global_rotation_only(model):
    """Pose with only root rotation: every vertex rigidly rotates about joint 0."""
    pose = np.zeros(72)
    pose[:3] = [0, np.pi / 3, 0]
    verts, joints, T = model(pose, np.zeros(10))
    R0 = rodrigues(pose[:3])[0]
    J0 = model.J_regressor @ model.v_template
    expect = (model.v_template - J0[0]) @ R0.T + J0[0]
    np.testing.assert_allclose(verts, expect, atol=1e-4)
    # every blend rotation equals the root rotation
    np.testing.assert_allclose(T[:, :3, :3], np.tile(R0, (6890, 1, 1)), atol=1e-5)


def test_joint_positions_follow_chain(model):
    """Rotating joint k must not move joints that are not its descendants."""
    pose = np.zeros(72)
    pose[3 * 10 : 3 * 10 + 3] = [0.5, 0, 0]  # rotate joint 10 (chain parent: 9)
    _, joints, _ = model(pose, np.zeros(10))
    _, joints0, _ = model(np.zeros(72), np.zeros(10))
    # synthetic model chain is 0->1->...->23: joints <= 10 unaffected
    np.testing.assert_allclose(joints[:11], joints0[:11], atol=1e-5)
    assert np.abs(joints[12:] - joints0[12:]).max() > 1e-4


def test_lbs_jnp_matches_numpy(model):
    rng = np.random.default_rng(2)
    pose = rng.uniform(-0.3, 0.3, 72)
    beta = rng.uniform(-1, 1, 10)
    verts, joints, T = model(pose, beta)
    R = rodrigues(pose.reshape(24, 3))
    jv, jj, jT = lbs_jnp(model, R, beta)
    np.testing.assert_allclose(np.asarray(jv), verts, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jj), joints, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jT), T, atol=1e-4)
