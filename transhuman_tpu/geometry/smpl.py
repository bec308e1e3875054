"""SMPL body model: linear blend skinning returning per-vertex blend matrices.

Reimplements the math of the reference's `lib/utils/SMPL.py:107-185` (numpy
LBS: shape blendshapes -> pose blendshapes -> 24-joint kinematic chain ->
per-vertex 4x4 blend matrix T).  The blend matrices are what DPaRF consumes
(`lib/networks/cross_transformer.py:185-188`): their 3x3 blocks define the
pose-deformed coordinate frame of each vertex/cluster.

Runs on the host (per frame, 6890 verts — trivially cheap); a jnp variant
`lbs_jnp` is provided for fully on-device pipelines.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

import numpy as np

N_VERTS = 6890
N_JOINTS = 24
N_SHAPE = 10

_SEX_FILES = {
    "male": "basicmodel_m_lbs_10_207_0_v1.0.0.pkl",
    "female": "basicModel_f_lbs_10_207_0_v1.0.0.pkl",
    "neutral": "SMPL_NEUTRAL.pkl",
}


def rodrigues(r: np.ndarray) -> np.ndarray:
    """Axis-angle vectors (N,3) -> rotation matrices (N,3,3).

    Same formula as if_nerf_data_utils.batch_rodrigues (the reference uses
    cv2.Rodrigues per joint in SMPL.py:134; identical math).
    """
    r = np.asarray(r, dtype=np.float64).reshape(-1, 3)
    angle = np.linalg.norm(r + 1e-8, axis=1, keepdims=True)
    rot_dir = r / angle
    cos = np.cos(angle)[:, None]
    sin = np.sin(angle)[:, None]
    rx, ry, rz = np.split(rot_dir, 3, axis=1)
    zeros = np.zeros_like(rx)
    K = np.concatenate([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1)
    K = K.reshape(-1, 3, 3)
    ident = np.eye(3)[None]
    return (ident + sin * K + (1 - cos) * np.matmul(K, K)).astype(np.float32)


class _ChumpyStub:
    """Absorbs chumpy classes during unpickling — chumpy is not in this
    image, and the raw SMPL_NEUTRAL.pkl download stores v_template/
    shapedirs/weights/... as chumpy.Ch objects whose data term lives in the
    instance dict under 'x' (the reference strips them with
    third_parties/clean_ch.py, which itself needs chumpy installed)."""

    def __init__(self, *a, **k):
        pass


def _unchumpy(v):
    if isinstance(v, _ChumpyStub):
        x = v.__dict__.get("x")
        if x is None:
            raise ValueError(
                "chumpy object without an 'x' data term — run the "
                "reference's clean_ch.py on this pickle instead"
            )
        return np.asarray(x)
    return v


def load_smpl_pickle(path: str) -> dict:
    """Load an SMPL pickle, chumpy-cleaned or raw.  Raw pickles reference
    the chumpy module; a stub unpickler absorbs those classes and extracts
    their numpy data terms (clean_ch.py:32-47 semantics, chumpy-free)."""

    class _U(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] == "chumpy":
                return _ChumpyStub
            return super().find_class(module, name)

    # ALWAYS the stub unpickler (it falls through for non-chumpy modules,
    # so cleaned pickles load identically): a plain pickle.load would
    # succeed in environments where chumpy IS installed and hand back real
    # Ch objects that _unchumpy cannot see — cleansmpl would then write a
    # 'cleaned' pickle still carrying chumpy objects
    with open(path, "rb") as f:
        data = _U(f, encoding="latin1").load()
    return {k: _unchumpy(v) for k, v in data.items()}


@dataclass
class SMPLModel:
    """Container for SMPL template assets (shapes as in the official pickle)."""

    v_template: np.ndarray  # (6890, 3)
    shapedirs: np.ndarray  # (6890, 3, 10)
    posedirs: np.ndarray  # (6890, 3, 207)
    J_regressor: np.ndarray  # (24, 6890) dense
    weights: np.ndarray  # (6890, 24)
    parent: np.ndarray  # (23,) parent joint index of joints 1..23
    faces: np.ndarray  # (F, 3) int32

    @classmethod
    def load(cls, model_dir: str, sex: str = "neutral") -> "SMPLModel":
        path = os.path.join(model_dir, _SEX_FILES[sex])
        data = load_smpl_pickle(path)  # handles raw chumpy pickles too
        J_regressor = data["J_regressor"]
        if hasattr(J_regressor, "todense"):
            J_regressor = np.array(J_regressor.todense())
        kintree = data["kintree_table"].astype("int64")
        id_to_col = {kintree[1, i].item(): i for i in range(kintree.shape[1])}
        parent = np.array(
            [id_to_col[kintree[0, it]] for it in range(1, kintree.shape[1])]
        )
        return cls(
            v_template=np.asarray(data["v_template"], dtype=np.float32),
            shapedirs=np.asarray(data["shapedirs"], dtype=np.float32),
            posedirs=np.asarray(data["posedirs"], dtype=np.float32),
            J_regressor=np.asarray(J_regressor, dtype=np.float32),
            weights=np.asarray(data["weights"], dtype=np.float32),
            parent=parent,
            faces=np.asarray(data["f"], dtype=np.int32),
        )

    @classmethod
    def synthetic(cls, seed: int = 0, n_verts: int = N_VERTS) -> "SMPLModel":
        """A structurally-valid random SMPL stand-in for tests/benchmarks
        (the real SMPL pickle is an external, license-gated download)."""
        rng = np.random.default_rng(seed)
        # a rough vertical "body": cylinder of height ~1.7m
        theta = rng.uniform(0, 2 * np.pi, n_verts)
        h = rng.uniform(-0.85, 0.85, n_verts)
        r = 0.15 + 0.1 * rng.random(n_verts)
        v_template = np.stack([r * np.cos(theta), h, r * np.sin(theta)], 1).astype(
            np.float32
        )
        # chain: joint i's parent is i-1 (simple spine-like chain)
        parent = np.arange(0, N_JOINTS - 1)
        joints_y = np.linspace(-0.8, 0.8, N_JOINTS)
        # J_regressor selecting nearest verts by height band (rows sum to 1)
        J_regressor = np.zeros((N_JOINTS, n_verts), dtype=np.float32)
        for j in range(N_JOINTS):
            d = np.abs(v_template[:, 1] - joints_y[j])
            idx = np.argsort(d)[:8]
            J_regressor[j, idx] = 1.0 / 8.0
        # skinning weights: soft assignment to 2 nearest joints by height
        d = np.abs(v_template[:, 1:2] - joints_y[None, :])  # (V, 24)
        w = np.exp(-(d**2) / 0.02)
        weights = (w / w.sum(1, keepdims=True)).astype(np.float32)
        shapedirs = (rng.standard_normal((n_verts, 3, N_SHAPE)) * 0.01).astype(
            np.float32
        )
        posedirs = (rng.standard_normal((n_verts, 3, 207)) * 0.001).astype(np.float32)
        # arbitrary triangulation (not geometrically meaningful)
        faces = rng.integers(0, n_verts, (13776, 3)).astype(np.int32)
        return cls(v_template, shapedirs, posedirs, J_regressor, weights, parent, faces)

    # ------------------------------------------------------------------
    def __call__(self, pose: np.ndarray, beta: np.ndarray, v_template=None):
        """LBS forward: returns (verts (6890,3), joints (24,3), T (6890,4,4)).

        pose: (72,)/(1,72)/(72,1) axis-angle or (24,3,3) rotations.
        beta: (10,) shape coefficients.
        Matches SMPL._call (SMPL.py:114-185): T maps *canonical* (posed-shape
        rest, i.e. v_posed) homogeneous coords to observation coords.
        """
        v_template = self.v_template if v_template is None else v_template
        n_verts = v_template.shape[0]
        beta = np.asarray(beta, dtype=np.float32).reshape(-1)
        v_shaped = (
            self.shapedirs.reshape(-1, N_SHAPE).dot(beta[:, None]).reshape(n_verts, 3)
            + v_template
        )
        J = self.J_regressor.dot(v_shaped)  # (24, 3)

        pose = np.asarray(pose)
        if pose.shape == (N_JOINTS, 3, 3):
            R = pose.astype(np.float32)
        else:
            R = rodrigues(pose.reshape(N_JOINTS, 3))

        lrotmin = (R[1:] - np.eye(3, dtype=np.float32)[None]).reshape(-1, 1)
        v_posed = v_shaped + self.posedirs.reshape(-1, 207).dot(lrotmin).reshape(
            n_verts, 3
        )

        # kinematic chain of local transforms
        J_rel = J.copy()
        J_rel[1:] = J[1:] - J[self.parent]
        G_local = np.zeros((N_JOINTS, 4, 4), dtype=np.float32)
        G_local[:, :3, :3] = R
        G_local[:, :3, 3] = J_rel
        G_local[:, 3, 3] = 1.0

        G = [G_local[0]]
        for i in range(1, N_JOINTS):
            G.append(G[self.parent[i - 1]].dot(G_local[i]))
        G = np.stack(G, axis=0)  # (24, 4, 4)
        joints = G[:, :3, 3].copy()

        # subtract the transformed rest joints (SMPL.py:164-168)
        G_adj = G.copy()
        G_adj[:, :3, 3] -= np.einsum("jab,jb->ja", G[:, :3, :3], J)

        T = self.weights.dot(G_adj.reshape(N_JOINTS, -1)).reshape(n_verts, 4, 4)
        v_h = np.concatenate([v_posed, np.ones((n_verts, 1), dtype=np.float32)], axis=1)
        v = np.einsum("vab,vb->va", T, v_h)[:, :3]
        return v.astype(np.float32), joints.astype(np.float32), T.astype(np.float32)


def lbs_jnp(model: SMPLModel, pose_rotmats, beta):
    """jnp LBS for on-device use. pose_rotmats: (24,3,3); beta: (10,).

    The kinematic chain is unrolled (24 static steps) — fine under jit.
    Returns (verts, joints, T) as jnp arrays.  Uses HIGHEST matmul precision:
    geometry must be exact, and these matmuls are tiny.
    """
    import functools

    import jax
    import jax.numpy as jnp

    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    v_template = jnp.asarray(model.v_template)
    n_verts = v_template.shape[0]
    v_shaped = mm(
        jnp.reshape(jnp.asarray(model.shapedirs), (-1, N_SHAPE)), beta[:, None]
    ).reshape(n_verts, 3) + v_template
    J = mm(jnp.asarray(model.J_regressor), v_shaped)
    R = pose_rotmats
    lrotmin = (R[1:] - jnp.eye(3)[None]).reshape(-1, 1)
    v_posed = v_shaped + mm(
        jnp.reshape(jnp.asarray(model.posedirs), (-1, 207)), lrotmin
    ).reshape(n_verts, 3)

    parent = model.parent
    J_rel = J.at[1:].add(-J[parent])
    G_local = (
        jnp.zeros((N_JOINTS, 4, 4))
        .at[:, :3, :3]
        .set(R)
        .at[:, :3, 3]
        .set(J_rel)
        .at[:, 3, 3]
        .set(1.0)
    )
    Gs = [G_local[0]]
    for i in range(1, N_JOINTS):
        Gs.append(mm(Gs[parent[i - 1]], G_local[i]))
    G = jnp.stack(Gs)
    joints = G[:, :3, 3]
    G_adj = G.at[:, :3, 3].add(
        -jnp.einsum("jab,jb->ja", G[:, :3, :3], J, precision=jax.lax.Precision.HIGHEST)
    )
    T = mm(jnp.asarray(model.weights), G_adj.reshape(N_JOINTS, -1)).reshape(
        n_verts, 4, 4
    )
    v_h = jnp.concatenate([v_posed, jnp.ones((n_verts, 1))], axis=1)
    v = jnp.einsum("vab,vb->va", T, v_h)[:, :3]
    return v, joints, T
