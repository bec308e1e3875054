"""Synthetic fixtures shared by tests, bench.py and __graft_entry__.py:
a structurally-valid fake ZJU-MoCap frame at configurable scale (real SMPL
assets are license-gated external downloads; see geometry/smpl.py)."""

from __future__ import annotations

import numpy as np

from .geometry.clusters import ClusterSpec
from .geometry.smpl import SMPLModel
from .models.network import TransHumanNet
from .render.pipeline import FrameInputs, RayBundle, RenderPipeline


def synthetic_setup(
    n_views: int = 3,
    image_hw: tuple = (512, 512),
    n_verts: int = 6890,
    n_clusters: int = 300,
    n_samples: int = 64,
    chunk_rays: int = 512,
    embed_dim: int = 192,
    vit_depth: int = 12,
    vit_heads: int = 3,
    knn_k: int = 7,
    dtype=None,
    axis_name=None,
    seed: int = 0,
    compact_ratio=None,
):
    """Returns (model, pipe, frame, smpl, cluster)."""
    rng = np.random.default_rng(seed)
    h, w = image_hw
    smpl = SMPLModel.synthetic(n_verts=n_verts)
    cluster = ClusterSpec.from_kmeans(
        smpl.v_template, n_clusters, iters=3 if n_verts < 1000 else 8
    )
    model = TransHumanNet(
        embed_dim=embed_dim,
        vit_depth=vit_depth,
        vit_heads=vit_heads,
        knn_k=knn_k,
        dtype=dtype,
        axis_name=axis_name,
    )
    pipe = RenderPipeline(
        model, cluster, smpl.v_template, n_samples=n_samples,
        chunk_rays=chunk_rays, compact_ratio=compact_ratio,
    )
    verts, _, T = smpl(np.zeros(72), np.zeros(10))
    focal = 0.9 * max(h, w)
    K = np.tile(
        np.array([[[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]], np.float32),
        (n_views, 1, 1),
    )
    # cameras on a circle around the subject
    Rs, Ts = [], []
    for i in range(n_views):
        th = 2 * np.pi * i / max(n_views, 1)
        c, s = np.cos(th), np.sin(th)
        Rm = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        # camera center on a circle, looking at the origin: forward axis in
        # world coords is R^T e_z = (s, 0, c), so place the camera at -2.5x that
        cam_pos = np.array([-2.5 * s, 0.0, -2.5 * c], np.float32)
        Rs.append(Rm)
        Ts.append(-Rm @ cam_pos)
    frame = FrameInputs(
        images=rng.random((n_views, h, w, 3), dtype=np.float32),
        vizmaps=np.ones((n_views, n_verts), np.float32),
        K=K,
        R=np.stack(Rs),
        T=np.stack(Ts).astype(np.float32),
        verts_world=verts,
        tar_verts_smpl=verts,
        blend_rot=T[:, :3, :3],
        Rh=np.eye(3, dtype=np.float32),
        Th=np.zeros(3, np.float32),
    )
    return model, pipe, frame, smpl, cluster


def synthetic_rays(n_rays: int, seed: int = 0, spread: float = 0.12):
    """Rays from a frontal camera toward the synthetic body at the origin."""
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32) * spread
    dirs[:, 2] += 1.0
    return RayBundle(
        ray_o=np.tile(np.array([0, 0, -2.5], np.float32), (n_rays, 1)),
        ray_d=dirs,
        near=np.full(n_rays, 1.2, np.float32),
        far=np.full(n_rays, 3.8, np.float32),
        mask=np.ones(n_rays, bool),
    )


def init_params(model: TransHumanNet, frame: FrameInputs, n_clusters: int, key):
    import jax.numpy as jnp

    if model.axis_name is not None:
        # init traces outside any mesh/vmap context where the sync-BN axis
        # names are unbound; a no-sync clone has the identical param tree.
        model = model.clone(axis_name=None)
    return model.init(
        key,
        jnp.asarray(frame.images),
        jnp.zeros((n_clusters, 3)),
        jnp.zeros((8, 3)),
        jnp.zeros((n_clusters, 3)),
        jnp.zeros((n_clusters, 3, 3)),
        jnp.zeros((8, 6 * getattr(model, "view_freqs", 4) + 3)),
    )


_JIT_METHODS: "OrderedDict" = None  # created lazily (collections import below)
_JIT_METHODS_CAP = 64  # bound on pinned (obj, program) pairs per process


def _attr_snapshot(obj) -> tuple:
    """Hashable snapshot of the plain-scalar attributes of `obj`.

    Any attribute a jitted method reads at trace time that is a python
    scalar (compact_ratio, remat, chunk_rays, n_samples, white_bkgd, ...)
    lands in the cache key, so mutating it and calling jit_method again
    structurally CANNOT serve the stale program (the advisor's
    `pipe.remat = True` hazard).  Non-scalar attrs (arrays, the model) are
    excluded — tests never mutate those in place."""
    items = []
    for k, v in sorted(vars(obj).items()):
        if isinstance(v, (int, float, bool, str, bytes, type(None))):
            items.append((k, v))
    return tuple(items)


def jit_method(obj, method: str = "render_frame"):
    """jax.jit(getattr(obj, method)) memoized per (obj, method, scalar attrs).

    For test suites that render many pipeline variants: re-tracing an
    identical program per call site dominates wall time (a persistent
    compilation cache only skips the XLA compile, not tracing/lowering).

    Scalar attributes of `obj` are part of the cache key (see
    _attr_snapshot), so the common mutate-a-flag-then-rerender pattern gets
    a fresh trace automatically.  Mutating a NON-scalar attribute in place
    (an array, the model) still requires jit_method_clear(obj).  The cache
    is LRU-bounded at 64 entries so a long pytest session cannot pin every
    pipeline (and its traced constants) for the process lifetime.
    """
    import jax

    global _JIT_METHODS
    if _JIT_METHODS is None:
        from collections import OrderedDict

        _JIT_METHODS = OrderedDict()
    key = (id(obj), method, _attr_snapshot(obj))
    hit = _JIT_METHODS.get(key)
    if hit is None:
        bound = getattr(obj, method)

        # fresh closure per cache entry: jax's pjit trace cache keys on
        # function EQUALITY, and bound methods of the same (obj, method)
        # compare equal — jitting the bound method directly would silently
        # share the stale trace across snapshot keys
        def _call(*a, _bound=bound, **k):
            return _bound(*a, **k)

        hit = _JIT_METHODS[key] = (obj, jax.jit(_call))
    _JIT_METHODS.move_to_end(key)
    while len(_JIT_METHODS) > _JIT_METHODS_CAP:
        _JIT_METHODS.popitem(last=False)
    return hit[1]


def jit_method_clear(obj=None):
    """Drop jit_method cache entries for `obj` (all entries when None) —
    required after mutating non-scalar attributes a cached method traced
    over (scalar-attr mutations re-key automatically)."""
    if _JIT_METHODS is None:
        return
    if obj is None:
        _JIT_METHODS.clear()
        return
    for k in [k for k in _JIT_METHODS if k[0] == id(obj)]:
        del _JIT_METHODS[k]
