"""kNN ops vs numpy brute force; dense-matmul aggregation == gather-aggregate."""

import numpy as np
import jax.numpy as jnp

from transhuman_tpu.ops import knn as K


def brute_knn(pts, refs, k):
    d2 = ((pts[:, None, :] - refs[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.sqrt(np.take_along_axis(d2, idx, 1)), idx


def test_knn_matches_bruteforce(rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    refs = rng.standard_normal((300, 3)).astype(np.float32)
    dist, idx = K.knn(jnp.asarray(pts), jnp.asarray(refs), 7)
    bd, bi = brute_knn(pts, refs, 7)
    np.testing.assert_allclose(np.asarray(dist), bd, atol=1e-4)
    # indices can differ on exact ties; verify via distances of chosen refs
    chosen = np.linalg.norm(pts[:, None] - refs[np.asarray(idx)], axis=-1)
    np.testing.assert_allclose(chosen, bd, atol=1e-4)


def test_min_dist(rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    refs = rng.standard_normal((100, 3)).astype(np.float32)
    got = np.asarray(K.min_dist(jnp.asarray(pts), jnp.asarray(refs)))
    want = np.sqrt(((pts[:, None] - refs[None]) ** 2).sum(-1).min(1))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dense_weights_equal_gather_aggregate(rng):
    n, c, d, k, v = 64, 30, 16, 7, 3
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    refs = rng.standard_normal((c, 3)).astype(np.float32)
    tokens = rng.standard_normal((v, c, d)).astype(np.float32)
    dist, idx = K.knn(jnp.asarray(pts), jnp.asarray(refs), k)
    w = K.knn_softmax_weights(dist, 0.5)
    dense = K.dense_weight_matrix(idx, w, c)
    agg_matmul = np.einsum("nc,vcd->vnd", np.asarray(dense), tokens)
    gathered = tokens[:, np.asarray(idx)]  # (v, n, k, d)
    agg_gather = np.einsum("nk,vnkd->vnd", np.asarray(w), gathered)
    np.testing.assert_allclose(agg_matmul, agg_gather, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense).sum(-1), np.ones(n), atol=1e-5)


def test_softmax_weights_match_reference_formula(rng):
    """cross_transformer.py:151-156: softmax(-dist/alpha) over K."""
    dist = np.abs(rng.standard_normal((10, 7))).astype(np.float32)
    got = np.asarray(K.knn_softmax_weights(jnp.asarray(dist), 0.5))
    e = np.exp(-dist / 0.5 - (-dist / 0.5).max(1, keepdims=True))
    want = e / e.sum(1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)
