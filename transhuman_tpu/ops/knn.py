"""Brute-force k-nearest-neighbour ops, designed for the TPU MXU.

Replaces pytorch3d's CUDA `knn_points` at its three reference call sites
(SURVEY.md §2.3):
  (a) DPaRF K=7 point->cluster binding       cross_transformer.py:170
  (b) inference culling K=1 vs 6890 verts    if_clight_renderer.py:440
  (c) mesh-grid culling                      if_mesh_renderer.py:53

Design: with at most ~6890 reference points, the distance matrix row block
is small; `d2 = |p|^2 + |r|^2 - 2 p.r^T` puts the dominant term on the MXU
as a (N x 3) @ (3 x R) matmul, and the top-k over <=6890 columns runs on
the VPU via `lax.top_k`.  No CUDA-style two-pass selection needed.

For DPaRF aggregation the K=7 softmax weights are additionally scattered
into a dense (N, C) matrix so the token aggregation becomes one
(N x C) @ (C x D) MXU matmul instead of a gather (see models/heads.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dist2(pts, refs, precision=None):
    """Squared euclidean distances. pts: (N,3), refs: (R,3) -> (N,R).

    Clamped at 0 to absorb the catastrophic cancellation of the expanded
    form (|p-r|^2 computed as |p|^2+|r|^2-2pr can go slightly negative).
    """
    p2 = jnp.sum(pts * pts, axis=-1, keepdims=True)  # (N,1)
    r2 = jnp.sum(refs * refs, axis=-1)  # (R,)
    cross = jnp.matmul(pts, refs.T, precision=precision)  # (N,R) on the MXU
    return jnp.maximum(p2 + r2[None, :] - 2.0 * cross, 0.0)


def topk_min(d, k: int):
    """Smallest-k values+indices per row of d (N, C): iterative extraction.

    XLA's `lax.top_k` lowers to a per-row sort on TPU — measured ~4x slower
    than k passes of (argmin + mask) for k=7, C=300.  Results are set-equal
    to top_k (ascending order; ties broken by lowest index, matching argmin
    semantics).  All passes are pure VPU map-reduces, no scatters.
    """
    n, c = d.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    cur = d
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
        v = jnp.min(cur, axis=-1)
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(col == i[:, None], jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def dparf_dense_weights(d2, k: int, alpha: float, aux=None, precision=None):
    """Streaming top-k + softmax + dense-weight build in one loop over k.

    d2: (N, C) squared distances.  Returns (w_dense (N, C) rows summing to 1
    with exactly k nonzeros, dist (N, k) euclidean ascending, aux_k,
    w_knn (N, k)), where aux_k is None or, given `aux` (C, A), the
    per-neighbour rows (N, k, A) = aux[idx] — materialized via per-iteration
    one-hot *matmuls* on the MXU instead of row gathers (measured 4x+ faster
    than XLA's gather for these 12-48 B rows on v5e).  w_knn is the SAME
    normalized softmax weight per neighbour that w_dense scatters — callers
    needing the compact (N, k) form (the DPaRF PE aggregation) must use it
    rather than recompute softmax(-dist/alpha), so the two aggregations can
    never diverge.

    Equivalent to softmax(-sqrt(topk)/alpha) scattered to dense columns, but
    the full matrix is touched only by the k argmin/mask passes — no (N, C)
    sqrt/exp/threshold passes (softmax runs unnormalized against the nearest
    distance, exp(-(d_i - d_0)/alpha) <= 1, and normalizes at the end).
    """
    n, c = d2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    cur = d2
    w_dense = jnp.zeros((n, c), d2.dtype)
    u_sum = jnp.zeros((n,), d2.dtype)
    d0 = None
    dists, us, auxs = [], [], []
    for _ in range(k):
        a = jnp.argmin(cur, axis=-1).astype(jnp.int32)
        v = jnp.min(cur, axis=-1)
        sel = col == a[:, None]
        d_i = jnp.sqrt(jnp.maximum(v, 1e-12))
        if d0 is None:
            d0 = d_i
        u = jnp.exp(-(d_i - d0) / alpha)
        w_dense = w_dense + jnp.where(sel, u[:, None], 0.0)
        u_sum = u_sum + u
        dists.append(d_i)
        us.append(u)
        if aux is not None:
            auxs.append(
                jnp.matmul(sel.astype(aux.dtype), aux, precision=precision)
            )
        cur = jnp.where(sel, jnp.inf, cur)
    w_dense = w_dense / u_sum[:, None]
    w_knn = jnp.stack(us, -1) / u_sum[:, None]
    aux_k = jnp.stack(auxs, axis=1) if aux is not None else None
    return w_dense, jnp.stack(dists, -1), aux_k, w_knn


def knn(pts, refs, k: int, precision=None):
    """k nearest refs per point: returns (dist, idx), dist = euclidean (sqrt'd),
    ascending, shapes (N,k).

    The 1e-12 floor keeps sqrt's gradient finite when cancellation clamps a
    tiny squared distance to exactly 0 (a point sitting on a cluster center
    would otherwise inject inf into the backward pass).
    """
    d2 = pairwise_dist2(pts, refs, precision=precision)
    d2k, idx = topk_min(d2, k)
    return jnp.sqrt(jnp.maximum(d2k, 1e-12)), idx


def min_dist(pts, refs, precision=None, ref_block: int = 1024):
    """Distance to the nearest ref per point: (N,).  The K=1 culling kNN
    (if_clight_renderer.py:440) only ever uses the distance, so skip top_k.

    The reduction is blocked over refs (`ref_block` columns at a time, via
    lax.scan) so the (N, R) distance matrix never materializes — for the
    5.6M-point full-frame cull vs 6890 verts that matrix would be GBs; the
    blocked form keeps the live intermediate at N x ref_block.
    """
    r = refs.shape[0]
    if r <= ref_block:
        d2 = pairwise_dist2(pts, refs, precision=precision)
        return jnp.sqrt(jnp.min(d2, axis=-1))
    pad = (-r) % ref_block
    refs_p = jnp.pad(refs, ((0, pad), (0, 0)), constant_values=1e10)
    blocks = refs_p.reshape(-1, ref_block, 3)

    def body(carry, blk):
        d2 = pairwise_dist2(pts, blk, precision=precision)
        return jnp.minimum(carry, jnp.min(d2, axis=-1)), None

    init = jnp.full(pts.shape[:1], jnp.inf, pts.dtype)
    out, _ = jax.lax.scan(body, init, blocks)
    return jnp.sqrt(out)


def min_excess2(pts, refs, bias2, precision=None, ref_block: int = 1024):
    """min over refs of (|p - r|^2 - bias2_r): (N,).  The per-vertex-radii
    cull predicate `exists v: dist(p, v) <= r_v` is `min_excess2 < 0` with
    bias2 = r_v^2 — same blocked MXU form as min_dist (the bias is a free
    row-vector add on the distance matrix), no sqrt needed.

    With uniform bias2 = c^2 this reduces to the classic shell predicate
    (min d2 < c^2  <=>  dist < c), so radii-cull with constant radii is the
    reference cull (if_clight_renderer.py:440-443) exactly.
    """
    r = refs.shape[0]
    if r <= ref_block:
        d2 = pairwise_dist2(pts, refs, precision=precision)
        return jnp.min(d2 - bias2[None, :], axis=-1)
    pad = (-r) % ref_block
    refs_p = jnp.pad(refs, ((0, pad), (0, 0)), constant_values=1e10)
    bias_p = jnp.pad(bias2, (0, pad))  # padded rows: d2 ~ 1e20 dominates
    blocks = refs_p.reshape(-1, ref_block, 3)
    bias_blocks = bias_p.reshape(-1, ref_block)

    def body(carry, blk):
        b_refs, b_bias = blk
        d2 = pairwise_dist2(pts, b_refs, precision=precision)
        return (
            jnp.minimum(carry, jnp.min(d2 - b_bias[None, :], axis=-1)),
            None,
        )

    init = jnp.full(pts.shape[:1], jnp.inf, pts.dtype)
    out, _ = jax.lax.scan(body, init, (blocks, bias_blocks))
    return out


def knn_softmax_weights(dist, alpha: float):
    """softmax(-dist/alpha) over the K axis (cross_transformer.py:151-156)."""
    return jax.nn.softmax(-dist / alpha, axis=-1)


def dense_weight_matrix(idx, weights, num_refs: int):
    """Scatter per-point top-k weights into a dense (N, num_refs) matrix.

    idx: (N,k) int32; weights: (N,k).  Rows sum to whatever `weights` rows
    sum to (1.0 after softmax).  Enables aggregation-as-matmul: with
    W = dense_weight_matrix(...), the kNN-weighted token pooling
    `sum_k w_k * token[idx_k]` is exactly `W @ tokens` — an MXU matmul
    instead of a (N,k,D) gather + reduction.
    """
    N, k = idx.shape
    onehot = jax.nn.one_hot(idx, num_refs, dtype=weights.dtype)  # (N,k,R)
    return jnp.einsum("nk,nkr->nr", weights, onehot)
