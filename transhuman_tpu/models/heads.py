"""DPaRF point binding + multi-view cross-attention fusion + NeRF heads.

Capability parity with the reference `lib/networks/cross_transformer.py`:

* DPaRF (`get_human_representation`, :158-205): each query point binds to its
  K=7 nearest cluster tokens (kNN in SMPL coords vs the ~300 observation-pose
  cluster centers), is re-expressed in each token's pose-deformed local frame
  (rotation = 3x3 block of the cluster-pooled SMPL blend matrix), sin-cos
  encoded, concatenated with the token feature, and softmax(-d/0.5)-weighted
  summed over K -> a 255-d per-view "human representation".
* View fusion (`cross_attention`, :128-149): single-head attention per point
  over the 3 input views; K/V projected from pixel-aligned features, Q/V from
  the human representation; residual add.
* Heads (:280-353): density branch averages views then 256->256->1; RGB branch
  adds pixel-feature residuals, concatenates the 27-d view-direction encoding,
  128-d MLP, view-average, 128->128->3.

TPU-native design:
* Point features are (V, N, C) with Dense over C — every 1x1-conv of the
  reference becomes an MXU matmul over the N point axis.
* The kNN token aggregation is a *dense* (N, C_clusters) @ (C_clusters, D)
  matmul built from scattered top-k softmax weights (ops/knn.py) rather than
  a gather+reduce — exactly equal, and MXU-shaped.
* The reference's progressive density-gated RGB (:291-311) is a dynamic-shape
  optimization; under jit we compute RGB for all (already SMPL-culled) points
  — the compositing weights of sigma<=0 points are 0, so outputs are
  identical.  Padded/invalid points are zeroed via `pts_mask` (matching the
  reference's masked-scatter at :229-242).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import knn as knn_ops
from .embedder import embed_dparf


def dparf_representation(
    pts_smpl,
    cluster_centers,
    cluster_rot,
    tokens,
    k: int = 7,
    dist_alpha: float = 0.5,
    n_freqs: int = 10,
    knn_sigma: Optional[float] = None,
    precision=None,
):
    """Deformable Partial Radiance Field point encoding.

    pts_smpl:        (N, 3) query points in SMPL coords.
    cluster_centers: (C, 3) cluster centers in SMPL coords (observation pose).
    cluster_rot:     (C, 3, 3) rotation blocks of pooled blend matrices.
    tokens:          (V, C, D) TransHE-refined cluster tokens.

    Returns (human_rep (V, N, D+2*3*n_freqs+3), keep_mask (N,) or None).
    keep_mask implements the config-gated truncation (cross_transformer.py:
    176-180): True where the nearest cluster is closer than knn_sigma.
    """
    n = pts_smpl.shape[0]

    # one streaming pass builds the kNN distances, the dense softmax weight
    # matrix, the compact (N, k) weights, AND the per-neighbour center/rot
    # rows (as one-hot MXU matmuls — XLA row gathers of these tiny rows were
    # the DPaRF hot spot).  The PE aggregation reuses the pass's own w_knn so
    # it can never diverge from the token aggregation's w_dense.
    c_rows = cluster_centers.shape[0]
    aux = jnp.concatenate(
        [cluster_centers, cluster_rot.reshape(c_rows, 9)], axis=1
    )  # (C, 12)
    d2 = knn_ops.pairwise_dist2(pts_smpl, cluster_centers, precision=precision)
    w_dense, dist, aux_k, w = knn_ops.dparf_dense_weights(
        d2, k, dist_alpha, aux=aux, precision=precision
    )

    keep_mask = None
    if knn_sigma is not None:
        keep_mask = dist[:, 0] < knn_sigma

    # local coordinates in each neighbour's deformed frame: (p - c_k) @ R_k
    centers_k = aux_k[..., :3]  # (N, k, 3)
    rot_k = aux_k[..., 3:].reshape(n, k, 3, 3)
    rel = pts_smpl[:, None, :] - centers_k
    local = jnp.einsum("nki,nkij->nkj", rel, rot_k, precision=precision)
    pe = embed_dparf(local, n_freqs)  # (N, k, 3+6*n_freqs)
    pe_agg = jnp.einsum("nk,nkd->nd", w, pe, precision=precision)

    # token aggregation as one dense MXU matmul (no (V,N,k,D) token gather)
    tok_agg = jnp.einsum("nc,vcd->vnd", w_dense, tokens, precision=precision)

    v = tokens.shape[0]
    pe_b = jnp.broadcast_to(pe_agg[None], (v, n, pe_agg.shape[-1]))
    return jnp.concatenate([tok_agg, pe_b.astype(tok_agg.dtype)], axis=-1), keep_mask


class ViewFusion(nn.Module):
    """Per-point single-head cross-attention over the input views
    (cross_transformer.py:30-40,128-149)."""

    att_dim: int = 128
    out_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, holder, pixel):
        # holder/pixel: (V, N, 256). Keys/values from pixel features,
        # query-keys/query-values from the holder (human representation).
        key = nn.Dense(self.att_dim, dtype=self.dtype, name="pix_key")(pixel)
        val = nn.Dense(self.out_dim, dtype=self.dtype, name="pix_value")(pixel)
        qkey = nn.Dense(self.att_dim, dtype=self.dtype, name="hold_key")(holder)
        qval = nn.Dense(self.out_dim, dtype=self.dtype, name="hold_value")(holder)
        # scores[n, i, j] = key_i . qkey_j; softmax over source views i
        scores = jnp.einsum("inc,jnc->nij", key, qkey) * (self.att_dim**-0.5)
        attn = nn.softmax(scores, axis=1)
        out = jnp.einsum("inc,nij->jnc", val, attn)
        return qval + out


class NeRFHeads(nn.Module):
    """Fusion + density/RGB decoding; input (V,N,*) point features -> (N,4) raw."""

    hidden: int = 256
    rgb_hidden: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, human_rep, pixel_feat, viewdir_embed, pts_mask=None):
        """human_rep: (V, N, 255); pixel_feat: (V, N, 384);
        viewdir_embed: (N, 27); pts_mask: optional (N,) bool.
        Returns raw (N, 4) = [rgb_logits, sigma]."""
        v, n, _ = human_rep.shape

        net_hold = nn.relu(
            nn.Dense(self.hidden, dtype=self.dtype, name="holder_in")(human_rep)
        )
        net_pix = nn.relu(
            nn.Dense(self.hidden, dtype=self.dtype, name="pixel_in")(pixel_feat)
        )
        net = ViewFusion(dtype=self.dtype, name="fusion")(net_hold, net_pix)
        net = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_1")(net))
        inter = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_2")(net))

        # density: view-average -> mlp -> 1
        opa = jnp.mean(inter, axis=0)
        opa = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_3")(opa))
        sigma = nn.Dense(1, dtype=self.dtype, name="alpha_out")(opa)  # (N, 1)

        # rgb: pixel-feature residuals + view-direction conditioning
        feat = nn.Dense(self.hidden, dtype=self.dtype, name="feature_fc")(inter)
        feat = feat + nn.Dense(self.hidden, dtype=self.dtype, name="rgb_res0")(
            pixel_feat
        )
        vdir = jnp.broadcast_to(
            viewdir_embed[None].astype(feat.dtype), (v, n, viewdir_embed.shape[-1])
        )
        feat = jnp.concatenate([feat, vdir], axis=-1)
        feat = nn.relu(nn.Dense(self.rgb_hidden, dtype=self.dtype, name="view_fc")(feat))
        feat = feat + nn.Dense(self.rgb_hidden, dtype=self.dtype, name="rgb_res1")(
            pixel_feat
        )
        feat = jnp.mean(feat, axis=0)
        feat = nn.relu(nn.Dense(self.rgb_hidden, dtype=self.dtype, name="fc_4")(feat))
        rgb = nn.Dense(3, dtype=self.dtype, name="rgb_out")(feat)  # (N, 3)

        raw = jnp.concatenate([rgb, sigma], axis=-1)
        if pts_mask is not None:
            raw = jnp.where(pts_mask[:, None], raw, 0.0)
        return raw
