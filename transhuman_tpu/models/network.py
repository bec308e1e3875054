"""Top-level TransHuman network: encoder + TransHE + DPaRF/NeRF heads.

Mirrors the capability of the reference `Network`
(`lib/networks/cross_transformer.py:84-271`) as one flax module with three
entry methods used by the renderer pipeline:

    encode_views(images)                 -> (holder_map, pixel_map)   [CNN]
    refine_tokens(tokens, pe_xyz)        -> tokens'                   [TransHE]
    query(pts, centers, rot, tokens, pixel_feat, viewdir, mask) -> raw (N,4)

The reference's SparseConvNet (`xyzc_net`, cross_transformer.py:100-101) is
dead code ("not used") and is intentionally not built; the checkpoint
converter drops its keys.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .encoder import SpatialEncoder
from .heads import NeRFHeads, dparf_representation
from .vit import VARIANTS, TransHE


class TransHumanNet(nn.Module):
    embed_dim: int = 192
    vit_depth: int = 12
    vit_heads: int = 3
    knn_k: int = 7
    knn_dist_alpha: float = 0.5
    knn_freqs: int = 10
    view_freqs: int = 4  # cfg.view_res (embedder.py:53); sets the sincos
    # view-direction input width (27-d at the official 4)
    use_truncation: bool = False
    knn_sigma: float = 0.25
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @classmethod
    def from_config(cls, cfg, axis_name=None):
        embed_dim, heads = VARIANTS[cfg.vit_variant]
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        return cls(
            embed_dim=embed_dim,
            vit_depth=cfg.vit_depth,
            vit_heads=heads,
            knn_k=cfg.KNN,
            knn_dist_alpha=cfg.KNN_DIST_ALPHA,
            knn_freqs=cfg.KNN_FREQ,
            view_freqs=cfg.view_res,
            use_truncation=cfg.use_truncation,
            knn_sigma=cfg.KNN_SIGMA,
            axis_name=axis_name,
            dtype=dtype,
        )

    def setup(self):
        self.encoder = SpatialEncoder(
            embed_dim=self.embed_dim, axis_name=self.axis_name, dtype=self.dtype
        )
        self.transhe = TransHE(
            embed_dim=self.embed_dim,
            depth=self.vit_depth,
            num_heads=self.vit_heads,
            dtype=self.dtype,
        )
        self.heads = NeRFHeads(dtype=self.dtype)

    def encode_views(self, images):
        """images: (V, H, W, 3) -> holder_map (V,H,W,D), pixel_map (V,H,W,384)."""
        return self.encoder(images)

    def refine_tokens(self, tokens, pe, mask=None):
        """tokens: (V, C, D); pe: (C, 3)/(V, C, 3) normalized canonical
        cluster centroids, or a precomputed (C, D)/(V, C, D) PE table."""
        if pe.ndim == 2:
            pe = jnp.broadcast_to(pe[None], (tokens.shape[0], *pe.shape))
        return self.transhe(tokens, pe, mask)

    def query(
        self,
        pts_smpl,
        cluster_centers,
        cluster_rot,
        tokens,
        pixel_feat,
        viewdir_embed,
        pts_mask=None,
    ):
        """Decode raw (N, 4) = [rgb_logits, sigma] for a chunk of points.

        pts_smpl (N,3) SMPL coords; cluster_centers (C,3); cluster_rot (C,3,3);
        tokens (V,C,D); pixel_feat (V,N,384); viewdir_embed (N,27);
        pts_mask optional (N,) bool (False -> raw forced to 0, reproducing the
        reference's masked scatter, cross_transformer.py:229-242)."""
        human_rep, keep = dparf_representation(
            pts_smpl,
            cluster_centers,
            cluster_rot,
            tokens,
            k=self.knn_k,
            dist_alpha=self.knn_dist_alpha,
            n_freqs=self.knn_freqs,
            knn_sigma=self.knn_sigma if self.use_truncation else None,
            # f32 (parity) mode forces true-f32 MXU passes for the distance/
            # aggregation matmuls: TPU DEFAULT precision multiplies f32
            # operands in bf16, which can re-rank near-tie kNN neighbours
            # vs the torch oracle; bf16 mode keeps the fast default
            precision="highest" if self.dtype is None else None,
        )
        if keep is not None:
            pts_mask = keep if pts_mask is None else (pts_mask & keep)
        return self.heads(human_rep, pixel_feat, viewdir_embed, pts_mask)

    def decode(self, human_rep, pixel_feat, viewdir_embed, pts_mask=None):
        """Heads-only decode for externally computed DPaRF representations
        (the fused Pallas kernel path, experiments/dparf.py)."""
        return self.heads(human_rep, pixel_feat, viewdir_embed, pts_mask)

    def __call__(self, images, tokens_pe, pts_smpl, centers, rot, viewdir_embed):
        """Init-only convenience path touching every submodule once."""
        holder_map, pixel_map = self.encode_views(images)
        v = images.shape[0]
        c = centers.shape[0]
        tokens = jnp.zeros((v, c, self.embed_dim), holder_map.dtype)
        tokens = self.refine_tokens(tokens, tokens_pe)
        n = pts_smpl.shape[0]
        pixel_feat = jnp.zeros((v, n, pixel_map.shape[-1]), pixel_map.dtype)
        return self.query(pts_smpl, centers, rot, tokens, pixel_feat, viewdir_embed)


from ..registry import NETWORKS


@NETWORKS.register("transhuman")
def _make_transhuman(cfg, axis_name=None):
    """cfg.network plugin entry (reference make_network.py:4-11)."""
    return TransHumanNet.from_config(cfg, axis_name=axis_name)
