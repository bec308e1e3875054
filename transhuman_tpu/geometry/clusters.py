"""K-means vertex->cluster grouping for TransHE token pooling.

The reference loads precomputed cluster tables (`kmeans_dict/*.npy`, consumed
at `lib/networks/renderer/if_clight_renderer.py:53-57`) and mean-pools vertex
features into cluster tokens with a Python dict loop (`voxelization`,
if_clight_renderer.py:356-371).

TPU-native design: pooling is a single (C x V) @ (V x D) matmul with a
row-normalized one-hot pooling matrix — an MXU operation, exactly equal to the
per-cluster mean, and trivially differentiable/shardable.  The same matrix
pools vertex positions (cluster centers) and blend matrices (flattened 4x4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ClusterSpec:
    """Static cluster assignment over the canonical SMPL vertices."""

    vert2cluster: np.ndarray  # (V,) int32, cluster id per vertex
    num_clusters: int

    def __post_init__(self):
        self.vert2cluster = np.asarray(self.vert2cluster, dtype=np.int32)
        counts = np.bincount(self.vert2cluster, minlength=self.num_clusters)
        if (counts == 0).any():
            raise ValueError("every cluster must own at least one vertex")
        self.counts = counts.astype(np.int32)
        n_verts = self.vert2cluster.shape[0]
        P = np.zeros((self.num_clusters, n_verts), dtype=np.float32)
        P[self.vert2cluster, np.arange(n_verts)] = 1.0 / counts[self.vert2cluster]
        self.pool_matrix = P  # (C, V): rows are mean-pooling weights

    # ------------------------------------------------------------------
    @classmethod
    def load_reference_dict(cls, path: str) -> "ClusterSpec":
        """Load a reference-format kmeans_dict npy
        ({'pc2voxel_ind': (V,), 'dict_voxel2pc_ind': {cid: [vidx]}})."""
        d = np.load(path, allow_pickle=True).item()
        vert2cluster = np.asarray(d["pc2voxel_ind"], dtype=np.int32)
        num = len(d["dict_voxel2pc_ind"])
        # reference iterates the dict sorted by cluster id; ids are 0..C-1
        assert sorted(d["dict_voxel2pc_ind"].keys()) == list(range(num))
        return cls(vert2cluster, num)

    @classmethod
    def from_kmeans(
        cls, verts: np.ndarray, num_clusters: int, seed: int = 0, iters: int = 50
    ) -> "ClusterSpec":
        """Lloyd's k-means over canonical vertex positions (tools/make_kmeans)."""
        rng = np.random.default_rng(seed)
        n = verts.shape[0]
        centers = verts[rng.choice(n, num_clusters, replace=False)].copy()
        assign = np.zeros(n, dtype=np.int64)
        for _ in range(iters):
            d2 = ((verts[:, None, :] - centers[None]) ** 2).sum(-1)
            new_assign = d2.argmin(1)
            if (new_assign == assign).all():
                break
            assign = new_assign
            for c in range(num_clusters):
                m = assign == c
                if m.any():
                    centers[c] = verts[m].mean(0)
                else:  # re-seed empty cluster at the farthest point
                    centers[c] = verts[d2.min(1).argmax()]
        # ensure no empty clusters in the final assignment; donors must keep
        # at least one member or the fixup would just move the hole (the
        # nearest vertex can be its own cluster's sole member) — with
        # n >= num_clusters a >1-member donor always exists by pigeonhole
        counts = np.bincount(assign, minlength=num_clusters)
        for c in range(num_clusters):
            if counts[c] == 0:
                for v in np.argsort(((verts - centers[c]) ** 2).sum(-1)):
                    if counts[assign[v]] > 1:
                        counts[assign[v]] -= 1
                        assign[v] = c
                        counts[c] += 1
                        break
        return cls(assign.astype(np.int32), num_clusters)

    def save_reference_dict(self, path: str):
        """Write the reference-compatible npy format."""
        v2pc = {
            int(c): np.where(self.vert2cluster == c)[0].tolist()
            for c in range(self.num_clusters)
        }
        np.save(
            path,
            {"pc2voxel_ind": self.vert2cluster.astype(np.int64), "dict_voxel2pc_ind": v2pc},
        )

    # ------------------------------------------------------------------
    def pool(self, vert_features: np.ndarray) -> np.ndarray:
        """Mean-pool per-vertex features to clusters: (..., V, D) -> (..., C, D).

        numpy variant; on device simply use `spec_pool_matrix @ feats` (see
        models/network.py) so it fuses into the surrounding jit.
        """
        return np.einsum("cv,...vd->...cd", self.pool_matrix, vert_features)

    def centers(self, verts: np.ndarray) -> np.ndarray:
        """Cluster centroids of a (V,3) vertex set: (C,3)."""
        return self.pool_matrix @ verts

    def pool_blend_mtx(self, blend_mtx: np.ndarray) -> np.ndarray:
        """Mean-pool (V,4,4) blend matrices -> (C,4,4), matching the reference
        pooling of blend_mtx at if_clight_renderer.py:544."""
        V = blend_mtx.shape[0]
        return (self.pool_matrix @ blend_mtx.reshape(V, 16)).reshape(-1, 4, 4)


def normalize_positions(x: np.ndarray, box: float = 1.5) -> np.ndarray:
    """Normalize coords into [-1,1] by the fixed [-box, box]^3 bounding box used
    for the ViT positional encoding (if_clight_renderer.py:50,373-383)."""
    lo, hi = -box, box
    return (((x - lo) / (hi - lo)) - 0.5) * 2.0
