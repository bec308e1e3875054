"""TransHE transformer: a ViT over ~300 human-part cluster tokens.

Capability parity with the reference `lib/networks/vision_transformer.py:
309-417` (a timm/DINO-style ViT with no patch embedding): pre-LN blocks
(LayerNorm eps 1e-6), qkv with bias, GELU MLP (ratio 4), final LayerNorm;
positional information comes from a pi-scaled sin-cos encoding of the
normalized *canonical* cluster centroids added to the tokens
(`prepare_tokens`, vision_transformer.py:366-371).  The optional
mask-token machinery is kept (mask arg), though the reference always calls
with mask=None (if_clight_renderer.py:538).

TPU notes: the token axis is ~300 and the view axis 3 — attention here is
tiny, so the win is keeping everything as large fused matmuls over the
(V*C, D) axis and letting XLA fuse LN/GELU into them.  Dropout/DropPath are
omitted: every rate is 0 in the reference config of record.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .embedder import embed_vit_pos


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim**-0.5)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


VARIANTS = {  # embed_dim, num_heads (vision_transformer.py:404-417)
    "tiny": (192, 3),
    "small": (384, 6),
    "base": (768, 12),
}


def random_token_mask(
    rng,
    num_tokens: int,
    mask_ratio=(0.1, 0.5),
    mask_prob: float = 0.5,
):
    """Host-side random token-masking generator (parity with the reference's
    RandomMaskingGenerator, vision_transformer.py:37-70 — dormant machinery:
    the forward always receives mask=None at if_clight_renderer.py:538).

    rng: np.random.Generator. Returns (num_tokens,) bool, True = masked.
    """
    import numpy as np

    n_mask = 0
    if (mask_ratio[0] or mask_ratio[1]) and rng.random() <= mask_prob:
        n_mask = int(rng.uniform(*mask_ratio) * num_tokens)
    mask = np.zeros(num_tokens, bool)
    mask[num_tokens - n_mask :] = True
    rng.shuffle(mask)
    return mask


class TransHE(nn.Module):
    """ViT over cluster tokens with canonical-centroid positional encoding."""

    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, pe, mask=None):
        """tokens: (B, C, D); pe: either (B, C, 3) normalized canonical
        centroids (embedded here) or a precomputed (B, C, D) encoding table;
        mask: optional (B, C) bool — True replaces the token with mask_token.

        A precomputed table matters for reference-checkpoint parity: at
        embed_dim=192 the encoding's top band is pi*2^31, where f32
        `sin(x*f + pi/2)` and `cos(x*f)` are uncorrelated — the reference's
        high bands are deterministic pseudo-noise its weights were trained
        against, so the converter stores the reference-op-exact table
        (tools/convert_checkpoint.py --pe_table)."""
        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        if mask is not None:
            tokens = jnp.where(mask[..., None], mask_token.astype(tokens.dtype), tokens)
        if pe.shape[-1] != self.embed_dim:
            pe = embed_vit_pos(pe, self.embed_dim)
        x = tokens + pe.astype(tokens.dtype)
        for i in range(self.depth):
            x = Block(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, name=f"block_{i}",
            )(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
