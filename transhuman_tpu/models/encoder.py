"""Multi-scale CNN image encoder (pixelNeRF-style SpatialEncoder).

Capability parity with the reference `lib/networks/encoder.py:50-155`:
ResNet18 stem + first two residual stages, every stage's feature map
bilinearly upsampled (align-corners) back to input resolution and
concatenated (64+64+128 = 256 ch), plus a 3->128 1x1 "color" conv on the raw
image => 384-ch pixel-aligned feature map; a 1x1 reduction to `embed_dim`
produces the "holder" map used for SMPL vertex painting.

TPU-native design decisions:
* NHWC layout throughout (XLA:TPU's native conv layout; no transposes).
* BatchNorm = BatchStatNorm (batch statistics always; see layers.py — this
  matches the reference, which runs BN in train mode even at eval).
* The align-corners upsample is two interpolation matmuls on the MXU.
* Stages 3/4 of ResNet18 are never used by the reference forward
  (num_layers=3, encoder.py:55,125-128), so they are not built at all —
  the checkpoint converter simply drops their weights.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchStatNorm, max_pool_3x3_s2, upsample_align_corners


class BasicBlock(nn.Module):
    """ResNet-v1 basic block: 3x3 conv-bn-relu, 3x3 conv-bn, (+shortcut), relu."""

    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        y = BatchStatNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = BatchStatNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(residual)
            residual = BatchStatNorm(
                axis_name=self.axis_name, dtype=self.dtype, name="down_bn"
            )(residual)
        return nn.relu(y + residual)


class SpatialEncoder(nn.Module):
    """ResNet18[:layer2] pyramid encoder -> (holder_map, pixel_map), NHWC.

    Returns:
        holder_map: (V, H, W, embed_dim)  — for SMPL vertex painting
        pixel_map:  (V, H, W, 384)        — pixel-aligned point features
    """

    embed_dim: int = 192
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images):
        v, h, w, _ = images.shape

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(images)
        x = BatchStatNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        latents = [x]  # (V, H/2, W/2, 64)

        x = max_pool_3x3_s2(x)
        for i in range(2):
            x = BasicBlock(
                64, axis_name=self.axis_name, dtype=self.dtype, name=f"layer1_{i}"
            )(x)
        latents.append(x)  # (V, H/4, W/4, 64)

        for i in range(2):
            x = BasicBlock(
                128, stride=2 if i == 0 else 1, axis_name=self.axis_name,
                dtype=self.dtype, name=f"layer2_{i}",
            )(x)
        latents.append(x)  # (V, H/8, W/8, 128)

        latents = [upsample_align_corners(l, (h, w)) for l in latents]
        color = nn.Conv(128, (1, 1), dtype=self.dtype, name="color_conv")(images)
        pixel_map = jnp.concatenate(latents + [color], axis=-1)  # (V,H,W,384)
        holder_map = nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="reduction"
        )(pixel_map)
        return holder_map, pixel_map
