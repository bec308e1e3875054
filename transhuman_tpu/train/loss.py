"""Training loss: patch-based MSE + perceptual (LPIPS) term.

Capability parity with the reference `lib/train/trainers/if_nerf_clight.py`:
predicted ray colors are scattered back into N_patches fixed-size square
patches (rays cover only the in-bbox pixels of each patch; the rest stay
background black, `_unpack_imgs` :94-106), then
loss = 1.0 * MSE(patches) + 0.1 * mean(LPIPS_vgg(patches*2-1)).

TPU-native contract: instead of the reference's per-patch Python loop over
boolean masks (dynamic sizes), each ray carries a static `ray_pixel_idx`
into the flattened (P*ps*ps) patch raster; invalid/padded rays carry -1 and
are dropped by the scatter (`mode="drop"`).  One scatter, fixed shapes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..render.pipeline import FrameInputs, RayBundle


@struct.dataclass
class TrainSample:
    """One training example (unbatched; train step vmaps a leading axis).

    Patch mode fills `target_patches`/`ray_pixel_idx`; non-patch mode
    (cfg.patch.use_patch_sampling=False) fills `target_rgb` instead and the
    loss is `masked_mse` over the valid rays (if_nerf_clight.py:77-81)."""

    frame: FrameInputs
    rays: RayBundle
    target_patches: Optional[jax.Array] = None  # (P, ps, ps, 3)
    ray_pixel_idx: Optional[jax.Array] = None  # (R,) int32 into P*ps*ps; -1 invalid
    target_rgb: Optional[jax.Array] = None  # (R, 3) non-patch ray targets


def unpack_patches(pred_rgb, ray_pixel_idx, patch_shape):
    """Scatter per-ray colors into (P, ps, ps, 3) patches (bg = black)."""
    p, ps, _, _ = patch_shape
    flat = jnp.zeros((p * ps * ps, 3), pred_rgb.dtype)
    flat = flat.at[ray_pixel_idx].set(pred_rgb, mode="drop")
    return flat.reshape(p, ps, ps, 3)


def patch_losses(
    pred_rgb,
    sample: TrainSample,
    lpips_fn: Optional[Callable] = None,
    l2_weight: float = 1.0,
    lpips_weight: float = 0.1,
):
    """Returns (loss, stats-dict). pred_rgb: (R, 3) ray colors."""
    targets = sample.target_patches
    pred = unpack_patches(pred_rgb, sample.ray_pixel_idx, targets.shape)
    mse = jnp.mean(jnp.square(pred - targets))
    loss = l2_weight * mse
    stats = {"mse_loss": l2_weight * mse}
    if lpips_fn is not None:
        lp = jnp.mean(lpips_fn(pred * 2.0 - 1.0, targets * 2.0 - 1.0))
        loss = loss + lpips_weight * lp
        stats["lpips_loss"] = lpips_weight * lp
    stats["loss"] = loss
    return loss, stats


def masked_mse(pred_rgb, target_rgb, mask):
    """Non-patch fallback (if_nerf_clight.py:77-81): MSE over valid rays."""
    m = mask[:, None].astype(pred_rgb.dtype)
    denom = jnp.maximum(jnp.sum(m) * 3.0, 1.0)
    return jnp.sum(jnp.square((pred_rgb - target_rgb) * m)) / denom


def random_ray_losses(pred_rgb, sample: TrainSample, l2_weight: float = 1.0):
    """Non-patch training loss (if_nerf_clight.py:77-81): masked MSE over
    the sampled rays; no perceptual term in this mode (the reference only
    applies LPIPS to patches). Stats key matches the reference ('img_loss')."""
    img_loss = l2_weight * masked_mse(
        pred_rgb, sample.target_rgb, sample.rays.mask
    )
    return img_loss, {"img_loss": img_loss, "loss": img_loss}
