"""Shared flax building blocks: batch-stat normalization, align-corners resize.

TPU-policy notes:
* BatchStatNorm — the reference runs BatchNorm in *train mode everywhere*,
  including evaluation (`run.py:29,75,130` call `network.train()`), so the
  forward pass always normalizes by current-batch statistics and the running
  averages are dead state.  We therefore implement BN with batch statistics
  only (no running-stats collection to thread through `apply`), with an
  optional `axis_name` that reproduces SyncBatchNorm (trainer.py:24-26) via
  `lax.pmean` over the data-parallel mesh axis.
* upsample_align_corners — torch's `F.interpolate(mode="bilinear",
  align_corners=True)` (encoder.py:133-139) expressed as two interpolation
  matmuls (one per spatial axis) so the op runs on the MXU and fuses with
  the surrounding convs, instead of a gather-based resize.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BatchStatNorm(nn.Module):
    """BatchNorm that always normalizes by batch statistics (see module doc)."""

    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        red = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=red)
        mean2 = jnp.mean(jnp.square(xf), axis=red)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = xf * inv + (bias - mean * inv)
        return y.astype(self.dtype or x.dtype)


def _interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) align-corners linear interpolation matrix."""
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), dtype=np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def upsample_align_corners(x, out_hw):
    """Bilinear align-corners resize of NHWC `x` to (H_out, W_out) via two
    MXU matmuls (constant interpolation matrices, folded at compile time)."""
    h_out, w_out = out_hw
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_interp_matrix(h_out, h_in), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w_out, w_in), dtype=x.dtype)
    x = jnp.einsum("oh,vhwc->vowc", mh, x)
    x = jnp.einsum("ow,vhwc->vhoc", mw, x)
    return x


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC input."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
