"""Device-side ray sampling and alpha compositing (jnp, jit-friendly).

Math parity with the reference:
* stratified depth sampling  — `Renderer.get_sampling_points`
  (lib/networks/renderer/if_clight_renderer.py:271-287)
* alpha compositing          — `raw2outputs`
  (lib/networks/renderer/nerf_net_utils.py:14-59)

Shapes are static everywhere; the training-time jitter is driven by an
explicit PRNG key (no global RNG state).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_along_rays(ray_o, ray_d, near, far, n_samples: int, rng=None):
    """Stratified points along rays.

    ray_o/ray_d: (R, 3); near/far: (R,).  Returns pts (R, S, 3), z_vals (R, S).
    With `rng`, depths are jittered uniformly inside midpoint intervals
    (training); without, they are the deterministic linspace (eval sets
    perturb=0, run.py:22).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=ray_o.dtype)
    z_vals = near[:, None] * (1.0 - t) + far[:, None] * t
    if rng is not None:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        u = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * u
    pts = ray_o[:, None, :] + ray_d[:, None, :] * z_vals[..., None]
    return pts, z_vals


def sample_pdf(bins, weights, n_samples: int, rng=None):
    """Hierarchical importance sampling along rays.

    The reference carries this unused (its CUDA `torchsearchsorted` import is
    dead, nerf_net_utils.py:63-98); provided here working, via
    jnp.searchsorted, for importance-sampling experiments.

    bins: (R, B+1) depth bin edges; weights: (R, B) coarse weights.
    Returns (R, n_samples) new depth samples (uniform mid-CDF when rng None).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R,B+1)

    if rng is None:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(rng, (*cdf.shape[:-1], n_samples), dtype=bins.dtype)

    idx = jnp.clip(
        jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u) - 1,
        0,
        weights.shape[-1] - 1,
    )
    cdf_lo = jnp.take_along_axis(cdf, idx, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, idx + 1, axis=-1)
    bin_lo = jnp.take_along_axis(bins, idx, axis=-1)
    bin_hi = jnp.take_along_axis(bins, idx + 1, axis=-1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)


def composite(
    raw,
    z_vals,
    ray_d,
    white_bkgd: bool = False,
    raw_noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """NeRF alpha compositing.

    raw: (R, S, 4) = [rgb_logits, sigma]; z_vals: (R, S); ray_d: (R, 3).
    Returns dict with rgb_map (R,3), acc_map (R,), depth_map (R,),
    weights (R,S).
    """
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1
    ) * jnp.linalg.norm(ray_d, axis=-1, keepdims=True)

    # raw may arrive in the model's compute dtype (bf16): storing bf16 and
    # upcasting here is bitwise-identical to upcasting at the chunk
    # boundary (the values were bf16 either way) but halves the
    # scatter-back + composite HBM traffic; the compositing math itself
    # (sigmoid/exp/cumprod) stays f32
    rgb = jax.nn.sigmoid(raw[..., :3].astype(jnp.float32))
    sigma = raw[..., 3].astype(jnp.float32)
    if raw_noise_std > 0.0 and rng is not None:
        sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    # exclusive cumprod of (1 - alpha): transmittance to each sample
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[:, :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return {
        "rgb_map": rgb_map,
        "acc_map": acc_map,
        "depth_map": depth_map,
        "weights": weights,
    }
