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

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
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
