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


def _seg_comb(l, r):
    bl, vl = l
    br, vr = r
    return bl | br, jnp.where(br, vr, vl * vr)


def segmented_excl_prod(v, seg_id, row: int = 128):
    """Exclusive product of ``v`` within runs of equal ``seg_id`` (both (M,),
    seg_id nondecreasing): out[i] = prod(v[j] for j in segment(i), j < i).

    TPU shape: a long single-axis scan lowers poorly (measured ~33 ms at
    M=786k), so this runs two levels of associative_scan — an in-row scan
    along the minor axis of (M/row, row), vectorized across sublanes, plus a
    (M/row,)-length carry scan — measured sub-ms at the same M.
    Inputs are padded up to a multiple of ``row`` internally.
    """
    m = v.shape[0]
    pad = (-m) % row
    if pad:
        # padding continues the last segment with factor-1 elements; their
        # outputs are sliced off at return
        v = jnp.concatenate([v, jnp.ones((pad,), v.dtype)])
        seg_id = jnp.concatenate(
            [seg_id, jnp.broadcast_to(seg_id[-1], (pad,))]
        )
    k = v.shape[0] // row
    v2 = v.reshape(k, row)
    rid = seg_id.reshape(k, row)
    prev_last = jnp.concatenate([jnp.full((1,), -1, rid.dtype), rid[:-1, -1]])
    b = jnp.concatenate(
        [(rid[:, 0] != prev_last)[:, None], rid[:, 1:] != rid[:, :-1]],
        axis=1,
    )  # real segment boundaries, including across row edges
    # in-row exclusive product: v shifted right within the row; element 0
    # starts at 1 (factors from previous rows arrive via the carry)
    vs = jnp.concatenate(
        [jnp.ones((k, 1), v2.dtype), jnp.where(b[:, 1:], 1.0, v2[:, :-1])],
        axis=1,
    )
    _, local = jax.lax.associative_scan(_seg_comb, (b, vs), axis=1)

    # carry = product over the open segment entering each row: a k-length
    # segmented scan over (row-has-boundary, row-tail-product), shifted
    tail = local[:, -1] * v2[:, -1]  # product since the row's last boundary
    hasb = jnp.any(b, axis=1)
    f_s = jnp.concatenate([jnp.ones((1,), bool), hasb[:-1]])
    t_s = jnp.concatenate([jnp.ones((1,), tail.dtype), tail[:-1]])
    _, carry = jax.lax.associative_scan(_seg_comb, (f_s, t_s))
    # the carry multiplies only elements still in the row's open first
    # segment (no boundary at or before them)
    open_seg = jnp.cumsum(b.astype(jnp.int32), axis=1) == 0
    out = jnp.where(open_seg, local * carry[:, None], local)
    return out.reshape(-1)[:m]


def pack_sample_bitmask(mask2d):
    """(R, S) bool -> (R, ceil(S/32)) uint32; bit j of word w is sample
    32*w + j.  VPU-only (shifts + disjoint-bit sums), no gathers."""
    r, s = mask2d.shape
    nw = (s + 31) // 32
    shifts = (jnp.arange(s, dtype=jnp.uint32) % 32)[None, :]
    w = mask2d.astype(jnp.uint32) << shifts
    sel = jnp.arange(s) // 32
    return jnp.stack(
        [jnp.sum(jnp.where(sel == j, w, 0), axis=1, dtype=jnp.uint32)
         for j in range(nw)],
        axis=1,
    )


def select_kth_set_bit(words, k):
    """Position of the k-th (0-based) set bit of each row's bitmask.

    words: (M, NW) uint32 (row bitmask, word w covers bits 32w..32w+31);
    k: (M,) int32.  Returns (M,) int32 in [0, 32*NW); callers mask slots
    where k >= popcount(row) themselves (the return is then an arbitrary
    in-range value).  Word cascade + 5-step popcount binary search —
    pure VPU ops, vectorized over M.
    """
    nw = words.shape[1]
    rem = k
    pos = jnp.zeros_like(k)
    word = words[:, 0]
    for j in range(1, nw):
        pc = jax.lax.population_count(word).astype(jnp.int32)
        go = rem >= pc
        rem = jnp.where(go, rem - pc, rem)
        pos = jnp.where(go, pos + 32, pos)
        word = jnp.where(go, words[:, j], word)
    for b in (16, 8, 4, 2, 1):
        lowmask = (jnp.uint32(1) << b) - jnp.uint32(1)
        c = jax.lax.population_count(word & lowmask).astype(jnp.int32)
        go = rem >= c
        rem = jnp.where(go, rem - c, rem)
        pos = jnp.where(go, pos + b, pos)
        word = jnp.where(go, word >> b, word)
    return pos


def blocked_cumsum_i32(q, row: int = 128):
    """Inclusive cumsum along axis 0 of (M, C) int32 with two's-complement
    wraparound, via (M/row, row, C) blocking (jnp.cumsum over one long axis
    measured ~30 ms at M=786k; this form ~1 ms).  Pads internally."""
    m, c = q.shape
    pad = (-m) % row
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, c), q.dtype)])
    x = q.reshape(-1, row, c)
    within = jnp.cumsum(x, axis=1)
    row_tot = within[:, -1, :]
    offs = jnp.cumsum(row_tot, axis=0) - row_tot  # exclusive row offsets
    return (within + offs[:, None, :]).reshape(-1, c)[:m]


def composite_stream(
    raw_c,
    seg_id,
    z,
    dists,
    starts,
    ends,
    n_rays: int,
    white_bkgd: bool = False,
    depth_scale=None,
    fp_bits: int = 28,
):
    """NeRF compositing directly over a COMPACTED sample stream — no
    scatter-back into the dense (R*S, 4) grid (the scatter alone measured
    ~35 ms at bench scale; this whole composite is ~4 ms):

    raw_c: (M, 4) decoded [rgb_logits, sigma], ray-then-sample ordered
           (masked/padding entries must carry sigma <= 0 so alpha == 0);
    seg_id: (M,) nondecreasing ray index per stream element;
    z, dists: (M,) per-element depth and integration distance;
    starts/ends: (R,) stream offsets of each ray's run, from the dense
           pre-compaction mask (counts -> cumsum; no gathers needed), both
           clamped to [0, M] (overflow rays lose their tail, reported by the
           caller's overflow counter);
    depth_scale: (M,) optional normalizer so w*z*depth_scale stays in [0,1]
           per element (pass 1/far); the caller multiplies the depth map
           back.  Per-ray reductions use EXACT modular int32 fixed-point
           prefix-sum differences (every channel is bounded by 1 per element
           and ~1 per ray, so 2^fp_bits scaling cannot overflow a segment
           difference; wraparound of the global prefix is harmless).

    Returns dict rgb_map (R,3), acc_map (R,), depth_map (R,) — depth still
    multiplied by depth_scale; caller rescales.
    Math parity: raw2outputs (nerf_net_utils.py:14-59) restricted to the
    active samples (inactive samples contribute alpha == 0 there, exactly).
    """
    rawf = raw_c.astype(jnp.float32)
    rgb = jax.nn.sigmoid(rawf[:, :3])
    sigma = rawf[:, 3]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = segmented_excl_prod(1.0 - alpha + 1e-10, seg_id)
    w = alpha * trans

    zc = z * depth_scale if depth_scale is not None else z
    chans = jnp.stack([w * rgb[:, 0], w * rgb[:, 1], w * rgb[:, 2], w, w * zc],
                      axis=1)
    scale = jnp.float32(2.0 ** fp_bits)
    q = jnp.round(chans * scale).astype(jnp.int32)
    csum0 = jnp.concatenate(
        [jnp.zeros((1, 5), jnp.int32), blocked_cumsum_i32(q)], axis=0
    )
    hi = csum0.at[ends].get(indices_are_sorted=True)
    lo = csum0.at[starts].get(indices_are_sorted=True)
    seg = (hi - lo).astype(jnp.float32) * (1.0 / scale)

    rgb_map = seg[:, :3]
    acc_map = seg[:, 3]
    depth_map = seg[:, 4]
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[:, None])
    return {"rgb_map": rgb_map, "acc_map": acc_map, "depth_map": depth_map}


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
