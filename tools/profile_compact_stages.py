"""Stage ablation of the COMPACT render path (stream-composite form) at
bench scale (65536 rays x 64 samples, ratio 0.1875, bf16).
One jit per ablation, big tensors as args, forced scalar readback.
Stage costs = differences between consecutive rows (each row carries the
same ~25 ms tunnel dispatch).

CAVEAT (learned in round 3, tools/probe_plan.py): a stage that returns
only a reduction lets XLA DCE the expensive part into the NEXT stage's
diff — the old 'plan' row returned n_active only, so jnp.nonzero's ~33 ms
index materialization was mis-binned into '+packed inputs'.  The stages
below mirror the CURRENT pipeline (bitmask stream plan, no nonzero) and
each returns a sum over every materialized output it claims to cover."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.render.pipeline import to_smpl, embed_viewdir  # noqa: E402
from transhuman_tpu.render.volume import composite_stream, sample_along_rays  # noqa: E402
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup  # noqa: E402

N_RAYS, S, CR = 65536, 64, 512
RATIO = 0.1875

model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=S,
    chunk_rays=CR, dtype=jnp.bfloat16, compact_ratio=RATIO)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
frame = jax.tree.map(jnp.asarray, frame)
rays = jax.tree.map(jnp.asarray, synthetic_rays(N_RAYS))


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=4):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


cp = CR * S
n = N_RAYS * S
m = -(-int(RATIO * n) // cp) * cp


from transhuman_tpu.render.volume import (  # noqa: E402
    blocked_cumsum_i32, pack_sample_bitmask, select_kth_set_bit)


def mask_core(frame, rays):
    pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near,
                               rays.far, S)
    flat = pts.reshape(n, 3)
    return pipe._compact_mask(frame, flat, jnp.repeat(rays.mask, S), cp)


def stage_mask(params, frame, rays):
    return jnp.sum(mask_core(frame, rays))


def inputs_core(params, frame, rays):
    """Mirrors pipeline._render_frame_compact's stream plan + packed
    ray-table gather (keep in sync)."""
    mask = mask_core(frame, rays)
    viewdir = rays.ray_d / jnp.linalg.norm(rays.ray_d, axis=-1, keepdims=True)
    vde = embed_viewdir(viewdir)
    m2d = mask.reshape(N_RAYS, S)
    counts = jnp.sum(m2d, axis=1, dtype=jnp.int32)
    ends = jnp.cumsum(counts)
    n_active = ends[-1]
    starts = jnp.minimum(ends - counts, m)
    ends = jnp.minimum(ends, m)
    words = pack_sample_bitmask(m2d)
    nw = words.shape[1]
    marker = jnp.zeros((m,), jnp.int32).at[starts].add(
        jnp.ones((N_RAYS,), jnp.int32), mode="drop", indices_are_sorted=True)
    ray_idx = jnp.clip(blocked_cumsum_i32(marker[:, None])[:, 0] - 1,
                       0, N_RAYS - 1)
    rdn = jnp.linalg.norm(rays.ray_d, axis=-1, keepdims=True)
    table = jnp.concatenate(
        [rays.ray_o, rays.ray_d, rays.near[:, None], rays.far[:, None],
         rdn, vde,
         jax.lax.bitcast_convert_type(words, jnp.float32),
         jax.lax.bitcast_convert_type(starts, jnp.float32)[:, None]], axis=1)
    rt = table.at[ray_idx].get(indices_are_sorted=True)
    ro, rd, near_c, far_c, rdn_c, c_vde = (
        rt[:, 0:3], rt[:, 3:6], rt[:, 6], rt[:, 7], rt[:, 8], rt[:, 9:36])
    words_c = jax.lax.bitcast_convert_type(rt[:, 36:36 + nw], jnp.uint32)
    start_c = jax.lax.bitcast_convert_type(rt[:, 36 + nw], jnp.int32)
    k = jnp.arange(m, dtype=jnp.int32) - start_c
    s_idx = select_kth_set_bit(words_c, k).astype(jnp.float32)
    valid = jnp.arange(m, dtype=jnp.int32) < jnp.minimum(n_active, m)
    tfrac = s_idx / (S - 1)
    z = near_c * (1.0 - tfrac) + far_c * tfrac
    c_pts = ro + rd * z[:, None]
    return (c_pts, c_vde, valid, z, near_c, far_c, rdn_c, s_idx, ray_idx,
            starts, ends)


def stage_inputs(params, frame, rays):
    c = inputs_core(params, frame, rays)
    return (c[0].sum() + c[1].sum() + c[3].sum() + c[8][-1]
            + c[9][-1] + c[10][-1])


def decode_core(params, frame, rays):
    (c_pts, c_vde, valid, z, near_c, far_c, rdn_c, s_idx, ray_idx,
     starts, ends) = inputs_core(params, frame, rays)
    pro = pipe.prologue(params, frame)

    def chunk_body(chunk):
        pts_c, vde_c, valid_c = chunk
        exact = pipe._cull(to_smpl(frame, pts_c), frame.tar_verts_smpl)
        return pipe.query_points(params, frame, pro, pts_c, vde_c,
                                 valid_c & exact, allow_pallas=True)

    raw_c = jax.lax.map(
        chunk_body,
        (c_pts.reshape(-1, cp, 3), c_vde.reshape(-1, cp, c_vde.shape[-1]),
         valid.reshape(-1, cp)),
    ).reshape(m, 4)
    return raw_c, z, near_c, far_c, rdn_c, s_idx, ray_idx, starts, ends


def stage_decode(params, frame, rays):
    raw_c, *_ = decode_core(params, frame, rays)
    return raw_c.astype(jnp.float32).sum()


def stage_full(params, frame, rays):
    (raw_c, z, near_c, far_c, rdn_c, s_idx, ray_idx,
     starts, ends) = decode_core(params, frame, rays)
    dists = jnp.where(s_idx == S - 1, 1e10, (far_c - near_c) / (S - 1))
    out = composite_stream(raw_c, ray_idx, z, dists * rdn_c, starts, ends,
                           N_RAYS, depth_scale=1.0 / jnp.maximum(far_c, 1e-9))
    return out["rgb_map"].sum()


print(f"mask            {t(jax.jit(stage_mask), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"+packed inputs  {t(jax.jit(stage_inputs), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"+decode         {t(jax.jit(stage_decode), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"+stream composite{t(jax.jit(stage_full), params, frame, rays)*1e3:7.1f} ms", flush=True)
print(f"render_frame    {t(jax.jit(pipe.render_frame), params, frame, rays)*1e3:8.1f} ms", flush=True)

# decode internals: prologue alone, and decode with pixel-gather disabled
print(f"prologue        {t(jax.jit(pipe.prologue), params, frame)*1e3:8.1f} ms", flush=True)
