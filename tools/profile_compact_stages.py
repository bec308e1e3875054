"""Stage ablation of the COMPACT render path at bench scale (65536 rays x
64 samples, ratio 0.1875, bf16): plan / gather / decode / scatter-back /
composite, plus sorted-vs-unsorted A/B for the compaction gather+scatter.
One jit per ablation, big tensors as args, forced scalar readback
(CLAUDE.md tunnel rules)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.render.pipeline import to_smpl, embed_viewdir  # noqa: E402
from transhuman_tpu.render.volume import composite, sample_along_rays  # noqa: E402
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


def plan(params, frame, rays):
    pts, z_vals = sample_along_rays(rays.ray_o, rays.ray_d, rays.near,
                                    rays.far, S)
    flat = pts.reshape(n, 3)
    idx, valid, safe, n_active, _ = pipe._compact_plan(
        frame, flat, jnp.repeat(rays.mask, S), cp)
    return pts, z_vals, flat, idx, valid, safe, n_active


def stage_plan(params, frame, rays):
    *_, n_active = plan(params, frame, rays)
    return n_active


def make_gather(sorted_flag):
    def f(params, frame, rays):
        pts, z_vals, flat, idx, valid, safe, _ = plan(params, frame, rays)
        viewdir = rays.ray_d / jnp.linalg.norm(rays.ray_d, axis=-1,
                                               keepdims=True)
        vde = embed_viewdir(viewdir)
        if sorted_flag:
            c_pts = flat.at[safe].get(indices_are_sorted=True)
            c_vde = vde.at[safe // S].get(indices_are_sorted=True)
        else:
            c_pts = flat[safe]
            c_vde = vde[safe // S]
        return c_pts.sum() + c_vde.sum()
    return f


def decode_core(params, frame, rays):
    """plan + gather + prologue + chunked decode; returns raw_c and plan."""
    pts, z_vals, flat, idx, valid, safe, _ = plan(params, frame, rays)
    pro = pipe.prologue(params, frame)
    viewdir = rays.ray_d / jnp.linalg.norm(rays.ray_d, axis=-1, keepdims=True)
    vde = embed_viewdir(viewdir)
    c_pts = flat.at[safe].get(indices_are_sorted=True)
    c_vde = vde.at[safe // S].get(indices_are_sorted=True)

    def chunk_body(chunk):
        pts_c, vde_c, valid_c = chunk
        exact = pipe._cull(to_smpl(frame, pts_c), frame.tar_verts_smpl)
        raw = pipe.query_points(params, frame, pro, pts_c, vde_c,
                                valid_c & exact, allow_pallas=True)
        return raw

    raw_c = jax.lax.map(
        chunk_body,
        (c_pts.reshape(-1, cp, 3), c_vde.reshape(-1, cp, c_vde.shape[-1]),
         valid.reshape(-1, cp)),
    ).reshape(m, 4)
    return raw_c, idx, z_vals


def stage_decode(params, frame, rays):
    raw_c, _, _ = decode_core(params, frame, rays)
    return raw_c.astype(jnp.float32).sum()


def make_scatter(sorted_flag, dtype):
    def f(params, frame, rays):
        raw_c, idx, _ = decode_core(params, frame, rays)
        raw = (jnp.zeros((n, 4), dtype).at[idx]
               .set(raw_c.astype(dtype), mode="drop",
                    indices_are_sorted=sorted_flag))
        return raw.astype(jnp.float32).sum()
    return f


def stage_full(params, frame, rays):
    raw_c, idx, z_vals = decode_core(params, frame, rays)
    raw = (jnp.zeros((n, 4), raw_c.dtype).at[idx]
           .set(raw_c, mode="drop", indices_are_sorted=True))
    out = composite(raw.reshape(N_RAYS, S, 4), z_vals, rays.ray_d, False)
    return out["rgb_map"].sum()


print(f"plan            {t(jax.jit(stage_plan), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"plan+gather srt {t(jax.jit(make_gather(True)), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"plan+gather uns {t(jax.jit(make_gather(False)), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"decode          {t(jax.jit(stage_decode), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"+scatter bf16 s {t(jax.jit(make_scatter(True, jnp.bfloat16)), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"+scatter bf16 u {t(jax.jit(make_scatter(False, jnp.bfloat16)), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"+scatter f32  s {t(jax.jit(make_scatter(True, jnp.float32)), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"full(+composite){t(jax.jit(stage_full), params, frame, rays)*1e3:8.1f} ms", flush=True)
print(f"render_frame    {t(jax.jit(pipe.render_frame), params, frame, rays)*1e3:8.1f} ms", flush=True)
