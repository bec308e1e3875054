"""A/B the compact-path input construction (in-jit loops, bench scale):
(a) packed 36-col f32 per-ray gather (current),
(b) slim 9-col gather + per-point viewdir embedding,
(c) the round-2 two-gather form (flat pts 12 B + vde 108 B rows).
Each returns (c_pts, c_vde)-equivalent sums; loop 4x inside one jit."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.models.embedder import embed_viewdir  # noqa: E402
from transhuman_tpu.render.volume import sample_along_rays  # noqa: E402
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup  # noqa: E402

N_RAYS, S, CR = 65536, 64, 512
RATIO = 0.1875

model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=S,
    chunk_rays=CR, dtype=jnp.bfloat16, compact_ratio=RATIO)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
frame = jax.tree.map(jnp.asarray, frame)
rays = jax.tree.map(jnp.asarray, synthetic_rays(N_RAYS))

cp = CR * S
n = N_RAYS * S
m = -(-int(RATIO * n) // cp) * cp


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n_=3):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n_):
        force(f(*a))
    return (time.perf_counter() - t0) / n_


def per_iter(make, *args):
    t1 = t(jax.jit(make(1)), *args)
    t4 = t(jax.jit(make(4)), *args)
    return (t4 - t1) / 3, t1


# plan once, outside the timed loops (device-resident args)
@jax.jit
def plan_fn(frame, rays):
    pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far, S)
    flat = pts.reshape(n, 3)
    idx, valid, safe, n_active, _, mask = pipe._compact_plan(
        frame, flat, jnp.repeat(rays.mask, S), cp)
    return flat, safe


flat, safe = plan_fn(frame, rays)
flat, safe = jax.device_put(flat), jax.device_put(safe)
viewdir = rays.ray_d / jnp.linalg.norm(rays.ray_d, axis=-1, keepdims=True)
vde_all = jax.jit(embed_viewdir)(viewdir)
rdn = jnp.linalg.norm(rays.ray_d, axis=-1, keepdims=True)
table36 = jnp.concatenate(
    [rays.ray_o, rays.ray_d, rays.near[:, None], rays.far[:, None], rdn,
     vde_all], axis=1)
table9 = table36[:, :9]


def mk_packed36(n_):
    def f(table, safe):
        def body(i, acc):
            ridx = jnp.minimum(safe // S + i, N_RAYS - 1)
            rt = table.at[ridx].get(indices_are_sorted=True)
            s_idx = (safe % S).astype(jnp.float32)
            tfrac = s_idx / (S - 1)
            z = rt[:, 6] * (1 - tfrac) + rt[:, 7] * tfrac
            c_pts = rt[:, 0:3] + rt[:, 3:6] * z[:, None]
            return acc + c_pts.sum() + rt[:, 9:36].sum()
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


def mk_slim9(n_):
    def f(table, safe):
        def body(i, acc):
            ridx = jnp.minimum(safe // S + i, N_RAYS - 1)
            rt = table.at[ridx].get(indices_are_sorted=True)
            s_idx = (safe % S).astype(jnp.float32)
            tfrac = s_idx / (S - 1)
            z = rt[:, 6] * (1 - tfrac) + rt[:, 7] * tfrac
            c_pts = rt[:, 0:3] + rt[:, 3:6] * z[:, None]
            vdir = rt[:, 3:6] / rt[:, 8:9]
            c_vde = embed_viewdir(vdir)
            return acc + c_pts.sum() + c_vde.sum()
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


def mk_two_gathers(n_):
    def f(flat, vde, safe):
        def body(i, acc):
            sf = jnp.minimum(safe + i, n - 1)
            c_pts = flat.at[sf].get(indices_are_sorted=True)
            c_vde = vde.at[sf // S].get(indices_are_sorted=True)
            return acc + c_pts.sum() + c_vde.sum()
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


for name, mk, args in [
    ("packed36 gather ", mk_packed36, (table36, safe)),
    ("slim9 + embed   ", mk_slim9, (table9, safe)),
    ("two gathers (r2)", mk_two_gathers, (flat, vde_all, safe)),
]:
    dt, t1 = per_iter(mk, *args)
    print(f"{name} {dt*1e3:8.2f} ms/iter (single {t1*1e3:6.1f})", flush=True)
