"""Break the 85 ms train FORWARD down with in-jit loops (render_train at
reference scale: 2400 rays x 64 samples, bf16).  Components: prologue
(encoder CNN + painting + token ViT), per-point pixel-feature sampling,
DPaRF+heads query, composite.  Each variant loops 1x vs 4x inside one jit;
per-iter = (t4 - t1) / 3 (kills the ~30 ms tunnel dispatch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.models.embedder import embed_viewdir  # noqa: E402
from transhuman_tpu.render.pipeline import to_smpl  # noqa: E402
from transhuman_tpu.render.volume import composite, sample_along_rays  # noqa: E402
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup  # noqa: E402

R_RAYS, S = 2400, 64

model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=S,
    dtype=jnp.bfloat16)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
frame = jax.tree.map(jnp.asarray, frame)
rays = jax.tree.map(jnp.asarray, synthetic_rays(R_RAYS))


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n_=4):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n_):
        force(f(*a))
    return (time.perf_counter() - t0) / n_


def per_iter(make, *args):
    t1 = t(jax.jit(make(1)), *args)
    t4 = t(jax.jit(make(4)), *args)
    return (t4 - t1) / 3, t1


def mk_prologue(n_):
    def f(params, frame):
        def body(i, acc):
            fr = frame.replace(
                images=frame.images + (i * 1e-6).astype(frame.images.dtype))
            pro = pipe.prologue(params, fr)
            return acc + pro.tokens.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


def mk_encoder(n_):
    def f(params, frame):
        def body(i, acc):
            img = frame.images + (i * 1e-6).astype(frame.images.dtype)
            hm, pm = model.apply(params, img, method="encode_views")
            return acc + hm.astype(jnp.float32)[0, 0, 0, 0] + pm.astype(
                jnp.float32)[0, 0, 0, 0]
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


def mk_full(n_):
    def f(params, frame, rays):
        def body(i, acc):
            rb = rays.replace(
                near=rays.near + jnp.float32(i) * 1e-7)
            out = pipe.render_train(params, frame, rb, None)
            return acc + out["rgb_map"].sum()
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


def mk_query(n_):
    # everything after the prologue: sampling + projection + pixel gather +
    # DPaRF + heads + composite, with the prologue hoisted out of the loop
    def f(params, frame, rays):
        pro = pipe.prologue(params, frame)

        def body(i, acc):
            rb = rays.replace(near=rays.near + jnp.float32(i) * 1e-7)
            pts, z_vals = sample_along_rays(
                rb.ray_o, rb.ray_d, rb.near, rb.far, S)
            viewdir = rb.ray_d / jnp.linalg.norm(
                rb.ray_d, axis=-1, keepdims=True)
            vde = embed_viewdir(viewdir)
            r, s = z_vals.shape
            vde_b = jnp.broadcast_to(
                vde[:, None, :], (r, s, vde.shape[-1])).reshape(r * s, -1)
            mask = jnp.broadcast_to(rb.mask[:, None], (r, s)).reshape(-1)
            raw = pipe.query_points(
                params, frame, pro, pts.reshape(r * s, 3), vde_b, mask)
            out = composite(
                raw.reshape(r, s, 4).astype(jnp.float32), z_vals, rb.ray_d,
                pipe.white_bkgd)
            return acc + out["rgb_map"].sum()
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


for name, mk, args in [
    ("full render_train", mk_full, (params, frame, rays)),
    ("prologue         ", mk_prologue, (params, frame)),
    ("encoder CNN only ", mk_encoder, (params, frame)),
    ("query (post-pro) ", mk_query, (params, frame, rays)),
]:
    dt, t1 = per_iter(mk, *args)
    print(f"{name} {dt*1e3:8.2f} ms/iter (single {t1*1e3:6.1f})", flush=True)
