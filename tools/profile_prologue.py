"""Prologue sub-stage profile: encoder CNN / painting+pooling / TransHE.
In-jit loops (4x) so the tunnel dispatch doesn't mask true costs."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.testing import init_params, synthetic_setup  # noqa: E402

model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=64,
    chunk_rays=512, dtype=jnp.bfloat16, compact_ratio=0.1875)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
frame = jax.tree.map(jnp.asarray, frame)


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=4):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


def per_iter(make, *args):
    t1 = t(jax.jit(make(1)), *args)
    t4 = t(jax.jit(make(4)), *args)
    return (t4 - t1) / 3, t1


def mk_encoder(n):
    def f(params, frame):
        def body(i, acc):
            h, p = pipe.model.apply(params, frame.images + i * 1e-6,
                                    method="encode_views")
            return acc + h.astype(jnp.float32).sum() + p.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return f


def mk_prologue(n):
    def f(params, frame):
        def body(i, acc):
            pro = pipe.prologue(params, frame.replace(
                images=frame.images + i * 1e-6))
            return acc + pro.tokens.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return f


dt, t1 = per_iter(mk_encoder, params, frame)
print(f"encoder (3x512x512)   {dt*1e3:8.2f} ms/iter (single {t1*1e3:6.1f})",
      flush=True)
dt, t1 = per_iter(mk_prologue, params, frame)
print(f"full prologue         {dt*1e3:8.2f} ms/iter (single {t1*1e3:6.1f})",
      flush=True)
