"""Microbench the feature-sampling backward at train scale: which part of
the custom VJP (argsort / row gather / segment_sum / d_uv) owns the time.
One process, forced readback (CLAUDE.md tunnel rules)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.ops.sampling import sample_feature_map  # noqa: E402

V, HF, WF, C = 3, 512, 512, 384
N = 2400 * 64
H_IMG, W_IMG = 512, 512

k0 = jax.random.PRNGKey(0)
feat = jax.jit(lambda k: jax.random.normal(k, (V, HF, WF, C), jnp.bfloat16))(k0)
uv = jax.jit(
    lambda k: jax.random.uniform(
        k, (V, N, 2), jnp.float32, 1.0, min(HF, WF) - 2
    )
)(jax.random.PRNGKey(1))


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=5):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


def loss(feat, uv):
    return sample_feature_map(feat, uv, (H_IMG, W_IMG)).astype(jnp.float32).sum()


print(f"fwd            {t(jax.jit(loss), feat, uv)*1e3:8.1f} ms", flush=True)
print(f"grad feat      {t(jax.jit(jax.grad(loss, 0)), feat, uv)*1e3:8.1f} ms", flush=True)
print(f"grad uv        {t(jax.jit(jax.grad(loss, 1)), feat, uv)*1e3:8.1f} ms", flush=True)
print(f"grad both      {t(jax.jit(jax.grad(loss, (0, 1))), feat, uv)*1e3:8.1f} ms", flush=True)

ids = jax.jit(
    lambda k: jax.random.randint(k, (V, 4 * N), 0, HF * WF, jnp.int32)
)(jax.random.PRNGKey(2))
rows = jax.jit(lambda k: jax.random.normal(k, (V, N, C), jnp.bfloat16))(
    jax.random.PRNGKey(3)
)

print(f"argsort 4N x3  {t(jax.jit(lambda i: jnp.sort(i, axis=1)[:, :1]), ids)*1e3:8.1f} ms", flush=True)


@jax.jit
def full_dfeat(ids, rows):
    def per_view(i, g_rows):
        order = jnp.argsort(i)
        v = jnp.take(g_rows, order % N, axis=0).astype(jnp.float32)
        return jax.ops.segment_sum(
            v, i[order], num_segments=HF * WF, indices_are_sorted=True
        )

    return jax.vmap(per_view)(ids, rows).sum(axis=(1, 2))


print(f"sort+gat+seg   {t(full_dfeat, ids, rows)*1e3:8.1f} ms", flush=True)


@jax.jit
def seg_only(ids, rows):
    # pre-sorted ids: isolates the segment_sum + gather
    def per_view(i, g_rows):
        i_s = jnp.sort(i)
        v = jnp.take(g_rows, (i_s % N), axis=0).astype(jnp.float32)
        return jax.ops.segment_sum(
            v, i_s, num_segments=HF * WF, indices_are_sorted=True
        )

    return jax.vmap(per_view)(ids, rows).sum(axis=(1, 2))


print(f"sort+gat+seg2  {t(seg_only, ids, rows)*1e3:8.1f} ms  (sort w/o argsort payload)", flush=True)
