"""Probe the primitive costs for a scatter-free compact composite:
(1) one packed per-ray row gather by sorted ray ids,
(2) sorted segment_sum (m -> R) of small rows,
(3) segmented product scan (associative_scan) over the compact stream,
(4) the current scatter-back, for reference.
All at bench scale: R=65536 rays, S=64, m = 0.1875 * R * S = 786432."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, S = 65536, 64
N = R * S
M = int(0.1875 * N)


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=4):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


# sorted active flat indices (random ~18.75% subset, sorted = ray-ordered)
rng = np.random.default_rng(0)
flat_idx = np.sort(rng.choice(N, M, replace=False)).astype(np.int32)
ray_idx = jnp.asarray(flat_idx // S)
k = jax.random.PRNGKey(0)
table = jax.jit(lambda k: jax.random.normal(k, (R, 35), jnp.float32))(k)
vals8 = jax.jit(lambda k: jax.random.normal(k, (M, 8), jnp.float32))(k)
alpha = jax.jit(lambda k: jax.random.uniform(k, (M,), jnp.float32, 0, 0.5))(k)
raw_c = jax.jit(lambda k: jax.random.normal(k, (M, 4), jnp.bfloat16))(k)
idx_full = jnp.asarray(flat_idx)

print(f"gather (R,35) by sorted ray_idx   "
      f"{t(jax.jit(lambda tb, i: tb.at[i].get(indices_are_sorted=True).sum()), table, ray_idx)*1e3:8.1f} ms", flush=True)
print(f"gather (R,35) unsorted hint       "
      f"{t(jax.jit(lambda tb, i: tb[i].sum()), table, ray_idx)*1e3:8.1f} ms", flush=True)
print(f"segment_sum (M,8)->(R,8) sorted   "
      f"{t(jax.jit(lambda v, i: jax.ops.segment_sum(v, i, R, indices_are_sorted=True).sum()), vals8, ray_idx)*1e3:8.1f} ms", flush=True)
print(f"segment_sum (M,8)->(R,8) unsorted "
      f"{t(jax.jit(lambda v, i: jax.ops.segment_sum(v, i, R).sum()), vals8, ray_idx)*1e3:8.1f} ms", flush=True)


def segprod(alpha, ray_idx):
    b = jnp.concatenate([jnp.ones((1,), bool), ray_idx[1:] != ray_idx[:-1]])
    v = 1.0 - alpha + 1e-10
    vs = jnp.where(b, 1.0, jnp.concatenate([jnp.ones((1,), v.dtype), v[:-1]]))

    def comb(l, r):
        bl, vl = l
        br, vr = r
        return bl | br, jnp.where(br, vr, vl * vr)

    _, trans = jax.lax.associative_scan(comb, (b, vs))
    return trans.sum()


print(f"segmented product scan over M     "
      f"{t(jax.jit(segprod), alpha, ray_idx)*1e3:8.1f} ms", flush=True)
print(f"scatter-back (M,4)bf16 -> (N,4)   "
      f"{t(jax.jit(lambda r, i: jnp.zeros((N, 4), jnp.bfloat16).at[i].set(r, mode='drop', indices_are_sorted=True).astype(jnp.float32).sum()), raw_c, idx_full)*1e3:8.1f} ms", flush=True)
