"""Probe round 2 for the scatter-free compact composite:
(a) chunked segmented product scan: lax.scan over (K, L) rows, in-row
    associative_scan, tiny cross-row carry — vs the 36 ms full-stream scan;
(b) int32 fixed-point cumsum of (M,5) + two 65K-row prefix gathers (the
    exact modular prefix-difference reduction) — vs 36 ms segment_sum;
(c) the packed (R,36) ray-table gather (m rows) for reference."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, S = 65536, 64
N = R * S
M = int(0.1875 * N)
L = 32768
K = M // L


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=4):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
flat_idx = np.sort(rng.choice(N, M, replace=False)).astype(np.int32)
ray_idx = jnp.asarray(flat_idx // S)
kk = jax.random.PRNGKey(0)
alpha = jax.jit(lambda k: jax.random.uniform(k, (M,), jnp.float32, 0, 0.5))(kk)
vals5 = jax.jit(lambda k: jax.random.uniform(k, (M, 5), jnp.float32))(kk)
table = jax.jit(lambda k: jax.random.normal(k, (R, 36), jnp.float32))(kk)
ends = jnp.asarray(np.searchsorted(flat_idx // S, np.arange(R), side="right").astype(np.int32))
starts = jnp.asarray(np.searchsorted(flat_idx // S, np.arange(R), side="left").astype(np.int32))


def chunked_segprod(alpha, ray_idx):
    v = (1.0 - alpha + 1e-10).reshape(K, L)
    rid = ray_idx.reshape(K, L)

    def comb(l, r):
        bl, vl = l
        br, vr = r
        return bl | br, jnp.where(br, vr, vl * vr)

    def row(carry, args):
        c_rid, c_prod = carry
        v_r, rid_r = args
        b = jnp.concatenate(
            [jnp.array([True]), rid_r[1:] != rid_r[:-1]])
        first = rid_r[0] != c_rid
        # element 0's exclusive product: carry if the ray continues, else 1
        vs = jnp.concatenate(
            [jnp.where(first, 1.0, c_prod)[None],
             jnp.where(b[1:], 1.0, v_r[:-1])])
        b = b.at[0].set(first)
        _, trans = jax.lax.associative_scan(comb, (b, vs))
        new_prod = trans[-1] * v_r[-1]
        return (rid_r[-1], new_prod), trans

    (_, _), trans = jax.lax.scan(row, (jnp.int32(-1), jnp.float32(1.0)),
                                 (v, rid))
    return trans.sum()


def fixedpoint_reduce(vals5, starts, ends):
    q = jnp.round(vals5 * (2.0 ** 28)).astype(jnp.int32)
    csum = jnp.cumsum(q, axis=0)
    csum0 = jnp.concatenate([jnp.zeros((1, 5), jnp.int32), csum], axis=0)
    hi = csum0.at[ends].get(indices_are_sorted=True)
    lo = csum0.at[starts].get(indices_are_sorted=True)
    out = (hi - lo).astype(jnp.float32) * (2.0 ** -28)
    return out.sum()


print(f"chunked segprod scan (24x32768)  "
      f"{t(jax.jit(chunked_segprod), alpha, ray_idx)*1e3:8.1f} ms", flush=True)
print(f"int32 cumsum(M,5)+2x65K gathers  "
      f"{t(jax.jit(fixedpoint_reduce), vals5, starts, ends)*1e3:8.1f} ms", flush=True)
print(f"packed (R,36) gather by ray_idx  "
      f"{t(jax.jit(lambda tb, i: tb.at[i].get(indices_are_sorted=True).sum()), table, ray_idx)*1e3:8.1f} ms", flush=True)

# correctness cross-check of the fixed-point reduction vs direct segment sums
seg = jax.ops.segment_sum(vals5, ray_idx, R)
q = jnp.round(vals5 * (2.0 ** 28)).astype(jnp.int32)
csum0 = jnp.concatenate([jnp.zeros((1, 5), jnp.int32), jnp.cumsum(q, axis=0)])
fp = (csum0[ends] - csum0[starts]).astype(jnp.float32) * (2.0 ** -28)
err = float(jnp.max(jnp.abs(fp - seg)))
print(f"fixed-point vs segment_sum max err {err:.3e}", flush=True)
