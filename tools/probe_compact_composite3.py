"""Probe round 3: two-level (blocked) scans.
(a) manual two-level int32 cumsum of (M,5) vs jnp.cumsum's 30 ms;
(b) row-vectorized segmented product scan: associative_scan along the minor
    axis of (M/128, 128), then a row-carry fixup, vs 33-36 ms.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, S = 65536, 64
N = R * S
M = int(0.1875 * N)
L = 128
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
q5 = jax.jit(lambda k: jax.random.randint(k, (M, 5), 0, 1 << 20, jnp.int32))(kk)


def cumsum2level(q):
    """Inclusive cumsum along axis 0 of (M, C) int32 via (K, L) blocking:
    in-row cumsum along the minor axis + exclusive row offsets."""
    c = q.shape[1]
    x = q.reshape(K, L, c)
    within = jnp.cumsum(x, axis=1)  # vectorized across K rows
    row_tot = within[:, -1, :]  # (K, c)
    # level-2: cumsum over K rows, again blocked (K = 48*128 here -> one more
    # level is overkill; K=6144 cumsum along axis 0 of (K, c) is small)
    offs = jnp.cumsum(row_tot, axis=0) - row_tot  # exclusive (K, c)
    return (within + offs[:, None, :]).reshape(M, c)


def fp_reduce_2level(q):
    return cumsum2level(q).sum()


def comb(l, r):
    bl, vl = l
    br, vr = r
    return bl | br, jnp.where(br, vr, vl * vr)


def seg_scan_2level(alpha, ray_idx):
    """Segmented EXCLUSIVE product of v = (1 - alpha + 1e-10) along the
    stream, segments keyed by ray_idx changes, as two levels of
    associative_scan: an in-row scan along the minor axis of (K, L) (rows
    are vectorized sublanes) plus a K-length carry scan across rows."""
    k = alpha.shape[0] // L
    v = (1.0 - alpha + 1e-10).reshape(k, L)
    rid = ray_idx.reshape(k, L)
    prev_last = jnp.concatenate([jnp.full((1,), -1, rid.dtype), rid[:-1, -1]])
    b = jnp.concatenate(
        [(rid[:, 0] != prev_last)[:, None], rid[:, 1:] != rid[:, :-1]],
        axis=1)  # REAL segment boundaries, incl. across row edges
    # in-row exclusive product: shift v right within the row; element 0
    # starts at 1 (cross-row factors come from the carry)
    vs = jnp.concatenate(
        [jnp.ones((k, 1), v.dtype), jnp.where(b[:, 1:], 1.0, v[:, :-1])],
        axis=1)
    _, trans_local = jax.lax.associative_scan(comb, (b, vs), axis=1)

    # row carry: product over the open segment entering each row, via a
    # K-length segmented scan (flags = row contains any real boundary)
    tail = trans_local[:, -1] * v[:, -1]  # product since last boundary in row
    hasb = jnp.any(b, axis=1)
    # exclusive: shift (hasb, tail) down one row
    f_s = jnp.concatenate([jnp.ones((1,), bool), hasb[:-1]])
    t_s = jnp.concatenate([jnp.ones((1,), tail.dtype), tail[:-1]])
    _, c = jax.lax.associative_scan(comb, (f_s, t_s))
    # the carry applies only to elements still in the row's FIRST (open)
    # segment, and only when the row does not itself start a new segment
    open_seg = jnp.cumsum(b.astype(jnp.int32), axis=1) == 0
    trans = jnp.where(open_seg, trans_local * c[:, None], trans_local)
    return trans


def seg_scan_2level_sum(alpha, ray_idx):
    return seg_scan_2level(alpha, ray_idx).sum()


print(f"two-level int32 cumsum (M,5)     "
      f"{t(jax.jit(fp_reduce_2level), q5)*1e3:8.1f} ms", flush=True)
print(f"two-level segmented prod scan    "
      f"{t(jax.jit(seg_scan_2level_sum), alpha, ray_idx)*1e3:8.1f} ms", flush=True)

# correctness: two-level cumsum == jnp.cumsum
ref = jnp.cumsum(q5, axis=0)
got = cumsum2level(q5)
print("cumsum exact:", bool(jnp.all(ref == got)), flush=True)

# correctness: segmented scan vs a host loop on a small prefix
Ms = 4096
a_s = np.asarray(alpha)[:Ms]
r_s = np.asarray(ray_idx)[:Ms]
v_s = 1.0 - a_s + 1e-10
ref_t = np.ones(Ms, np.float64)
run = 1.0
for i in range(Ms):
    if i == 0 or r_s[i] != r_s[i - 1]:
        run = 1.0
    ref_t[i] = run
    run *= v_s[i]
got_t = np.asarray(
    jax.jit(seg_scan_2level)(alpha[:Ms], ray_idx[:Ms])
).reshape(-1)
print("segscan max err:", float(np.abs(got_t - ref_t).max()), flush=True)
