"""Decision probe: what does the d_feat backward's SORT PLAN actually cost,
and would a counting-sort-by-window bucket plan beat it?

The stream-scatter kernel only needs rows GROUPED by W_SPAN-window (order
within a window is irrelevant: stores are +=).  The current plan pays a
full argsort + 3 takes per view.  The bucket plan pays: one-hot histogram
(MXU), rank-in-bucket via cumsum of the one-hot, dest = offset[bucket] +
rank, an int32 scatter to invert the permutation, then the same row take.

Times both at train scale (V=3, N=153600, ids clustered like projected
body points).  Run: PYTHONPATH=/root/repo:/root/.axon_site python ...

MEASURED (v5e): sort plan 13.0 ms/iter, bucket plan 24.8 — the full
argsort is CHEAP (the old 42 ms figure was the 4N tap-major sort, long
gone) and the bucket plan's (N, NW) rank cumsum + permutation-inversion
scatter cost more than the sort they replace.  Counting-sort grouping is
a dead end here; see experiments/streamscatter.py for the full story.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, N, C = 3, 2400 * 64, 384
HW = 512 * 512
W_SPAN = 2048
NW = HW // W_SPAN  # 256 buckets
B = 512

# clustered ids: body occupies a ~160x160 box
key = jax.random.PRNGKey(0)
ids = jax.jit(lambda k: (
    jax.random.randint(k, (V, N), 180 * 512 + 180, 340 * 512 + 340)
))(key)
rows = jax.jit(lambda k: jax.random.normal(k, (V, N, C), jnp.bfloat16))(
    jax.random.PRNGKey(1))
w2 = jax.jit(lambda k: jax.random.uniform(k, (V, N, 2)))(jax.random.PRNGKey(2))


def sort_plan(i, g_rows, wxy):
    order = jnp.argsort(i)
    i_s = i[order]
    rows_s = jnp.take(g_rows, order, axis=0)
    wxy_s = jnp.take(wxy, order, axis=0)
    return i_s, rows_s, wxy_s


def bucket_plan(i, g_rows, wxy):
    bucket = (i // W_SPAN).astype(jnp.int32)
    onehot = (
        bucket[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, NW), 1)
    )
    counts = jnp.sum(onehot, axis=0)  # (NW,)
    rank = jnp.cumsum(onehot.astype(jnp.int32), axis=0)  # inclusive
    my_rank = jnp.sum(jnp.where(onehot, rank, 0), axis=1) - 1  # (N,)
    padded = ((counts + B - 1) // B) * B
    offsets = jnp.cumsum(padded) - padded  # exclusive, (NW,)
    my_off = jnp.sum(jnp.where(onehot, offsets[None, :], 0), axis=1)
    dest = my_off + my_rank  # unique in [0, N')
    npad = N + NW * B
    src = jnp.full((npad,), N, jnp.int32).at[dest].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop", unique_indices=True)
    g_pad = jnp.concatenate([g_rows, jnp.zeros((1, C), g_rows.dtype)], 0)
    i_pad = jnp.concatenate([i, jnp.full((1,), HW + 2, i.dtype)], 0)
    w_pad = jnp.concatenate([wxy, jnp.zeros((1, 2), wxy.dtype)], 0)
    return jnp.take(i_pad, src), jnp.take(g_pad, src, axis=0), \
        jnp.take(w_pad, src, axis=0)


def chain(plan, n_):
    def f(ids, rows, w2):
        def body(t, acc):
            out = jax.vmap(plan)(ids + t, rows, w2)
            return acc + out[1].astype(jnp.float32).ravel()[0] + \
                out[0][0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))
    return f


def force(r):
    return float(np.asarray(r))


def t(f, *a, n_=3):
    force(f(*a)); t0 = time.perf_counter()
    for _ in range(n_):
        force(f(*a))
    return (time.perf_counter() - t0) / n_


for plan, name in [(sort_plan, "sort  "), (bucket_plan, "bucket")]:
    t1 = t(jax.jit(chain(plan, 1)), ids, rows, w2)
    t4 = t(jax.jit(chain(plan, 4)), ids, rows, w2)
    print(f"{name} plan {(t4-t1)/3*1e3:8.2f} ms/iter (single {t1*1e3:6.1f})",
          flush=True)
