"""Probe round 4: same primitives as rounds 2-3 but looped INSIDE one jit
(8 dependent iterations) so the ~25 ms tunnel dispatch doesn't mask the true
cost (CLAUDE.md rule).  Reported = (t_loop8 - t_loop1) / 7 per iteration."""
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


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=4):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


def per_iter(make, *args):
    f1 = jax.jit(make(1))
    f8 = jax.jit(make(8))
    t1 = t(f1, *args)
    t8 = t(f8, *args)
    return (t8 - t1) / 7, t1


rng = np.random.default_rng(0)
flat_idx = np.sort(rng.choice(N, M, replace=False)).astype(np.int32)
ray_idx = jnp.asarray(flat_idx // S)
idx_full = jnp.asarray(flat_idx)
kk = jax.random.PRNGKey(0)
alpha = jax.jit(lambda k: jax.random.uniform(k, (M,), jnp.float32, 0, 0.5))(kk)
q5 = jax.jit(lambda k: jax.random.randint(k, (M, 5), 0, 1 << 12, jnp.int32))(kk)
table = jax.jit(lambda k: jax.random.normal(k, (R, 36), jnp.float32))(kk)
raw_c = jax.jit(lambda k: jax.random.normal(k, (M, 4), jnp.bfloat16))(kk)
ends = jnp.asarray(np.searchsorted(flat_idx // S, np.arange(R), side="right").astype(np.int32))
starts = jnp.asarray(np.searchsorted(flat_idx // S, np.arange(R), side="left").astype(np.int32))


def loop(n, body, init):
    def f():
        return jax.lax.fori_loop(0, n, body, init)
    return f


def mk_gather(n):
    def body(i, acc):
        g = table.at[(ray_idx + i) % R].get(indices_are_sorted=False)
        return acc + g.sum()
    return loop(n, body, jnp.float32(0.0))


def mk_gather_sorted(n):
    def body(i, acc):
        g = table.at[jnp.minimum(ray_idx + i, R - 1)].get(indices_are_sorted=True)
        return acc + g.sum()
    return loop(n, body, jnp.float32(0.0))


def mk_cumsum2(n):
    def body(i, acc):
        q = q5 + i
        x = q.reshape(M // L, L, 5)
        within = jnp.cumsum(x, axis=1)
        row_tot = within[:, -1, :]
        offs = jnp.cumsum(row_tot, axis=0) - row_tot
        cs = (within + offs[:, None, :]).reshape(M, 5)
        return acc + cs[-1].sum()
    return loop(n, body, jnp.int32(0))


def comb(l, r):
    bl, vl = l
    br, vr = r
    return bl | br, jnp.where(br, vr, vl * vr)


def mk_segscan2(n):
    def body(i, acc):
        a = alpha + 1e-8 * i
        k = M // L
        v = (1.0 - a + 1e-10).reshape(k, L)
        rid = ray_idx.reshape(k, L)
        prev_last = jnp.concatenate(
            [jnp.full((1,), -1, rid.dtype), rid[:-1, -1]])
        b = jnp.concatenate(
            [(rid[:, 0] != prev_last)[:, None], rid[:, 1:] != rid[:, :-1]],
            axis=1)
        vs = jnp.concatenate(
            [jnp.ones((k, 1), v.dtype), jnp.where(b[:, 1:], 1.0, v[:, :-1])],
            axis=1)
        _, trans_local = jax.lax.associative_scan(comb, (b, vs), axis=1)
        tail = trans_local[:, -1] * v[:, -1]
        hasb = jnp.any(b, axis=1)
        f_s = jnp.concatenate([jnp.ones((1,), bool), hasb[:-1]])
        t_s = jnp.concatenate([jnp.ones((1,), tail.dtype), tail[:-1]])
        _, c = jax.lax.associative_scan(comb, (f_s, t_s))
        open_seg = jnp.cumsum(b.astype(jnp.int32), axis=1) == 0
        trans = jnp.where(open_seg, trans_local * c[:, None], trans_local)
        return acc + trans.sum()
    return loop(n, body, jnp.float32(0.0))


def mk_prefix_gathers(n):
    csum0 = jnp.concatenate([jnp.zeros((1, 5), jnp.int32),
                             jnp.cumsum(q5, axis=0)])

    def body(i, acc):
        hi = csum0.at[jnp.minimum(ends + i, M)].get(indices_are_sorted=True)
        lo = csum0.at[jnp.minimum(starts + i, M)].get(indices_are_sorted=True)
        return acc + (hi - lo).sum()
    return loop(n, body, jnp.int32(0))


def mk_scatter(n):
    def body(i, acc):
        r = jnp.zeros((N, 4), jnp.bfloat16).at[
            jnp.minimum(idx_full + i, N - 1)
        ].set(raw_c, mode="drop", indices_are_sorted=True)
        return acc + r.astype(jnp.float32).sum()
    return loop(n, body, jnp.float32(0.0))


for name, mk, args in [
    ("packed (R,36) gather x M      ", mk_gather, ()),
    ("packed gather sorted hint     ", mk_gather_sorted, ()),
    ("two-level int32 cumsum (M,5)  ", mk_cumsum2, ()),
    ("two-level segmented prod scan ", mk_segscan2, ()),
    ("2x 65K prefix-row gathers     ", mk_prefix_gathers, ()),
    ("scatter-back (M,4)bf16->(N,4) ", mk_scatter, ()),
]:
    dt, t1 = per_iter(mk, *args)
    print(f"{name} {dt*1e3:8.2f} ms/iter   (single-dispatch {t1*1e3:6.1f})",
          flush=True)
