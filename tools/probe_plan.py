"""Probe the compact-plan internals at bench scale (in-jit loops):
(a) prefilter mask (lax.map cluster-radius test over 4.19M pts),
(b) jnp.nonzero(size=m) from a given mask (suspected ~35 ms: one long
    4.19M cumsum + a 4.19M-row scatter),
(c) the descriptor-free stream reconstruction: per-ray sample bitmask
    (s=64 -> 2x uint32) + scatter-1-at-starts + blocked cumsum for ray_idx
    + popcount binary search for the k-th surviving sample index.
(c) must produce exactly nonzero's (ray_idx, s_idx) on in-capacity slots.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.render.volume import blocked_cumsum_i32, sample_along_rays  # noqa: E402
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


@jax.jit
def make_mask(frame, rays):
    pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far, S)
    flat = pts.reshape(n, 3)
    return pipe._compact_plan(frame, flat, jnp.repeat(rays.mask, S), cp)[5], flat


mask, flat = make_mask(frame, rays)
mask, flat = jax.device_put(mask), jax.device_put(flat)


def mk_prefilter(n_):
    def f(frame, flat):
        centers_c, thresh2 = pipe._prefilter_tables(frame)

        def body(i, acc):
            fl = flat + jnp.float32(i) * 1e-12

            def pre_body(c_pts):
                return pipe._prefilter_chunk(frame, c_pts, centers_c, thresh2)

            msk = jax.lax.map(pre_body, fl.reshape(-1, cp, 3)).reshape(n)
            return acc + jnp.sum(msk)
        return jax.lax.fori_loop(0, n_, body, jnp.int32(0))
    return f


def mk_nonzero(n_):
    def f(mask):
        def body(i, acc):
            mk = mask & (i < 10**8)
            (idx,) = jnp.nonzero(mk, size=m, fill_value=n)
            return acc + idx[0] + idx[-1]
        return jax.lax.fori_loop(0, n_, body, jnp.int32(0))
    return f


def stream_reconstruct(mk):
    """mask (n,) -> (ray_idx (m,), s_idx (m,), valid (m,)) without nonzero."""
    m2d = mk.reshape(N_RAYS, S)
    counts = jnp.sum(m2d, axis=1, dtype=jnp.int32)
    ends = jnp.cumsum(counts)
    total = ends[-1]
    starts = jnp.minimum(ends - counts, m)
    # per-ray sample bitmask, two uint32 halves (bit j of half h = sample
    # 32*h + j survives)
    w = (m2d.astype(jnp.uint32) << jnp.arange(S, dtype=jnp.uint32)[None, :] % 32)
    lo = jnp.sum(jnp.where(jnp.arange(S) < 32, w, 0), axis=1, dtype=jnp.uint32)
    hi = jnp.sum(jnp.where(jnp.arange(S) >= 32, w, 0), axis=1, dtype=jnp.uint32)
    # owner ray of each stream slot: #starts <= j (last ray started) - 1
    marker = jnp.zeros((m,), jnp.int32).at[starts].add(
        jnp.ones((N_RAYS,), jnp.int32), mode="drop",
        indices_are_sorted=True)
    ray_idx = blocked_cumsum_i32(marker[:, None])[:, 0] - 1
    ray_idx = jnp.clip(ray_idx, 0, N_RAYS - 1)
    # gather the per-ray words + start (the real pipeline rides these in the
    # packed table gather; standalone cost shown here)
    tbl = jnp.stack([lo, hi, starts.astype(jnp.uint32)], axis=1)
    g = tbl.at[ray_idx].get(indices_are_sorted=True)
    glo, ghi, gst = g[:, 0], g[:, 1], g[:, 2].astype(jnp.int32)
    k = jnp.arange(m, dtype=jnp.int32) - gst  # k-th survivor of the ray
    pc_lo = jax.lax.population_count(glo).astype(jnp.int32)
    use_hi = k >= pc_lo
    word = jnp.where(use_hi, ghi, glo)
    kk = jnp.where(use_hi, k - pc_lo, k)
    pos = jnp.where(use_hi, jnp.int32(32), jnp.int32(0))
    for b in (16, 8, 4, 2, 1):
        lowmask = (jnp.uint32(1) << b) - jnp.uint32(1)
        c = jax.lax.population_count(word & lowmask).astype(jnp.int32)
        go = kk >= c
        kk = jnp.where(go, kk - c, kk)
        pos = jnp.where(go, pos + b, pos)
        word = jnp.where(go, word >> b, word)
    valid = jnp.arange(m, dtype=jnp.int32) < jnp.minimum(total, m)
    return ray_idx, jnp.clip(pos, 0, S - 1), valid


def mk_stream(n_):
    def f(mask):
        def body(i, acc):
            mk = mask & (i < 10**8)
            ray_idx, s_idx, valid = stream_reconstruct(mk)
            return acc + ray_idx[-1] + jnp.sum(jnp.where(valid, s_idx, 0))
        return jax.lax.fori_loop(0, n_, body, jnp.int32(0))
    return f


# correctness first (host, small equivalence on the real mask)
ridx, sidx, valid = jax.jit(stream_reconstruct)(mask)
(idx_ref,) = jnp.nonzero(np.asarray(mask), size=m, fill_value=n)
vref = np.asarray(idx_ref) < n
ridx, sidx, valid = np.asarray(ridx), np.asarray(sidx), np.asarray(valid)
assert (valid == vref).all(), "valid mismatch"
nz = np.asarray(idx_ref)[vref]
assert (ridx[vref] == nz // S).all(), "ray_idx mismatch"
assert (sidx[vref] == nz % S).all(), "s_idx mismatch"
print(f"reconstruction exact on {vref.sum()} active slots", flush=True)

for name, mk, args in [
    ("prefilter       ", mk_prefilter, (frame, flat)),
    ("nonzero(size=m) ", mk_nonzero, (mask,)),
    ("stream-reconstr ", mk_stream, (mask,)),
]:
    dt, t1 = per_iter(mk, *args)
    print(f"{name} {dt*1e3:8.2f} ms/iter (single {t1*1e3:6.1f})", flush=True)
