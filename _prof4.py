import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
rng = np.random.default_rng(0)
H=W=512; C=384; V=3; N=32768
pm = jnp.asarray(rng.standard_normal((V,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
ys = jnp.asarray(rng.integers(0, H-2, (32,V,N)).astype(np.int32))
xs = jnp.asarray(rng.integers(0, W-2, (32,V,N)).astype(np.int32))
def t(f, *a, n=4):
    r = jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r = jax.block_until_ready(f(*a))
    return (time.perf_counter()-t0)/n

dn22 = jax.lax.GatherDimensionNumbers(offset_dims=(1,2,3), collapsed_slice_dims=(), start_index_map=(0,1))
@jax.jit
def g22(pm, ys, xs):
    def body(c):
        y, x = c
        def vg(f, yi, xi):
            return jax.lax.gather(f, jnp.stack([yi,xi],-1), dn22, slice_sizes=(2,2,C), mode="clip")
        p = jax.vmap(vg)(pm, y, x)
        return p.sum(axis=(2,3,4))
    return jax.lax.map(body, (ys, xs))
print("gather 2x2xC   ", t(g22, pm, ys, xs), flush=True)

dn12 = jax.lax.GatherDimensionNumbers(offset_dims=(1,2,3), collapsed_slice_dims=(), start_index_map=(0,1))
@jax.jit
def g12(pm, ys, xs):
    def body(c):
        y, x = c
        def vg(f, yi, xi):
            a = jax.lax.gather(f, jnp.stack([yi,xi],-1), dn12, slice_sizes=(1,2,C), mode="clip")
            b = jax.lax.gather(f, jnp.stack([yi+1,xi],-1), dn12, slice_sizes=(1,2,C), mode="clip")
            return a.sum(axis=(1,2,3)) + b.sum(axis=(1,2,3))
        return jax.vmap(vg)(pm, y, x)
    return jax.lax.map(body, (ys, xs))
print("2x gather 1x2xC", t(g12, pm, ys, xs), flush=True)

pmflat = pm.reshape(V, H*W, C)
@jax.jit
def gtake(pmf, ys, xs):
    def body(c):
        y, x = c
        idx = y*W + x
        out = 0
        for dy in (0,1):
            for dx in (0,1):
                out = out + jnp.take_along_axis(pmf, (idx+dy*W+dx)[...,None], axis=1).sum(-1)
        return out
    return jax.lax.map(body, (ys, xs))
print("4x take 1xC    ", t(gtake, pmflat, ys, xs), flush=True)

# nearest (1 tap) to see per-row floor
@jax.jit
def g1(pmf, ys, xs):
    def body(c):
        y, x = c
        idx = y*W + x
        return jnp.take_along_axis(pmf, idx[...,None], axis=1).sum(-1)
    return jax.lax.map(body, (ys, xs))
print("1x take 1xC    ", t(g1, pmflat, ys, xs), flush=True)

# all-same-address
ys0 = jnp.zeros_like(ys); xs0 = jnp.zeros_like(xs)
print("2x2 same addr  ", t(g22, pm, ys0, xs0), flush=True)
