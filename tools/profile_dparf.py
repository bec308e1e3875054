import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transhuman_tpu.ops import knn as K
from transhuman_tpu.models.embedder import embed_dparf

rng = np.random.default_rng(0)
N = 32768
pts = jnp.asarray(rng.standard_normal((N,3)).astype(np.float32)*0.4)
centers = jnp.asarray(rng.standard_normal((300,3)).astype(np.float32)*0.4)
rot = jnp.asarray(rng.standard_normal((300,3,3)).astype(np.float32))
tokens = jnp.asarray(rng.standard_normal((3,300,192)).astype(np.float32)).astype(jnp.bfloat16)
chunks = jnp.tile(pts[None], (32,1,1))

def _force(r):
    # through the axon tunnel block_until_ready may not drain the dispatch
    # queue; fetch one scalar to the host to force completion
    import numpy as _np
    leaf = jax.tree.leaves(r)[0]
    return float(_np.asarray(leaf).ravel()[0])


def t(f, *a, n=4):
    _force(f(*a)); t0=time.perf_counter()
    for _ in range(n): _force(f(*a))
    return (time.perf_counter()-t0)/n

@jax.jit
def s_dist(ch):
    def body(c):
        return K.pairwise_dist2(c, centers).sum(1)
    return jax.lax.map(body, ch)
print("dist only      ", t(s_dist, chunks), flush=True)

@jax.jit
def s_weights(ch):
    def body(c):
        d2 = K.pairwise_dist2(c, centers)
        w, d, _, wk = K.dparf_dense_weights(d2, 7, 0.5)
        return w.sum(1) + d.sum(1) + wk.sum(1)
    return jax.lax.map(body, ch)
print("dist+weights   ", t(s_weights, chunks), flush=True)

@jax.jit
def s_tok(ch):
    def body(c):
        d2 = K.pairwise_dist2(c, centers)
        w, d, _, _ = K.dparf_dense_weights(d2, 7, 0.5)
        tok = jnp.einsum("nc,vcd->vnd", w, tokens)
        return tok.sum(axis=(0,2))
    return jax.lax.map(body, ch)
print("dist+w+tokmm   ", t(s_tok, chunks), flush=True)

@jax.jit
def s_gather(ch):
    def body(c):
        d2 = K.pairwise_dist2(c, centers)
        w, d, _, _ = K.dparf_dense_weights(d2, 7, 0.5)
        idx = K.topk_min(d2, 7)[1]  # the row-gather variant being measured
        ck = jnp.take(centers, idx, axis=0)
        rk = jnp.take(rot, idx, axis=0)
        return ck.sum(axis=(1,2)) + rk.sum(axis=(1,2,3))
    return jax.lax.map(body, ch)
print("dist+w+gathers ", t(s_gather, chunks), flush=True)

@jax.jit
def s_pe(ch):
    def body(c):
        d2 = K.pairwise_dist2(c, centers)
        w, dist, _, wk = K.dparf_dense_weights(d2, 7, 0.5)
        idx = K.topk_min(d2, 7)[1]  # the row-gather variant being measured
        ck = jnp.take(centers, idx, axis=0)
        rk = jnp.take(rot, idx, axis=0)
        rel = c[:,None,:] - ck
        local = jnp.einsum("nki,nkij->nkj", rel, rk)
        pe = embed_dparf(local, 10)
        return jnp.einsum("nk,nkd->nd", wk, pe).sum(1)
    return jax.lax.map(body, ch)
print("dist+w+g+pe    ", t(s_pe, chunks), flush=True)
