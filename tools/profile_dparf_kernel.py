import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transhuman_tpu.experiments.dparf import dparf_fused
from transhuman_tpu.models.heads import dparf_representation

rng = np.random.default_rng(0)
N = 32768
pts = jnp.asarray(rng.standard_normal((N,3)).astype(np.float32)*0.4)
centers = jnp.asarray(rng.standard_normal((300,3)).astype(np.float32)*0.4)
rot = jnp.asarray(rng.standard_normal((300,3,3)).astype(np.float32))
tokens = jnp.asarray(rng.standard_normal((3,300,192)).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def fused32(pts):
    def body(c):
        tok, pe, dist = dparf_fused(c, centers, rot, tokens)
        return tok.sum(axis=(0,2)) + pe.sum(1) + dist.sum(1)
    return jax.lax.map(body, pts)

@jax.jit
def jnp32(pts):
    def body(c):
        rep, _ = dparf_representation(c, centers, rot, tokens)
        return rep.sum(axis=(0,2))
    return jax.lax.map(body, pts)

chunks = jnp.broadcast_to(pts[None], (32, N, 3)).copy() if False else jnp.tile(pts[None], (32,1,1))
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
print("fused x32:", t(fused32, chunks), flush=True)
print("jnp   x32:", t(jnp32, chunks), flush=True)
# correctness on TPU
tok, pe, dist = dparf_fused(pts, centers, rot, tokens)
rep, _ = dparf_representation(pts, centers, rot, tokens)
print("tok maxdiff", float(jnp.abs(tok.astype(jnp.float32)-rep[...,:192]).max()))
print("pe maxdiff", float(jnp.abs(pe - rep[0,:,192:]).max()))
