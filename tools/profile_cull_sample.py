import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transhuman_tpu.ops.knn import min_dist
from transhuman_tpu.ops.sampling import project_points, sample_feature_map

rng = np.random.default_rng(0)
N = 32768
pts = jnp.asarray(rng.standard_normal((N,3)).astype(np.float32)*0.4)
verts = jnp.asarray(rng.standard_normal((6890,3)).astype(np.float32)*0.4)
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

for rb in (2048, 1024, 512, 256, 128):
    f = jax.jit(lambda ch, rb=rb: jax.lax.map(lambda c: min_dist(c, verts, ref_block=rb) < 0.1, ch))
    print(f"cull rb={rb:5d}", t(f, chunks), flush=True)

pm = jnp.asarray(rng.standard_normal((3,512,512,384)).astype(np.float32)).astype(jnp.bfloat16)
K = jnp.tile(jnp.asarray([[120.,0,256],[0,120.,256],[0,0,1]])[None], (3,1,1))
R = jnp.tile(jnp.eye(3)[None], (3,1,1))
T = jnp.tile(jnp.asarray([0,0,2.5])[None], (3,1))
@jax.jit
def samp(ch, pm):
    def body(c):
        uv, _ = project_points(c, K, R, T)
        return sample_feature_map(pm, uv, (512,512)).sum(axis=(0,2))
    return jax.lax.map(body, ch)
print("sample bf16   ", t(samp, chunks, pm), flush=True)
print("sample f32    ", t(samp, chunks, pm.astype(jnp.float32)), flush=True)
