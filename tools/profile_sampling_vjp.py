import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transhuman_tpu.ops.sampling import _lerp, _sample_taps, sample_feature_map
rng = np.random.default_rng(0)
V,H,W,C = 3,512,512,384
N = 153600
feat = jnp.asarray(rng.standard_normal((V,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
uv = jnp.asarray(np.stack([rng.uniform(0,1024,(V,N)), rng.uniform(0,1024,(V,N))],-1).astype(np.float32))
g = jnp.asarray(rng.standard_normal((V,N,C)).astype(np.float32)).astype(jnp.bfloat16)

def loss_raw(f, uv, g):
    p, wx, wy, _, _ = _sample_taps(f, uv, (1024,1024))
    return ( _lerp(p, wx, wy) * g ).astype(jnp.float32).sum()
def loss_new(f, uv, g):
    return (sample_feature_map(f, uv, (1024,1024)) * g).astype(jnp.float32).sum()
graw = jax.jit(jax.grad(loss_raw))
gnew = jax.jit(jax.grad(loss_new))
jax.block_until_ready(graw(feat, uv, g)); jax.block_until_ready(gnew(feat, uv, g))
for name, fn in [("xla-scatter bwd", graw), ("segsum bwd    ", gnew)]*2:
    t0=time.perf_counter()
    for _ in range(3): _ = float(jnp.asarray(fn(feat, uv, g))[0,0,0,0])
    print(name, (time.perf_counter()-t0)/3, flush=True)
