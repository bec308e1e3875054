import time, jax, jax.numpy as jnp, numpy as np
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.ops.knn import min_dist
from transhuman_tpu.ops.sampling import project_points, sample_feature_map
from transhuman_tpu.render.volume import sample_along_rays

model, pipe, frame, _, cluster = synthetic_setup(image_hw=(512,512), n_verts=6890, n_clusters=300, n_samples=64, chunk_rays=512, dtype=jnp.bfloat16)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
frame = jax.tree.map(jnp.asarray, frame)
rays = jax.tree.map(jnp.asarray, synthetic_rays(65536))

def t(f, *a, n=5):
    r = jax.block_until_ready(f(*a))
    t0=time.perf_counter()
    for _ in range(n): r = jax.block_until_ready(f(*a))
    return (time.perf_counter()-t0)/n

prologue = jax.jit(lambda p, f: pipe.prologue(p, f))
print("prologue    ", t(prologue, params, frame), flush=True)
pro = prologue(params, frame)

pts, z = sample_along_rays(rays.ray_o[:512], rays.ray_d[:512], rays.near[:512], rays.far[:512], 64)
flat = jnp.asarray(pts.reshape(-1,3))
cull = jax.jit(lambda p: min_dist((p - frame.Th) @ frame.Rh, frame.tar_verts_smpl) < 0.1)
print("cull/chunk  ", t(cull, flat), flush=True)
proj = jax.jit(lambda p: project_points(p, frame.K, frame.R, frame.T)[0])
uv = proj(flat)
print("proj/chunk  ", t(proj, flat), flush=True)
samp = jax.jit(lambda u: sample_feature_map(pro.pixel_map, u, (512,512)))
pf = samp(uv)
print("sample/chunk", t(samp, uv), flush=True)
vde = jnp.zeros((32768,27))
query = jax.jit(lambda pts_s, pfeat: model.apply(params, pts_s, pro.centers, pro.rot, pro.tokens, pfeat, vde, None, method="query"))
pts_s = (flat - frame.Th) @ frame.Rh
print("query/chunk ", t(query, pts_s, pf), flush=True)
render = jax.jit(lambda p,f,r: pipe.render_frame(p,f,r))
print("render_frame", t(render, params, frame, rays, n=3), flush=True)
