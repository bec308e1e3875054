"""Stage ablation profile: per-stage device time with one dispatch per stage
(big tensors passed as args; 32 chunks of 32768 pts scanned inside each jit)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.ops.knn import min_dist, pairwise_dist2
from transhuman_tpu.ops.sampling import project_points, sample_feature_map
from transhuman_tpu.render.volume import sample_along_rays
from transhuman_tpu.models.heads import dparf_representation

DT = jnp.bfloat16
model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=64,
    chunk_rays=512, dtype=DT)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
frame = jax.tree.map(jnp.asarray, frame)
rays = jax.tree.map(jnp.asarray, synthetic_rays(16384))

pro = jax.jit(pipe.prologue)(params, frame)
jax.block_until_ready(pro)

pts, z = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far, 64)
chunks = pts.reshape(32, 32768, 3)  # 32 chunks


def _force(r):
    # through the axon tunnel block_until_ready may not drain the dispatch
    # queue; fetch one scalar to the host to force completion
    import numpy as _np
    leaf = jax.tree.leaves(r)[0]
    return float(_np.asarray(leaf).ravel()[0])


def t(f, *a, n=4):
    _force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        _force(f(*a))
    return (time.perf_counter() - t0) / n


@jax.jit
def stage_cull(chunks, verts, Rh, Th):
    def body(c):
        return min_dist((c - Th) @ Rh, verts) < 0.1
    return jax.lax.map(body, chunks)

print("cull x32     ", t(stage_cull, chunks, frame.tar_verts_smpl, frame.Rh, frame.Th), flush=True)


@jax.jit
def stage_sample(chunks, pixel_map, K, R, T):
    def body(c):
        uv, _ = project_points(c, K, R, T)
        return sample_feature_map(pixel_map, uv, (512, 512)).sum(axis=(0, 2))
    return jax.lax.map(body, chunks)

print("proj+sample32", t(stage_sample, chunks, pro.pixel_map, frame.K, frame.R, frame.T), flush=True)


@jax.jit
def stage_dparf(chunks, centers, rot, tokens, Rh, Th):
    def body(c):
        rep, _ = dparf_representation((c - Th) @ Rh, centers, rot, tokens)
        return rep.sum(axis=(0, 2))
    return jax.lax.map(body, chunks)

print("dparf x32    ", t(stage_dparf, chunks, pro.centers, pro.rot, pro.tokens, frame.Rh, frame.Th), flush=True)


@jax.jit
def stage_dist_topk(chunks, centers, Rh, Th):
    def body(c):
        d2 = pairwise_dist2((c - Th) @ Rh, centers)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        nt, idx = jax.lax.top_k(-d, 7)
        return nt.sum(1) + idx.sum(1)
    return jax.lax.map(body, chunks)

print("dist+topk x32", t(stage_dist_topk, chunks, pro.centers, frame.Rh, frame.Th), flush=True)


@jax.jit
def stage_heads(chunks, centers, rot, tokens, pixel_feat, vde, Rh, Th):
    def body(c):
        return model.apply(params, (c - Th) @ Rh, centers, rot, tokens,
                           pixel_feat, vde, None, method="query")
    return jax.lax.map(body, chunks)

pf = jnp.zeros((3, 32768, 384), DT)
vde = jnp.zeros((32768, 27), DT)
print("query x32    ", t(stage_heads, chunks, pro.centers, pro.rot, pro.tokens, pf, vde, frame.Rh, frame.Th), flush=True)

render = jax.jit(pipe.render_frame)
print("render 16384r", t(render, params, frame, rays, n=3), flush=True)
