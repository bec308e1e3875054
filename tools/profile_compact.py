"""A/B: plain chunked render_frame vs static-capacity compaction (+two-stage
cull) on the real chip at reference scale.  One process, forced readback per
iteration (tunnel dispatch-queue honesty — see CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_compact.py [plain compact50 ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.render.pipeline import RenderPipeline  # noqa: E402
from transhuman_tpu.testing import (  # noqa: E402
    init_params,
    synthetic_rays,
    synthetic_setup,
)

N_RAYS, N_SAMPLES, CHUNK = 16384, 64, 512
variants = sys.argv[1:] or ["plain", "compact50", "compact375", "compact25"]

model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512, 512), n_verts=6890, n_clusters=300,
    n_samples=N_SAMPLES, chunk_rays=CHUNK, dtype=jnp.bfloat16,
)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
rays = synthetic_rays(N_RAYS)
frame = jax.tree.map(jnp.asarray, frame)
rays = jax.tree.map(jnp.asarray, rays)


def t(f, *a, n=5):
    out = f(*a)
    float(jnp.sum(out["acc_map"]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
        float(jnp.sum(out["acc_map"]))
    return (time.perf_counter() - t0) / n, out


def clone(ratio):
    p = RenderPipeline.__new__(RenderPipeline)
    p.__dict__.update(pipe.__dict__)
    p.compact_ratio = ratio
    return p


RATIOS = {"compact50": 0.5, "compact375": 0.375, "compact25": 0.25}

if "plain" in variants:
    dt, out = t(jax.jit(pipe.render_frame), params, frame, rays)
    print(f"plain      {dt*1e3:8.1f} ms  {N_RAYS/dt:9,.0f} rays/s", flush=True)

for name in variants:
    if name not in RATIOS:
        continue
    c = clone(RATIOS[name])
    dt, out = t(jax.jit(c.render_frame), params, frame, rays)
    print(
        f"{name:10s} {dt*1e3:8.1f} ms  {N_RAYS/dt:9,.0f} rays/s  "
        f"overflow={int(out['overflow'][0])}",
        flush=True,
    )

if "parts" in variants:
    # component breakdown of the compact path at ratio 0.375
    import jax.numpy as jnp
    from transhuman_tpu.render.volume import composite, sample_along_rays

    c = clone(0.375)

    def tt(f, *a, n=5):
        r = f(*a)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
            float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        return (time.perf_counter() - t0) / n

    @jax.jit
    def prologue_only(params, frame):
        p = c.prologue(params, frame)
        return p.tokens

    print(f"prologue   {tt(prologue_only, params, frame)*1e3:8.1f} ms", flush=True)

    cp = c.chunk_rays * c.n_samples

    @jax.jit
    def prefilter_compact(params, frame, rays):
        c.prologue(params, frame)
        pts, z = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far, c.n_samples)
        flat = pts.reshape(-1, 3)
        idx, _, _, _, _, _ = c._compact_plan(
            frame, flat, jnp.ones((flat.shape[0],), bool), cp
        )
        return idx

    print(f"pro+pre+cp {tt(prefilter_compact, params, frame, rays)*1e3:8.1f} ms", flush=True)

    @jax.jit
    def sample_and_composite(rays):
        pts, z = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far, c.n_samples)
        raw = jnp.zeros(pts.shape[:2] + (4,), jnp.float32)
        out = composite(raw, z, rays.ray_d, False)
        return out["rgb_map"]

    print(f"smp+compos {tt(sample_and_composite, rays)*1e3:8.1f} ms", flush=True)

if "overlap" in variants:
    # Does the pixel-feature gather overlap with the rest of the decode, or
    # serialize (scalar-core descriptor issue)?  Compare the full compact
    # render against one whose sampler is a gather-free dummy of identical
    # output shape; if full ≈ dummy + standalone-gather, it's serial.
    import jax.numpy as jnp

    import transhuman_tpu.render.pipeline as P
    from transhuman_tpu.ops.sampling import sample_feature_map as _orig

    c = clone(0.375)
    dt, _ = t(jax.jit(c.render_frame), params, frame, rays)
    print(f"full(.375)    {dt*1e3:8.1f} ms", flush=True)

    def _dummy(feat, uv, ishape):
        base = feat[:, 0, 0, :][:, None, :]
        return base * (jnp.sum(uv, axis=-1, keepdims=True) * 0 + 1).astype(feat.dtype)

    P.sample_feature_map = _dummy
    try:
        dt2, _ = t(jax.jit(c.render_frame), params, frame, rays)
        print(f"no-gather     {dt2*1e3:8.1f} ms", flush=True)
    finally:
        P.sample_feature_map = _orig

# decode chunk-size sweep at a fixed ratio ("chunk1024", "chunk2048", ...)
for name in variants:
    if not name.startswith("chunk"):
        continue
    cr = int(name[5:])
    c = clone(0.375)
    c.chunk_rays = cr
    dt, out = t(jax.jit(c.render_frame), params, frame, rays)
    print(
        f"r.375 cr={cr:<5d} {dt*1e3:8.1f} ms  {N_RAYS/dt:9,.0f} rays/s  "
        f"overflow={int(out['overflow'][0])}",
        flush=True,
    )
