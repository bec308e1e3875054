"""Benchmark: full-frame inference throughput (rays/sec/chip).

Mirrors the reference's eval workload (render_fast, if_clight_renderer.py:
429-484): a 512x512 novel-view render — here 65,536 body-region rays x 64
stratified samples through the full pipeline (3-view ResNet encode, SMPL
painting, TransHE, chunked DPaRF/NeRF queries with SMPL-distance culling,
alpha compositing).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput number (BASELINE.md);
REFERENCE_RAYS_PER_SEC below is a pinned engineering estimate of the CUDA
reference on one V100 (69k valid rays/frame at ~1.4 s/frame for the
render_fast path). Replace with a measured number when one exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: first run pays the (slow, tunneled) XLA:TPU
# compile; subsequent runs start in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_RAYS_PER_SEC = 50_000.0

N_RAYS = 65_536
N_SAMPLES = 64
CHUNK_RAYS = 512  # 32768 points/chunk, the reference chunk size; fastest measured
IMAGE_HW = (512, 512)


def main():
    from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup

    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=IMAGE_HW,
        n_verts=6890,
        n_clusters=300,
        n_samples=N_SAMPLES,
        chunk_rays=CHUNK_RAYS,
        dtype=jnp.bfloat16,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(N_RAYS)

    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(jnp.asarray, rays)

    render = jax.jit(lambda p, f, r: pipe.render_frame(p, f, r))

    # warmup / compile; NOTE a scalar host readback per iteration — through
    # the axon tunnel, block_until_ready alone does not reliably drain the
    # dispatch queue, which silently overstates throughput
    out = render(params, frame, rays)
    float(jnp.sum(out["acc_map"]))

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = render(params, frame, rays)
        float(jnp.sum(out["acc_map"]))
    dt = (time.perf_counter() - t0) / n_iters

    rays_per_sec = N_RAYS / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_512x512_render",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
