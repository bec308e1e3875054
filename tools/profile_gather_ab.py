"""A/B the pixel-feature gather (the inference wall, ~140 ms / 1.05M pts).

Variants (all numerically equal taps + lerp, 20% active mask like the real
cull, masked-uv -> texel 0 dedup semantics):

  base       current ops/sampling.sample_feature_map (2x2xC slice gather)
  quad       "quad layout": map pre-shifted to (V*H*W, 4C); ONE contiguous
             row per point-view instead of a 2-row 2x2 slice
  seq        quad gather with sequential ids (engine ceiling / locality probe)
  sorted     quad gather with active-first sorted ids (locality probe)
  pallas     Pallas DMA gather on the quad layout that SKIPS masked points
             (XLA must fetch all N; the kernel only fetches the ~20% active)

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_gather_ab.py base quad pallas
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.ops.sampling import sample_feature_map  # noqa: E402

V, C = 3, 384
H = W = int(os.environ.get("GAB_HW", 512))
N = int(os.environ.get("GAB_N", 1_048_576))  # 16384 rays x 64 samples
ACTIVE = 0.2

variants = sys.argv[1:] or ["base", "quad", "pallas"]

rng = np.random.default_rng(0)
# generate the map on-device: a 0.6GB host->device transfer through the
# axon tunnel costs minutes
pm = jax.jit(
    lambda k: jax.random.normal(k, (V, H, W, C), jnp.bfloat16)
)(jax.random.PRNGKey(0))
mask_np = rng.random(N) < ACTIVE
uv_np = np.stack(
    [rng.uniform(1, W - 2, N), rng.uniform(1, H - 2, N)], -1
).astype(np.float32)
uv_np[~mask_np] = 0.0  # the masked-uv dedup the pipeline applies
uv = jnp.asarray(np.broadcast_to(uv_np, (V, N, 2)))
mask = jnp.asarray(mask_np)


def _force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=5):
    _force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        _force(f(*a))
    return (time.perf_counter() - t0) / n


@jax.jit
def build_quad(pm):
    """(V,H,W,C) -> (V*H*W, 4C): [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)].
    Edge rows/cols replicate (never read: ids are clamped to H-2/W-2)."""
    sx = jnp.concatenate([pm[:, :, 1:], pm[:, :, -1:]], axis=2)
    sy = jnp.concatenate([pm[:, 1:], pm[:, -1:]], axis=1)
    sxy = jnp.concatenate([sx[:, 1:], sx[:, -1:]], axis=1)
    return jnp.concatenate([pm, sx, sy, sxy], axis=-1).reshape(V * H * W, 4 * C)


@jax.jit
def prep_ids(uv, mask):
    """uv -> (flat ids (V,N) int32 [-1 masked], w4 (V,N,4) f32)."""
    fx = jnp.clip(uv[..., 0], 0.0, W - 1)
    fy = jnp.clip(uv[..., 1], 0.0, H - 1)
    x0 = jnp.minimum(jnp.floor(fx).astype(jnp.int32), W - 2)
    y0 = jnp.minimum(jnp.floor(fy).astype(jnp.int32), H - 2)
    wx = fx - x0
    wy = fy - y0
    w4 = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], -1
    )
    voff = (jnp.arange(V, dtype=jnp.int32) * (H * W))[:, None]
    ids = jnp.where(mask[None, :], voff + y0 * W + x0, -1)
    return ids, jnp.where(mask[None, :, None], w4, 0.0)


CHUNK = 3 * 32768  # point-views per chunk, like the pipeline's lax.map


def _quad_lerp(quad, idx, w):
    """idx (M,) int32 >=0; w (M,4) -> (M, C) bf16 lerped rows."""
    rows = jnp.take(quad, idx, axis=0)  # (M, 4C) bf16
    wb = w.astype(rows.dtype)
    return (
        rows[:, 0 * C:1 * C] * wb[:, 0:1]
        + rows[:, 1 * C:2 * C] * wb[:, 1:2]
        + rows[:, 2 * C:3 * C] * wb[:, 2:3]
        + rows[:, 3 * C:4 * C] * wb[:, 3:4]
    )


@jax.jit
def quad_xla(quad, ids, w4):
    """Chunked gather+lerp (the shape the render pipeline would use)."""
    idx = jnp.maximum(ids.reshape(-1, CHUNK), 0)
    w = w4.reshape(-1, CHUNK, 4)

    def body(c):
        return _quad_lerp(quad, c[0], c[1]).astype(jnp.float32).sum(axis=1)

    return jax.lax.map(body, (idx, w))


# ---- pallas DMA gather -----------------------------------------------------
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _gather_kernel(ids_ref, w_ref, quad_ref, out_ref, rows, sem):
    tile = ids_ref.shape[0]

    def copy(k):
        idk = ids_ref[k]
        return pltpu.make_async_copy(quad_ref.at[idk], rows.at[k], sem)

    def issue(k, _):
        jax.lax.cond(ids_ref[k] >= 0, lambda: copy(k).start(), lambda: None)
        return 0

    jax.lax.fori_loop(0, tile, issue, 0)

    def drain(k, _):
        jax.lax.cond(ids_ref[k] >= 0, lambda: copy(k).wait(), lambda: None)
        return 0

    jax.lax.fori_loop(0, tile, drain, 0)

    q = rows[:]
    w = w_ref[:].astype(jnp.float32)
    acc = (
        q[:, 0 * C:1 * C].astype(jnp.float32) * w[:, 0:1]
        + q[:, 1 * C:2 * C].astype(jnp.float32) * w[:, 1:2]
        + q[:, 2 * C:3 * C].astype(jnp.float32) * w[:, 2:3]
        + q[:, 3 * C:4 * C].astype(jnp.float32) * w[:, 3:4]
    )
    # masked rows hold stale garbage; their weights are all 0 -> 0*inf NaN
    # is possible, so select explicitly on sum(w)==0
    valid = (w[:, 0:1] + w[:, 1:2] + w[:, 2:3] + w[:, 3:4]) > 1e-6
    out_ref[:] = jnp.where(valid, acc, 0.0).astype(out_ref.dtype)


def pallas_gather(quad, ids, w4, tile=512):
    vn = ids.size
    return pl.pallas_call(
        _gather_kernel,
        interpret=jax.devices()[0].platform == "cpu",
        grid=(vn // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vn, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tile, 4 * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(ids.reshape(-1), w4.reshape(-1, 4), quad)



# ---- scalar-prefetch slice gather ------------------------------------------
# The pixel map is flattened to 1-D; each point-view's 2x2xC slice is two
# contiguous 2C-element row pairs (top: rows (y0, x0..x0+1); bottom: +W*C).
# One grid step fetches G slices via 2G Element-indexed 1-D in_specs whose
# index_maps read prefetched scalar offsets — Pallas's pipeline
# double-buffers the DMAs like XLA's gather but with 2G in flight per step
# and the bilinear lerp fused in-kernel.  (2C = 768 elements satisfies the
# Mosaic 128-lane divisibility rule; a (2,2,C) 3-D block does not.)
# Scalar-prefetch operands live in SMEM, so the M point-views are processed
# in chunks of SP_CHUNK via an outer lax.map.
G_SLICES = 8
SP_CHUNK = int(os.environ.get("GAB_SPCHUNK", 32768))


def _sp_kernel(offs_ref, w_ref, *refs):
    pairs = refs[: 2 * G_SLICES]
    out_ref = refs[2 * G_SLICES]
    w = w_ref[:].astype(jnp.float32)  # (G, 4)
    outs = []
    for g in range(G_SLICES):
        top = pairs[2 * g][:].reshape(2, C).astype(jnp.float32)
        bot = pairs[2 * g + 1][:].reshape(2, C).astype(jnp.float32)
        outs.append(
            top[0] * w[g, 0] + top[1] * w[g, 1]
            + bot[0] * w[g, 2] + bot[1] * w[g, 3]
        )
    out_ref[:] = jnp.stack(outs).astype(out_ref.dtype)


def _sp_call(pm_flat, offs, w4):
    """offs (K,) int32 element offsets of the top row pair; w4 (K, 4)."""
    k = offs.shape[0]
    grid = (k // G_SLICES,)
    row = W * C

    def pair_spec(g, extra):
        return pl.BlockSpec(
            (pl.Element(2 * C),),
            lambda i, offs, g=g, extra=extra: (offs[i * G_SLICES + g] + extra,),
        )

    specs = []
    for g in range(G_SLICES):
        specs.append(pair_spec(g, 0))
        specs.append(pair_spec(g, row))
    return pl.pallas_call(
        _sp_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((G_SLICES, 4), lambda i, offs: (i, 0))]
            + specs,
            out_specs=pl.BlockSpec((G_SLICES, C), lambda i, offs: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((k, C), jnp.bfloat16),
        interpret=jax.devices()[0].platform == "cpu",
    )(offs, w4, *([pm_flat] * (2 * G_SLICES)))


def sprefetch_gather(pm_flat, offs, w4):
    def body(c):
        return _sp_call(pm_flat, c[0], c[1])

    return jax.lax.map(
        body, (offs.reshape(-1, SP_CHUNK), w4.reshape(-1, SP_CHUNK, 4))
    ).reshape(offs.shape[0], C)


def run_sprefetch():
    pm_flat = pm.reshape(-1)
    fx = jnp.clip(uv[..., 0], 0.0, W - 1)
    fy = jnp.clip(uv[..., 1], 0.0, H - 1)
    x0 = jnp.minimum(jnp.floor(fx).astype(jnp.int32), W - 2)
    y0 = jnp.minimum(jnp.floor(fy).astype(jnp.int32), H - 2)
    wx, wy = fx - x0, fy - y0
    w4 = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], -1
    )
    voff = (jnp.arange(V, dtype=jnp.int32) * (H * W))[:, None]
    offs = ((voff + y0 * W + x0) * C).reshape(-1)
    w4f = w4.reshape(-1, 4)

    fn = jax.jit(
        lambda pm_flat, offs, w: sprefetch_gather(pm_flat, offs, w)
        .astype(jnp.float32)
        .sum(axis=1)
    )
    try:
        got = np.asarray(fn(pm_flat, offs, w4f))
        # reference: the existing sampler
        ref = np.asarray(
            jax.jit(
                lambda pm, uv: sample_feature_map(pm, uv, (H, W))
                .astype(jnp.float32)
                .sum(axis=2)
            )(pm, uv)
        ).reshape(-1)
        err = float(np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-6))
        print(
            f"sprefetch G={G_SLICES}  {t(fn, pm_flat, offs, w4f)*1e3:8.2f} ms  "
            f"relerr={err:.2e}",
            flush=True,
        )
    except Exception as e:
        print(
            f"sprefetch FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True
        )


def main():
    need_quad = set(variants) & {"quad", "seq", "sorted", "pallas"}
    if need_quad:
        quad = build_quad(pm)
        ids, w4 = prep_ids(uv, mask)
        ids.block_until_ready()

    if "base" in variants:
        @jax.jit
        def base(pm, uv):
            return sample_feature_map(pm, uv, (H, W)).sum(axis=(0, 2))

        print(f"base          {t(base, pm, uv)*1e3:8.2f} ms", flush=True)

    if "quad" in variants:
        print(f"quad build    {t(build_quad, pm)*1e3:8.2f} ms  (per frame)", flush=True)
        print(f"prep ids      {t(prep_ids, uv, mask)*1e3:8.2f} ms", flush=True)
        print(f"quad_xla      {t(quad_xla, quad, ids, w4)*1e3:8.2f} ms", flush=True)

    if "seq" in variants:
        ids_seq = jnp.broadcast_to(
            (jnp.arange(N, dtype=jnp.int32) % (H * W - W))[None], (V, N)
        ).astype(jnp.int32) + 0
        print(f"quad_seq      {t(quad_xla, quad, ids_seq, w4)*1e3:8.2f} ms", flush=True)

    if "sorted" in variants:
        order = np.argsort(~mask_np, kind="stable")
        ids_sorted = jnp.asarray(np.asarray(ids)[:, order])
        w4_sorted = jnp.asarray(np.asarray(w4)[:, order])
        print(f"quad_sorted   {t(quad_xla, quad, ids_sorted, w4_sorted)*1e3:8.2f} ms", flush=True)


    if "pallas" in variants:
        fn = jax.jit(lambda q, i, w: pallas_gather(q, i, w, 512).astype(
            jnp.float32).sum(axis=1))
        try:
            ref = np.asarray(quad_xla(quad, ids, w4)).ravel()  # per point-view
            got = np.asarray(fn(quad, ids, w4)).ravel()
            err = float(
                np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6)
            )
            print(f"pallas t=512  {t(fn, quad, ids, w4)*1e3:8.2f} ms   relerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"pallas t=512  FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)

    if "sprefetch" in variants:
        run_sprefetch()

    if "pallas_sweep" in variants:
        for tile in (256, 1024, 2048):
            fn = jax.jit(
                lambda q, i, w, tile=tile: pallas_gather(q, i, w, tile).sum(axis=(0, 1))
            )
            try:
                print(f"pallas t={tile:4d} {t(fn, quad, ids, w4)*1e3:8.2f} ms", flush=True)
            except Exception as e:
                print(f"pallas t={tile:4d} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
