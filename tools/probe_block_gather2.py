"""Chunked scalar-prefetch blocked gather at REAL scale (the FULL-STORY
revisit): probe G died at M=1M only because the whole id vector staged in
1 MB SMEM; here each pallas_call sees <=131K ids (512 KB) and a lax.map
runs the chunks.  Measures raw blocked row-gather economics vs XLA take at
bench scale (M = 2.36M point-views, src = V*Hf*Wf x C bf16) for G points
per grid step, G in {8, 32}.  If this wins by ~2x, a bilinear 2-block
variant replaces the decode's 2x2 slice gather.

MEASURED (v5e, 2026-08-17): blocked G=8 192.8 ms / G=32 177.0 ms
(75-82 GB/s fetched), XLA take 50.5 ms at the same M.  Per-block-DMA
issue cost ~75 ns — the SAME descriptor floor XLA's gather pays per row.
NEGATIVE, final: no Pallas formulation beats the issue-rate bound; the
decode keeps XLA's 2x2-slice gather.  Do not revisit (int8 doesn't help —
traffic isn't the binding constraint, descriptor issue rate is).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, C = 3 * 128 * 128, 384  # V*Hf*Wf rows
M = 2_359_296  # 786432 points x 3 views
MC = 131_072  # ids per pallas_call (512 KB SMEM)
BLK = 8  # block rows (f32 tile granularity; bf16 may pad to 16)


def make_block_gather(G):
    def _kg(ids_ref, *refs):
        blocks = refs[:G]
        out_ref = refs[G]
        i = pl.program_id(0)
        outs = []
        for g in range(G):
            r = ids_ref[i * G + g] % BLK
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1) == r
            ).astype(jnp.float32)
            row = jnp.dot(oh, blocks[g][:].astype(jnp.float32))  # (1, C)
            outs.append(row[0])
        out_ref[:] = jnp.stack(outs).astype(out_ref.dtype)

    def one_chunk(src, ids_c):
        specs = [
            pl.BlockSpec((BLK, C), lambda i, ids, g=g: (ids[i * G + g] // BLK, 0))
            for g in range(G)
        ]
        return pl.pallas_call(
            functools.partial(_kg),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(MC // G,),
                in_specs=specs,
                out_specs=pl.BlockSpec((G, C), lambda i, ids: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((MC, C), jnp.bfloat16),
        )(ids_c, *([src] * G))

    def full(src, ids):
        return jax.lax.map(
            lambda idc: one_chunk(src, idc), ids.reshape(-1, MC)
        ).reshape(M, C)

    return full


def t(f, *a, n=4):
    r = f(*a)
    float(np.asarray(r.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
        float(np.asarray(r.ravel()[0]))
    return (time.perf_counter() - t0) / n


if __name__ == "__main__":
    src = jax.jit(lambda k: jax.random.normal(k, (R, C), jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    ids = jax.jit(lambda k: jax.random.randint(k, (M,), 0, R, jnp.int32))(
        jax.random.PRNGKey(1)
    )

    for G in (8, 32):
        name = f"blocked G={G:2d}"
        try:
            fn = jax.jit(make_block_gather(G))
            out = fn(src, ids)
            ref = jnp.take(src, ids[:4096], axis=0)
            err = float(jnp.max(jnp.abs(
                out[:4096].astype(jnp.float32) - ref.astype(jnp.float32))))
            dt = t(fn, src, ids)
            gb = M * BLK * C * 2 / 1e9
            print(f"{name}: OK {dt*1e3:8.2f} ms  ({gb/dt:6.0f} GB/s fetched)"
                  f"  err={err:.1e}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    xt = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    print(f"XLA take     {t(xt, src, ids)*1e3:8.2f} ms", flush=True)
