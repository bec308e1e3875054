"""Probe G: scalar-prefetch gather with STANDARD Blocked(8) dynamic
index_maps (the pallas-guide embedding-lookup pattern) — the pipeline
emitter's own DMAs, no manual make_async_copy / ANY refs (those are broken
in this remote-compile build, see probe_dma_gather2).

out[j] = src[ids[j]] via: fetch the (8, C) block containing row ids[j],
one-hot-select the row in-kernel.  G_PER_STEP points per grid step so the
out block satisfies the (8, 128) tiling rule.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, C = 262144, 384
M = 1_048_576
G = 8  # points per grid step


def _kg(ids_ref, w_ref, *refs):
    blocks = refs[:G]
    out_ref = refs[G]
    i = pl.program_id(0)
    outs = []
    for g in range(G):
        r = ids_ref[i * G + g] % 8
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == r
        ).astype(jnp.float32)
        row = jnp.dot(oh, blocks[g][:].astype(jnp.float32))  # (1, C)
        outs.append(row[0] * w_ref[g, 0])
    out_ref[:] = jnp.stack(outs).astype(out_ref.dtype)


def block_gather(src, ids, w):
    specs = [
        pl.BlockSpec((8, C), lambda i, ids, g=g: (ids[i * G + g] // 8, 0))
        for g in range(G)
    ]
    return pl.pallas_call(
        _kg,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // G,),
            in_specs=[pl.BlockSpec((G, 1), lambda i, ids: (i, 0))] + specs,
            out_specs=pl.BlockSpec((G, C), lambda i, ids: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
    )(ids, w, *([src] * G))


def t(f, *a, n=5):
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
    w = jnp.ones((M, 1), jnp.float32)
    try:
        fn = jax.jit(block_gather)
        out = fn(src, ids, w)
        ref = jnp.take(src, ids[:4096], axis=0)
        err = float(
            jnp.max(
                jnp.abs(out[:4096].astype(jnp.float32) - ref.astype(jnp.float32))
            )
        )
        print(f"G blocked-sp: OK {t(fn, src, ids, w)*1e3:8.2f} ms  err={err:.1e}",
              flush=True)
    except Exception as e:
        print(f"G blocked-sp: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
    xt = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    print(f"XLA take      {t(xt, src, ids)*1e3:8.2f} ms", flush=True)
