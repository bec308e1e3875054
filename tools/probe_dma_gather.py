"""Bisect why dynamically-indexed row DMA crashes this Mosaic build.

Ladder of minimal kernels, each try/except'd: (A) one synchronous
dynamically-indexed row copy per loop step; (B) start-all/drain-all
double-buffered; (C) no-loop single row per grid step via scalar prefetch.
If A already crashes, dynamic-index DMA gather is off the table on this
build (documented in CLAUDE.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, C = 262144, 384  # source rows
M = 1_048_576  # gathers
TILE = 1024

src = jax.jit(lambda k: jax.random.normal(k, (R, C), jnp.bfloat16))(
    jax.random.PRNGKey(0)
)
ids = jax.jit(
    lambda k: jax.random.randint(k, (M,), 0, R, jnp.int32)
)(jax.random.PRNGKey(1))


def force(r):
    return float(np.asarray(r.ravel()[0]))


def t(f, *a, n=5):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        force(f(*a))
    return (time.perf_counter() - t0) / n


def attempt(name, fn):
    try:
        g = jax.jit(fn)
        out = g(src, ids)
        ref = jnp.take(src, ids[:TILE], axis=0)
        err = float(
            jnp.max(jnp.abs(out[:TILE].astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"{name}: OK  {t(g, src, ids)*1e3:8.2f} ms  err={err:.1e}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


# --- A: synchronous per-row copy ------------------------------------------
def _ka(ids_ref, src_ref, out_ref, sem):
    def body(i, _):
        cp = pltpu.make_async_copy(src_ref.at[ids_ref[i]], out_ref.at[i], sem)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


def gather_a(src, ids):
    return pl.pallas_call(
        _ka,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(ids, src)


# --- B: start-all then drain-all (no cond) --------------------------------
def _kb(ids_ref, src_ref, out_ref, sem):
    def start(i, _):
        pltpu.make_async_copy(src_ref.at[ids_ref[i]], out_ref.at[i], sem).start()
        return 0

    jax.lax.fori_loop(0, TILE, start, 0)

    def drain(i, _):
        pltpu.make_async_copy(src_ref.at[ids_ref[i]], out_ref.at[i], sem).wait()
        return 0

    jax.lax.fori_loop(0, TILE, drain, 0)


def gather_b(src, ids):
    return pl.pallas_call(
        _kb,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(ids, src)


# --- C: windowed double-buffer, start k+1 then wait k ---------------------
def _kc(ids_ref, src_ref, out_ref, sem):
    pltpu.make_async_copy(src_ref.at[ids_ref[0]], out_ref.at[0], sem).start()

    def body(i, _):
        @pl.when(i + 1 < TILE)
        def _():
            pltpu.make_async_copy(
                src_ref.at[ids_ref[i + 1]], out_ref.at[i + 1], sem
            ).start()

        pltpu.make_async_copy(src_ref.at[ids_ref[i]], out_ref.at[i], sem).wait()
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


def gather_c(src, ids):
    return pl.pallas_call(
        _kc,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(ids, src)


if __name__ == "__main__":
    import sys

    which = sys.argv[1:] or ["a", "b", "c"]
    if "a" in which:
        attempt("A sync-row ", gather_a)
    if "b" in which:
        attempt("B start/drain", gather_b)
    if "c" in which:
        attempt("C windowed ", gather_c)
    # XLA baseline for the same access pattern
    xt = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    print(f"XLA take     {t(xt, src, ids)*1e3:8.2f} ms", flush=True)
