"""Second-level bisect: which ingredient kills the remote Mosaic compile —
async copy itself, the ANY-space ref, or the dynamically-indexed source.
All kernels copy rows of (R, C) bf16 into a (TILE, C) output block."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, C, TILE, M = 4096, 384, 256, 4096

src = jax.jit(lambda k: jax.random.normal(k, (R, C), jnp.bfloat16))(
    jax.random.PRNGKey(0)
)
ids = jax.jit(lambda k: jax.random.randint(k, (M,), 0, R, jnp.int32))(
    jax.random.PRNGKey(1)
)


def attempt(name, kern, extra_scratch=True):
    try:
        out = pl.pallas_call(
            kern,
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
            scratch_shapes=(
                [pltpu.SemaphoreType.DMA(())] if extra_scratch else []
            ),
        )(ids, src)
        print(f"{name}: OK sum={float(jnp.sum(out.astype(jnp.float32))):.1f}",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


# D: static-index async copy of a whole TILE block (contiguous, no dynamic)
def _kd(ids_ref, src_ref, out_ref, sem):
    cp = pltpu.make_async_copy(src_ref.at[pl.ds(0, TILE)], out_ref, sem)
    cp.start()
    cp.wait()


# E: dynamic block offset from SMEM scalar (one DMA per grid step)
def _ke(ids_ref, src_ref, out_ref, sem):
    base = jnp.minimum(ids_ref[0], R - TILE)
    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(base, TILE)], out_ref, sem
    )
    cp.start()
    cp.wait()


# F: per-row dynamic ds(idx, 1) copies in a python loop (8 rows only)
def _kf(ids_ref, src_ref, out_ref, sem):
    for k in range(8):
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(ids_ref[k], 1)], out_ref.at[pl.ds(k, 1)], sem
        )
        cp.start()
        cp.wait()
    out_ref[8:] = jnp.zeros_like(out_ref[8:])


if __name__ == "__main__":
    attempt("D static-block ", _kd)
    attempt("E dyn-offset blk", _ke)
    attempt("F dyn per-row x8", _kf)
