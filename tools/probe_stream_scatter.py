"""GATING PROBE for a Pallas streaming segment-sum (the d_feat backward).

The sampling backward's d_feat is ~108 ms of the 213 ms chained train step
(tools/profile_train_step.py chain) and is scatter-DESCRIPTOR-bound in XLA
(sorted segment_sum issues one scatter descriptor per row; ~36 ns each over
1.84M tap-rows).  The one formulation that avoids per-row descriptors is a
Pallas kernel that reads sorted rows SEQUENTIALLY (block DMAs) and
accumulates into a VMEM window with per-row dynamic stores.

This probe measures the core rate question ONLY: how fast can a kernel do
  window[id[i]] += rows[i]          (B rows/block, C=384, W_SPAN window)
with ids in SMEM (scalar prefetch) and rows streamed through VMEM blocks?
If per-row cost lands >= the XLA scatter's ~36 ns, the avenue is dead; at
~5-10 ns it wins ~4x on the dominant train-backward stage.

Variants: 1 store/row and 4 stores/row (the real backward has 4 bilinear
taps per point).  An XLA sorted-segment-sum at identical shapes anchors the
comparison.  Loop-in-jit timing (t4 - t1)/3 kills tunnel dispatch.
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

N, B, C, W_SPAN = 131072, 1024, 384, 4096
HW = 512 * 512


def make_kernel(n_taps: int):
    # Mosaic cannot prove a per-row dynamic load offset is sublane-aligned
    # (bf16 tiles are (16, 128)): load aligned 8-row chunks and unroll the
    # chunk statically; the per-row *store* at an arbitrary dynamic sublane
    # offset is the open question this probe answers.
    def kernel(ids_ref, rows_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = b * B

        def body(j, _):
            chunk = rows_ref[pl.ds(j * 8, 8), :].astype(jnp.float32)
            for u in range(8):
                idx = ids_ref[base + j * 8 + u]
                row = chunk[u : u + 1, :]
                for t in range(n_taps):
                    out_ref[pl.ds(idx + t, 1), :] += row * (0.25 + 0.1 * t)
            return 0

        jax.lax.fori_loop(0, B // 8, body, 0)

    return kernel


def make_onehot_kernel(n_taps: int, w_span: int):
    # Descriptor-free AND dynamic-store-free: ids stream in as a VMEM
    # vector; the block's scatter matrix M[s, r] = sum_t w_t * [s == id_r+t]
    # is built by compare-against-iota on the VPU and applied as ONE MXU
    # matmul out[s, c] += M @ rows.  Window index would be dynamic
    # (scalar-prefetched, monotonic) in the real kernel; here out is a
    # single window and ids are in-range, which measures the rate only.
    def kernel(ids_ref, rows_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        ids = ids_ref[0, :]  # (B,) int32 in [0, w_span)
        chunk = rows_ref[:].astype(jnp.bfloat16)  # (B, C)
        span = jax.lax.broadcasted_iota(jnp.int32, (w_span, B), 0)
        m = jnp.zeros((w_span, B), jnp.bfloat16)
        for t in range(n_taps):
            m = m + jnp.where(span == ids[None, :] + t,
                              jnp.bfloat16(0.25 + 0.1 * t), jnp.bfloat16(0))
        out_ref[:] += jax.lax.dot_general(
            m, chunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kernel


def onehot_scatter(ids2d, rows, n_taps, w_span):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((1, B), lambda b: (b, 0)),
            pl.BlockSpec((B, C), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((w_span + 8, C), lambda b: (0, 0)),
    )
    return pl.pallas_call(
        make_onehot_kernel(n_taps, w_span + 8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w_span + 8, C), jnp.float32),
    )(ids2d, rows)


def stream_scatter(ids, rows, n_taps):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, C), lambda b, ids: (b, 0)),
        ],
        out_specs=pl.BlockSpec((W_SPAN + 8, C), lambda b, ids: (0, 0)),
    )
    return pl.pallas_call(
        make_kernel(n_taps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W_SPAN + 8, C), jnp.float32),
    )(ids, rows)


def force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n_=3):
    force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n_):
        force(f(*a))
    return (time.perf_counter() - t0) / n_


def per_iter(make, *args):
    t1 = t(jax.jit(make(1)), *args)
    t4 = t(jax.jit(make(4)), *args)
    return (t4 - t1) / 3


def mk_pallas(n_taps):
    def make(n_):
        def f(ids, rows):
            def body(i, acc):
                r = rows + (i * 1e-6).astype(rows.dtype)
                return acc + stream_scatter(ids, r, n_taps)[0, 0]

            return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))

        return f

    return make


def mk_xla_segsum(n_):
    # XLA anchor: sorted segment_sum at the same cardinality into HW segs
    def f(ids_hw, rows):
        def body(i, acc):
            r = (rows + (i * 1e-6).astype(rows.dtype)).astype(jnp.float32)
            s = jax.ops.segment_sum(
                r, ids_hw, num_segments=HW, indices_are_sorted=True
            )
            return acc + s[0, 0]

        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))

    return f


def main():
    k = jax.random.PRNGKey(0)
    ids = jnp.sort(jax.random.randint(k, (N,), 0, W_SPAN, jnp.int32))
    ids_hw = jnp.sort(jax.random.randint(k, (N,), 0, HW - 2, jnp.int32))
    rows = jax.random.normal(jax.random.PRNGKey(1), (N, C), jnp.bfloat16)

    dt = per_iter(mk_xla_segsum, ids_hw, rows)
    print(f"xla segsum (1 tap)   {dt*1e3:8.2f} ms  {dt/N*1e9:6.1f} ns/row", flush=True)
    for taps in (1, 4):
        dt = per_iter(mk_pallas(taps), ids, rows)
        print(
            f"pallas stream x{taps}    {dt*1e3:8.2f} ms  {dt/(N*taps)*1e9:6.1f} ns/store",
            flush=True,
        )
    for w_span in (1024, 4096):
        ids2d = jax.random.randint(
            jax.random.PRNGKey(4), (N // B, B), 0, w_span, jnp.int32
        )

        def mk_onehot(n_):
            def f(ids2d, rows):
                def body(i, acc):
                    r = rows + (i * 1e-6).astype(rows.dtype)
                    return acc + onehot_scatter(ids2d, r, 4, w_span)[0, 0]

                return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))

            return f

        dt = per_iter(mk_onehot, ids2d, rows)
        print(
            f"pallas onehot x4 W={w_span:5d} {dt*1e3:8.2f} ms  "
            f"{dt/(N*4)*1e9:6.1f} ns/store",
            flush=True,
        )


if __name__ == "__main__":
    main()
