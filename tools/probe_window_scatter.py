"""2x2-window scatter_add formulation of the sampling d_feat backward.

The shipping VJP (ops/sampling.py::_sfm_bwd) issues FOUR C-wide sorted
segment-sum rows per point-view (the 4 bilinear taps) — 4N scatter rows.
The forward's big win was fetching each point's 2x2 tap footprint as ONE
(2, 2, C) gather slice; this probe applies the same trick to the
backward: view the accumulator as (Hf, Wf*C) and scatter ONE (2, 2C)
update window per point at (y0, x0*C) with lax.scatter_add
(indices_are_sorted) — all 4 taps ride one scatter row, 4x fewer rows,
one f32 accumulator instead of four segment-sum outputs.

Edge safety: x0/y0 are pre-clamped to [0, Wf-2]/[0, Hf-2] by
_sample_taps, so every 2x2 window is fully in bounds.  Overlapping
windows from neighbouring points are fine: scatter-ADD accumulates.

Timing discipline: real weighted cotangent (an all-ones cotangent lets
XLA fold the row gather — see probe_dfeat_isolated.py), loop-in-jit
diffed timing, forced scalar readback.  Isolated numbers gate an
in-step measurement (probe_step_ablate lesson), never a flag flip.

MEASURED (v5e, 2026-08-17): CLOSED NEGATIVE — do not revisit.
  segsum (shipping)   64.4 ms/iter (3 views)
  window (2,2C)     2618.8 ms/iter  (40x WORSE)
  rowpair (1,2C)    3959.9 ms/iter  (61x WORSE)
Outputs match to 1e-6.  Verdict: XLA:TPU lowers jax.ops.segment_sum
(rank-1 sorted scatter-add) through a FAST sorted-segment path, but any
other lax.scatter_add shape — windowed updates, wide flat rows — hits
the general serialized scatter lowering (the same path whose native
gather-transpose measured 2.2 s/step before the custom VJP).  Fewer
scatter rows do NOT help because the slow path is not descriptor-bound,
it is serialization-bound.  The 4x C-wide sorted segment-sums in
ops/sampling.py::_sfm_bwd are the optimal XLA formulation; together
with the Pallas stream-scatter closure (experiments/streamscatter.py) every
known reformulation of the sampling backward is now measured.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

print('platform:', jax.devices()[0].platform, flush=True)

if os.environ.get("PROBE_SMALL"):  # CPU numerics smoke
    V, HF, WF, C = 2, 16, 16, 8
    N = 500
else:
    V, HF, WF, C = 3, 512, 512, 384
    N = 2400 * 64

feat = jax.jit(lambda k: jax.random.normal(k, (V, HF, WF, C), jnp.bfloat16))(
    jax.random.PRNGKey(0))
uv = jax.jit(lambda k: jax.random.uniform(k, (V, N, 2), jnp.float32, 1.0, HF - 2))(
    jax.random.PRNGKey(1))
g = jax.jit(lambda k: jax.random.normal(k, (V, N, C), jnp.bfloat16))(
    jax.random.PRNGKey(2))


def taps(uv_v):
    fx = jnp.clip(uv_v[:, 0], 0.0, WF - 1)
    fy = jnp.clip(uv_v[:, 1], 0.0, HF - 1)
    x0 = jnp.minimum(jnp.floor(fx).astype(jnp.int32), WF - 2)
    y0 = jnp.minimum(jnp.floor(fy).astype(jnp.int32), HF - 2)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]
    return x0, y0, wx.astype(jnp.float32), wy.astype(jnp.float32)


def sort_view(uv_v, g_v):
    x0, y0, wx, wy = taps(uv_v)
    base = y0 * WF + x0
    order = jnp.argsort(base)
    rows = jnp.take(g_v, order, axis=0).astype(jnp.float32)
    w4 = ((1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy)
    w4 = jnp.concatenate(w4, axis=1)[order]  # (N, 4)
    return base[order], rows, w4


def dfeat_segsum(uv_v, g_v):
    """The shipping engine: 4 sorted segment-sums (ops/sampling.py)."""
    i_s, rows, w4 = sort_view(uv_v, g_v)
    acc = 0.0
    for k, off in enumerate((0, 1, WF, WF + 1)):
        acc = acc + jax.ops.segment_sum(
            rows * w4[:, k:k + 1], i_s + off,
            num_segments=HF * WF, indices_are_sorted=True)
    return acc.reshape(HF, WF, C)


def dfeat_window(uv_v, g_v):
    """One (2, 2C) scatter_add window per point on the (Hf, Wf*C) grid."""
    i_s, rows, w4 = sort_view(uv_v, g_v)
    y_s, x_s = i_s // WF, i_s % WF
    top = jnp.concatenate([rows * w4[:, 0:1], rows * w4[:, 1:2]], axis=1)
    bot = jnp.concatenate([rows * w4[:, 2:3], rows * w4[:, 3:4]], axis=1)
    upd = jnp.stack([top, bot], axis=1)  # (N, 2, 2C)
    starts = jnp.stack([y_s, x_s * C], axis=1)  # (N, 2)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))
    out = jax.lax.scatter_add(
        jnp.zeros((HF, WF * C), jnp.float32), starts, upd, dnums,
        indices_are_sorted=True, unique_indices=False)
    return out.reshape(HF, WF, C)


def dfeat_rowpair(uv_v, g_v):
    """Two (2C,) scatter rows per point on the flat (Hf*Wf*C,) grid."""
    i_s, rows, w4 = sort_view(uv_v, g_v)
    top = jnp.concatenate([rows * w4[:, 0:1], rows * w4[:, 1:2]], axis=1)
    bot = jnp.concatenate([rows * w4[:, 2:3], rows * w4[:, 3:4]], axis=1)
    upd = jnp.concatenate([top, bot], axis=0)  # (2N, 2C)
    starts = jnp.concatenate([i_s * C, (i_s + WF) * C])[:, None]  # (2N, 1)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    out = jax.lax.scatter_add(
        jnp.zeros((HF * WF * C,), jnp.float32), starts, upd, dnums,
        indices_are_sorted=False, unique_indices=False)
    return out.reshape(HF, WF, C)


def force(r):
    return float(np.asarray(r))


def t_loop(fn, n_=4, reps=3):
    """Median of loop-in-jit diffed timings (1x vs n_x)."""
    def mk(k):
        def f(uv, g):
            def body(i, acc):
                d = jax.vmap(fn)(uv + i * 1e-6, g)
                return acc + d.ravel()[0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(f)

    f1, fn_ = mk(1), mk(n_)
    force(f1(uv, g)); force(fn_(uv, g))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(f1(uv, g)); t1 = time.perf_counter()
        force(fn_(uv, g)); t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n_ - 1))
    return float(np.median(ts))


# numerics first (CPU-safe too): window must match segsum to f32 tolerance
ref = jax.jit(jax.vmap(dfeat_segsum))(uv, g)
for name, fn in (("window", dfeat_window), ("rowpair", dfeat_rowpair)):
    out = jax.jit(jax.vmap(fn))(uv, g)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"{name:8s} max|diff| vs segsum = {err:.3e}", flush=True)
    assert err < 1e-3, name

if os.environ.get("PROBE_SMALL"):
    raise SystemExit(0)

for name, fn in (("segsum ", dfeat_segsum), ("window ", dfeat_window),
                 ("rowpair", dfeat_rowpair)):
    print(f"{name} {t_loop(fn)*1e3:8.2f} ms/iter (3 views)", flush=True)
