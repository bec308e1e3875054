"""Streaming scatter-accumulate for the feature-sampling backward (Pallas).

The d_feat term of `ops/sampling.py`'s custom VJP is the transpose of the
bilinear pixel-feature gather: 4 tap-rows per point-view accumulated into
the (Hf*Wf, C) feature map (reference autograd of the grid_sample at
if_clight_renderer.py:186-208).  In XLA every formulation pays one scatter
descriptor per tap-row (sorted segment_sum: ~19-22 ns/row -> ~40 ms for the
1.84M tap-rows at train scale, plus 4x weighted row reads).  This kernel
replaces the descriptor stream with *sequential* block DMAs over the sorted
rows and per-row dynamic VMEM stores, which issue at ~11 ns
(tools/probe_stream_scatter.py) and touch each output window once.

Design (id statistics: tools/probe_id_spans.py):

- The caller sorts the per-view base ids ONCE (the VJP's existing argsort)
  and folds the four bilinear tap weights into two (N, 2C) f32 "slab"
  streams: top = [w00*g | w01*g] targeting rows (id, id+1) and bottom =
  [w10*g | w11*g] targeting (id+Wf, id+Wf+1).
- One kernel invocation handles one tap-pair; each sorted row issues a
  single dynamic (2, C) VMEM store out[rel : rel+2] += slab (adjacent taps
  share the store; sequential grid order makes the += race-free).
- The output is tiled into aligned windows of W_SPAN rows.  Block b's
  window win[b] = ids[b*B] // W_SPAN is scalar-prefetched; ids are sorted,
  so win is non-decreasing and Mosaic's revisit rule keeps the window in
  VMEM across consecutive blocks.  The kernel zeroes a window on first
  visit; windows no block touches are killed by a `touched` mask on the
  XLA side (their VMEM-less HBM content is garbage).
- Rows whose taps would cross their window's end are RESIDUALS (~0.5-5% at
  B=512/W=2048 on real projection geometry): their slab is zeroed and
  redirected to the window's pad row, and their true contribution is added
  by compact sorted segment_sums over R_CAP-row rounds inside a
  `lax.while_loop` that drains ALL residuals — one round in practice, more
  only for pathological id distributions.  The result is therefore EXACT
  for every input with no fallback branch.  (An earlier design gated a
  pure-XLA fallback behind `lax.cond(n_resid > R_CAP, ...)`; the train
  step vmaps the loss over the batch axis, and vmap lowers a
  batched-predicate cond to select_n which executes BOTH branches — the
  step paid the kernel AND the full descriptor path, 211.6 -> 285.3
  ms/step.  A batched while_loop keeps its dynamic trip count.)
- The bottom tap-pair writes through a Wf-SHIFTED VIEW of the map (buffer
  outB with outB[i] == d_feat[i + Wf]), so the same sorted order, windows,
  rel ids and residual set apply unchanged — no second sort, no wide
  windows.  The caller combines d_feat = outA + shift(outB, Wf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 512      # rows per grid step (8-row chunked in-kernel)
W_SPAN = 2048      # aligned output window rows
_PAD_ROWS = 8      # dump rows at the window tail for residual rows
R_CAP = 16384      # residual rows drained per while_loop round (the
                   # segment_sums are static-shape, so R_CAP rows are paid
                   # every round — keep it small; extra rounds are rare)

# scalar-prefetch operands stage wholly in SMEM (~1 MB); keep ids under it
MAX_IDS = 196608


def _kernel(rel_ref, win_ref, slabs_ref, out_ref):
    b = pl.program_id(0)
    prev = win_ref[jnp.maximum(b - 1, 0)]

    @pl.when(jnp.logical_or(b == 0, win_ref[b] != prev))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    c = out_ref.shape[1]
    base = b * BLOCK_B

    def body(j, _):
        chunk = slabs_ref[pl.ds(j * 8, 8), :]  # (8, 2C) f32
        for u in range(8):
            rel = rel_ref[base + j * 8 + u]
            # two (1, C) stores: Mosaic only lowers single-row dynamic
            # vector stores (a (2, C) RMW at a dynamic sublane offset
            # fails the alignment proof)
            out_ref[pl.ds(rel, 1), :] += chunk[u : u + 1, :c]
            out_ref[pl.ds(rel + 1, 1), :] += chunk[u : u + 1, c:]
        return 0

    jax.lax.fori_loop(0, BLOCK_B // 8, body, 0)


def _pairs_scatter(rel, win, slabs, n_windows, c):
    """One tap-pair pass.  rel (N,) int32 window-relative row ids (residuals
    pre-redirected to W_SPAN), win (N/BLOCK_B,) int32 non-decreasing, slabs
    (N, 2C) f32.  Returns (n_windows * (W_SPAN + _PAD_ROWS), C) f32 flat
    windows (untouched windows carry garbage — caller masks).  The output
    stays 2D: Mosaic cannot prove alignment for dynamic stores through a
    leading window axis (a 3D (1, span, c) block fails to lower)."""
    n = rel.shape[0]
    span = W_SPAN + _PAD_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // BLOCK_B,),
        in_specs=[
            pl.BlockSpec((BLOCK_B, 2 * c), lambda b, rel, win: (b, 0)),
        ],
        out_specs=pl.BlockSpec((span, c), lambda b, rel, win: (win[b], 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * span, c), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu",
    )(rel, win, slabs)


def dfeat_scatter_sorted(i_s, g_s, w4_s, hw, wf, r_cap=R_CAP):
    """Accumulate sorted bilinear tap-rows into a flat (hw, C) f32 map.

    i_s  (N,) int32 SORTED base ids (pre-clamped so tap ids i_s + {0, 1,
         wf, wf+1} all stay below hw).  N % BLOCK_B == 0, N <= MAX_IDS.
    g_s  (N, C) cotangent rows in sorted order (any float dtype).
    w4_s (N, 4) f32 tap weights in sorted order:
         ((1-wx)(1-wy), wx(1-wy), (1-wx)wy, wx*wy).
    hw   static Hf * Wf (must be a multiple of W_SPAN); wf static row
         stride (>= 2, for the shifted bottom-pair view).

    Returns (d_feat_flat (hw, C) f32, n_resid).  EXACT for every input:
    residual rows are drained in r_cap-sized rounds by a while_loop (one
    round in practice; n_resid is returned for observability only).

    Same sum as four sorted segment_sums (f32 products, f32 accumulation);
    only the addition order differs.
    """
    n, c = g_s.shape
    assert n % BLOCK_B == 0 and n <= MAX_IDS, n
    assert hw % W_SPAN == 0, hw
    n_windows = hw // W_SPAN

    gf = g_s.astype(jnp.float32)
    i_s = i_s.astype(jnp.int32)

    # shared window plan (identical for both tap-pairs: the bottom pair
    # writes the same rel ids through the shifted view)
    win = (i_s[:: BLOCK_B] // W_SPAN).astype(jnp.int32)
    win_of_row = jnp.repeat(win, BLOCK_B)
    rel = i_s - win_of_row * W_SPAN
    resid = rel > W_SPAN - 2  # row's id+1 tap must stay inside the window
    rel_k = jnp.where(resid, W_SPAN, rel).astype(jnp.int32)

    touched = (
        jnp.zeros((n_windows,), jnp.float32).at[win].set(1.0, mode="drop")
    )

    def run_pair(w_lo, w_hi):
        slabs = jnp.concatenate([gf * w_lo, gf * w_hi], axis=1)
        slabs = jnp.where(resid[:, None], 0.0, slabs)
        wins = _pairs_scatter(rel_k, win, slabs, n_windows, c)
        wins = wins.reshape(n_windows, W_SPAN + _PAD_ROWS, c)
        # jnp.where, not multiply: untouched windows are UNINITIALIZED
        # memory, and 0 * NaN would leak the NaN through a mask-multiply
        wins = jnp.where(touched[:, None, None] > 0, wins, 0.0)
        return wins[:, :W_SPAN, :].reshape(hw, c)

    top = run_pair(w4_s[:, 0:1], w4_s[:, 1:2])
    bot_shift = run_pair(w4_s[:, 2:3], w4_s[:, 3:4])
    # bottom pair wrote through the wf-shifted view: d[i] += bot[i - wf]
    out = top + jnp.pad(bot_shift, ((wf, 0), (0, 0)))[:hw]

    # Residual taps, at their ABSOLUTE rows (after the shift, so both pairs
    # are handled uniformly).  Drain in r_cap-row rounds; a sorted
    # subsequence stays sorted, and rank order == id order within a round.
    # IMPORTANT: this must stay a while_loop, not a cond on n_resid — the
    # train step vmaps the loss, and vmap runs BOTH branches of a
    # batched-predicate cond (measured +73 ms/step).
    n_resid = jnp.sum(resid.astype(jnp.int32))
    resid_i = resid.astype(jnp.int32)
    rank = jnp.cumsum(resid_i) - resid_i  # 0-based rank among residuals
    gf_pad = jnp.concatenate([gf, jnp.zeros((1, c), jnp.float32)], axis=0)
    ids_pad = jnp.concatenate(
        [i_s, jnp.full((1,), hw + 2, jnp.int32)], axis=0
    )
    w4_pad = jnp.concatenate(
        [w4_s, jnp.zeros((1, 4), w4_s.dtype)], axis=0
    )

    def round_body(carry):
        k, acc = carry
        lo = k * r_cap
        mask_k = resid & (rank >= lo) & (rank < lo + r_cap)
        (take,) = jnp.nonzero(mask_k, size=r_cap, fill_value=n)
        r_rows = jnp.take(gf_pad, take, axis=0)      # (r_cap, C)
        r_ids = jnp.take(ids_pad, take)              # (r_cap,) sorted
        r_w4 = jnp.take(w4_pad, take, axis=0)
        for col, off in ((0, 0), (1, 1), (2, wf), (3, wf + 1)):
            # padded lanes carry the hw+2 sentinel -> land in the discard
            # tail rows [hw, hw+3)
            seg = jnp.minimum(r_ids + off, hw + 2)
            acc = acc + jax.ops.segment_sum(
                r_rows * r_w4[:, col : col + 1], seg, num_segments=hw + 3,
                indices_are_sorted=True,
            )
        return k + 1, acc

    _, r = jax.lax.while_loop(
        lambda carry: carry[0] * r_cap < n_resid,
        round_body,
        (jnp.zeros((), jnp.int32), jnp.zeros((hw + 3, c), jnp.float32)),
    )
    return out + r[:hw], n_resid
