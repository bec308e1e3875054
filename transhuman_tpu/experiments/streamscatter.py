"""Streaming scatter-accumulate for the feature-sampling backward (Pallas).

The d_feat term of `ops/sampling.py`'s custom VJP is the transpose of the
bilinear pixel-feature gather: 4 tap-rows per point-view accumulated into
the (Hf*Wf, C) feature map (reference autograd of the grid_sample at
if_clight_renderer.py:186-208).  In XLA every formulation pays one scatter
descriptor per tap-row (sorted segment_sum: ~19-22 ns/row -> ~69 ms for
the 1.84M tap-rows inside the train step).  This kernel replaces the
descriptor stream with *sequential* block DMAs over the sorted rows and
per-row dynamic VMEM stores into aligned output windows.

DESIGN HISTORY (measured on the v5e chip; tools/probe_step_ablate.py):

v1 (two passes per view, slabs = [w_lo*g | w_hi*g] materialized in XLA,
single window per block, residual rows drained by hw-wide segment-sum
rounds) LOST in the full train step, 287.8 vs 220.7 ms/step XLA, despite
winning the isolated vmapped grad 46.7 vs 68.2 ms (tpu_grad_check2):
  - the residual drain cost ~70 ms/step: the train step's ids are
    CLUSTERED (projected body points, ~7 rows/texel), so ~13% of rows sat
    past their block's window and each drain round materializes 4
    (hw+3, C) f32 segment-sum outputs plus adds (~1.2 GB/round/view);
  - the slab build/masking glue cost ~25 ms/step, eating the window
    pass's 69 -> 41 ms win over the XLA segment_sums.

v2 (this file) fixed both structurally — and STILL lost, 271.6 vs 219.0
ms/step: the wide spread-tail of the sorted ids leaves 2.4-5.3% of rows
per view outside even a two-window block span, and ANY nonzero residual
count pays a ~50 ms while-loop round of four (hw+3, C) f32 segment-sum
materializations.  Ablating the drain entirely (kernel-noresid, INEXACT)
still measures 241.5 — the v2 window pass itself loses 22 ms to the XLA
segment-sums in-step (v1's two-pass variant tied at 218.1); the kernel's
isolated 21 ms advantage does not survive the step's scheduling context.
The last alternative is also a measured dead end: a bucket-by-window
counting-sort plan (which would make rel < W_SPAN by construction, zero
residuals, and replace the argsort) costs 24.8 ms vs the sort plan's
13.0 (tools/probe_sortcost.py — the argsort itself is cheap; the old
42 ms figure was the long-gone 4N tap-major sort).  VERDICT: the XLA
sorted-segment-sum path ships (ops/sampling.py auto-gate returns False);
this kernel stays as a measured negative with its tests, like
experiments/dparf2.py.  Do not revisit without a design that (a) needs NO
residual machinery for arbitrary id spreads, (b) beats the in-step (not
isolated) segment-sums, and (c) keeps plan glue under the sort's 13 ms.

v2 design (kept for the record):
  - ONE pass per view: rows (N, C) bf16 and tap weights (N, 128-padded)
    f32 stream into the kernel; the four weighted tap rows are formed
    IN-KERNEL (f32 products, broadcast multiply) — no slab
    materialization at all, and the row stream is bf16 (4x less input
    traffic than v1's two f32 slab streams);
  - both tap-pairs ride ONE (1, 2C) store each: lanes [0,C) accumulate
    the top pair (taps id, id+1), lanes [C,2C) the bottom pair (taps
    id+wf, id+wf+1) written through a wf-shifted view — half the RMW
    stores of v1 (and half the serial same-row dependency chains that
    clustered ids produce);
  - each block writes through TWO window outputs, win[b] and win[b]+1,
    so a sorted block straddling a window boundary is covered
    structurally; rows are residual only when a 512-row sorted block
    spans >2*W_SPAN ids (~never on real geometry).  The while_loop
    drain remains as an exactness backstop and runs ZERO rounds in
    practice.  (It must stay a while_loop, not a cond: the train step
    vmaps the loss, and vmap runs BOTH branches of a batched-predicate
    cond — measured +73 ms/step.)

Window bookkeeping: block b's window win[b] = ids[b*B] // W_SPAN is
scalar-prefetched; ids are sorted, so win is non-decreasing and Mosaic's
revisit rule keeps both output windows in VMEM across consecutive blocks.
Each output window is zeroed on first visit; windows no block touches
hold uninitialized HBM and are masked out on the XLA side (`touched`).
The +1 tap of rel == W_SPAN-1 lands in the window's pad rows and is
folded back with a shifted add after the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 512      # rows per grid step (8-row chunked in-kernel)
W_SPAN = 1024      # aligned output window rows (x2 coverage per block)
_PAD_ROWS = 8      # pad rows at each window tail for the rel+1 tap
R_CAP = 16384      # residual rows drained per while_loop round (backstop)

# scalar-prefetch operands stage wholly in SMEM (~1 MB); keep ids under it
MAX_IDS = 196608

# Ablation knobs for step-level profiling ONLY (tools/probe_step_ablate.py):
# read at trace time; production paths leave both False.
DEBUG_SKIP_PALLAS = False  # replace the window scatter with a ~free stub
DEBUG_SKIP_RESID = False   # drop the residual while_loop drain (inexact)


def _kernel(rel_ref, win_ref, rows_ref, w4_ref, o1_ref, o2_ref):
    b = pl.program_id(0)
    prev = win_ref[jnp.maximum(b - 1, 0)]

    # o1 (window win[b]) and o2 (window win[b]+1) are separate buffers, so
    # one first-visit condition serves both: their window indices change on
    # exactly the same steps.
    @pl.when(jnp.logical_or(b == 0, win_ref[b] != prev))
    def _init():
        o1_ref[:] = jnp.zeros_like(o1_ref)
        o2_ref[:] = jnp.zeros_like(o2_ref)

    c = rows_ref.shape[1]
    base = b * BLOCK_B

    def body(j, _):
        # aligned 8-row chunks: Mosaic cannot prove a per-row dynamic LOAD
        # offset is sublane-aligned (bf16 tiles are (16, 128)); the per-row
        # dynamic STORE at an arbitrary offset lowers fine.
        chunk = rows_ref[pl.ds(j * 8, 8), :].astype(jnp.float32)  # (8, C)
        w = w4_ref[pl.ds(j * 8, 8), :]                            # (8, 128)
        # lanes [0,C): top pair (taps id, id+1); lanes [C,2C): bottom pair
        # (taps id+wf, id+wf+1, via the wf-shifted output view)
        s0 = jnp.concatenate([chunk * w[:, 0:1], chunk * w[:, 2:3]], axis=1)
        s1 = jnp.concatenate([chunk * w[:, 1:2], chunk * w[:, 3:4]], axis=1)
        for u in range(8):
            rel = rel_ref[base + j * 8 + u]
            in1 = rel < W_SPAN

            @pl.when(in1)
            def _store1():
                o1_ref[pl.ds(rel, 1), :] += s0[u : u + 1]
                o1_ref[pl.ds(rel + 1, 1), :] += s1[u : u + 1]

            @pl.when(jnp.logical_not(in1))
            def _store2():
                r2 = rel - W_SPAN
                o2_ref[pl.ds(r2, 1), :] += s0[u : u + 1]
                o2_ref[pl.ds(r2 + 1, 1), :] += s1[u : u + 1]

        return 0

    jax.lax.fori_loop(0, BLOCK_B // 8, body, 0)


def _window_scatter(rel, win, rows, w4p, n_windows, c):
    """One pass over all sorted rows.  rel (N,) int32 window-relative ids
    in [0, 2*W_SPAN] (2*W_SPAN = redirected zero-weight rows), win
    (N/BLOCK_B,) int32 non-decreasing, rows (N, C) bf16/f32, w4p (N, 128)
    f32 tap weights in lanes 0..3.  Returns (o1, o2), each
    ((n_windows+1) * span, 2C) f32 flat windows: o1's window w holds
    global window w contributions, o2's window w likewise (o2 is indexed
    at win[b]+1 in-kernel).  Untouched windows carry garbage — caller
    masks.  The outputs stay 2D: Mosaic cannot prove alignment for
    dynamic stores through a leading window axis."""
    n = rel.shape[0]
    span = W_SPAN + _PAD_ROWS
    out = jax.ShapeDtypeStruct(((n_windows + 1) * span, 2 * c), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // BLOCK_B,),
        in_specs=[
            pl.BlockSpec((BLOCK_B, c), lambda b, rel, win: (b, 0)),
            pl.BlockSpec((BLOCK_B, 128), lambda b, rel, win: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((span, 2 * c), lambda b, rel, win: (win[b], 0)),
            pl.BlockSpec((span, 2 * c), lambda b, rel, win: (win[b] + 1, 0)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[out, out],
        interpret=jax.devices()[0].platform == "cpu",
    )(rel, win, rows, w4p)


def dfeat_scatter_sorted(i_s, g_s, w4_s, hw, wf, r_cap=R_CAP):
    """Accumulate sorted bilinear tap-rows into a flat (hw, C) f32 map.

    i_s  (N,) int32 SORTED base ids (pre-clamped so tap ids i_s + {0, 1,
         wf, wf+1} all stay below hw).  N % BLOCK_B == 0, N <= MAX_IDS.
    g_s  (N, C) cotangent rows in sorted order (any float dtype).
    w4_s (N, 4) f32 tap weights in sorted order:
         ((1-wx)(1-wy), wx(1-wy), (1-wx)wy, wx*wy).
    hw   static Hf * Wf (must be a multiple of W_SPAN); wf static row
         stride (>= 2, for the shifted bottom-pair lanes).

    Returns (d_feat_flat (hw, C) f32, n_resid).  EXACT for every input:
    the rare rows outside their block's two windows are drained in
    r_cap-sized rounds by a while_loop (zero rounds in practice; n_resid
    is returned for observability only).

    Same sum as four sorted segment_sums (f32 products, f32 accumulation);
    only the addition order differs.
    """
    n, c = g_s.shape
    assert n % BLOCK_B == 0 and n <= MAX_IDS, n
    assert hw % W_SPAN == 0, hw
    n_windows = hw // W_SPAN

    i_s = i_s.astype(jnp.int32)
    w4_s = w4_s.astype(jnp.float32)

    win = (i_s[:: BLOCK_B] // W_SPAN).astype(jnp.int32)
    win_of_row = jnp.repeat(win, BLOCK_B)
    rel = i_s - win_of_row * W_SPAN
    # storable iff both taps of both pairs stay inside window win or win+1
    resid = rel > 2 * W_SPAN - 2
    rel_k = jnp.where(resid, 2 * W_SPAN, rel).astype(jnp.int32)

    w4p = jnp.zeros((n, 128), jnp.float32).at[:, :4].set(w4_s)
    w4p = jnp.where(resid[:, None], 0.0, w4p)  # redirected rows add zero

    span = W_SPAN + _PAD_ROWS
    if DEBUG_SKIP_PALLAS:
        # ablation stub: keep the input prep alive (max can't be DCE'd)
        # but skip the pallas custom call
        stub = jnp.max(g_s.astype(jnp.float32)) * jnp.max(w4p) * 1e-30
        o1 = jnp.zeros(((n_windows + 1) * span, 2 * c), jnp.float32) + stub
        o2 = o1
    else:
        o1, o2 = _window_scatter(rel_k, win, g_s, w4p, n_windows, c)

    touched1 = jnp.zeros((n_windows + 1,), jnp.float32).at[win].set(
        1.0, mode="drop"
    )
    touched2 = jnp.zeros((n_windows + 1,), jnp.float32).at[win + 1].set(
        1.0, mode="drop"
    )
    # jnp.where, not multiply: untouched windows are UNINITIALIZED memory,
    # and 0 * NaN would leak the NaN through a mask-multiply
    o1w = jnp.where(
        touched1[:, None, None] > 0,
        o1.reshape(n_windows + 1, span, 2 * c), 0.0,
    )
    o2w = jnp.where(
        touched2[:, None, None] > 0,
        o2.reshape(n_windows + 1, span, 2 * c), 0.0,
    )

    def combine(lo):
        """Flatten one tap-pair's lanes [lo, lo+c) across both outputs:
        main window rows + the pad-row carry shifted one window down.
        o2's windows already sit at their global index (indexed at
        win[b]+1 in-kernel); its pad rows are provably never written
        (a store there would need rel == 2*W_SPAN - 1, excluded as
        residual)."""
        main = (
            o1w[:n_windows, :W_SPAN, lo : lo + c]
            + o2w[:n_windows, :W_SPAN, lo : lo + c]
        ).reshape(hw, c)
        carry = jnp.zeros((n_windows, W_SPAN, c), jnp.float32).at[
            :, :_PAD_ROWS
        ].set(o1w[:n_windows, W_SPAN:, lo : lo + c]).reshape(hw, c)
        return main + jnp.pad(carry, ((W_SPAN, 0), (0, 0)))[:hw]

    top = combine(0)
    bot_shift = combine(c)
    # bottom pair lanes accumulate through the wf-shifted view:
    # d[i] += bot[i - wf]
    out = top + jnp.pad(bot_shift, ((wf, 0), (0, 0)))[:hw]

    n_resid = jnp.sum(resid.astype(jnp.int32))
    if DEBUG_SKIP_RESID:  # ablation: window pass only (INEXACT)
        return out, n_resid

    # Residual backstop: drain in r_cap-row rounds at the rows' ABSOLUTE
    # ids (handles both pairs uniformly).  A sorted subsequence stays
    # sorted, and rank order == id order within a round.  IMPORTANT: this
    # must stay a while_loop, not a cond on n_resid — the train step vmaps
    # the loss, and vmap runs BOTH branches of a batched cond (measured
    # +73 ms/step).  Zero rounds on real geometry.
    gf = g_s.astype(jnp.float32)
    resid_i = resid.astype(jnp.int32)
    rank = jnp.cumsum(resid_i) - resid_i  # 0-based rank among residuals
    gf_pad = jnp.concatenate([gf, jnp.zeros((1, c), jnp.float32)], axis=0)
    ids_pad = jnp.concatenate(
        [i_s, jnp.full((1,), hw + 2, jnp.int32)], axis=0
    )
    w4_pad = jnp.concatenate(
        [w4_s, jnp.zeros((1, 4), jnp.float32)], axis=0
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
