"""Transposed fused DPaRF binding kernel (Pallas, TPU) — v2.

Same math as models/heads.dparf_representation (the reference's
`knn_points` + gather + softmax aggregation, cross_transformer.py:158-205)
and as experiments/dparf.py, but laid out to avoid the two things that made v1
LOSE to XLA (455 ms vs 167 ms, see experiments/dparf.py:18-25):

* **Points live in lanes, clusters in sublanes.**  The distance tile is
  (Cp, T) instead of (T, Cp), so the k-NN min runs down the *sublane* axis
  — a chain of elementwise `minimum`s over vector registers — instead of
  Mosaic's expensive cross-lane argmin reductions.
* **value|index packing.**  Squared distances are non-negative f32, whose
  bit patterns are order-isomorphic to the values; masking the low 9
  mantissa bits and writing the cluster row index there gives min+argmin
  in ONE reduction, with deterministic lowest-index tie-breaking.  The
  distance used for the softmax loses 9 mantissa bits (relative error
  2^-14 — far below the bf16 noise floor of the surrounding model).

Everything else stays in VMEM per tile: the one-hot selection compare, the
dense softmax weights (Cp, T), the aux rows (center/rotation) as one
(12, Cp) @ (Cp, T) MXU matmul per neighbour, the sin-cos positional code,
and the final token aggregation (VD, Cp) @ (Cp, T).  Outputs transpose to
point-major in-kernel.

Forward-only (inference); training keeps the differentiable jnp path.

MEASURED (v5e, 1.05M pts, C=300, V=3, D=192, 32k chunks, forced readback):
XLA composition 174.4 ms; this kernel 184.0 ms — the transpose + packing
recovers v1's 2.7x loss (455 ms) but still does not beat XLA's fusion, so
`use_pallas` stays off by default (second negative result; the XLA
composition's MXU matmuls + fused elementwise remain the fastest form).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # points per grid step (lane-major)
_PAD_CENTER = 1e6  # sentinel coordinate for padded cluster rows
_IDX_BITS = 9  # supports Cp <= 512 cluster rows
_IDX_MASK = (1 << _IDX_BITS) - 1


def _kernel(ptsT_ref, centers_ref, centersT_ref, rotT_ref, tokensT_ref,
            tok_out, pe_out, dist_out, *, k, alpha, n_freqs, pe_rows):
    pT = ptsT_ref[:]  # (3, T) f32
    c = centers_ref[:]  # (Cp, 3) f32
    cp, t = c.shape[0], pT.shape[1]

    # distances transposed: clusters down sublanes, points across lanes
    d2 = (
        jnp.sum(c * c, axis=1, keepdims=True)
        + jnp.sum(pT * pT, axis=0, keepdims=True)
        - 2.0 * jnp.dot(c, pT, preferred_element_type=jnp.float32)
    )  # (Cp, T) >= 0 up to cancellation
    d2 = jnp.maximum(d2, 0.0)

    # pack value|index: non-negative f32 bits are order-isomorphic
    row = jax.lax.broadcasted_iota(jnp.int32, (cp, t), 0)
    packed = (pltpu.bitcast(d2, jnp.int32) & ~_IDX_MASK) | row

    auxT = jnp.concatenate([centersT_ref[:], rotT_ref[:]], axis=0)  # (12, Cp)
    tokensT = tokensT_ref[:]  # (VD, Cp) f32

    d0 = None
    u_sum = jnp.zeros((1, t), jnp.float32)
    w_denseT = jnp.zeros((cp, t), jnp.float32)
    pe_acc = jnp.zeros((pe_rows, t), jnp.float32)
    dists = []
    for _ in range(k):
        m = jnp.min(packed, axis=0, keepdims=True)  # (1, T): min+argmin
        oh = (packed == m).astype(jnp.float32)  # (Cp, T) one-hot
        packed = jnp.where(oh > 0, jnp.int32(0x7FFFFFFF), packed)
        d2_i = pltpu.bitcast(m & ~_IDX_MASK, jnp.float32)  # (1, T)
        d_i = jnp.sqrt(jnp.maximum(d2_i, 1e-12))
        if d0 is None:
            d0 = d_i
        u = jnp.exp(-(d_i - d0) / alpha)  # (1, T) in (0, 1]
        u_sum = u_sum + u
        w_denseT = w_denseT + oh * u
        dists.append(d_i)

        aux_k = jnp.dot(auxT, oh, preferred_element_type=jnp.float32)  # (12,T)
        rel = pT - aux_k[0:3]  # (3, T)
        # local_j = sum_i rel_i * R[i, j]; rot rows 3+i*3+j hold R[i, j]
        lx = rel[0] * aux_k[3] + rel[1] * aux_k[6] + rel[2] * aux_k[9]
        ly = rel[0] * aux_k[4] + rel[1] * aux_k[7] + rel[2] * aux_k[10]
        lz = rel[0] * aux_k[5] + rel[1] * aux_k[8] + rel[2] * aux_k[11]
        local = jnp.stack([lx, ly, lz], axis=0)  # (3, T)
        parts = [local]
        for f in range(n_freqs):
            s = local * np.float32(np.pi * 2.0**f)
            parts.append(jnp.sin(s))
            parts.append(jnp.cos(s))
        pe_k = jnp.concatenate(parts, axis=0)  # (3 + 6*n_freqs, T)
        pad = pe_rows - pe_k.shape[0]
        if pad:
            pe_k = jnp.pad(pe_k, ((0, pad), (0, 0)))
        pe_acc = pe_acc + u * pe_k

    inv = 1.0 / u_sum  # (1, T)
    tokT = jnp.dot(tokensT, w_denseT * inv, preferred_element_type=jnp.float32)
    tok_out[:] = jnp.transpose(tokT).astype(tok_out.dtype)  # (T, VD)
    pe_out[:] = jnp.transpose(pe_acc * inv)  # (T, pe_rows)
    dist = jnp.concatenate(
        dists + [jnp.zeros((8 - k, t), jnp.float32)] if k < 8 else dists,
        axis=0,
    )  # (8, T)
    dist_out[:] = jnp.transpose(dist)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("k", "alpha", "n_freqs", "interpret")
)
def dparf_fused2(
    pts_smpl,
    cluster_centers,
    cluster_rot,
    tokens,
    k: int = 7,
    alpha: float = 0.5,
    n_freqs: int = 10,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """pts_smpl (N,3) f32; centers (C,3); rot (C,3,3); tokens (V,C,D).

    Returns (tok_agg (V,N,D) tokens.dtype, pe_agg (N, 3+6*n_freqs) f32,
    knn_dist (N,k) f32 ascending).  N must be a multiple of TILE; requires
    k <= 8 and C <= 512 (value|index packing width).
    """
    n = pts_smpl.shape[0]
    v, c, dm = tokens.shape
    assert n % TILE == 0, f"N={n} not a multiple of {TILE}"
    assert k <= 8 and c <= (1 << _IDX_BITS)
    cp = _round_up(c, 128)
    pe_raw = 3 + 6 * n_freqs
    pe_rows = _round_up(pe_raw, 8)

    centers_p = jnp.pad(
        cluster_centers.astype(jnp.float32),
        ((0, cp - c), (0, 0)),
        constant_values=_PAD_CENTER,
    )
    rotT_p = jnp.pad(
        cluster_rot.reshape(c, 9).astype(jnp.float32), ((0, cp - c), (0, 0))
    ).T  # (9, Cp)
    tokensT_p = jnp.pad(
        jnp.transpose(tokens, (1, 0, 2)).reshape(c, v * dm).astype(jnp.float32),
        ((0, cp - c), (0, 0)),
    ).T  # (VD, Cp)

    kernel = functools.partial(
        _kernel, k=k, alpha=alpha, n_freqs=n_freqs, pe_rows=pe_rows
    )
    tok, pe, dist = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v * dm, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, v * dm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, pe_rows), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, v * dm), tokens.dtype),
            jax.ShapeDtypeStruct((n, pe_rows), jnp.float32),
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pts_smpl.astype(jnp.float32).T,
        centers_p,
        centers_p.T,
        rotT_p,
        tokensT_p,
    )

    tok_agg = jnp.transpose(tok.reshape(n, v, dm), (1, 0, 2))
    return tok_agg, pe[:, :pe_raw], dist[:, :k]
