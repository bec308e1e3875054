"""Pallas stream-scatter d_feat backward: equality against the XLA path.

The kernel (experiments/streamscatter.py) replaces the sorted segment-sum
scatter in ops/sampling.py's custom VJP; these tests pin (a) the raw
kernel against a numpy scatter oracle over adversarial id patterns and
(b) the integrated grad path (USE_STREAM_SCATTER forced on, interpret
mode on CPU) against the XLA path at qualifying shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transhuman_tpu.experiments.streamscatter import (
    BLOCK_B,
    W_SPAN,
    dfeat_scatter_sorted,
)
import transhuman_tpu.ops.sampling as sampling

HF = WF = 64
HW = HF * WF
C = 384  # lane-aligned like the real pixel feature maps
N = 2 * BLOCK_B


def _oracle(ids, g, w4, wf):
    ref = np.zeros((HW, C), np.float32)
    for col, off in enumerate((0, 1, wf, wf + 1)):
        np.add.at(ref, ids + off, g.astype(np.float32) * w4[:, col : col + 1])
    return ref


def _w4(rng, n):
    wx = rng.random(n).astype(np.float32)
    wy = rng.random(n).astype(np.float32)
    return np.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=1
    )


@pytest.mark.parametrize(
    "name,ids_fn",
    [
        ("uniform", lambda rng: np.sort(
            rng.integers(0, HW - WF - 2, N).astype(np.int32))),
        ("clustered", lambda rng: np.sort(
            np.repeat(rng.integers(0, (HW - WF - 2) // 8, N // 8) * 8, 8
                      ).astype(np.int32))),
        ("window_boundary", lambda rng: np.sort(np.clip(
            rng.integers(-8, 8, N) + W_SPAN, 0, HW - WF - 2
        ).astype(np.int32))),
        ("all_equal", lambda rng: np.full(N, 7, np.int32)),
    ],
)
def test_kernel_matches_oracle(name, ids_fn):
    rng = np.random.default_rng(3)
    ids = ids_fn(rng)
    g = rng.standard_normal((N, C)).astype(np.float32)
    w4 = _w4(rng, N)
    out, _ = dfeat_scatter_sorted(
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(w4), HW, WF
    )
    np.testing.assert_allclose(
        np.asarray(out), _oracle(ids, g, w4, WF), atol=2e-4, rtol=1e-5
    )


def test_residual_multi_round_drain():
    """Forcing r_cap far below the residual count must still be exact: the
    while_loop drains residuals over multiple rounds (the backstop path a
    pathological id distribution takes).  A block must span more than two
    windows to produce residuals now, so mix near and far ids inside one
    sorted block."""
    rng = np.random.default_rng(11)
    far = min(3 * W_SPAN + 400, HW - WF - 2)
    ids = np.sort(
        np.concatenate([
            np.full(700, 5, np.int32),
            np.full(N - 700, far, np.int32),
        ])
    )
    g = rng.standard_normal((N, C)).astype(np.float32)
    w4 = _w4(rng, N)
    out, n_resid = dfeat_scatter_sorted(
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(w4), HW, WF, r_cap=64
    )
    assert int(n_resid) > 64  # the point of the test: multiple rounds
    np.testing.assert_allclose(
        np.asarray(out), _oracle(ids, g, w4, WF), atol=2e-4, rtol=1e-5
    )


def test_grad_path_matches_xla():
    """sample_feature_map grads: stream-scatter path == XLA path."""
    rng = np.random.default_rng(5)
    v = 2
    feat = jnp.asarray(
        rng.standard_normal((v, HF, WF, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    uv = jnp.asarray(
        rng.uniform(1.0, HF - 2, size=(v, N, 2)).astype(np.float32)
    )

    def loss(feat, uv):
        out = sampling.sample_feature_map(feat, uv, (HF, WF))
        return jnp.sum(out.astype(jnp.float32) * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)))

    old = sampling.USE_STREAM_SCATTER
    try:
        sampling.USE_STREAM_SCATTER = False
        d_ref = jax.grad(loss, (0, 1))(feat, uv)
        sampling.USE_STREAM_SCATTER = True
        d_new = jax.grad(loss, (0, 1))(feat, uv)
    finally:
        sampling.USE_STREAM_SCATTER = old

    np.testing.assert_allclose(
        np.asarray(d_new[0], np.float32),
        np.asarray(d_ref[0], np.float32),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(d_new[1]), np.asarray(d_ref[1]), atol=1e-5
    )


def test_grad_path_under_vmap():
    """The train step vmaps the loss over the batch axis; the python-loop
    view structure must still work under an outer vmap (size 1, like the
    per-device shard in training)."""
    rng = np.random.default_rng(7)
    v = 2
    feat = jnp.asarray(
        rng.standard_normal((1, v, HF, WF, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    uv = jnp.asarray(
        rng.uniform(1.0, HF - 2, size=(1, v, N, 2)).astype(np.float32)
    )

    def loss(feat, uv):
        out = sampling.sample_feature_map(feat, uv, (HF, WF))
        return jnp.sum(out.astype(jnp.float32))

    def batched(feat, uv):
        return jnp.sum(jax.vmap(jax.grad(loss))(feat, uv))

    old = sampling.USE_STREAM_SCATTER
    try:
        sampling.USE_STREAM_SCATTER = False
        ref = batched(feat, uv)
        sampling.USE_STREAM_SCATTER = True
        new = batched(feat, uv)
    finally:
        sampling.USE_STREAM_SCATTER = old
    np.testing.assert_allclose(
        np.asarray(new), np.asarray(ref), rtol=1e-4, atol=1e-2
    )
