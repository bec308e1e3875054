"""Transposed fused DPaRF kernel (experiments/dparf2) vs the jnp reference path
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU, where
it measured 184 ms vs XLA's 174 ms — kept as a documented experiment)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transhuman_tpu.experiments.dparf2 import TILE, dparf_fused2
from transhuman_tpu.models.heads import dparf_representation


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, c, v, d = 2 * TILE, 300, 3, 192
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
    centers = rng.standard_normal((c, 3)).astype(np.float32) * 0.4
    rot = np.stack([np.linalg.qr(m)[0] for m in rng.standard_normal((c, 3, 3))])
    tokens = rng.standard_normal((v, c, d)).astype(np.float32)
    return (
        jnp.asarray(pts),
        jnp.asarray(centers),
        jnp.asarray(rot.astype(np.float32)),
        jnp.asarray(tokens),
    )


def test_v2_matches_jnp(data):
    pts, centers, rot, tokens = data
    tok, pe, dist = dparf_fused2(pts, centers, rot, tokens, interpret=True)

    rep, _ = dparf_representation(pts, centers, rot, tokens)
    np.testing.assert_allclose(
        np.asarray(tok), np.asarray(rep[..., :192]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pe), np.asarray(rep[0, :, 192:]), atol=2e-4
    )
    d = np.asarray(dist)
    assert d.shape == (2 * TILE, 7)
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_v2_bf16_tokens(data):
    pts, centers, rot, tokens = data
    tok, pe, dist = dparf_fused2(
        pts, centers, rot, tokens.astype(jnp.bfloat16), interpret=True
    )
    assert tok.dtype == jnp.bfloat16
    rep, _ = dparf_representation(pts, centers, rot, tokens)
    np.testing.assert_allclose(
        np.asarray(tok, np.float32), np.asarray(rep[..., :192]), atol=2e-2
    )
