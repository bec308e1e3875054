"""Fused Pallas DPaRF kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transhuman_tpu.experiments.dparf import TILE, dparf_fused
from transhuman_tpu.models.heads import dparf_representation


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, c, v, d = TILE, 300, 3, 192
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


def test_fused_matches_jnp(data):
    pts, centers, rot, tokens = data
    tok, pe, dist = dparf_fused(pts, centers, rot, tokens, interpret=True)

    rep, _ = dparf_representation(pts, centers, rot, tokens)
    # rep = concat([tok_agg (V,N,D), pe broadcast (V,N,63)], -1)
    np.testing.assert_allclose(
        np.asarray(tok), np.asarray(rep[..., :192]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pe), np.asarray(rep[0, :, 192:]), atol=2e-4
    )
    # distances ascending, shape (N, 7)
    d = np.asarray(dist)
    assert d.shape == (TILE, 7)
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_fused_bf16_tokens(data):
    pts, centers, rot, tokens = data
    tok, pe, dist = dparf_fused(
        pts, centers, rot, tokens.astype(jnp.bfloat16), interpret=True
    )
    assert tok.dtype == jnp.bfloat16
    rep, _ = dparf_representation(pts, centers, rot, tokens)
    np.testing.assert_allclose(
        np.asarray(tok, np.float32), np.asarray(rep[..., :192]), atol=2e-2
    )
