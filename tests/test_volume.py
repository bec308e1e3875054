"""Volume rendering options: white background, density noise, sample_pdf."""

import jax
import jax.numpy as jnp
import numpy as np

from transhuman_tpu.render.volume import composite, sample_along_rays, sample_pdf


def test_white_background(rng):
    raw = jnp.asarray(rng.standard_normal((4, 8, 4)).astype(np.float32)) - 5.0
    # strongly negative sigma -> zero opacity -> white bkgd shows through
    raw = raw.at[..., 3].set(-100.0)
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (4, 8))
    rd = jnp.tile(jnp.asarray([[0, 0, 1.0]]), (4, 1))
    out = composite(raw, z, rd, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0, atol=1e-6)
    out0 = composite(raw, z, rd, white_bkgd=False)
    np.testing.assert_allclose(np.asarray(out0["rgb_map"]), 0.0, atol=1e-6)


def test_raw_noise_std_changes_densities(rng):
    raw = jnp.asarray(rng.standard_normal((4, 8, 4)).astype(np.float32))
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (4, 8))
    rd = jnp.tile(jnp.asarray([[0, 0, 1.0]]), (4, 1))
    a = composite(raw, z, rd, raw_noise_std=1.0, rng=jax.random.PRNGKey(0))
    b = composite(raw, z, rd)
    assert not np.allclose(np.asarray(a["acc_map"]), np.asarray(b["acc_map"]))


def test_sample_pdf_concentrates_on_high_weights():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    w = jnp.zeros((2, 8)).at[:, 4].set(100.0)  # all mass in bin [0.5, 0.625]
    s = np.asarray(sample_pdf(bins, w, 16))
    frac_in = ((s >= 0.5) & (s <= 0.625)).mean()
    assert frac_in > 0.8  # the u=0,1 endpoints land in the epsilon-mass tails
    # stochastic variant stays in bounds
    s2 = np.asarray(sample_pdf(bins, w, 16, rng=jax.random.PRNGKey(0)))
    assert (s2 >= 0).all() and (s2 <= 1).all()


def test_stratified_vs_deterministic(rng):
    ro = jnp.zeros((3, 3))
    rd = jnp.tile(jnp.asarray([[0, 0, 1.0]]), (3, 1))
    near = jnp.ones(3)
    far = jnp.full(3, 2.0)
    _, z_det = sample_along_rays(ro, rd, near, far, 8)
    np.testing.assert_allclose(np.asarray(z_det[0]), np.linspace(1, 2, 8), atol=1e-6)
    _, z_jit = sample_along_rays(ro, rd, near, far, 8, rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(z_det), np.asarray(z_jit))
    assert (np.asarray(z_jit) >= 1.0 - 1e-6).all() and (np.asarray(z_jit) <= 2.0 + 1e-6).all()


def test_truncation_masking(rng):
    """use_truncation zeroes raw outputs for points far from all clusters."""
    from transhuman_tpu.models.heads import dparf_representation

    pts = jnp.asarray(
        np.concatenate([np.zeros((4, 3)), np.full((4, 3), 10.0)]).astype(np.float32)
    )
    centers = jnp.asarray(rng.standard_normal((12, 3)).astype(np.float32) * 0.1)
    rot = jnp.tile(jnp.eye(3)[None], (12, 1, 1))
    tokens = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    _, keep = dparf_representation(pts, centers, rot, tokens, k=3, knn_sigma=0.25)
    assert np.asarray(keep)[:4].all() and not np.asarray(keep)[4:].any()
