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

def test_segmented_excl_prod_matches_loop(rng):
    """Two-level blocked segmented scan == a host reference loop, across
    row-boundary / long-segment / padding (M % 128 != 0) cases."""
    from transhuman_tpu.render.volume import segmented_excl_prod

    for M, max_seg in [(1000, 7), (4096, 300), (515, 2)]:
        seg = np.sort(rng.integers(0, max_seg, M)).astype(np.int32)
        v = rng.uniform(0.2, 1.0, M).astype(np.float32)
        ref = np.ones(M, np.float64)
        run = 1.0
        for i in range(M):
            if i == 0 or seg[i] != seg[i - 1]:
                run = 1.0
            ref[i] = run
            run *= v[i]
        got = np.asarray(
            jax.jit(segmented_excl_prod)(jnp.asarray(v), jnp.asarray(seg))
        )
        # atol floor: long segments drive the f64 host reference into
        # values below f32 underflow, where the device (like the dense
        # cumprod path) flushes to 0
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-30)


def test_blocked_cumsum_i32_exact(rng):
    from transhuman_tpu.render.volume import blocked_cumsum_i32

    for M in (130, 4096, 777):
        q = rng.integers(-(1 << 20), 1 << 20, (M, 3)).astype(np.int32)
        ref = np.cumsum(q, axis=0, dtype=np.int32)  # wraps like int32
        got = np.asarray(jax.jit(blocked_cumsum_i32)(jnp.asarray(q)))
        np.testing.assert_array_equal(got, ref)


def test_composite_stream_matches_dense(rng):
    """composite_stream over a compacted stream == dense composite when the
    dropped samples carry sigma -> alpha == 0."""
    from transhuman_tpu.render.volume import composite_stream

    R, S = 13, 16
    raw = rng.standard_normal((R, S, 4)).astype(np.float32)
    keep = rng.random((R, S)) < 0.4
    raw[..., 3] = np.where(keep, raw[..., 3], -100.0)  # culled -> alpha ~ 0
    near = rng.uniform(1.0, 1.5, R).astype(np.float32)
    far = near + rng.uniform(0.5, 1.0, R).astype(np.float32)
    t = np.linspace(0, 1, S, dtype=np.float32)
    z = near[:, None] * (1 - t) + far[:, None] * t
    rd = rng.standard_normal((R, 3)).astype(np.float32)
    dense = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), False)

    # build the stream: keep-only entries, ray-then-sample order (plus a
    # couple of padding slots at the tail with sigma=0 -> must be inert)
    ridx, sidx = np.nonzero(keep)
    pad = 5
    raw_c = np.concatenate([raw[ridx, sidx], np.zeros((pad, 4), np.float32)])
    seg = np.concatenate([ridx, np.full(pad, R - 1)]).astype(np.int32)
    z_c = np.concatenate([z[ridx, sidx], np.ones(pad, np.float32)])
    rdn = np.linalg.norm(rd, axis=1)
    d = (far - near) / (S - 1)
    dist_c = np.where(sidx == S - 1, 1e10, d[ridx]) * rdn[ridx]
    dist_c = np.concatenate([dist_c, np.ones(pad, np.float32)])
    counts = keep.sum(1)
    ends = np.cumsum(counts).astype(np.int32)
    starts = (ends - counts).astype(np.int32)
    fs = np.concatenate([far[ridx], np.ones(pad, np.float32)])
    out = composite_stream(
        jnp.asarray(raw_c), jnp.asarray(seg), jnp.asarray(z_c),
        jnp.asarray(dist_c), jnp.asarray(starts), jnp.asarray(ends), R,
        depth_scale=jnp.asarray(1.0 / fs),
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb_map"]), np.asarray(dense["rgb_map"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["acc_map"]), np.asarray(dense["acc_map"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["depth_map"]) * far,
        np.asarray(dense["depth_map"]), atol=5e-5)


def test_pack_bitmask_and_kth_bit(rng):
    """pack_sample_bitmask + select_kth_set_bit reconstruct np.nonzero's
    (row, col) pairs for every surviving sample, incl. S not a multiple
    of 32 and rows with 0 or all survivors."""
    from transhuman_tpu.render.volume import (
        pack_sample_bitmask, select_kth_set_bit)

    for s in (64, 48, 20, 33):
        mask = rng.random((37, s)) < 0.3
        mask[0] = False
        mask[1] = True
        words = np.asarray(pack_sample_bitmask(jnp.asarray(mask)))
        assert words.shape == (37, (s + 31) // 32)
        rows, cols = np.nonzero(mask)
        counts = mask.sum(1)
        k = np.concatenate([np.arange(c) for c in counts]).astype(np.int32)
        got = np.asarray(
            select_kth_set_bit(jnp.asarray(words[rows]), jnp.asarray(k)))
        np.testing.assert_array_equal(got, cols.astype(np.int32))
