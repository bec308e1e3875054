"""Capacity-boundary + fuzz tests for static-capacity compaction.

The compaction plan (pipeline._compact_plan + the descriptor-free stream
plan) is the most off-by-one-prone machinery in the repo: capacity m is a
chunk-rounded function of compact_ratio, overflow = n_active - m, and the
contract is EXACT equality with the dense render whenever overflow == 0
plus an exact overflow count otherwise.  These tests pin the boundary
(m == n_active, m one chunk short) and fuzz random poses/ratios."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transhuman_tpu.render.pipeline import RenderPipeline, pad_rays
from transhuman_tpu.testing import (
    init_params,
    jit_method,
    synthetic_rays,
    synthetic_setup,
)


def _render(pipe, params, frame, rays):
    """Jit-per-pipe render: compiled programs persist in conftest's compile
    cache across suite runs (eager execution pays tens of seconds of
    per-primitive dispatch on this platform)."""
    return jit_method(pipe, "render_frame")(params, frame, rays)


def _build(seed=0, n_samples=4):
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(24, 24), n_verts=80, n_clusters=10, n_samples=n_samples,
        chunk_rays=4, embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3,
        seed=seed,
    )
    pipe.cull_distance = 0.35  # enough survivors for the boundary cases
    params = init_params(
        model, frame, cluster.num_clusters, jax.random.PRNGKey(seed)
    )
    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(
        jnp.asarray, pad_rays(synthetic_rays(24, seed=seed), pipe.chunk_rays)
    )
    return pipe, params, frame, rays


_TWINS: dict = {}


def _twin(pipe, ratio):
    # memoized per (pipe, ratio) so repeated calls reuse one object — and
    # therefore one jit_method trace (a fresh twin per call would re-trace
    # an identical program every time)
    key = (id(pipe), ratio)
    hit = _TWINS.get(key)
    if hit is None:
        c = RenderPipeline.__new__(RenderPipeline)
        c.__dict__.update(pipe.__dict__)
        c.compact_ratio = ratio
        hit = _TWINS[key] = (pipe, c)
    return hit[1]


def _n_active(pipe, params, frame, rays):
    """Recover the plan's exact survivor count from a starved run's
    overflow: n_active = overflow + m_starved."""
    n = rays.ray_o.shape[0] * pipe.n_samples
    cp = pipe.chunk_rays * pipe.n_samples
    starved = _twin(pipe, 1.0 / n)  # m = one chunk
    out = _render(starved, params, frame, rays)
    return int(np.asarray(out["overflow"])[0]) + cp


@pytest.fixture(scope="module")
def built0():
    return _build()


def test_capacity_exactly_at_need_has_no_overflow(built0):
    pipe, params, frame, rays = built0
    n = rays.ray_o.shape[0] * pipe.n_samples
    cp = pipe.chunk_rays * pipe.n_samples
    n_active = _n_active(pipe, params, frame, rays)
    assert 0 < n_active < n, "fixture should cull some but not all points"

    m_exact = -(-n_active // cp) * cp
    # ratio placed so int(ratio*n) rounds up to exactly m_exact
    tight = _twin(pipe, (m_exact - 0.5) / n)
    out = _render(tight, params, frame, rays)
    assert int(np.asarray(out["overflow"])[0]) == 0
    dense = _render(_twin(pipe, None), params, frame, rays)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(dense[k]), atol=2e-5,
            err_msg=f"{k} at exact capacity",
        )


def test_capacity_one_chunk_short_reports_exact_overflow(built0):
    pipe, params, frame, rays = built0
    n = rays.ray_o.shape[0] * pipe.n_samples
    cp = pipe.chunk_rays * pipe.n_samples
    n_active = _n_active(pipe, params, frame, rays)
    m_exact = -(-n_active // cp) * cp
    if m_exact <= cp:
        pytest.skip("need at least two chunks of survivors")

    short = _twin(pipe, (m_exact - cp - 0.5) / n)
    out = _render(short, params, frame, rays)
    assert int(np.asarray(out["overflow"])[0]) == n_active - (m_exact - cp)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_compact_matches_dense_or_reports_overflow(seed):
    """Random pose/params/rays, random ratio: either the compact maps are
    bit-close to dense, or overflow is positive (never silently wrong)."""
    pipe, params, frame, rays = _build(seed=seed)
    rng = np.random.default_rng(seed)
    ratio = float(rng.uniform(0.05, 0.6))
    compact = _twin(pipe, ratio)
    out = _render(compact, params, frame, rays)
    over = int(np.asarray(out["overflow"])[0])
    dense = _render(_twin(pipe, None), params, frame, rays)
    if over == 0:
        for k in ("rgb_map", "acc_map", "depth_map"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(dense[k]), atol=2e-5,
                err_msg=f"{k} seed={seed} ratio={ratio:.3f}",
            )
    else:
        # honest accounting: capacity + overflow covers every survivor
        n = rays.ray_o.shape[0] * pipe.n_samples
        cp = pipe.chunk_rays * pipe.n_samples
        m = -(-int(ratio * n) // cp) * cp
        assert over + m == _n_active(pipe, params, frame, rays)


def test_reference_depth_64_samples_fixed_point_exact():
    """The stream composite's int32 fixed-point prefix trick at the
    REFERENCE sample depth (64/ray): quantization drift over a long ray
    must stay below float tolerance vs the dense f32 composite."""
    pipe, params, frame, rays = _build(seed=5, n_samples=64)
    compact = _twin(pipe, 0.9)
    out = _render(compact, params, frame, rays)
    assert int(np.asarray(out["overflow"])[0]) == 0
    dense = _render(_twin(pipe, None), params, frame, rays)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(dense[k]), atol=2e-5,
            err_msg=f"{k} at 64 samples/ray",
        )
