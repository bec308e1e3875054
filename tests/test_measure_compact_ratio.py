"""tools/measure_compact_ratio: the superset/exact fractions it reports
must agree with what the compact render path actually consumes."""

import jax.numpy as jnp
import numpy as np

from transhuman_tpu.render.pipeline import RenderPipeline
from transhuman_tpu.tools.measure_compact_ratio import make_counts_fn, measure

from test_pipeline import setup  # noqa: F401  (module-scoped fixture)


def test_counts_match_compact_plan(setup):  # noqa: F811
    """superset count == the n_active the compact plan computes (same
    prefilter, same mask semantics); exact <= superset (conservative)."""
    pipe, params, frame, rays = setup
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9

    sup, ex, n = make_counts_fn(c)(frame, rays)
    assert int(ex) <= int(sup)
    assert n == rays.ray_o.shape[0] * c.n_samples

    from transhuman_tpu.render.volume import sample_along_rays

    pts, _ = sample_along_rays(rays.ray_o, rays.ray_d, rays.near, rays.far,
                               c.n_samples)
    flat = pts.reshape(-1, 3)
    cp = c.chunk_rays * c.n_samples
    _, _, _, n_active, _, _ = c._compact_plan(
        frame, flat, jnp.repeat(rays.mask, c.n_samples), cp
    )
    assert int(sup) == int(n_active)


def test_measure_report_shape(setup):  # noqa: F811
    pipe, params, frame, rays = setup
    c = RenderPipeline.__new__(RenderPipeline)
    c.__dict__.update(pipe.__dict__)
    c.compact_ratio = 0.9
    rep = measure(c, [(frame, rays), (frame, rays)], margin=1.2)
    assert rep["frames"] == 2
    assert 0.0 <= rep["exact_frac"]["max"] <= rep["superset_frac"]["max"] <= 1.0
    assert np.isclose(
        rep["recommended_compact_ratio"],
        round(rep["superset_frac"]["max"] * 1.2, 4),
    )
    # json-serializable end to end
    import json

    json.dumps(rep)
