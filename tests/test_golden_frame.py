"""Committed golden-frame regression pin (VERDICT r3 #4).

Every other parity test recomputes BOTH sides at test time (torch oracle vs
flax) — strong against divergence from torch, blind to *joint* drift (a JAX
upgrade or a refactor that shifts oracle and implementation together).  This
test renders a tiny deterministic scene on CPU (fixed seeds, f32, highest
matmul precision via conftest) and compares against a committed npz, end to
end through the full pipeline (encoder -> TransHE -> DPaRF -> heads ->
compositing) and the evaluator protocol surface (PSNR/SSIM, if_nerf.py:
121-134).

If this fails after an INTENTIONAL change (new JAX pin, a numerics-affecting
refactor), inspect the diff magnitude, then regenerate with:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/regen_golden_frame.py

and say in the commit message why the numbers moved.  A silent small drift
is exactly what this pin exists to catch — do not regen without a reason.
"""

from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "golden" / "render_frame.npz"

# scene constants shared with tools/regen_golden_frame.py
SCENE = dict(
    image_hw=(64, 64),
    n_verts=512,
    n_clusters=32,
    n_samples=8,
    chunk_rays=16,
    vit_depth=2,
)
N_RAYS = 64
EVAL_HW = (8, 8)


def render_golden():
    """The pinned computation: dense full-frame render + evaluator metrics
    against a deterministic pseudo-gt (pred + 0.01, clipped)."""
    import jax
    import jax.numpy as jnp

    from transhuman_tpu.evals import metrics
    from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup

    model, pipe, frame, _, cluster = synthetic_setup(**SCENE)
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(N_RAYS)
    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(jnp.asarray, rays)
    out = jax.jit(pipe.render_frame)(params, frame, rays)
    out = {k: np.asarray(v, np.float32) for k, v in out.items()}

    # evaluator surface: reconstruct an 8x8 image from the 64 rays and run
    # the metric math the reference evaluates with (data_range=2.0 quirk)
    img = out["rgb_map"].reshape(*EVAL_HW, 3).astype(np.float64)
    gt = np.clip(img + 0.01, 0.0, 1.0)
    out["psnr"] = np.float32(metrics.psnr(img, gt))
    out["ssim"] = np.float32(metrics.ssim(img, gt))
    return out


def test_render_matches_committed_golden():
    got = render_golden()
    want = np.load(GOLDEN)
    assert set(want.files) == set(got)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-5, atol=2e-5,
            err_msg=f"{k} drifted from the committed golden — see module "
            "docstring before regenerating",
        )
    np.testing.assert_allclose(got["psnr"], want["psnr"], atol=5e-4)
    np.testing.assert_allclose(got["ssim"], want["ssim"], atol=1e-5)


def test_golden_is_nontrivial():
    """Guard the fixture itself: a zero/constant golden would pass the drift
    check while pinning nothing."""
    z = np.load(GOLDEN)
    assert float(np.abs(z["rgb_map"]).max()) > 1e-3
    assert float(z["acc_map"].max()) > 1e-3
    assert 0 < float(z["ssim"]) <= 1.0
