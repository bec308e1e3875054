"""LPIPS weight conversion + loading.

Converter source of truth: the reference's vendored calibration heads at
third_parties/lpips/weights/v0.1/vgg.pth (loaded by
third_parties/lpips/lpips.py:23-110). The test against the REAL file is
skipped when the reference checkout is absent.
"""

import os

import jax
import numpy as np
import pytest

from transhuman_tpu.models.lpips import (
    VGG16_STAGES,
    init_lpips_params,
    load_lpips_params,
    lpips_distance,
)
from transhuman_tpu.tools.convert_lpips import convert, convert_lins

REAL_LINS = "/root/reference/third_parties/lpips/weights/v0.1/vgg.pth"


def _save_npz(path, params):
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


@pytest.mark.skipif(not os.path.exists(REAL_LINS), reason="reference lins absent")
def test_convert_real_lpips_lins(tmp_path):
    import torch

    sd = {k: v.numpy() for k, v in torch.load(REAL_LINS, map_location="cpu").items()}
    lins = convert_lins(sd)
    assert sorted(lins) == [f"lin{i}" for i in range(5)]
    for si, (_, ch) in enumerate(VGG16_STAGES):
        w = lins[f"lin{si}"]
        assert w.shape == (ch,) and w.dtype == np.float32
        # the trained calibration heads are non-negative (lpips clamps during
        # training); a negative value would mean a mis-mapped tensor
        assert (w >= 0).all()
    # bit-parity with the raw torch tensors
    for si in range(5):
        np.testing.assert_array_equal(
            lins[f"lin{si}"], sd[f"lin{si}.model.1.weight"].reshape(-1)
        )

    # full pipeline: lins-only npz + random-backbone npz merge and run
    lins_path = tmp_path / "lins_only.npz"
    _save_npz(lins_path, convert(None, sd))
    backbone = tmp_path / "backbone.npz"
    _save_npz(backbone, init_lpips_params(jax.random.PRNGKey(0)))
    params = load_lpips_params(str(lins_path), backbone=str(backbone))
    x = np.linspace(-1, 1, 2 * 16 * 16 * 3, dtype=np.float32).reshape(2, 16, 16, 3)
    d = np.asarray(lpips_distance(params, x, -x))
    assert d.shape == (2,) and np.isfinite(d).all() and (d > 0).all()
    # the real lin weights are in play (not the random init ones)
    np.testing.assert_array_equal(
        np.asarray(params["lin2"]), sd["lin2.model.1.weight"].reshape(-1)
    )


def test_lins_only_without_backbone_is_loud(tmp_path):
    lins_path = tmp_path / "lins_only.npz"
    _save_npz(
        lins_path,
        {f"lin{si}": np.ones(ch, np.float32) for si, (_, ch) in enumerate(VGG16_STAGES)},
    )
    with pytest.raises(ValueError, match="lins-only"):
        load_lpips_params(str(lins_path))


def test_backbone_only_without_lins_is_loud(tmp_path):
    """A convs-only npz (exactly what converting just the torchvision
    backbone produces) must fail at load time, not KeyError inside the
    first jitted lpips_distance trace."""
    params = init_lpips_params(jax.random.PRNGKey(0))
    path = tmp_path / "backbone_only.npz"
    _save_npz(path, {k: v for k, v in params.items() if k.startswith("conv")})
    with pytest.raises(ValueError, match="calibration heads"):
        load_lpips_params(str(path))


def test_unit_norm_matches_vendored_eps_placement():
    """_unit_norm follows the vendored normalize_tensor exactly
    (sqrt(sum+eps)+eps in the denominator) — for a near-dead feature the
    upstream-richzhang placement (sqrt(sum)+eps) differs measurably, so a
    sloppy implementation would fail this pin."""
    import torch

    from transhuman_tpu.models.lpips import _unit_norm

    rng = np.random.default_rng(7)
    for scale in (1.0, 1e-5, 1e-12, 0.0):
        x = (rng.standard_normal((4, 8)) * scale).astype(np.float32)
        tx = torch.from_numpy(x)
        want = tx / (torch.sqrt(tx.pow(2).sum(-1, keepdim=True) + 1e-10) + 1e-10)
        np.testing.assert_allclose(
            np.asarray(_unit_norm(x)), want.numpy(), rtol=1e-6, atol=1e-9,
            err_msg=f"scale {scale}",
        )


def test_full_file_roundtrip(tmp_path):
    params = init_lpips_params(jax.random.PRNGKey(0))
    path = tmp_path / "full.npz"
    _save_npz(path, params)
    loaded = load_lpips_params(str(path))
    assert sorted(loaded) == sorted(params)


def test_masked_lpips_equals_unpadded():
    """Bucket-padded masked LPIPS == plain LPIPS on the unpadded crop, for
    odd/even extents (incl. the maxpool floor-truncation cases), to float
    precision — the evaluator's bucketing must not move the metric."""
    import jax.numpy as jnp

    from transhuman_tpu.models.lpips import lpips_distance_masked

    params = init_lpips_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    # jit (one wrapper, one trace+persistent compile per extent): the eager
    # VGG16 forward pays seconds of per-primitive dispatch per call.
    # params stay a jit ARGUMENT — closing them over would bake ~59 MB of
    # VGG16 weights into every cached executable as HLO constants
    jd = jax.jit(lpips_distance)
    jm = jax.jit(lpips_distance_masked)
    for (h, w) in [(33, 47), (32, 32), (61, 35), (40, 64)]:
        x = rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32)
        ref = np.asarray(jd(params, x, y))
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        pad = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
        got = np.asarray(
            jm(params, np.pad(x, pad), np.pad(y, pad),
               jnp.array([h, w], jnp.int32))
        )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7,
                                   err_msg=f"extent {(h, w)}")


def test_evaluator_bucketed_lpips_path(tmp_path, rng):
    """Evaluator pads crops and threads (h, w) through the masked fn; the
    recorded metric equals the plain unpadded distance."""
    from transhuman_tpu.evals import Evaluator
    from transhuman_tpu.models.lpips import make_lpips_masked_fn

    params = init_lpips_params(jax.random.PRNGKey(0))
    fn = jax.jit(make_lpips_masked_fn(params))
    ev = Evaluator(str(tmp_path), lpips_fn=fn, save_images=False)
    h = w = 16
    mask = np.ones(h * w, bool)
    pred = rng.random((h * w, 3)).astype(np.float32)
    gt = rng.random((h * w, 3)).astype(np.float32)
    r = ev.evaluate_frame(pred, gt, mask, (h, w))
    direct = float(
        np.asarray(
            lpips_distance(
                params,
                pred.reshape(1, h, w, 3) * 2 - 1,
                gt.reshape(1, h, w, 3) * 2 - 1,
            )
        ).reshape(())
    )
    assert abs(r["lpips"] - direct) < 1e-5


def test_evaluator_summary_loud_when_lpips_missing(tmp_path, rng):
    from transhuman_tpu.evals import Evaluator

    ev = Evaluator(str(tmp_path), lpips_fn=None, save_images=False)
    # an 8x8 blob: clears the degenerate-crop guard (>= 7x7 bbox)
    mask2d = np.zeros((16, 16), bool)
    mask2d[4:12, 4:12] = True
    mask = mask2d.reshape(-1)
    n = int(mask.sum())
    ev.evaluate_frame(
        rng.random((n, 3)).astype(np.float32),
        rng.random((n, 3)).astype(np.float32),
        mask,
        (16, 16),
    )
    out = ev.summarize()
    assert out["lpips"] is None
    text = (tmp_path / "summary.txt").read_text()
    assert "n/a (no VGG weights" in text
    assert "ssim(data_range=1.0)" in text


def test_vgg16_backbone_conversion_drill(tmp_path):
    """Full-stack rehearsal of the license-gated backbone path: a random
    torchvision-format VGG16 `features` state_dict + an LPIPS-format lins
    state_dict go through the convert_lpips CLI (torch.save -> .pth -> npz),
    load via load_lpips_params, and the jnp lpips_distance must match an
    independent torch replica of the vendored LPIPS forward
    (third_parties/lpips/lpips.py:23-110: scaling layer, 13 convs + relu,
    2x2 maxpools between stages, channel unit-norm, non-negative 1x1 lin
    heads, spatial mean, sum over the 5 stages)."""
    import torch
    import torch.nn.functional as F

    from transhuman_tpu.tools.convert_lpips import VGG16_FEATURE_IDX, main

    g = torch.Generator().manual_seed(0)
    vgg_sd, c_in = {}, 3
    for si, (n_convs, ch) in enumerate(VGG16_STAGES):
        for li in VGG16_FEATURE_IDX[si]:
            vgg_sd[f"features.{li}.weight"] = (
                torch.randn(ch, c_in, 3, 3, generator=g) * 0.05
            )
            vgg_sd[f"features.{li}.bias"] = torch.randn(ch, generator=g) * 0.05
            c_in = ch
    lins_sd = {
        f"lin{si}.model.1.weight": torch.randn(
            1, ch, 1, 1, generator=g
        ).abs()
        for si, (_, ch) in enumerate(VGG16_STAGES)
    }

    vgg_path, lins_path = tmp_path / "vgg.pth", tmp_path / "lins.pth"
    out_path = tmp_path / "full.npz"
    torch.save(vgg_sd, vgg_path)
    torch.save(lins_sd, lins_path)
    main(["--vgg", str(vgg_path), "--lins", str(lins_path), str(out_path)])
    params = load_lpips_params(str(out_path))

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 35, 29, 3)).astype(np.float32)  # odd extents
    y = rng.uniform(-1, 1, (2, 35, 29, 3)).astype(np.float32)
    got = np.asarray(lpips_distance(params, x, y))

    # independent torch oracle (NCHW)
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def stages(z):
        z = (z - shift) / scale
        outs = []
        for si, idxs in enumerate(VGG16_FEATURE_IDX):
            for li in idxs:
                z = F.relu(
                    F.conv2d(
                        z, vgg_sd[f"features.{li}.weight"],
                        vgg_sd[f"features.{li}.bias"], padding=1,
                    )
                )
            outs.append(z)
            if si < len(VGG16_FEATURE_IDX) - 1:
                z = F.max_pool2d(z, 2)
        return outs

    def unit(z):
        # vendored normalize_tensor (third_parties/lpips/__init__.py:40-42):
        # eps inside the sqrt AND added to the norm factor
        return z / (torch.sqrt(z.pow(2).sum(1, keepdim=True) + 1e-10) + 1e-10)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    want = 0.0
    for si, (gx, gy) in enumerate(zip(stages(tx), stages(ty))):
        d = (unit(gx) - unit(gy)).pow(2)
        want = want + (d * lins_sd[f"lin{si}.model.1.weight"]).sum(1).mean((1, 2))
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=1e-6)
