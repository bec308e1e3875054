"""Metric goldens: SSIM vs an explicit sliding-window reference; LPIPS vs a
torch replica of the VGG16-lin architecture (random weights)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from transhuman_tpu.evals import metrics
from transhuman_tpu.models.lpips import (
    VGG16_STAGES,
    _SCALE,
    _SHIFT,
    init_lpips_params,
    lpips_distance,
)


def ssim_direct(x, y, data_range=2.0, win=7, K1=0.01, K2=0.03):
    """Brutally literal windowed SSIM (sample covariance, border crop)."""
    H, W = x.shape
    pad = (win - 1) // 2
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    vals = []
    for i in range(pad, H - pad):
        for j in range(pad, W - pad):
            wx = x[i - pad : i + pad + 1, j - pad : j + pad + 1].ravel()
            wy = y[i - pad : i + pad + 1, j - pad : j + pad + 1].ravel()
            ux, uy = wx.mean(), wy.mean()
            vx, vy = wx.var(ddof=1), wy.var(ddof=1)
            vxy = ((wx - ux) * (wy - uy)).sum() / (wx.size - 1)
            vals.append(
                ((2 * ux * uy + C1) * (2 * vxy + C2))
                / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
            )
    return float(np.mean(vals))


def test_ssim_matches_direct(rng):
    x = rng.random((24, 20)).astype(np.float64)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)
    got = metrics.ssim(x, y)
    want = ssim_direct(x, y)
    assert abs(got - want) < 1e-7


def test_ssim_identical_images():
    x = np.random.default_rng(1).random((30, 30, 3))
    assert abs(metrics.ssim(x, x) - 1.0) < 1e-9


def test_ssim_degenerate_crop_raises():
    """A crop smaller than the 7x7 window must raise (like skimage's
    "win_size exceeds image extent"), not return NaN with a RuntimeWarning
    (VERDICT r3 weak #2)."""
    import pytest

    tiny = np.zeros((4, 5))
    with pytest.raises(ValueError, match="smaller than the 7x7 window"):
        metrics.ssim(tiny, tiny)
    with pytest.raises(ValueError, match="smaller than the 7x7 window"):
        metrics.ssim(np.zeros((0, 0, 3)), np.zeros((0, 0, 3)))


def test_evaluator_degenerate_mask_raises(tmp_path):
    """An empty / tiny mask_at_box must fail loudly WITH the frame identity
    instead of polluting the accumulators with NaN (VERDICT r3 weak #2)."""
    import pytest

    from transhuman_tpu.evals import Evaluator

    ev = Evaluator(str(tmp_path), save_images=False)
    hw = (16, 16)
    empty = np.zeros(256, bool)
    with pytest.raises(ValueError, match="frame=7"):
        ev.evaluate_frame(
            np.zeros((0, 3)), np.zeros((0, 3)), empty, hw,
            human="H", frame_index=7, cam_ind=2,
        )
    # 3x3 blob: nonempty but below the SSIM window
    tiny = np.zeros((16, 16), bool)
    tiny[5:8, 5:8] = True
    with pytest.raises(ValueError, match="bbox 3x3"):
        ev.evaluate_frame(
            np.zeros((9, 3)), np.zeros((9, 3)), tiny.reshape(-1), hw,
            human="H", frame_index=8, cam_ind=0,
        )
    # nothing was accumulated by the failed frames
    assert ev.mse == [] and ev.ssim == []


def test_evaluator_lpips_small_crop_raises(tmp_path, rng):
    """Crops under 16px/side have a zero VGG stage-5 extent -> the masked
    LPIPS would 0/0-NaN (and torch's would crash); the evaluator must raise
    with the frame identity before calling it."""
    import pytest

    from transhuman_tpu.evals import Evaluator

    ev = Evaluator(
        str(tmp_path), save_images=False,
        lpips_fn=lambda x, y, hw: np.zeros(1),
    )
    hw = (16, 16)
    blob = np.zeros((16, 16), bool)
    blob[2:12, 2:14] = True  # 12x10 bbox: fine for SSIM, too small for LPIPS
    n = int(blob.sum())
    pred = rng.random((n, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="LPIPS needs a crop >= 16px"):
        ev.evaluate_frame(pred, pred, blob.reshape(-1), hw, frame_index=4)
    # the guard fires BEFORE any accumulation: a caller that catches and
    # skips the frame must not be left with desynced metric lists
    assert ev.mse == [] and ev.psnr == [] and ev.ssim == [] and ev.lpips == []


def test_psnr():
    a = np.zeros((10, 3))
    b = np.full((10, 3), 0.1)
    assert abs(metrics.psnr(a, b) - 20.0) < 1e-6


class TorchLPIPS(nn.Module):
    """Independent replica of the vendored LPIPS math for cross-checking."""

    def __init__(self, params):
        super().__init__()
        self.params = {
            k: torch.from_numpy(np.asarray(v)).float() for k, v in params.items()
        }

    def forward(self, x, y):
        def stages(t):
            t = (t - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(
                _SCALE
            ).view(1, 3, 1, 1)
            outs = []
            for si, (n_convs, _) in enumerate(VGG16_STAGES):
                for ci in range(n_convs):
                    w = self.params[f"conv{si}_{ci}_w"].permute(3, 2, 0, 1)
                    b = self.params[f"conv{si}_{ci}_b"]
                    t = F.relu(F.conv2d(t, w, b, padding=1))
                outs.append(t)
                if si < 4:
                    t = F.max_pool2d(t, 2)
            return outs

        fx, fy = stages(x), stages(y)
        total = 0.0
        for si, (gx, gy) in enumerate(zip(fx, fy)):
            nx = gx / (gx.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            ny = gy / (gy.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            d = (nx - ny).pow(2)
            w = self.params[f"lin{si}"].view(1, -1, 1, 1)
            total = total + (d * w).sum(1).mean(dim=(1, 2))
        return total


def test_lpips_matches_torch_replica(rng):
    import jax

    params = init_lpips_params(jax.random.PRNGKey(0))
    x = (rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    y = (rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    got = np.asarray(lpips_distance(params, x, y))
    torch_model = TorchLPIPS(jax.tree.map(np.asarray, params))
    want = (
        torch_model(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2),
        )
        .detach()
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    # distance to self is zero
    np.testing.assert_allclose(
        np.asarray(lpips_distance(params, x, x)), 0.0, atol=1e-6
    )


def test_evaluator_flow(tmp_path, rng):
    from transhuman_tpu.evals import Evaluator

    ev = Evaluator(str(tmp_path), save_images=True)
    hw = (16, 16)
    mask = np.zeros(256, bool)
    mask[60:180] = True
    pred = rng.random((120, 3)).astype(np.float32)
    gt = np.clip(pred + 0.01, 0, 1)
    r = ev.evaluate_frame(pred, gt, mask, hw, human="H", frame_index=3, cam_ind=1)
    assert r["psnr"] > 30
    out = ev.summarize()
    assert out["psnr"] is not None and (tmp_path / "summary.txt").exists()
    assert (tmp_path / "H" / "pred" / "frame3_view1.png").exists()
    assert ev.mse == []  # reset
