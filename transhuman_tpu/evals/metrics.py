"""Image metrics with the exact semantics the reference evaluates with.

* PSNR: -10*log10(mse) over the masked ray set (if_nerf.py:34-37,121-134).
* SSIM: skimage.structural_similarity(multichannel=True) semantics — 7x7
  uniform windows, sample-covariance normalization (N/(N-1)), border crop of
  the filter radius, channel-mean — including the quirk that skimage assumes
  data_range=2.0 for float inputs (the reference never passes data_range, so
  its published numbers use 2.0; pass data_range=1.0 for the strictly-correct
  [0,1] value).
"""

from __future__ import annotations

import numpy as np


def mse(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.mean((pred - gt) ** 2))


def psnr(pred: np.ndarray, gt: np.ndarray, *, from_mse=None) -> float:
    """-10*log10(mse); pass from_mse to reuse an already-computed mean
    squared error instead of re-reducing the full arrays (the evaluator
    computes mse immediately before psnr on the same (R,3) buffers)."""
    m = mse(pred, gt) if from_mse is None else from_mse
    return float(-10.0 * np.log10(m))


def _uniform_filter(x: np.ndarray, win: int) -> np.ndarray:
    """Mean filter via 2D cumulative sums; interior values only are used
    downstream (the SSIM map is border-cropped), so edge handling is moot."""
    import cv2

    return cv2.blur(x, (win, win), borderType=cv2.BORDER_REFLECT)


def ssim_multi(
    pred: np.ndarray,
    gt: np.ndarray,
    data_ranges=(2.0,),
    win_size: int = 7,
    K1: float = 0.01,
    K2: float = 0.03,
):
    """SSIM at SEVERAL data_ranges sharing one set of filtered moments.

    The five cv2.blur moment filters per channel dominate the cost; the
    data_range enters only through the C1/C2 constants, so evaluating both
    the reference's 2.0 quirk and the correct 1.0 convention per frame
    costs one moment pass, not two (the eval loop is host-bound).  Returns
    a list of floats aligned with `data_ranges`.

    Raises ValueError when either image extent is smaller than `win_size`
    (the border-cropped SSIM map would be empty -> NaN-with-RuntimeWarning);
    skimage.structural_similarity raises in the same situation ("win_size
    exceeds image extent"), so this matches reference behavior."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if min(pred.shape[:2], default=0) < win_size:
        raise ValueError(
            f"ssim: image extent {pred.shape[:2]} is smaller than the "
            f"{win_size}x{win_size} window (empty or degenerate crop)"
        )
    if pred.ndim == 3:
        per_c = [
            ssim_multi(pred[..., c], gt[..., c], data_ranges, win_size,
                       K1, K2)
            for c in range(pred.shape[-1])
        ]
        return [float(np.mean([pc[i] for pc in per_c]))
                for i in range(len(data_ranges))]
    np_win = win_size * win_size
    cov_norm = np_win / (np_win - 1)
    ux = _uniform_filter(pred, win_size)
    uy = _uniform_filter(gt, win_size)
    uxx = _uniform_filter(pred * pred, win_size)
    uyy = _uniform_filter(gt * gt, win_size)
    uxy = _uniform_filter(pred * gt, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    pad = (win_size - 1) // 2
    out = []
    for data_range in data_ranges:
        C1 = (K1 * data_range) ** 2
        C2 = (K2 * data_range) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2)
        )
        out.append(float(S[pad:-pad, pad:-pad].mean()))
    return out


def ssim(
    pred: np.ndarray,
    gt: np.ndarray,
    data_range: float = 2.0,
    win_size: int = 7,
    K1: float = 0.01,
    K2: float = 0.03,
) -> float:
    """pred/gt: (H, W) or (H, W, C) float images (see ssim_multi)."""
    return ssim_multi(pred, gt, (data_range,), win_size, K1, K2)[0]
