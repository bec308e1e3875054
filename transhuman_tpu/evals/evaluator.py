"""Per-frame metric accumulation + image dumps + summary files.

Capability parity with `lib/evaluators/if_nerf.py`: MSE/PSNR on the masked
ray colors; SSIM + LPIPS on the bbox-cropped reconstructed images; pred/gt/
input PNG dumps per human; `summarize()` writes per-frame metric .npy arrays
and summary.txt and resets the accumulators.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import metrics


class Evaluator:
    def __init__(
        self,
        result_dir: str,
        lpips_fn=None,
        save_images: bool = True,
        ssim_data_range: float = 2.0,
        exp_name: str = "transhuman_tpu",
        epoch: int = -1,
        lpips_bucket: int = 32,
    ):
        """lpips_fn: with lpips_bucket > 0 (default) a masked 3-arg closure
        (x, y, hw) -> (B,) (models.lpips.make_lpips_masked_fn): bbox crops
        are zero-padded up to multiples of `lpips_bucket`, so the whole eval
        compiles one program per size bucket instead of one per frame (the
        per-frame crop shapes would each cost a 2-6 min tunnel compile).
        The masked distance equals the unpadded one exactly (lpips.py).
        lpips_bucket = 0 keeps the legacy 2-arg (x, y) per-shape call."""
        self.result_dir = result_dir
        self.lpips_fn = lpips_fn
        self.lpips_bucket = lpips_bucket
        self.save_images = save_images
        self.ssim_data_range = ssim_data_range
        self.exp_name = exp_name
        self.epoch = epoch
        self.mse, self.psnr, self.ssim, self.lpips = [], [], [], []
        self.ssim_dr1 = []

    # ------------------------------------------------------------------
    def _reconstruct(self, rgb, mask_at_box, hw, white_bkgd=False):
        h, w = hw
        img = np.full((h * w, 3), 1.0 if white_bkgd else 0.0, np.float32)
        img[mask_at_box] = rgb
        return img.reshape(h, w, 3)

    def evaluate_frame(
        self,
        rgb_pred: np.ndarray,  # (R, 3) valid-ray predictions
        rgb_gt: np.ndarray,  # (R, 3)
        mask_at_box: np.ndarray,  # (H*W,) bool
        hw: tuple,
        human: str = "human",
        frame_index: int = 0,
        cam_ind: int = 0,
        input_imgs: Optional[np.ndarray] = None,  # (V, H, W, 3)
        white_bkgd: bool = False,
    ) -> dict:
        import cv2

        # degenerate-frame guard: an empty mask (0 rays) or a bbox tinier
        # than the 7x7 SSIM window would otherwise yield NaN metrics with a
        # numpy RuntimeWarning deep inside the filters — fail loudly WITH the
        # frame identity instead (skimage raises on the same inputs, so the
        # reference eval would not survive such a frame either; if_nerf.py:39-62)
        x, y, w, h = cv2.boundingRect(mask_at_box.reshape(hw).astype(np.uint8))
        if len(rgb_pred) == 0 or min(h, w) < 7:
            raise ValueError(
                f"degenerate eval frame: human={human} frame={frame_index} "
                f"cam={cam_ind} — mask_at_box has {int(np.sum(mask_at_box))} "
                f"pixels, bbox {w}x{h} (needs >= 7x7 for SSIM). The mask is "
                "empty or nearly so; check the dataset masks/bounds."
            )
        if self.lpips_fn is not None and min(h, w) < 16:
            # VGG16-LPIPS has 4 stride-2 pools: a crop side < 16 px has a
            # ZERO valid extent at stage 5 (masked path -> 0/0 NaN; torch's
            # unpadded run crashes on the zero-height conv input there, so
            # the reference could not evaluate this frame either).  Checked
            # HERE, before any metric is appended: a guard that fired after
            # the mse/psnr/ssim appends would leave the per-metric lists
            # desynced for callers that catch and continue.
            raise ValueError(
                f"LPIPS needs a crop >= 16px per side; got {w}x{h} for "
                f"human={human} frame={frame_index} cam={cam_ind}"
            )

        frame_mse = metrics.mse(rgb_pred, rgb_gt)
        self.mse.append(frame_mse)
        self.psnr.append(metrics.psnr(rgb_pred, rgb_gt, from_mse=frame_mse))

        img_pred = self._reconstruct(rgb_pred, mask_at_box, hw, white_bkgd)
        img_gt = self._reconstruct(rgb_gt, mask_at_box, hw, white_bkgd)
        # crop to the tight bbox of the rendered region (if_nerf.py:58-62)
        crop_pred = img_pred[y : y + h, x : x + w]
        crop_gt = img_gt[y : y + h, x : x + w]

        # one moment pass for BOTH data_ranges (the cv2.blur filters are
        # the dominant SSIM cost on the host-bound eval loop): headline
        # column keeps data_range=2.0 (the skimage float default the
        # reference's published numbers use); ssim_dr1 is the
        # strictly-correct [0,1]-image convention
        s_head, s_dr1 = metrics.ssim_multi(
            crop_pred, crop_gt, (self.ssim_data_range, 1.0)
        )
        self.ssim.append(s_head)
        self.ssim_dr1.append(s_dr1)
        if self.lpips_fn is not None:
            a = crop_pred[None] * 2.0 - 1.0
            b = crop_gt[None] * 2.0 - 1.0
            if self.lpips_bucket:
                ch, cw = crop_pred.shape[:2]
                bk = self.lpips_bucket
                ph, pw = -(-ch // bk) * bk, -(-cw // bk) * bk
                pad = ((0, 0), (0, ph - ch), (0, pw - cw), (0, 0))
                lp = self.lpips_fn(
                    np.pad(a, pad), np.pad(b, pad),
                    np.array([ch, cw], np.int32),
                )
            else:
                lp = self.lpips_fn(a, b)
            self.lpips.append(float(np.asarray(lp).reshape(())))

        if self.save_images:
            hdir = os.path.join(self.result_dir, human)
            for sub in ("pred", "gt", "input"):
                os.makedirs(os.path.join(hdir, sub), exist_ok=True)
            cv2.imwrite(
                f"{hdir}/pred/frame{frame_index}_view{cam_ind}.png",
                np.clip(crop_pred[..., ::-1] * 255, 0, 255).astype(np.uint8),
            )
            cv2.imwrite(
                f"{hdir}/gt/frame{frame_index}_view{cam_ind}_gt.png",
                np.clip(crop_gt[..., ::-1] * 255, 0, 255).astype(np.uint8),
            )
            if input_imgs is not None:
                for v, im in enumerate(input_imgs):
                    cv2.imwrite(
                        f"{hdir}/input/frame{frame_index}_t_0_view_{v}.png",
                        np.clip(im[..., ::-1] * 255, 0, 255).astype(np.uint8),
                    )

        return {
            "mse": self.mse[-1],
            "psnr": self.psnr[-1],
            "ssim": self.ssim[-1],
            "lpips": self.lpips[-1] if self.lpips else None,
        }

    # ------------------------------------------------------------------
    def summarize(self, write: bool = True) -> dict:
        """write=False computes the summary dict without touching the
        filesystem (non-zero ranks of a frame-sharded eval: the metrics are
        already merged globally, but only process 0 owns the output files,
        matching the reference's rank-0-only I/O, recorder.py:41)."""
        if write:
            os.makedirs(self.result_dir, exist_ok=True)
            for name in ("mse", "psnr", "ssim", "lpips"):
                np.save(
                    os.path.join(self.result_dir, f"{name}.npy"),
                    getattr(self, name),
                )
        out = {
            "experiment": self.exp_name,
            "epoch": self.epoch,
            "mse": float(np.mean(self.mse)) if self.mse else None,
            "psnr": float(np.mean(self.psnr)) if self.psnr else None,
            "ssim": float(np.mean(self.ssim)) if self.ssim else None,
            "lpips": float(np.mean(self.lpips)) if self.lpips else None,
        }
        # the missing-weights case must be loud in the summary, not a silent
        # None that reads like "LPIPS = 0"
        text = dict(out)
        if self.lpips_fn is None and out["lpips"] is None:
            text["lpips"] = "n/a (no VGG weights — set cfg.lpips_weights)"
        if self.ssim_dr1:
            text["ssim(data_range=1.0)"] = float(np.mean(self.ssim_dr1))
        if write:
            with open(os.path.join(self.result_dir, "summary.txt"), "w") as f:
                f.writelines(f"{k}: {v}\n" for k, v in text.items())
        self.mse, self.psnr, self.ssim, self.lpips = [], [], [], []
        self.ssim_dr1 = []
        return out


def merge_across_processes(ev: Evaluator, positions) -> Evaluator:
    """Frame-sharded eval: merge the per-frame metric lists accumulated by
    every process into each process's evaluator, ordered by the frames'
    global positions — so `summarize()` equals a single-process run exactly
    (content and .npy order).  `positions[i]` is the global FrameSampler
    ordinal of the i-th frame this process evaluated.  No-op single-process.
    The reference has no analog: its eval is strictly one GPU (run.py:7-55).
    """
    import jax

    if jax.process_count() == 1:
        return ev
    from ..parallel.mesh import gather_positioned

    for name in ("mse", "psnr", "ssim", "ssim_dr1", "lpips"):
        vals = getattr(ev, name)
        # lpips is either per-frame or entirely absent (no weights)
        merged = gather_positioned(vals, positions[: len(vals)])
        setattr(ev, name, [float(x) for x in merged])
    return ev


from ..registry import EVALUATORS


@EVALUATORS.register("if_nerf")
def _make_if_nerf(*args, **kw):
    """cfg.evaluator plugin entry (reference make_evaluator.py:4-8)."""
    return Evaluator(*args, **kw)
