"""Free-viewpoint frame writer (parity: lib/visualizers/if_nerf_perform.py:
16-38 — scatter predicted ray colors into the full H x W frame and save)."""

from __future__ import annotations

import os

import numpy as np


class PerformVisualizer:
    def __init__(self, out_dir: str, white_bkgd: bool = False):
        self.out_dir = out_dir
        self.white_bkgd = white_bkgd
        os.makedirs(out_dir, exist_ok=True)

    def visualize(self, rgb_pred, mask_at_box, hw, frame_index: int, human: str = ""):
        """rgb_pred: (R,3) colors of the in-box rays; mask_at_box: (H*W,)."""
        import cv2

        h, w = hw
        img = np.full((h * w, 3), 1.0 if self.white_bkgd else 0.0, np.float32)
        img[np.asarray(mask_at_box)] = np.asarray(rgb_pred)
        img = img.reshape(h, w, 3)
        d = os.path.join(self.out_dir, human) if human else self.out_dir
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"frame{frame_index:04d}.png")
        cv2.imwrite(path, np.clip(img[..., ::-1] * 255, 0, 255).astype(np.uint8))
        return path


from ..registry import VISUALIZERS


@VISUALIZERS.register("perform")
def _make_perform(*args, **kw):
    """cfg.visualizer plugin entry (reference make_visualizer.py:4-8)."""
    return PerformVisualizer(*args, **kw)
