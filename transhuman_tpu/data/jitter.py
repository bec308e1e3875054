"""Deterministic color jitter for training images.

Capability parity with the reference's torchvision ColorJitter
(brightness (0.2,2), contrast (0.3,2), saturation (0.2,2), hue (-0.5,0.5),
`can_smpl.py:278-285`), applied with an epoch+index-derived seed so every
rank/worker sees the same augmentation for the same (epoch, index)
(`can_smpl.py:320-328`).  Reimplemented in numpy/cv2 (same transform
semantics; the exact random draws differ from torchvision's RNG, which only
affects training augmentation, never eval parity).
"""

from __future__ import annotations

import numpy as np

BRIGHTNESS = (0.2, 2.0)
CONTRAST = (0.3, 2.0)
SATURATION = (0.2, 2.0)
HUE = (-0.5, 0.5)


def _blend(a, b, f):
    return np.clip(f * a + (1.0 - f) * b, 0.0, 255.0)


def color_jitter(img_u8: np.ndarray, seed: int) -> np.ndarray:
    """img_u8: (H, W, 3) uint8 RGB -> jittered uint8 RGB."""
    rng = np.random.default_rng(seed)
    img = img_u8.astype(np.float32)
    b = rng.uniform(*BRIGHTNESS)
    c = rng.uniform(*CONTRAST)
    s = rng.uniform(*SATURATION)
    h = rng.uniform(*HUE)
    for op in rng.permutation(4):
        if op == 0:
            img = _blend(img, 0.0, b)
        elif op == 1:
            mean = img @ np.array([0.299, 0.587, 0.114], np.float32)
            img = _blend(img, float(mean.mean()), c)
        elif op == 2:
            gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
            img = _blend(img, gray, s)
        else:
            import cv2

            hsv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(h * 180)) % 180
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)
    return img.astype(np.uint8)
