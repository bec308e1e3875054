"""Deterministic color jitter for training images.

Capability parity with the reference's torchvision ColorJitter
(brightness (0.2,2), contrast (0.3,2), saturation (0.2,2), hue (-0.5,0.5),
`can_smpl.py:278-285`), applied with an epoch+index-derived seed so every
rank/worker sees the same augmentation for the same (epoch, index)
(`can_smpl.py:320-328`).  Reimplemented in numpy/cv2 (same transform
semantics; the exact random draws differ from torchvision's RNG, which only
affects training augmentation, never eval parity).

Runs on the float [0,1] image AFTER the resize (the reference jitters the
full-resolution uint8 frame before undistort/resize) — an intentional
host-pipeline optimization: 1024x1024 u8 jitter was the single largest
input-path cost (~160 ms/sample) and jitter-then-linear-resample vs
resample-then-jitter only differ through the per-op clip, which is
irrelevant for a training augmentation whose draws already deviate from
torchvision's.  In-place blends, one temporary.
"""

from __future__ import annotations

import numpy as np

BRIGHTNESS = (0.2, 2.0)
CONTRAST = (0.3, 2.0)
SATURATION = (0.2, 2.0)
HUE = (-0.5, 0.5)


def _blend_(img, other, f):
    """img <- clip(f*img + (1-f)*other) in place; other is scalar or array."""
    np.multiply(img, f, out=img)
    if isinstance(other, np.ndarray):
        img += (1.0 - f) * other
    elif other != 0.0:
        img += (1.0 - f) * other
    np.clip(img, 0.0, 1.0, out=img)
    return img


_GRAY = np.array([0.299, 0.587, 0.114], np.float32)


def color_jitter(img: np.ndarray, seed: int) -> np.ndarray:
    """img: (H, W, 3) float32 RGB in [0, 1] -> jittered float32 RGB.

    The input array is not modified; ops run in a random order like
    torchvision's ColorJitter."""
    import cv2

    rng = np.random.default_rng(seed)
    img = img.astype(np.float32, copy=True)
    b = rng.uniform(*BRIGHTNESS)
    c = rng.uniform(*CONTRAST)
    s = rng.uniform(*SATURATION)
    h = rng.uniform(*HUE)
    for op in rng.permutation(4):
        if op == 0:
            _blend_(img, 0.0, b)
        elif op == 1:
            mean = float((img @ _GRAY).mean())
            _blend_(img, mean, c)
        elif op == 2:
            gray = (img @ _GRAY)[..., None]
            _blend_(img, gray, s)
        else:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)  # H in [0,360)
            hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return img
