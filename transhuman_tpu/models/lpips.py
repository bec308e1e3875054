"""LPIPS perceptual distance (VGG16 backbone), functional jnp implementation.

Capability parity with the vendored LPIPS used for the training loss and the
evaluator metric (`third_parties/lpips/lpips.py:23-110`): inputs in [-1,1]
are shifted/scaled by the ImageNet statistics, passed through VGG16's five
conv stages, each stage's features are channel-unit-normalized, squared
differences are reduced by learned non-negative 1x1 "lin" weights and
averaged spatially, and the five stage scores are summed.

Weights are a plain dict pytree (see tools/convert_lpips.py for the
torch->npz converter); with no weights available the training loss simply
omits the perceptual term (cfg.lpips_weights == '').

NHWC layout; convs hit the MXU.  The whole distance is jit-able and
differentiable (it backs the training loss at if_nerf_clight.py:65-72).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature-extractor conv plan: (#convs, channels) per stage; stages are
# separated by 2x2 max-pools, LPIPS taps the relu after each stage's last conv
VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(key, seed_scale: float = 0.05):
    """Random-weight parameter tree with the correct shapes (testing only;
    real use requires converted pretrained weights).  Distinct `key`s give
    distinct trees (the key seeds the host rng)."""
    params = {}
    try:  # typed PRNG key or legacy uint32 key array both accepted
        kd = np.asarray(jax.random.key_data(key))
    except TypeError:
        kd = np.asarray(key)
    rng = np.random.default_rng(kd.astype(np.uint64).ravel())
    c_in = 3
    for si, (n_convs, ch) in enumerate(VGG16_STAGES):
        for ci in range(n_convs):
            params[f"conv{si}_{ci}_w"] = (
                rng.standard_normal((3, 3, c_in, ch)).astype(np.float32) * seed_scale
            )
            params[f"conv{si}_{ci}_b"] = np.zeros(ch, np.float32)
            c_in = ch
        params[f"lin{si}"] = np.abs(
            rng.standard_normal(ch).astype(np.float32) * seed_scale
        )
    return jax.tree.map(jnp.asarray, params)


def _vgg_stages(params, x):
    """x: (B,H,W,3) in [-1,1] -> list of 5 stage activations (post-relu)."""
    x = (x - _SHIFT) / _SCALE
    outs = []
    for si, (n_convs, _) in enumerate(VGG16_STAGES):
        for ci in range(n_convs):
            w = params[f"conv{si}_{ci}_w"]
            b = params[f"conv{si}_{ci}_b"]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.relu(x)
        outs.append(x)
        if si < len(VGG16_STAGES) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return outs


def _unit_norm(x, eps=1e-10):
    """Channel unit-norm, matching the vendored `normalize_tensor`
    (third_parties/lpips/__init__.py:40-42) exactly: eps appears both inside
    the sqrt AND added to the norm factor — `x / (sqrt(sum(x^2)+eps) + eps)`.
    (The upstream richzhang LPIPS uses `sqrt(sum)+eps`; the reference vendors
    the double-eps variant, and parity follows the vendored copy.)"""
    return x / (jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps) + eps)


def lpips_distance(params, x, y):
    """x, y: (B,H,W,3) in [-1,1] -> (B,) perceptual distances."""
    fx = _vgg_stages(params, x)
    fy = _vgg_stages(params, y)
    total = 0.0
    for si, (gx, gy) in enumerate(zip(fx, fy)):
        d = jnp.square(_unit_norm(gx) - _unit_norm(gy))  # (B,H,W,C)
        w = params[f"lin{si}"]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def make_lpips_fn(params):
    """Closure (x, y) -> distances, with params baked in (for the loss)."""
    return lambda x, y: lpips_distance(params, x, y)


def _mask_hw(x, h, w):
    """Zero activations at rows >= h / cols >= w (h, w may be traced)."""
    r = jnp.arange(x.shape[1])[:, None] < h
    c = jnp.arange(x.shape[2])[None, :] < w
    return x * (r & c)[None, :, :, None].astype(x.dtype)


def _vgg_stages_masked(params, x, h, w):
    """_vgg_stages over a zero-padded (B,H,W,3) input whose valid region is
    x[:, :h, :w].  Returns (stage activations, per-stage valid extents);
    activations are EXACTLY those of the unpadded run on the valid extents
    and zero outside:

    - Zeroing outside the valid extent before every conv makes a same-pad
      conv read the same zeros the unpadded run's boundary padding provides
      (the contamination to kill is deeper: after conv+bias+relu the padded
      region is no longer zero, so re-mask after every relu).
    - 2x2/2 max-pool extents propagate as floor(h/2) — the same odd-size
      truncation torch's MaxPool2d applies in the unpadded run; windows
      with i < floor(h/2) read only valid rows, so values match exactly.
    """
    x = (x - _SHIFT) / _SCALE
    x = _mask_hw(x, h, w)
    outs, exts = [], []
    for si, (n_convs, _) in enumerate(VGG16_STAGES):
        for ci in range(n_convs):
            wk = params[f"conv{si}_{ci}_w"]
            b = params[f"conv{si}_{ci}_b"]
            x = jax.lax.conv_general_dilated(
                x, wk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = _mask_hw(jax.nn.relu(x), h, w)
        outs.append(x)
        exts.append((h, w))
        if si < len(VGG16_STAGES) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            h, w = h // 2, w // 2
            x = _mask_hw(x, h, w)
    return outs, exts


def lpips_distance_masked(params, x, y, hw):
    """LPIPS over zero-padded inputs: x, y (B,H,W,3) in [-1,1] with the
    valid crop at [:, :hw[0], :hw[1]]; returns (B,) distances EXACTLY equal
    to `lpips_distance` on the unpadded crop (see _vgg_stages_masked).

    This is what lets the evaluator pad per-frame bbox crops to a few size
    buckets — one jit compile per bucket instead of one per frame
    (lib/evaluators/if_nerf.py:39-119 recomputes eagerly per frame) —
    without changing the metric."""
    fx, exts = _vgg_stages_masked(params, x, hw[0], hw[1])
    fy, _ = _vgg_stages_masked(params, y, hw[0], hw[1])
    total = 0.0
    for si, (gx, gy) in enumerate(zip(fx, fy)):
        d = jnp.square(_unit_norm(gx) - _unit_norm(gy))  # zero off-extent
        w = params[f"lin{si}"]
        h_s, w_s = exts[si]
        total = total + jnp.sum(d * w, axis=(1, 2, 3)) / (h_s * w_s)
    return total


def make_lpips_masked_fn(params):
    """Closure (x, y, hw) -> distances (for the bucketed evaluator)."""
    return lambda x, y, hw: lpips_distance_masked(params, x, y, hw)


def load_lpips_params(path: str, backbone: str = ""):
    """Load a converted .npz weight file (tools/convert_lpips.py).

    Accepts either a full file (13 VGG16 convs + 5 lin heads) or a lins-only
    file (the reference vendors only the learned calibration heads at
    third_parties/lpips/weights/v0.1/vgg.pth; the VGG16 backbone is the
    standard torchvision IMAGENET1K pretrained `features` weights, which are
    not redistributed here). For a lins-only file, pass `backbone` — a second
    converted .npz containing the conv weights — and the two are merged.
    A lins-only file without a backbone raises, loudly: LPIPS without the
    pretrained backbone is meaningless.
    """
    with np.load(path) as z:
        params = {k: jnp.asarray(z[k]) for k in z.files}
    if backbone:
        with np.load(backbone) as z:
            params.update(
                {k: jnp.asarray(z[k]) for k in z.files if k.startswith("conv")}
            )
    missing = [
        f"conv{si}_{ci}_{t}"
        for si, (n_convs, _) in enumerate(VGG16_STAGES)
        for ci in range(n_convs)
        for t in ("w", "b")
        if f"conv{si}_{ci}_{t}" not in params
    ]
    if missing:
        raise ValueError(
            f"LPIPS weights at {path!r} are lins-only ({len(missing)} conv "
            "tensors missing). Convert the torchvision VGG16 IMAGENET1K "
            "`features` state_dict with tools/convert_lpips.py and pass it "
            "as `backbone=` (or cfg.lpips_backbone)."
        )
    missing_lins = [
        f"lin{si}" for si in range(len(VGG16_STAGES)) if f"lin{si}" not in params
    ]
    if missing_lins:
        raise ValueError(
            f"LPIPS weights at {path!r} lack the learned calibration heads "
            f"({', '.join(missing_lins)}). A backbone-only npz is not a "
            "usable LPIPS: convert the reference's "
            "third_parties/lpips/weights/v0.1/vgg.pth with "
            "tools/convert_lpips.py and pass it as the main path (the "
            "backbone npz goes in `backbone=`)."
        )
    return params
