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


def test_full_file_roundtrip(tmp_path):
    params = init_lpips_params(jax.random.PRNGKey(0))
    path = tmp_path / "full.npz"
    _save_npz(path, params)
    loaded = load_lpips_params(str(path))
    assert sorted(loaded) == sorted(params)


def test_evaluator_summary_loud_when_lpips_missing(tmp_path, rng):
    from transhuman_tpu.evals import Evaluator

    ev = Evaluator(str(tmp_path), lpips_fn=None, save_images=False)
    mask = np.zeros(16 * 16, bool)
    mask[:32] = True
    ev.evaluate_frame(
        rng.random((32, 3)).astype(np.float32),
        rng.random((32, 3)).astype(np.float32),
        mask,
        (16, 16),
    )
    out = ev.summarize()
    assert out["lpips"] is None
    text = (tmp_path / "summary.txt").read_text()
    assert "n/a (no VGG weights" in text
    assert "ssim(data_range=1.0)" in text
