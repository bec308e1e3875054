"""flax layer blocks vs torch oracles (BN train-mode, align-corners resize,
3x3/s2 max-pool)."""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from transhuman_tpu.models.layers import (
    BatchStatNorm,
    max_pool_3x3_s2,
    upsample_align_corners,
)


def test_batch_stat_norm_matches_torch_train_mode(rng):
    x = rng.standard_normal((3, 8, 8, 6)).astype(np.float32)
    bn = BatchStatNorm()
    params = bn.init(jax.random.PRNGKey(0), x)
    # randomize scale/bias
    scale = rng.standard_normal(6).astype(np.float32)
    bias = rng.standard_normal(6).astype(np.float32)
    params = {"params": {"scale": scale, "bias": bias}}
    got = np.asarray(bn.apply(params, x))

    tbn = torch.nn.BatchNorm2d(6, affine=True)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
    tbn.train()  # batch statistics — the mode the reference always runs in
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = tbn(tx).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample_align_corners_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    got = np.asarray(upsample_align_corners(x, (20, 13)))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(tx, (20, 13), mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 17, 17, 3)).astype(np.float32)
    got = np.asarray(max_pool_3x3_s2(x))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.max_pool2d(tx, kernel_size=3, stride=2, padding=1)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)
