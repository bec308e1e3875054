"""Golden tests for the frequency encoders against independent torch
reimplementations of the reference formulas (embedder.py and
vision_transformer.PositionalEncoding)."""

import numpy as np
import pytest
import torch

from transhuman_tpu.models import embedder as emb


def torch_nerf_embed(x: torch.Tensor, multires: int) -> torch.Tensor:
    """Reference lib/networks/embedder.py:4-49 semantics."""
    outs = [x]
    freq_bands = 2.0 ** torch.linspace(0.0, multires - 1, steps=multires)
    for freq in freq_bands:
        for fn in (torch.sin, torch.cos):
            outs.append(fn(x * freq))
    return torch.cat(outs, -1)


def torch_pixelnerf_pe(x: torch.Tensor, num_freqs: int, include_input: bool):
    """Reference lib/networks/vision_transformer.py:100-136 semantics."""
    freqs = np.pi * 2.0 ** torch.arange(0, num_freqs, dtype=torch.float32)
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    _phases = torch.zeros(2 * num_freqs)
    _phases[1::2] = np.pi * 0.5
    _phases = _phases.view(1, -1, 1)
    embed = x.unsqueeze(1).repeat(1, num_freqs * 2, 1)
    embed = torch.sin(torch.addcmul(_phases, embed, _freqs))
    embed = embed.view(x.shape[0], -1)
    if include_input:
        embed = torch.cat((x, embed), dim=-1)
    return embed


def test_viewdir_embed_matches_reference(rng):
    x = rng.standard_normal((50, 3)).astype(np.float32)
    got = np.asarray(emb.embed_viewdir(x, 4))
    want = torch_nerf_embed(torch.from_numpy(x), 4).numpy()
    assert got.shape == (50, 27)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_xyz_embed_matches_reference(rng):
    x = rng.standard_normal((50, 3)).astype(np.float32)
    got = np.asarray(emb.embed_xyz(x, 10))
    want = torch_nerf_embed(torch.from_numpy(x), 10).numpy()
    assert got.shape == (50, 63)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dparf_embed_matches_reference(rng):
    x = (rng.standard_normal((64, 3)) * 0.1).astype(np.float32)
    got = np.asarray(emb.embed_dparf(x, 10))
    want = torch_pixelnerf_pe(torch.from_numpy(x), 10, include_input=True).numpy()
    assert got.shape == (64, 63)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vit_pos_embed_matches_reference(rng):
    x = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    got = np.asarray(emb.embed_vit_pos(x, 192))
    want = torch_pixelnerf_pe(torch.from_numpy(x), 32, include_input=False).numpy()
    assert got.shape == (30, 192)
    # huge freqs (up to pi * 2^31) amplify f32 ulp differences: at freq
    # pi*2^k a 1e-7 input rounding difference shifts the phase by ~4e-7*2^k.
    # Compare low bands tightly, mid bands loosely, high bands only boundedness.
    np.testing.assert_allclose(got[:, : 6 * 12], want[:, : 6 * 12], atol=1e-3)
    np.testing.assert_allclose(got[:, : 6 * 16], want[:, : 6 * 16], atol=5e-2)
    assert np.isfinite(got).all() and (np.abs(got) <= 1.0 + 1e-6).all()


def test_vit_pos_embed_rejects_bad_dim():
    x = np.zeros((4, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="embed_dim % 6"):
        emb.embed_vit_pos(x, 100)


def test_batched_shapes():
    x = np.zeros((2, 5, 3), dtype=np.float32)
    assert emb.embed_viewdir(x).shape == (2, 5, 27)
    assert emb.embed_dparf(x).shape == (2, 5, 63)
