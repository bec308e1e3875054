"""Reverse-converter (JAX -> reference .pth) round-trip tests.

The export must emit the COMPLETE state-dict inventory the reference
`Network()` loads strictly (net_utils.py:361-392 -> load_state_dict), and
torch -> jax -> torch must be bit-exact on every weight the forward pass
reads."""

import pickle

import numpy as np
import pytest
import torch

from transhuman_tpu.tools.convert_checkpoint import (
    convert_state_dict,
    official_key_inventory,
)
from transhuman_tpu.tools.export_checkpoint import export_state_dict, main

VIT_DEPTH = 12


@pytest.fixture(scope="module")
def official_sd():
    g = torch.Generator().manual_seed(1)
    sd = {}
    for k, shape in official_key_inventory(VIT_DEPTH).items():
        if k.endswith("num_batches_tracked"):
            sd[k] = torch.tensor(2100, dtype=torch.int64)
        elif k.endswith("running_var"):
            sd[k] = torch.rand(shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(shape, generator=g) * 0.02
    return sd


# weights the reference forward pass never reads: the export fills these
# with defaults instead of round-tripping them (documented in its docstring)
def _dead(k):
    return (
        k.startswith("xyzc_net.")
        or k.startswith(("encoder.model.layer3", "encoder.model.layer4"))
        or k == "ViT.cls_token"
        or k.endswith(("running_mean", "running_var", "num_batches_tracked",
                       "_freqs", "_phases"))
    )


def test_roundtrip_bit_exact(official_sd):
    params = convert_state_dict(official_sd, strict=True)["params"]
    out = export_state_dict(params, VIT_DEPTH)

    want = official_key_inventory(VIT_DEPTH)
    assert set(out) == set(want)
    for k, shape in want.items():
        assert tuple(out[k].shape) == tuple(shape), k
        if not _dead(k):
            np.testing.assert_array_equal(
                out[k], official_sd[k].numpy(), err_msg=k
            )


def test_pe_buffers_match_reference_formula(official_sd):
    """The rebuilt _freqs/_phases must equal pixelNeRF's registered buffers
    (vision_transformer.py:115-122) so a strict load is also numerically
    faithful for the buffers."""
    params = convert_state_dict(official_sd, strict=True)["params"]
    out = export_state_dict(params, VIT_DEPTH)
    num_freqs = 192 // 6
    freqs = np.pi * 2.0 ** torch.arange(num_freqs, dtype=torch.float32)
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1).numpy()
    _phases = np.zeros(2 * num_freqs, np.float32)
    _phases[1::2] = np.pi * 0.5
    np.testing.assert_array_equal(out["ViT.PE._freqs"], _freqs)
    np.testing.assert_array_equal(
        out["ViT.PE._phases"], _phases.reshape(1, -1, 1)
    )


def test_cli_roundtrip(official_sd, tmp_path):
    """ckpt pickle -> main() -> torch.load -> strict re-conversion equals the
    original param tree."""
    params = convert_state_dict(official_sd, strict=True)["params"]
    src = tmp_path / "in.ckpt"
    with open(src, "wb") as f:
        pickle.dump({"params": params, "epoch": 7}, f)
    dst = tmp_path / "out.pth"
    main([str(src), str(dst)])

    blob = torch.load(dst, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 7
    params2 = convert_state_dict(blob["net"], strict=True)["params"]
    flat1 = {
        "/".join(p): np.asarray(v)
        for p, v in _flatten(params).items()
    }
    flat2 = {
        "/".join(p): np.asarray(v)
        for p, v in _flatten(params2).items()
    }
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k], err_msg=k)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out
