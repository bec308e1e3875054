"""Official-checkpoint conversion drill.

The real epoch-2100 checkpoint is license-gated and absent from this
environment; this drill rehearses the exact conversion against a state dict
carrying the COMPLETE key inventory the reference `Network()` serializes
(cross_transformer.py:84-128 + encoder.py:50-97 + vision_transformer.py:
309-341, incl. xyzc_net.*, full resnet18 with BN running stats, ViT
buffers) at the official config's real shapes (vit_depth=12, embed 192,
KNN_FREQ=10).  Conversion must be strict (no unknown keys), produce a
parameter tree IDENTICAL in structure and shapes to our model's init tree,
and the loaded model must render finite values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from transhuman_tpu.models.network import TransHumanNet
from transhuman_tpu.tools.convert_checkpoint import (
    convert_state_dict,
    official_key_inventory,
)

VIT_DEPTH = 12


@pytest.fixture(scope="module")
def official_sd():
    g = torch.Generator().manual_seed(0)
    sd = {}
    for k, shape in official_key_inventory(VIT_DEPTH).items():
        if k.endswith("num_batches_tracked"):
            sd[k] = torch.tensor(2100, dtype=torch.int64)
        elif k.endswith("running_var"):
            sd[k] = torch.rand(shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(shape, generator=g) * 0.02
    return sd


def test_inventory_is_complete_and_strict(official_sd):
    """Every official key is either mapped or on the documented drop list;
    an off-inventory key makes strict conversion fail loudly."""
    variables = convert_state_dict(official_sd, strict=True)
    assert set(variables) == {"params"}

    bad = dict(official_sd)
    bad["decoder.mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="mystery"):
        convert_state_dict(bad, strict=True)


def test_converted_tree_matches_model_init_exactly(official_sd):
    """Converted params == model.init params in structure AND shapes (so
    flax apply will accept the real checkpoint without any re-keying)."""
    variables = convert_state_dict(official_sd, strict=True)
    model = TransHumanNet(embed_dim=192, vit_depth=VIT_DEPTH, vit_heads=3,
                          knn_k=7, knn_freqs=10)
    nc, npts, nv = 10, 16, 3
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((nv, 32, 32, 3)),
        jnp.zeros((nc, 3)),
        jnp.zeros((npts, 3)),
        jnp.zeros((nc, 3)),
        jnp.zeros((nc, 3, 3)),
        jnp.zeros((npts, 27)),
    )["params"]

    got = jax.tree_util.tree_map(np.shape, variables["params"])
    want = jax.tree_util.tree_map(np.shape, init)
    assert got == want  # nested-dict equality: keys and shapes


def test_converted_params_render(official_sd):
    """The converted tree actually runs the forward (encode -> refine ->
    query) and returns finite raw values."""
    variables = convert_state_dict(official_sd, strict=True)
    model = TransHumanNet(embed_dim=192, vit_depth=VIT_DEPTH, vit_heads=3,
                          knn_k=7, knn_freqs=10)
    rng = np.random.default_rng(0)
    nc, npts, nv = 10, 16, 3
    imgs = jnp.asarray(rng.random((nv, 32, 32, 3)), jnp.float32)
    holder_map, pixel_map = model.apply(variables, imgs,
                                        method=model.encode_views)
    assert np.isfinite(np.asarray(holder_map)).all()

    tokens = jnp.asarray(rng.standard_normal((nv, nc, 192)), jnp.float32)
    pe = jnp.asarray(rng.uniform(-1, 1, (nc, 3)), jnp.float32)
    tokens = model.apply(variables, tokens, pe, method=model.refine_tokens)
    raw = model.apply(
        variables,
        jnp.asarray(rng.standard_normal((npts, 3)), jnp.float32),
        pe,
        jnp.tile(jnp.eye(3)[None], (nc, 1, 1)).astype(jnp.float32),
        tokens,
        jnp.asarray(rng.standard_normal((nv, npts, 384)), jnp.float32),
        jnp.asarray(rng.standard_normal((npts, 27)), jnp.float32),
        method=model.query,
    )
    assert raw.shape == (npts, 4)
    assert np.isfinite(np.asarray(raw)).all()


def test_expected_keys_cli(capsys):
    from transhuman_tpu.tools.convert_checkpoint import main

    main(["--expected_keys"])
    out = capsys.readouterr().out
    assert "ViT.blocks.11.attn.qkv.weight: (576, 192)" in out
    assert "xyzc_net.conv4.6.weight: (128, 3, 3, 3, 128)" in out
    assert "encoder.model.layer4.0.downsample.0.weight: (512, 256, 1, 1)" in out
    assert "fc_0.weight: (256, 255, 1)" in out
