"""Export this framework's parameters back into a reference-layout torch
checkpoint (.pth) — the inverse of tools/convert_checkpoint.py.

Usage:
    python -m transhuman_tpu.tools.export_checkpoint in.ckpt out.pth \
        [--vit_depth 12] [--epoch N]

Why: a complete migration story runs both ways — models trained here can be
evaluated/visualized with the reference codebase (`run.py --type ...` loads
`{net: state_dict, epoch}` blobs via `lib/utils/net_utils.py:361-392`).

The emitted state dict carries the COMPLETE key inventory the reference
`Network()` serializes (see `official_key_inventory`), so a strict
`load_state_dict` succeeds:

* mapped weights — the exact inverse layout transforms of the converter
  (flax Dense (in, out) -> torch Conv1d/Linear (out, in[, 1]); flax conv
  HWIO -> torch OIHW),
* PE buffers (`ViT.PE`, `encoder.PE_color`, `PE_relative`, freqs/phases) —
  rebuilt with the reference's own formulas
  (vision_transformer.py:115-122: freqs = pi * 2**arange repeated twice,
  phases = [0, pi/2] tiled),
* BatchNorm running stats — identity (mean 0 / var 1 / steps 0).  The
  reference always evaluates in train mode (run.py:29) so running stats are
  never read at inference; they only matter if training is resumed there,
* modules that do not exist here because they are dead code in the
  reference (`xyzc_net.*` SparseConvNet, resnet layer3/4/fc, `ViT.cls_token`)
  — zero-filled at the official shapes.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .convert_checkpoint import official_key_inventory


def _conv2d_inv(w):  # HWIO -> OIHW
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _dense_inv(w, conv1d: bool):  # (in, out) -> (out, in[, 1])
    w = np.transpose(np.asarray(w), (1, 0))
    return w[:, :, None] if conv1d else w


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node, np.float32)


def _pe_buffers(n_freqs: int):
    """pixelNeRF PositionalEncoding registered buffers
    (vision_transformer.py:115-122)."""
    freqs = np.pi * 2.0 ** np.arange(n_freqs, dtype=np.float32)
    _freqs = np.repeat(freqs, 2).reshape(1, -1, 1)
    _phases = np.zeros(2 * n_freqs, np.float32)
    _phases[1::2] = np.pi * 0.5
    return _freqs, _phases.reshape(1, -1, 1)


def export_state_dict(params: Dict, vit_depth: int = 12) -> Dict[str, np.ndarray]:
    """params: flax param tree (the converter's `variables['params']`) ->
    complete reference state dict (numpy values; torch-ify at save)."""
    sd: Dict[str, np.ndarray] = {}

    def bn(src, dst):
        sd[dst + ".weight"] = _get(params, src + ("scale",))
        sd[dst + ".bias"] = _get(params, src + ("bias",))

    def conv(src, dst, bias=True):
        sd[dst + ".weight"] = _conv2d_inv(_get(params, src + ("kernel",)))
        if bias:
            sd[dst + ".bias"] = _get(params, src + ("bias",))

    def dense(src, dst, conv1d=True):
        sd[dst + ".weight"] = _dense_inv(_get(params, src + ("kernel",)), conv1d)
        sd[dst + ".bias"] = _get(params, src + ("bias",))

    # ---- encoder (inverse of convert_state_dict's encoder block)
    conv(("encoder", "conv1"), "encoder.model.conv1", bias=False)
    bn(("encoder", "bn1"), "encoder.model.bn1")
    for layer in ("layer1", "layer2"):
        for b in range(2):
            src = ("encoder", f"{layer}_{b}")
            dst = f"encoder.model.{layer}.{b}"
            conv(src + ("conv1",), dst + ".conv1", bias=False)
            bn(src + ("bn1",), dst + ".bn1")
            conv(src + ("conv2",), dst + ".conv2", bias=False)
            bn(src + ("bn2",), dst + ".bn2")
            if "down_conv" in params["encoder"][f"{layer}_{b}"]:
                conv(src + ("down_conv",), dst + ".downsample.0", bias=False)
                bn(src + ("down_bn",), dst + ".downsample.1")
    conv(("encoder", "color_conv"), "encoder.upsample_color")
    conv(("encoder", "reduction"), "encoder.reduction_layer")

    # ---- TransHE ViT
    sd["ViT.mask_token"] = _get(params, ("transhe", "mask_token"))
    for i in range(vit_depth):
        src = ("transhe", f"block_{i}")
        dst = f"ViT.blocks.{i}"
        sd[dst + ".norm1.weight"] = _get(params, src + ("norm1", "scale"))
        sd[dst + ".norm1.bias"] = _get(params, src + ("norm1", "bias"))
        dense(src + ("attn", "qkv"), dst + ".attn.qkv", conv1d=False)
        dense(src + ("attn", "proj"), dst + ".attn.proj", conv1d=False)
        sd[dst + ".norm2.weight"] = _get(params, src + ("norm2", "scale"))
        sd[dst + ".norm2.bias"] = _get(params, src + ("norm2", "bias"))
        dense(src + ("mlp_fc1",), dst + ".mlp.fc1", conv1d=False)
        dense(src + ("mlp_fc2",), dst + ".mlp.fc2", conv1d=False)
    sd["ViT.norm.weight"] = _get(params, ("transhe", "norm", "scale"))
    sd["ViT.norm.bias"] = _get(params, ("transhe", "norm", "bias"))

    # ---- heads (inverse of the converter's head_map; all torch Conv1d)
    head_map = {
        "fc_0": ("holder_in",),
        "alpha_res_0": ("pixel_in",),
        "spatial_key_value_0.key_embed": ("fusion", "pix_key"),
        "spatial_key_value_0.value_embed": ("fusion", "pix_value"),
        "spatial_key_value_1.key_embed": ("fusion", "hold_key"),
        "spatial_key_value_1.value_embed": ("fusion", "hold_value"),
        "fc_1": ("fc_1",),
        "fc_2": ("fc_2",),
        "fc_3": ("fc_3",),
        "alpha_fc": ("alpha_out",),
        "feature_fc": ("feature_fc",),
        "rgb_res_0": ("rgb_res0",),
        "view_fc": ("view_fc",),
        "rgb_res_1": ("rgb_res1",),
        "fc_4": ("fc_4",),
        "rgb_fc": ("rgb_out",),
    }
    for dst, src in head_map.items():
        dense(("heads",) + src, dst, conv1d=True)

    # ---- complete the inventory: buffers, running stats, dead modules
    embed_dim = sd["ViT.norm.weight"].shape[0]
    for name, nf in (
        ("ViT.PE", embed_dim // 6),
        ("encoder.PE_color", 10),
        ("PE_relative", 10),
    ):
        fr, ph = _pe_buffers(nf)
        sd[name + "._freqs"] = fr
        sd[name + "._phases"] = ph

    for k, shape in official_key_inventory(vit_depth).items():
        if k in sd:
            continue
        if k.endswith("num_batches_tracked"):
            sd[k] = np.zeros((), np.int64)
        elif k.endswith("running_var"):
            sd[k] = np.ones(shape, np.float32)
        elif k.endswith("running_mean"):
            sd[k] = np.zeros(shape, np.float32)
        else:  # xyzc_net.*, resnet layer3/4, ViT.cls_token — dead code
            sd[k] = np.zeros(shape, np.float32)
    return sd


def _extract_params(payload):
    """Accept any of our on-disk formats: a raw param tree, the converter's
    {'params': {'params': tree}}, or a training checkpoint
    {'params': tree, 'epoch': ...}."""
    tree = payload
    while isinstance(tree, dict) and "transhe" not in tree and "params" in tree:
        tree = tree["params"]
    if not (isinstance(tree, dict) and "transhe" in tree):
        raise ValueError(
            "could not locate the flax param tree in the checkpoint payload"
        )
    return tree


def main(argv=None):
    import argparse
    import pickle

    p = argparse.ArgumentParser()
    p.add_argument("input", help=".ckpt written by this framework")
    p.add_argument("output", help="reference-layout .pth to write")
    p.add_argument("--vit_depth", type=int, default=12)
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch stamp (default: from the checkpoint)")
    args = p.parse_args(argv)

    import torch

    with open(args.input, "rb") as f:
        payload = pickle.load(f)
    params = _extract_params(payload)
    vit_depth = 1 + max(
        int(m.group(1))
        for k in params["transhe"]
        if (m := re.match(r"block_(\d+)$", k))
    )
    if vit_depth != args.vit_depth:
        print(f"note: checkpoint has vit_depth={vit_depth}")
    sd = export_state_dict(params, vit_depth)
    epoch = args.epoch
    if epoch is None:
        epoch = payload.get("epoch", 0) if isinstance(payload, dict) else 0
    torch.save(
        {"net": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
         "epoch": int(epoch)},
        args.output,
    )
    print(f"wrote {args.output} ({len(sd)} tensors, epoch {epoch})")


if __name__ == "__main__":
    main()
