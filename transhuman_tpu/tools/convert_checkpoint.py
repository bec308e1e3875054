"""Convert a reference TransHuman torch checkpoint into this framework's
parameter pytree.

Usage:
    python -m transhuman_tpu.tools.convert_checkpoint in.pth out.ckpt \
        [--vit_depth 12]

Key mapping (reference module -> flax param path):
  encoder.model.conv1/bn1/layer1/layer2  -> encoder/{conv1,bn1,layer{L}_{B}/*}
  encoder.upsample_color                 -> encoder/color_conv
  encoder.reduction_layer                -> encoder/reduction
  ViT.blocks.N.{norm1,attn,norm2,mlp}    -> transhe/block_N/*
  ViT.norm, ViT.mask_token               -> transhe/{norm,mask_token}
  fc_0 / alpha_res_0                     -> heads/{holder_in,pixel_in}
  spatial_key_value_0.{key,value}_embed  -> heads/fusion/{pix_key,pix_value}
  spatial_key_value_1.{key,value}_embed  -> heads/fusion/{hold_key,hold_value}
  fc_1 fc_2 fc_3 alpha_fc                -> heads/{fc_1,fc_2,fc_3,alpha_out}
  feature_fc rgb_res_0 view_fc rgb_res_1 fc_4 rgb_fc
                                         -> heads/{feature_fc,rgb_res0,view_fc,
                                                   rgb_res1,fc_4,rgb_out}

Dropped (dead code / unused-at-forward state, SURVEY.md §2.3):
  xyzc_net.* (SparseConvNet), encoder.model.layer3/4 + fc, BatchNorm running
  stats (forward always uses batch statistics, run.py:29), ViT.cls_token,
  positional-encoding buffers.

Layout transforms: torch Conv2d OIHW -> flax HWIO; torch Linear/Conv1d
(out,in[,1]) -> flax Dense (in,out).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

DROP_PATTERNS = [
    r"^xyzc_net\.",
    r"^encoder\.model\.(layer3|layer4|fc)\.",
    r"running_mean$",
    r"running_var$",
    r"num_batches_tracked$",
    r"^ViT\.cls_token$",
    r"_freqs$",
    r"_phases$",
    r"^encoder\.PE_color\.",
]


def _conv2d(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):  # (out, in) or (out, in, 1) -> (in, out)
    w = np.asarray(w)
    if w.ndim == 3:
        w = w[:, :, 0]
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def convert_state_dict(sd: Dict[str, "np.ndarray"]) -> Dict:
    """sd: reference state_dict (tensors or ndarrays) -> {'params': {...}}."""
    sd = {
        re.sub(r"^(module\.|net\.)+", "", k): np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in sd.items()
    }
    params: Dict = {}
    dropped, unknown = [], []

    def bn(dst, src):
        _set(params, dst + ("scale",), sd[src + ".weight"])
        _set(params, dst + ("bias",), sd[src + ".bias"])

    def conv(dst, src, bias=True):
        _set(params, dst + ("kernel",), _conv2d(sd[src + ".weight"]))
        if bias:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    def dense(dst, src):
        _set(params, dst + ("kernel",), _dense(sd[src + ".weight"]))
        _set(params, dst + ("bias",), sd[src + ".bias"])

    # ---- encoder
    conv(("encoder", "conv1"), "encoder.model.conv1", bias=False)
    bn(("encoder", "bn1"), "encoder.model.bn1")
    for layer, blocks in (("layer1", 2), ("layer2", 2)):
        for b in range(blocks):
            base = f"encoder.model.{layer}.{b}"
            dst = ("encoder", f"{layer}_{b}")
            conv(dst + ("conv1",), base + ".conv1", bias=False)
            bn(dst + ("bn1",), base + ".bn1")
            conv(dst + ("conv2",), base + ".conv2", bias=False)
            bn(dst + ("bn2",), base + ".bn2")
            if f"{base}.downsample.0.weight" in sd:
                conv(dst + ("down_conv",), base + ".downsample.0", bias=False)
                bn(dst + ("down_bn",), base + ".downsample.1")
    conv(("encoder", "color_conv"), "encoder.upsample_color")
    conv(("encoder", "reduction"), "encoder.reduction_layer")

    # ---- TransHE ViT
    _set(params, ("transhe", "mask_token"), np.asarray(sd["ViT.mask_token"]))
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"ViT\.blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        base = f"ViT.blocks.{i}"
        dst = ("transhe", f"block_{i}")
        _set(params, dst + ("norm1", "scale"), sd[base + ".norm1.weight"])
        _set(params, dst + ("norm1", "bias"), sd[base + ".norm1.bias"])
        dense(dst + ("attn", "qkv"), base + ".attn.qkv")
        dense(dst + ("attn", "proj"), base + ".attn.proj")
        _set(params, dst + ("norm2", "scale"), sd[base + ".norm2.weight"])
        _set(params, dst + ("norm2", "bias"), sd[base + ".norm2.bias"])
        dense(dst + ("mlp_fc1",), base + ".mlp.fc1")
        dense(dst + ("mlp_fc2",), base + ".mlp.fc2")
    _set(params, ("transhe", "norm", "scale"), sd["ViT.norm.weight"])
    _set(params, ("transhe", "norm", "bias"), sd["ViT.norm.bias"])

    # ---- heads
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
    for src, dst in head_map.items():
        dense(("heads",) + dst, src)

    # ---- audit unmapped keys
    consumed = set()

    def mark(prefixes):
        for k in sd:
            if any(k.startswith(p) for p in prefixes):
                consumed.add(k)

    mark(["encoder.model.conv1", "encoder.model.bn1", "encoder.model.layer1",
          "encoder.model.layer2", "encoder.upsample_color",
          "encoder.reduction_layer", "ViT.", "fc_", "alpha_", "feature_fc",
          "rgb_", "view_fc", "spatial_key_value_"])
    for k in sd:
        if k in consumed:
            continue
        if any(re.search(p, k) for p in DROP_PATTERNS):
            dropped.append(k)
        else:
            unknown.append(k)
    if unknown:
        print(f"WARNING: {len(unknown)} unmapped keys, e.g. {unknown[:5]}")
    return {"params": params}


def reference_pe_table(pe_xyz_norm: np.ndarray, embed_dim: int) -> np.ndarray:
    """TransHE positional-encoding table computed with the reference's exact
    op sequence (vision_transformer.PositionalEncoding:100-136: f32
    `sin(addcmul(phases, x.repeat, freqs))` under torch's libm).  At
    embed_dim=192 the top band is pi*2^31 where any reordering of these f32
    ops decorrelates the values — official checkpoints were trained against
    THIS noise pattern, so store the table verbatim (models/vit.py)."""
    import torch

    nf = embed_dim // 6
    x = torch.from_numpy(np.asarray(pe_xyz_norm, np.float32))
    freqs = np.pi * 2.0 ** torch.arange(nf, dtype=torch.float32)
    _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    _phases = torch.zeros(2 * nf)
    _phases[1::2] = np.pi * 0.5
    emb = x.unsqueeze(1).repeat(1, nf * 2, 1)
    emb = torch.sin(torch.addcmul(_phases.view(1, -1, 1), emb, _freqs))
    return emb.view(x.shape[0], -1).numpy()


def main(argv=None):
    import argparse
    import pickle

    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--smpl_dir", default=None,
                   help="SMPL model dir; with --kmeans, also store the "
                        "reference-exact TransHE PE table")
    p.add_argument("--kmeans", default=None, help="kmeans_dict_{C}.npy path")
    p.add_argument("--embed_dim", type=int, default=192)
    p.add_argument("--pe_box", type=float, default=1.5)
    args = p.parse_args(argv)

    import torch

    blob = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = blob.get("net", blob) if isinstance(blob, dict) else blob
    epoch = blob.get("epoch", 0) if isinstance(blob, dict) else 0
    variables = convert_state_dict(sd)  # {'params': {...}} flax variables dict
    payload = {"params": variables, "epoch": epoch}

    if args.smpl_dir and args.kmeans:
        from ..geometry.clusters import ClusterSpec, normalize_positions
        from ..geometry.smpl import SMPLModel

        smpl = SMPLModel.load(args.smpl_dir)
        cluster = ClusterSpec.load_reference_dict(args.kmeans)
        cen = cluster.pool_matrix @ smpl.v_template
        payload["pe_table"] = reference_pe_table(
            normalize_positions(cen, args.pe_box), args.embed_dim
        )
        print("stored reference-exact PE table", payload["pe_table"].shape)

    with open(args.output, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"wrote {args.output} (epoch {epoch})")


if __name__ == "__main__":
    main()
