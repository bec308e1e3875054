"""Import torchvision ResNet18 ImageNet weights into SpatialEncoder params.

Usage:
    python -m transhuman_tpu.tools.convert_resnet resnet18.pth out.npz

The encoder uses only the stem + layer1/layer2 (encoder.py); the reduction
and color convs have no pretrained source and stay at their flax init —
merge with `apply_pretrained(params, np.load(out.npz))` at model build
(reference behavior: torchvision pretrained=True, encoder.py:77-79).
"""

from __future__ import annotations

import numpy as np


def convert(sd: dict) -> dict:
    """torchvision resnet18 state_dict -> flat {path: array} for the encoder."""

    def c(w):  # OIHW -> HWIO
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    out = {
        "conv1/kernel": c(sd["conv1.weight"]),
        "bn1/scale": np.asarray(sd["bn1.weight"]),
        "bn1/bias": np.asarray(sd["bn1.bias"]),
    }
    for layer in ("layer1", "layer2"):
        for b in range(2):
            base = f"{layer}.{b}"
            dst = f"{layer}_{b}"
            out[f"{dst}/conv1/kernel"] = c(sd[f"{base}.conv1.weight"])
            out[f"{dst}/bn1/scale"] = np.asarray(sd[f"{base}.bn1.weight"])
            out[f"{dst}/bn1/bias"] = np.asarray(sd[f"{base}.bn1.bias"])
            out[f"{dst}/conv2/kernel"] = c(sd[f"{base}.conv2.weight"])
            out[f"{dst}/bn2/scale"] = np.asarray(sd[f"{base}.bn2.weight"])
            out[f"{dst}/bn2/bias"] = np.asarray(sd[f"{base}.bn2.bias"])
            if f"{base}.downsample.0.weight" in sd:
                out[f"{dst}/down_conv/kernel"] = c(sd[f"{base}.downsample.0.weight"])
                out[f"{dst}/down_bn/scale"] = np.asarray(
                    sd[f"{base}.downsample.1.weight"]
                )
                out[f"{dst}/down_bn/bias"] = np.asarray(
                    sd[f"{base}.downsample.1.bias"]
                )
    return out


def apply_pretrained(variables: dict, flat: dict) -> dict:
    """Merge converted encoder weights into a full variables pytree."""
    import jax

    params = jax.tree.map(lambda x: x, variables)  # shallow-ish copy
    enc = params["params"]["encoder"]
    for path, arr in flat.items():
        node = enc
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        assert node[parts[-1]].shape == arr.shape, path
        node[parts[-1]] = arr.astype(np.float32)
    return params


def main(argv=None):
    import argparse

    import torch

    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args(argv)
    sd = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in sd.items()}
    out = convert(sd)
    np.savez(args.output, **out)
    print(f"wrote {args.output} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
