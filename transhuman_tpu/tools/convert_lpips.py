"""Convert torchvision VGG16 + LPIPS linear-head weights to the jnp LPIPS
format (models/lpips.py).

Usage:
    python -m transhuman_tpu.tools.convert_lpips \
        --vgg vgg16_features.pth --lins lpips_vgg_lins.pth out.npz

`--vgg` is a torchvision VGG16 `features` state_dict (keys '0.weight',
'2.weight', ... for the 13 convs); `--lins` is the LPIPS calibration
state_dict (keys 'lin{i}.model.1.weight', shape (1, C, 1, 1)) as vendored at
reference third_parties/lpips/weights/v0.1/vgg.pth.
"""

from __future__ import annotations

import numpy as np

from ..models.lpips import VGG16_STAGES

# torchvision vgg16.features conv layer indices, in stage order
VGG16_FEATURE_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def convert(vgg_sd: dict, lins_sd: dict) -> dict:
    out = {}
    for si, idxs in enumerate(VGG16_FEATURE_IDX):
        assert len(idxs) == VGG16_STAGES[si][0]
        for ci, li in enumerate(idxs):
            w = np.asarray(vgg_sd[f"{li}.weight"])  # OIHW
            b = np.asarray(vgg_sd[f"{li}.bias"])
            out[f"conv{si}_{ci}_w"] = np.transpose(w, (2, 3, 1, 0))
            out[f"conv{si}_{ci}_b"] = b
        lw = None
        for k in (f"lin{si}.model.1.weight", f"lins.{si}.model.1.weight"):
            if k in lins_sd:
                lw = np.asarray(lins_sd[k])
                break
        assert lw is not None, f"no lin weight for stage {si}"
        out[f"lin{si}"] = lw.reshape(-1)
    return out


def main(argv=None):
    import argparse

    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--vgg", required=True)
    p.add_argument("--lins", required=True)
    p.add_argument("output")
    args = p.parse_args(argv)

    def load(path):
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        return {
            k.replace("features.", ""): v.numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()
        }

    out = convert(load(args.vgg), load(args.lins))
    np.savez(args.output, **out)
    print(f"wrote {args.output} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
