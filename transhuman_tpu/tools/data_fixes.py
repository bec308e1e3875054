"""Small dataset-preparation fixes (parity: the reference's standalone
scripts `third_parties/clean_ch.py` -> cleansmpl,
`lib/utils/modify_313_315_filename.py` -> rename313).

    python -m transhuman_tpu.tools.data_fixes rename313 data/zju_mocap/CoreView_313
    python -m transhuman_tpu.tools.data_fixes cleanmask data/zju_mocap/CoreView_387
    python -m transhuman_tpu.tools.data_fixes cleansmpl SMPL_NEUTRAL.pkl out_dir/
"""

from __future__ import annotations

import os
import re


def rename_313_315(root: str, dry_run: bool = False):
    """Rename 313/315-style frame files ('..._000000_xxx.jpg' with the frame
    number as the 5th '_' token) to plain '{frame}{ext}', per camera dir, in
    the image root AND the mask/ + mask_cihp/ subtrees — all three roots the
    reference script walks (modify_313_315_filename.py:4-9; data/zju.py
    builds mask paths from the same short stem as images)."""
    n = 0
    roots = [root] + [
        os.path.join(root, sub)
        for sub in ("mask", "mask_cihp")
        if os.path.isdir(os.path.join(root, sub))
    ]
    for r in roots:
        for cam in sorted(os.listdir(r)):
            cdir = os.path.join(r, cam)
            if not os.path.isdir(cdir) or not cam.startswith("Camera"):
                continue
            for f in sorted(os.listdir(cdir)):
                parts = f.split("_")
                if len(parts) > 4 and re.fullmatch(r"\d+", parts[4].split(".")[0]):
                    dst = parts[4].split(".")[0] + os.path.splitext(f)[1]
                    if not dry_run:
                        os.rename(os.path.join(cdir, f), os.path.join(cdir, dst))
                    n += 1
    return n


def clean_smpl_pickle(path: str, out_dir: str):
    """Strip chumpy objects from an SMPL pickle -> plain-numpy pickle (the
    reference's third_parties/clean_ch.py:32-47).  Unlike the reference
    (which needs chumpy importable to unpickle), this uses the stub
    unpickler in geometry/smpl.py, so it runs in this chumpy-free image."""
    import pickle

    from ..geometry.smpl import load_smpl_pickle

    data = load_smpl_pickle(path)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, os.path.basename(path))
    with open(out, "wb") as f:
        pickle.dump(data, f)
    return out


def clean_channel_masks(root: str, dry_run: bool = False):
    """Collapse 3-channel mask PNGs to single-channel binary.  NO reference
    analog — a practical fix for ZJU-MoCap distributions that ship RGB mask
    PNGs (the loaders expect single-channel, zju.py::_load_mask)."""
    import cv2
    import numpy as np

    n = 0
    for sub in ("mask", "mask_cihp"):
        mdir = os.path.join(root, sub)
        if not os.path.isdir(mdir):
            continue
        for dirpath, _, files in os.walk(mdir):
            for f in files:
                if not f.endswith(".png"):
                    continue
                p = os.path.join(dirpath, f)
                m = cv2.imread(p, cv2.IMREAD_UNCHANGED)
                if m is None or m.ndim == 2:
                    continue
                out = (m.sum(-1) != 0).astype(np.uint8)
                if not dry_run:
                    cv2.imwrite(p, out)
                n += 1
    return n


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["rename313", "cleanmask", "cleansmpl"])
    p.add_argument("root")
    p.add_argument("out_dir", nargs="?", default="output",
                   help="cleansmpl only: output directory")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)
    if args.cmd == "cleansmpl":
        out = clean_smpl_pickle(args.root, args.out_dir)
        print(f"cleansmpl: wrote {out}")
        return
    if args.cmd == "rename313":
        n = rename_313_315(args.root, args.dry_run)
    else:
        n = clean_channel_masks(args.root, args.dry_run)
    print(f"{args.cmd}: {n} files {'(dry run)' if args.dry_run else 'updated'}")


if __name__ == "__main__":
    main()
