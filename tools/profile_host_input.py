"""Host input-path breakdown: cProfile over ZJUDataset.get_train_sample.

The train-CLI serial floor on a 1-core host is data_time == host work per
sample (CLAUDE.md: 533 -> 216 ms/sample after the r3 fixes).  This tool
shows where the remaining milliseconds live (decode, resize, morphology,
LBS, ray sampling) so further host work targets the real hot spots.
Reuses verify_input_overlap's fake on-disk ZJU layout (1024x1024 sources,
ratio 0.5 -> 512x512 like the reference protocol).
"""
import cProfile
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_input_overlap import build_fake_zju  # noqa: E402 (tools/ sibling)

from transhuman_tpu.config import Config
from transhuman_tpu.data.zju import ZJUDataset
from transhuman_tpu.geometry.smpl import SMPLModel


def main():
    root = tempfile.mkdtemp(prefix="hostprof_zju_")
    build_fake_zju(root)
    cfg = Config().merge_opts(
        [
            "data_root", root,
            "ratio", "0.5",
            "train_num_views", "3",
            "test.input_view", "[0, 1, 2]",
            "test.target_view", "[3]",
            "kmeans_dir", "/nonexistent",
        ]
    )
    smpl = SMPLModel.synthetic(n_verts=6890)
    info = {"CoreView_901": {"begin_i": 0, "i_intv": 1, "ni": 10}}
    ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    ds.set_epoch(0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ds.get_train_sample(0)  # warm caches (undistort maps, ray grids)

    t0 = time.perf_counter()
    for i in range(n):
        ds.get_train_sample(i % 10)
    per = (time.perf_counter() - t0) / n
    print(f"get_train_sample: {per * 1e3:.1f} ms/sample (n={n})", flush=True)

    prof = cProfile.Profile()
    prof.enable()
    for i in range(n):
        ds.get_train_sample(i % 10)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
