"""Eval host-input throughput: processed-input-view LRU on vs off.

FrameSampler keeps every target camera of each kept frame
(samplers.py:136-164), so consecutive eval items share the same input
views; the LRU (data/zju.py::_input_view) makes the run pay their decode/
undistort/resize/vizmap cost once per frame instead of once per target.
Measures get_eval_item at the reference eval protocol scale (1024x1024
sources, ratio 0.5 -> 512x512, 3 input views, 6 targets per frame — the
ZJU test protocol's [0,7,15] -> 6-target shape) on the fake on-disk
dataset.

Usage: python tools/profile_eval_input_cache.py [n_items]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_input_overlap import build_fake_zju  # noqa: E402 (tools/ sibling)

from transhuman_tpu.config import Config
from transhuman_tpu.data.zju import ZJUDataset
from transhuman_tpu.geometry.smpl import SMPLModel


def main():
    root = tempfile.mkdtemp(prefix="evalcache_zju_")
    n_cams = 9
    build_fake_zju(root, n_frames=4, n_cams=n_cams)
    cfg = Config().merge_opts(
        [
            "data_root", root,
            "ratio", "0.5",
            "test.input_view", "[0, 1, 2]",
            "test.target_view", "[3, 4, 5, 6, 7, 8]",  # 6 targets/frame
            "kmeans_dir", "/nonexistent",
        ]
    )
    smpl = SMPLModel.synthetic(n_verts=6890)
    info = {"CoreView_901": {"begin_i": 0, "i_intv": 1, "ni": 4}}
    ds = ZJUDataset(cfg, "test", smpl=smpl, human_info=info)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(ds)
    ds.get_eval_item(0)  # warm the non-LRU caches (undistort maps, ray grids)

    for mode in ("cold (cache cleared per item)", "warm (LRU on)"):
        t0 = time.perf_counter()
        for i in range(n):
            if mode.startswith("cold"):
                ds._iv_cache.clear()
            ds.get_eval_item(i % len(ds))
        per = (time.perf_counter() - t0) / n
        print(f"{mode:32s} {per * 1e3:7.1f} ms/item  {1.0 / per:5.2f} items/s",
              flush=True)


if __name__ == "__main__":
    main()
