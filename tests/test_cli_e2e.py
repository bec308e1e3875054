"""End-to-end CLI tests: train 1 epoch on the fake on-disk ZJU dataset, then
run all three inference workloads (evaluate / visualize / reconstruction)
from the produced checkpoint — the full reference workflow at doll-house
scale (BASELINE.json configs 1-5 wiring)."""

import os

import numpy as np
import pytest

from transhuman_tpu.config import Config
from transhuman_tpu.data.zju import ZJUDataset
from transhuman_tpu.geometry.smpl import SMPLModel

from tests.test_zju_data import fake_zju  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def trained(fake_zju, tmp_path_factory):  # noqa: F811
    cfg0, smpl, info = fake_zju
    work = tmp_path_factory.mktemp("work")
    overrides = [
        "data_root", cfg0.data_root,
        "rasterize_root", cfg0.rasterize_root,
        "ratio", "0.5",
        "train_num_views", "2",
        "test.input_view", "[0, 1]",
        "test.target_view", "[2]",
        "patch.N_patches", "2",
        "patch.size", "6",
        "vit_depth", "2",
        "num_class", "8",
        "N_samples", "8",
        "chunk_size", "64",
        "pad_bucket", "64",
        "ep_iter", "2",
        "train.epoch", "1",
        "save_freq", "1",
        "render_views", "4",
        "voxel_size", "[0.06, 0.06, 0.06]",
        "trained_model_dir", str(work / "model"),
        "record_dir", str(work / "record"),
        "result_dir", str(work / "result"),
        "kmeans_dir", str(work / "nonexistent"),
    ]
    argv = []
    for kv in overrides:
        argv.append(str(kv))
    return cfg0, smpl, info, argv, work


def test_train_then_all_run_modes(trained):
    cfg0, smpl, info, argv, work = trained
    from transhuman_tpu.cli import run as run_cli
    from transhuman_tpu.cli import train as train_cli

    cfg = Config().merge_opts(argv)
    train_ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    state = train_cli.main(argv, dataset=train_ds, smpl=smpl)
    assert int(state.step) == 2
    assert os.path.exists(work / "model" / "transhuman" / "transhuman_tpu" / "latest.ckpt")
    assert os.path.exists(work / "record" / "metrics.jsonl")

    test_cfg = Config().merge_opts(argv).merge_dict({"run_mode": "test", "perturb": 0.0})
    eval_ds = ZJUDataset(test_cfg, "test", smpl=smpl, human_info=info)

    summary = run_cli.main(["--type", "evaluate"] + argv, dataset=eval_ds, smpl=smpl)
    assert summary["psnr"] is not None and np.isfinite(summary["psnr"])
    rdir = work / "result" / "epoch_-1" / "debug"
    assert (rdir / "summary.txt").exists()
    assert (rdir / "psnr.npy").exists()

    run_cli.main(["--type", "visualize"] + argv, dataset=eval_ds, smpl=smpl)
    perform = rdir / "perform" / "CoreView_901"
    assert len(list(perform.glob("*.png"))) > 0

    run_cli.main(["--type", "reconstruction"] + argv, dataset=eval_ds, smpl=smpl)
    meshes = list((rdir / "mesh").glob("*.ply"))
    assert len(meshes) > 0


def test_resume_from_checkpoint(trained):
    cfg0, smpl, info, argv, work = trained
    from transhuman_tpu.cli import train as train_cli

    cfg = Config().merge_opts(argv).merge_dict({"train": {"epoch": 2}})
    train_ds = ZJUDataset(cfg, "train", smpl=smpl, human_info=info)
    argv2 = argv + ["train.epoch", "2"]
    state = train_cli.main(argv2, dataset=train_ds, smpl=smpl)
    # epoch 0 was trained in the previous test; resume does only epoch 1
    assert int(state.step) == 4


def test_train_cli_test_flag_runs_val(trained):
    """train_net.py --test analog: weights-only load + val loop (loss stats
    averaged over the test loader, evaluator summary, one 'val' record)."""
    import json

    from transhuman_tpu.cli import train as train_cli

    cfg0, smpl, info, argv, work = trained
    test_cfg = Config().merge_opts(argv).merge_dict(
        {"run_mode": "test", "perturb": 0.0}
    )
    eval_ds = ZJUDataset(test_cfg, "test", smpl=smpl, human_info=info)
    val_stats, summary = train_cli.main(
        ["--test"] + argv + ["use_record", "True"],
        dataset=eval_ds, smpl=smpl,
    )
    assert np.isfinite(val_stats["img_loss"]) and val_stats["img_loss"] >= 0
    assert val_stats["loss"] == val_stats["img_loss"]
    assert summary["psnr"] is not None and np.isfinite(summary["psnr"])

    rows = [
        json.loads(line)
        for line in open(work / "record" / "metrics.jsonl")
    ]
    val_rows = [r for r in rows if r.get("prefix") == "val"]
    assert val_rows, "no 'val' record written"
    assert np.isclose(val_rows[-1]["img_loss"], val_stats["img_loss"])
    assert "psnr" in val_rows[-1]
