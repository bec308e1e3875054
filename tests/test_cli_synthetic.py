"""CLI dataset-registry routing: `dataset synthetic` runs train + evaluate
end-to-end with ZERO on-disk assets (the reference's config-named dataset
plugin dispatch, make_dataset.py:57-91, as a registry lookup)."""

import numpy as np


def _argv(work):
    return [
        "dataset", "synthetic",
        "num_class", "8",
        "vit_depth", "2",
        "N_samples", "8",
        "chunk_size", "64",
        "pad_bucket", "64",
        "patch.N_patches", "2",
        "patch.size", "6",
        "ep_iter", "2",
        "train.epoch", "1",
        "save_freq", "1",
        "trained_model_dir", str(work / "model"),
        "record_dir", str(work / "record"),
        "result_dir", str(work / "result"),
        "kmeans_dir", str(work / "nonexistent"),
    ]


def test_synthetic_train_then_evaluate(tmp_path):
    from transhuman_tpu.cli import run as run_cli
    from transhuman_tpu.cli import train as train_cli

    argv = _argv(tmp_path)
    state = train_cli.main(argv)
    assert int(state.step) == 2

    summary = run_cli.main(["--type", "evaluate"] + argv)
    assert summary["psnr"] is not None and np.isfinite(summary["psnr"])
    assert summary["mse"] is not None and summary["mse"] >= 0


def test_synthetic_train_tensor_parallel(tmp_path):
    """mesh_axis_model=2 routes the train CLI through the GSPMD TP step
    (('data','model') mesh, parallel/tp.py): train, checkpoint (sharded
    arrays must snapshot to host cleanly), then evaluate from it."""
    from transhuman_tpu.cli import run as run_cli
    from transhuman_tpu.cli import train as train_cli

    argv = _argv(tmp_path) + ["mesh_axis_model", "2", "mesh_axis_data", "2"]
    state = train_cli.main(argv)
    assert int(state.step) == 2
    qkv = state.params["params"]["transhe"]["block_0"]["attn"]["qkv"]
    assert "model" in str(qkv["kernel"].sharding.spec)

    # resume path places the restored state back on the TP mesh
    argv_resume = argv + ["train.epoch", "2", "resume", "True"]
    state = train_cli.main(argv_resume)
    assert int(state.step) == 4

    summary = run_cli.main(["--type", "evaluate"] + argv)
    assert summary["psnr"] is not None and np.isfinite(summary["psnr"])
