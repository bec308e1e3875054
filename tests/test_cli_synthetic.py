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


def test_synthetic_train_with_cull(tmp_path, capsys):
    """cfg.train.cull wires through the CLI: train.cull_ratio 0 = AUTO
    (capacity sized from the measured survivor fraction of the first train
    samples — docs/SCALING.md attribution), then the culled+compacted
    training decode runs end-to-end, reports the overflow stat, and
    checkpoints."""
    from transhuman_tpu.cli import train as train_cli

    argv = _argv(tmp_path) + [
        "train.cull", "True",
        "train.cull_ratio", "0",  # auto: measure, don't default
        "cull_distance", "0.5",  # synthetic body: keep some survivors
    ]
    state = train_cli.main(argv)
    assert int(state.step) == 2
    out = capsys.readouterr().out
    assert "train.cull_ratio auto" in out
    import re

    ratio = float(re.search(r"-> ratio ([0-9.]+)", out).group(1))
    assert 0 < ratio <= 1.0
    import os

    assert os.path.exists(str(tmp_path / "model"))


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


def test_weights_only_checkpoint_fine_tune(tmp_path):
    """Fine-tuning from a CONVERTED official checkpoint (weights + pe_table,
    NO opt_state — tools/convert_checkpoint.py's payload): the optimizer
    state starts fresh instead of KeyError, the pe_table is threaded into
    the runtime, and every checkpoint the run writes carries it onward."""
    import pickle

    import jax.numpy as jnp

    from transhuman_tpu.cli import train as train_cli

    argv = _argv(tmp_path)
    state = train_cli.main(argv)  # epoch 0 baseline run to get real params

    # cli.common.model_dir layout: trained_model_dir / task / exp_name
    mdir = tmp_path / "model" / "transhuman" / "transhuman_tpu"
    with open(mdir / "latest.ckpt", "rb") as f:
        full = pickle.load(f)
    # (C, D) like RenderPipeline.pe_can: C=num_class 8, D=192 (vit tiny)
    pe = (np.arange(8 * 192, dtype=np.float32).reshape(8, 192) % 7) * 0.1
    converted = {"params": full["params"], "epoch": 0, "pe_table": pe}
    conv_path = tmp_path / "converted.ckpt"
    with open(conv_path, "wb") as f:
        pickle.dump(converted, f)

    state2 = train_cli.main(
        argv + ["specified_resume", str(conv_path), "train.epoch", "2"]
    )
    assert int(state2.step) >= 1
    with open(mdir / "latest.ckpt", "rb") as f:
        saved = pickle.load(f)
    assert "opt_state" in saved  # full state saved by the fine-tune
    np.testing.assert_array_equal(saved["pe_table"], pe)  # table rides along

    # a typo'd explicit resume path must fail loudly, never fresh-init
    import pytest

    with pytest.raises(FileNotFoundError, match="specified_resume"):
        train_cli.main(argv + ["specified_resume", str(tmp_path / "nope.ckpt")])
