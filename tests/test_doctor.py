"""tools/doctor.py: read-only environment/asset diagnostic."""

import numpy as np

from tests.test_zju_data import fake_zju  # noqa: F401  (fixture reuse)


def test_doctor_passes_on_fake_dataset(fake_zju, monkeypatch, capsys):  # noqa: F811
    from transhuman_tpu.data import catalog
    from transhuman_tpu.tools import doctor

    cfg0, smpl, info = fake_zju
    monkeypatch.setattr(
        catalog, "get_human_info", lambda split, mode="": dict(info)
    )
    rc = doctor.main([
        "data_root", cfg0.data_root,
        "rasterize_root", cfg0.rasterize_root,
        "ratio", "0.5",
        "test.input_view", "[0, 1]",
        "test.target_view", "[2]",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[PASS] dataset humans" in out
    assert "[PASS] annots" in out
    assert "[PASS] sample frame" in out
    assert "[PASS] vizmaps" in out
    # absent-but-recoverable assets warn, not fail
    assert "[WARN] SMPL model" in out
    assert "[WARN] k-means dict" in out


def test_doctor_fails_without_dataset(tmp_path, capsys):
    from transhuman_tpu.tools import doctor

    rc = doctor.main(["data_root", str(tmp_path / "nope")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] dataset root" in out


def test_doctor_fails_on_missing_eval_checkpoint(fake_zju, monkeypatch, capsys):  # noqa: F811
    """run_mode=test needs a checkpoint: WARN becomes FAIL."""
    from transhuman_tpu.data import catalog
    from transhuman_tpu.tools import doctor

    cfg0, smpl, info = fake_zju
    monkeypatch.setattr(
        catalog, "get_human_info", lambda split, mode="": dict(info)
    )
    rc = doctor.main([
        "data_root", cfg0.data_root,
        "rasterize_root", cfg0.rasterize_root,
        "run_mode", "test",
        "test.input_view", "[0, 1]",
        "test.target_view", "[2]",
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] checkpoint" in out


def test_doctor_accepts_epoch_only_checkpoints(fake_zju, monkeypatch,  # noqa: F811
                                               capsys, tmp_path):
    """A model dir with only ep{N}.ckpt (no latest.ckpt) is loadable —
    load_checkpoint picks test.epoch/max — so doctor must not FAIL it."""
    from transhuman_tpu.data import catalog
    from transhuman_tpu.tools import doctor

    cfg0, smpl, info = fake_zju
    monkeypatch.setattr(
        catalog, "get_human_info", lambda split, mode="": dict(info)
    )
    mdir = tmp_path / "model" / "transhuman" / "default"
    mdir.mkdir(parents=True)
    (mdir / "ep5.ckpt").write_bytes(b"stub")
    rc = doctor.main([
        "data_root", cfg0.data_root,
        "rasterize_root", cfg0.rasterize_root,
        "run_mode", "test",
        "trained_model_dir", str(tmp_path / "model"),
        "exp_name", "default",
        "test.input_view", "[0, 1]",
        "test.target_view", "[2]",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[PASS] checkpoint" in out and "ep5.ckpt" in out
