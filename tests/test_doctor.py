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
