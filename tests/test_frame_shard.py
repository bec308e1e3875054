"""Single-process units for the frame-sharded eval machinery (cli/run.py
_frame_shard, parallel.mesh.gather_positioned, Evaluator.summarize(write=)).
The real 2-process path is covered by test_multihost.py."""

import os

import numpy as np

from transhuman_tpu.cli.run import _frame_shard
from transhuman_tpu.evals.evaluator import Evaluator
from transhuman_tpu.parallel.mesh import gather_positioned


def test_frame_shard_single_process_is_identity():
    idx, pos = _frame_shard(np.array([5, 9, 2]))
    np.testing.assert_array_equal(idx, [5, 9, 2])
    np.testing.assert_array_equal(pos, [0, 1, 2])


def test_frame_shard_striding(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    idx, pos = _frame_shard(np.arange(100, 107))
    np.testing.assert_array_equal(idx, [101, 104])
    np.testing.assert_array_equal(pos, [1, 4])


def test_frame_shard_covers_all_frames_disjointly(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    seen = []
    for p in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        idx, pos = _frame_shard(np.arange(11))
        np.testing.assert_array_equal(idx, pos)  # identity sequence here
        seen.extend(pos.tolist())
    assert sorted(seen) == list(range(11))


def test_process_shard_tiny_dataset_pads_by_cycling(monkeypatch):
    """pad > n_items (tiny dataset on many hosts): every process must still
    get exactly `per` VALID indices — the old single idx[:pad] concat left
    trailing processes with short/empty shards, misaligning the collective
    batch assembly across ranks."""
    import jax

    from transhuman_tpu.parallel.mesh import process_shard

    monkeypatch.setattr(jax, "process_count", lambda: 8)
    got = []
    for i in range(8):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        s = process_shard(3)
        assert s.shape == (1,)
        assert 0 <= int(s[0]) < 3
        got.append(int(s[0]))
    assert set(got) == {0, 1, 2}  # all items covered by some process


def test_make_mesh_rejects_oversized_axis():
    import jax
    import pytest

    from transhuman_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="mesh_axis_data"):
        make_mesh(len(jax.devices()) + 1)


def test_gather_positioned_single_process_sorts_by_position():
    assert gather_positioned([3.0, 1.0, 2.0], [2, 0, 1]) == [1.0, 2.0, 3.0]
    assert gather_positioned([], []) == []


def test_summarize_write_false_touches_nothing(tmp_path):
    d = str(tmp_path / "results")
    ev = Evaluator(result_dir=d, save_images=False)
    ev.mse.append(0.5)
    ev.psnr.append(30.0)
    ev.ssim.append(0.9)
    out = ev.summarize(write=False)
    assert out["psnr"] == 30.0
    assert not os.path.exists(d)
    # and write=True produces the files
    ev.psnr.append(31.0)
    ev.summarize(write=True)
    assert os.path.exists(os.path.join(d, "summary.txt"))
    assert os.path.exists(os.path.join(d, "psnr.npy"))
