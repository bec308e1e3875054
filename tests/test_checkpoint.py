"""Checkpoint I/O unit tests: sync save/load lifecycle and the async
checkpointer's ordering + error-propagation guarantees."""

import os
import pickle

import numpy as np
import pytest

from transhuman_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    load_params,
    save_checkpoint,
)


def _payload(v):
    return {"params": {"w": np.full((4, 4), float(v), np.float32)}}


def test_save_load_lifecycle(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, _payload(1), epoch=0, save_epoch_copy=True)
    save_checkpoint(d, _payload(2), epoch=1, save_epoch_copy=False)
    # latest has epoch 1; only ep0 exists as an epoch copy
    ck = load_checkpoint(d)
    assert ck["epoch"] == 1 and ck["params"]["w"][0, 0] == 2
    assert load_checkpoint(d, epoch=0)["params"]["w"][0, 0] == 1
    assert sorted(f for f in os.listdir(d) if f.startswith("ep")) == ["ep0.ckpt"]
    params, epoch = load_params(d)
    assert epoch == 1 and params["w"][0, 0] == 2


def test_load_falls_back_to_max_epoch(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, _payload(5), epoch=3)
    save_checkpoint(d, _payload(9), epoch=7)
    os.remove(os.path.join(d, "latest.ckpt"))
    ck = load_checkpoint(d)
    assert ck["epoch"] == 7 and ck["params"]["w"][0, 0] == 9


def test_async_saves_stay_ordered(tmp_path):
    """Many rapid async saves: latest.ckpt must end at the LAST epoch (one
    ordered worker — a slow old save can never clobber a newer one), every
    epoch copy must exist, and the snapshot must be taken at submit time
    (mutating the payload afterwards must not leak into the file)."""
    d = str(tmp_path)
    cp = AsyncCheckpointer()
    live = {"params": {"w": np.zeros(8, np.float32)}}
    for e in range(12):
        live["params"]["w"][:] = e
        cp.save(d, live, epoch=e, save_epoch_copy=True)
    live["params"]["w"][:] = -1  # after-submit mutation must not be saved
    cp.wait()
    ck = load_checkpoint(d)
    assert ck["epoch"] == 11
    np.testing.assert_array_equal(ck["params"]["w"], np.full(8, 11.0))
    for e in range(12):
        np.testing.assert_array_equal(
            load_checkpoint(d, epoch=e)["params"]["w"], np.full(8, float(e))
        )


def test_async_errors_are_raised_not_swallowed(tmp_path):
    cp = AsyncCheckpointer()
    bad = os.path.join(str(tmp_path), "file_not_dir")
    with open(bad, "wb") as f:
        f.write(b"x")
    # target "dir" is a file -> the worker's makedirs fails
    cp.save(os.path.join(bad, "sub"), _payload(1), epoch=0)
    with pytest.raises(OSError):
        cp.wait()


def test_async_roundtrip_pickle_identical_to_sync(tmp_path):
    da, ds = str(tmp_path / "a"), str(tmp_path / "s")
    cp = AsyncCheckpointer()
    cp.save(da, _payload(3), epoch=2)
    cp.wait()
    save_checkpoint(ds, _payload(3), epoch=2)
    with open(os.path.join(da, "latest.ckpt"), "rb") as f:
        a = pickle.load(f)
    with open(os.path.join(ds, "latest.ckpt"), "rb") as f:
        s = pickle.load(f)
    assert a["epoch"] == s["epoch"]
    np.testing.assert_array_equal(a["params"]["w"], s["params"]["w"])


def test_async_backpressure_bounds_pending(tmp_path, monkeypatch):
    """Each pending save holds a full host snapshot; a disk slower than the
    save cadence must block the caller instead of accumulating snapshots
    without bound (cap: 2 queued)."""
    import time as _time

    import transhuman_tpu.train.checkpoint as ck

    slow = {"n": 0}
    real = ck._write_blobs

    def slow_write(*a, **k):
        slow["n"] += 1
        _time.sleep(0.2)
        return real(*a, **k)

    monkeypatch.setattr(ck, "_write_blobs", slow_write)
    c = ck.AsyncCheckpointer()
    payload = {"params": {"w": np.ones(4, np.float32)}, "step": 0}
    for e in range(5):
        c.save(str(tmp_path), payload, e, save_epoch_copy=False)
        assert len(c._pending) <= 2
    c.wait()
    assert slow["n"] == 5
