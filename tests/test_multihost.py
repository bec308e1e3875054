"""Multi-host training proof: 2 jax.distributed CPU processes produce the
same parameter update as a single process on the same global batch.

Covers the untested-beyond-one-process path of parallel/mesh.py
(make_array_from_process_local_data assembly, process_shard slicing,
cross-process pmean + SyncBN) — the reference analog is
lib/datasets/samplers.py:73-133 + DDP/SyncBatchNorm (train_net.py:116-123).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"
REPO = Path(__file__).parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(pid, n_proc, port, n_local, out, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(n_proc), str(port),
         str(n_local), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_update_matches_single(tmp_path):
    out1 = tmp_path / "single.npz"
    out2 = tmp_path / "multi.npz"

    # single process, 8 local devices
    p = _run(0, 1, 0, 8, out1)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0 and "WORKER_OK" in out, out

    # two processes, 4 local devices each -> same 8-device global mesh
    port = _free_port()
    procs = [_run(i, 2, port, 4, out2) for i in range(2)]
    logs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=300)
            logs.append(o)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out\n" + "\n".join(logs))
    if any(p.returncode != 0 for p in procs):
        if any("UNAVAILABLE" in log or "DEADLINE_EXCEEDED" in log for log in logs):
            pytest.skip("jax.distributed unavailable in this environment")
        pytest.fail("\n".join(logs))
    assert "WORKER_OK" in logs[0], logs[0]

    a, b = np.load(out1), np.load(out2)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(
            a[k], b[k], rtol=1e-5, atol=1e-6,
            err_msg=f"{k} differs between 1-process and 2-process runs",
        )


EVAL_WORKER = Path(__file__).parent / "multihost_eval_worker.py"


def _run_eval(pid, n_proc, port, out):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, str(EVAL_WORKER), str(pid), str(n_proc), str(port),
         str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_frame_sharded_eval_matches_single(tmp_path):
    """cli/run.py frame sharding + metric gather: 2 jax.distributed
    processes evaluating 7 frames (unequal 4/3 split) must produce the same
    per-frame metric arrays (content AND order) and summary means as one
    process."""
    out1 = tmp_path / "single.npz"
    out2 = tmp_path / "multi.npz"

    p = _run_eval(0, 1, 0, out1)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0 and "WORKER_OK" in out, out

    port = _free_port()
    procs = [_run_eval(i, 2, port, out2) for i in range(2)]
    logs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=300)
            logs.append(o)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("eval workers timed out\n" + "\n".join(logs))
    if any(p.returncode != 0 for p in procs):
        if any("UNAVAILABLE" in log or "DEADLINE_EXCEEDED" in log for log in logs):
            pytest.skip("jax.distributed unavailable in this environment")
        pytest.fail("\n".join(logs))

    a, b = np.load(out1), np.load(out2)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], err_msg=k)


TP_SAVE_WORKER = Path(__file__).parent / "multihost_tp_save_worker.py"


def test_two_process_tp_checkpoint_save(tmp_path):
    """AsyncCheckpointer.save on multi-host TP-sharded state: snapshotting a
    non-fully-addressable leaf is a collective all-gather every process
    joins (write=rank==0); the written checkpoint holds the global values."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(TP_SAVE_WORKER), str(i), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=300)
            logs.append(o)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("TP-save workers timed out (collective not joined?)\n"
                    + "\n".join(logs))
    if any(p.returncode != 0 for p in procs):
        if any("UNAVAILABLE" in log or "DEADLINE_EXCEEDED" in log for log in logs):
            pytest.skip("jax.distributed unavailable in this environment")
        pytest.fail("\n".join(logs))

    import pickle

    with open(tmp_path / "latest.ckpt", "rb") as f:
        ckpt = pickle.load(f)
    np.testing.assert_array_equal(
        ckpt["params"]["qkv"]["kernel"],
        np.arange(4 * 8, dtype=np.float32).reshape(4, 8),
    )
    np.testing.assert_array_equal(
        ckpt["params"]["qkv"]["bias"], np.arange(8, dtype=np.float32)
    )
    assert float(ckpt["params"]["scalar"]) == 3.5 and int(ckpt["step"]) == 7
