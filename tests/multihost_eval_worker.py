"""Subprocess worker for the frame-sharded eval test (test_multihost.py).

Exercises the multi-process eval machinery of cli/run.py without a model:
  * `_frame_shard` strided frame assignment,
  * `parallel.mesh.gather_positioned` merging unequal per-process metric
    lists back into global order,
  * `evals.evaluator.merge_across_processes` + `summarize(write=rank0)`.

Each process "evaluates" its shard of 7 synthetic frames (7 % 2 != 0 — the
unequal-count path) by looking metrics up in a shared table; process 0
writes the merged per-frame arrays + summary means to the given .npz, which
the parent compares against the plain single-process answer.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# same persistent compile cache as conftest.py (shared bootstrap module):
# without it each spawned process re-pays its XLA compiles every suite run
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _jax_cache  # noqa: E402

_jax_cache.configure(jax)


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out_path = sys.argv[4]
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=n_proc,
            process_id=pid,
        )

    import numpy as np

    from transhuman_tpu.cli.run import _frame_shard
    from transhuman_tpu.evals.evaluator import Evaluator, merge_across_processes

    N_FRAMES = 7
    table = np.random.default_rng(3).random((N_FRAMES, 4))  # mse/psnr/ssim/lp

    frame_ids = np.arange(100, 100 + N_FRAMES)  # FrameSampler-style indices
    local_idx, positions = _frame_shard(frame_ids)
    assert local_idx.shape == positions.shape

    ev = Evaluator(
        result_dir=os.path.join(os.path.dirname(out_path), f"rank{pid}"),
        save_images=False,
    )
    for fid in local_idx:
        row = table[fid - 100]
        ev.mse.append(float(row[0]))
        ev.psnr.append(float(row[1]))
        ev.ssim.append(float(row[2]))
        ev.ssim_dr1.append(float(row[2]))
        ev.lpips.append(float(row[3]))

    merge_across_processes(ev, positions)
    per_frame = {
        "mse": np.asarray(ev.mse),
        "psnr": np.asarray(ev.psnr),
        "ssim": np.asarray(ev.ssim),
        "lpips": np.asarray(ev.lpips),
    }
    summary = ev.summarize(write=pid == 0)

    if pid == 0:
        out = dict(per_frame)
        out["summary"] = np.asarray(
            [summary["mse"], summary["psnr"], summary["ssim"], summary["lpips"]]
        )
        np.savez(out_path, **out)
        print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
