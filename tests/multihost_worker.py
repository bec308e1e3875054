"""Subprocess worker for the multi-host training test (test_multihost.py).

Each process owns 4 virtual CPU devices; with 2 processes the mesh spans 8
global devices.  The worker exercises the exact multi-host machinery of
cli/train.py (reference analog: lib/datasets/samplers.py:73-133 rank
sharding + DDP/SyncBN):

  * jax.distributed.initialize over a local coordinator,
  * a ('data',) mesh over the GLOBAL device list (parallel.make_mesh),
  * per-process contiguous batch slices assembled into global arrays via
    parallel.shard_batch (make_array_from_process_local_data),
  * one shard_map'd SGD step with BatchStatNorm(axis_name=("batch","data"))
    — cross-process SyncBN — and lax.pmean'd grads.

Run with process_id/num_processes; process 0 writes updated params to the
given .npz path.  A 1-process run on the same global batch must produce the
same update (asserted by the parent test).
"""

import os
import sys

n_local = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_local}"
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
    out_path = sys.argv[5]
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=n_proc,
            process_id=pid,
        )

    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from transhuman_tpu.models.layers import BatchStatNorm
    from transhuman_tpu.parallel import make_mesh, process_shard, replicate, shard_batch

    GLOBAL_BATCH = 16

    class TinyNet(nn.Module):
        axis_name: tuple = None

        @nn.compact
        def __call__(self, x):
            h = nn.Dense(8, name="fc1")(x)
            # SyncBN across every sample on the mesh, like the real model
            h = BatchStatNorm(axis_name=self.axis_name, name="bn")(h)
            return nn.Dense(4, name="fc2")(nn.relu(h))

    model = TinyNet(axis_name=("batch", "data"))

    # deterministic global dataset + the DistributedSampler-analog sharding
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((GLOBAL_BATCH, 6)).astype(np.float32)
    ys = rng.standard_normal((GLOBAL_BATCH, 4)).astype(np.float32)
    local_idx = process_shard(GLOBAL_BATCH, np.random.default_rng(42))
    batch = {"x": xs[local_idx], "y": ys[local_idx]}

    mesh = make_mesh()
    # init traces outside the mesh where axis names are unbound (same trick
    # as testing.init_params)
    params = model.clone(axis_name=None).init(
        jax.random.PRNGKey(7), jnp.zeros((2, 6))
    )
    params = replicate(mesh, params)
    batch = shard_batch(mesh, batch)

    tx = optax.sgd(0.1)
    opt_state = replicate(mesh, tx.init(params))

    def local_step(params, opt_state, batch):
        def loss_fn(p):
            # vmap with axis_name="batch" so BatchStatNorm sees the sample
            # axis, exactly like train/step.py:103-105
            preds = jax.vmap(
                lambda x: model.apply(p, x[None])[0], axis_name="batch"
            )(batch["x"])
            return jnp.mean((preds - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(
        shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P("data")),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    new_params, _, loss = step(params, opt_state, batch)

    if pid == 0:
        flat = jax.tree_util.tree_flatten_with_path(new_params)[0]
        out = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
        out["loss"] = np.asarray(loss)
        np.savez(out_path, **out)
        print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
