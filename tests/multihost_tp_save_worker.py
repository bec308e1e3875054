"""Subprocess worker for the multi-host TP checkpoint-save test.

2 processes x 2 local CPU devices = a ('data','model') 2x2 global mesh.
A param tree is sharded P(None,'model') (Megatron column layout, NOT fully
addressable from either process); every process calls
AsyncCheckpointer.save (the snapshot's replicating all-gather is a
collective), and only process 0 writes.  The parent asserts the written
checkpoint equals the known global values.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _jax_cache  # noqa: E402

_jax_cache.configure(jax)


def main():
    pid, n_proc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
    )
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from transhuman_tpu.parallel.tp import make_tp_mesh
    from transhuman_tpu.train.checkpoint import AsyncCheckpointer

    mesh = make_tp_mesh(2, 2)  # ('data','model') over 4 global devices
    kernel = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    bias = np.arange(8, dtype=np.float32)

    def put(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx]
        )

    params = {
        "qkv": {"kernel": put(kernel, P(None, "model")),
                "bias": put(bias, P("model"))},
        "scalar": put(np.float32(3.5), P()),
    }
    assert not params["qkv"]["kernel"].is_fully_addressable

    ck = AsyncCheckpointer()
    ck.save(out_dir, {"params": params, "step": 7}, epoch=0,
            save_epoch_copy=False, write=(pid == 0))
    ck.wait()
    # all processes must reach here (the snapshot is a collective)
    print(f"proc {pid} ok")


if __name__ == "__main__":
    main()
