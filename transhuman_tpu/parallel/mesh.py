"""Device mesh construction and batch sharding.

Replaces the reference's distributed layer (NCCL process group
`train_net.py:116-123`, DDP gradient allreduce `trainer.py:28-33`,
rank-sharded sampling `samplers.py:73-133`) with the JAX SPMD equivalents:
one process drives a `Mesh` over all local (or distributed) devices; the
train step runs under `shard_map` with the batch sharded over the `data`
axis and gradients reduced by `lax.pmean` over ICI.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and the
same code spans hosts (DCN between hosts, ICI within) — data loading then
shards per-process exactly like the reference's DistributedSampler, via
`process_shard` indices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh ('data',). n_data defaults to all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        if len(devices) < n_data:
            # silent truncation would run a SMALLER global batch than
            # configured (and, multihost, could build a mesh excluding the
            # caller's own chips); make_tp_mesh/make_pp_mesh raise too
            raise ValueError(
                f"mesh_axis_data={n_data} but only {len(devices)} devices "
                "are available"
            )
        devices = devices[:n_data]
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree (leading axis = global batch) sharded over 'data'.

    Single-host: `batch` holds the full global batch.  Multi-host: each
    process passes only ITS slice (global batch is
    `process_count * local_batch`, process i contributing rows
    [i*local : (i+1)*local] — the layout `cli/train.py` produces via
    `process_shard`), assembled with make_array_from_process_local_data.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        # ONE pytree-level device_put: jax batches the per-leaf transfers
        # in a single dispatch (a per-leaf tree.map pays per-leaf dispatch
        # overhead on every training batch — host path is the bottleneck
        # on small-core hosts)
        return jax.device_put(batch, sharding)

    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def gather_positioned(values, positions):
    """Merge per-process (value, global-position) pairs across all
    processes and return the values in global-position order.

    The frame-sharded eval path (cli/run.py): each process evaluates frames
    `positions` of the FrameSampler sequence and holds `values` metrics for
    them; the merged list is identical (content AND order) to what a
    single-process run would have accumulated.  Per-process counts may be
    unequal (gathers are padded with NaN up to the max count).  Single
    process: returns `values` unchanged.
    """
    vals = np.asarray(values, np.float64)
    pos = np.asarray(positions, np.int64)
    if vals.shape != pos.shape:
        raise ValueError(f"{vals.shape} values vs {pos.shape} positions")
    if jax.process_count() == 1:
        return [v for _, v in sorted(zip(pos.tolist(), vals.tolist()))]
    from jax.experimental import multihost_utils as mh

    counts = np.asarray(mh.process_allgather(np.int64(vals.size)))
    m = int(counts.max()) if counts.size else 0
    if m == 0:
        return []
    vbuf = np.full((m,), np.nan)
    pbuf = np.full((m,), -1, np.int64)
    vbuf[: vals.size] = vals
    pbuf[: pos.size] = pos
    all_v = np.asarray(mh.process_allgather(vbuf))  # (P, m)
    all_p = np.asarray(mh.process_allgather(pbuf))
    keep = all_p.reshape(-1) >= 0
    flat_v, flat_p = all_v.reshape(-1)[keep], all_p.reshape(-1)[keep]
    order = np.argsort(flat_p, kind="stable")
    return flat_v[order].tolist()


def process_shard(n_items: int, shuffle_rng: Optional[np.random.Generator] = None):
    """Per-process item indices — the DistributedSampler analog
    (samplers.py:88-133): contiguous shard of a (optionally shuffled) range."""
    idx = np.arange(n_items)
    if shuffle_rng is not None:
        shuffle_rng.shuffle(idx)
    n_proc = jax.process_count()
    per = int(np.ceil(n_items / n_proc))
    # pad by CYCLING so every process gets exactly `per` items (keeps steps
    # aligned).  np.resize repeats the whole sequence as many times as
    # needed — a single idx[:pad] concat breaks when pad > n_items (tiny
    # dataset on many hosts: trailing processes got short/EMPTY shards and
    # the collective batch assembly misaligned across ranks)
    idx = np.resize(idx, per * n_proc)
    return idx[jax.process_index() * per : (jax.process_index() + 1) * per]
