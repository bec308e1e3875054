"""Checkpoint save/load with the reference's lifecycle semantics
(`lib/utils/net_utils.py:288-428`):

* periodic epoch checkpoints (`ep{N}.ckpt`) + a rolling `latest.ckpt`,
* full-state resume (params, optimizer state, step, epoch, recorder),
* weights-only load for evaluation, picking `latest`/max-epoch/explicit,
* NO destructive directory wipe on resume=False (the reference deletes the
  model dir, net_utils.py:297-298 — an explicit non-goal here).

Format: a pickle of a numpy-ified pytree written atomically (tmp+rename).
Multi-host: call only from process 0 (`jax.process_index() == 0`), matching
the reference's rank-0-only saves (train_net.py:74-78).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


import functools


@functools.lru_cache(maxsize=None)
def _replicator(sharding):
    """One cached jitted identity per target sharding: a fresh jit lambda
    per leaf per save would re-trace (and through the tunnel, re-compile)
    one collective for every param/mu/nu leaf on every epoch."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def _write_blobs(model_dir: str, data: dict, epoch: int, save_epoch_copy: bool):
    os.makedirs(model_dir, exist_ok=True)
    blob = pickle.dumps(data, protocol=pickle.HIGHEST_PROTOCOL)

    def write(path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)

    write(os.path.join(model_dir, "latest.ckpt"))
    if save_epoch_copy:
        write(os.path.join(model_dir, f"ep{epoch}.ckpt"))


def save_checkpoint(
    model_dir: str,
    payload: dict,
    epoch: int,
    save_epoch_copy: bool = True,
):
    """payload: dict with at least {'params': ...}; we add 'epoch'."""
    data = _to_numpy(dict(payload, epoch=epoch))
    _write_blobs(model_dir, data, epoch, save_epoch_copy)


class AsyncCheckpointer:
    """Overlap checkpoint serialization + file IO with training.

    The reference blocks the train loop on `torch.save` (net_utils.py:
    335-348); here only the device->host fetch is synchronous — the state
    must be snapshotted before the next (buffer-donating) step reuses it —
    while pickling and the atomic writes run on ONE background worker.  A
    single worker keeps saves ordered, so `latest.ckpt` can never regress
    to an older epoch when a slow save finishes after a newer one.  Worker
    errors are re-raised at the next `save()`/`wait()` — a failed write
    must not be silent.  Call `wait()` before reading the files back or
    exiting."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._ex = ThreadPoolExecutor(max_workers=1)
        self._pending = []

    def _drain(self, block: bool):
        rest = []
        for f in self._pending:
            if block or f.done():
                f.result()  # re-raise worker failures
            else:
                rest.append(f)
        self._pending = rest

    def save(self, model_dir: str, payload: dict, epoch: int,
             save_epoch_copy: bool = True, write: bool = True):
        """write=False still snapshots (a no-op for host leaves) but skips
        the file write — multi-host callers pass write=(rank == 0) and call
        save on EVERY process, because fetching a non-fully-addressable
        leaf (multi-host TP-sharded params/Adam moments) is a collective
        all-gather that all processes must join."""
        self._drain(block=False)

        # backpressure: each pending save holds a full host snapshot of the
        # train state (params + Adam moments — hundreds of MB at scale); a
        # disk slower than the save cadence would otherwise accumulate one
        # snapshot per epoch without bound.  Block on the OLDEST write once
        # 2 are queued: the train loop stalls rather than the host OOMing.
        while len(self._pending) >= 2:
            self._pending.pop(0).result()

        # snapshot NOW, with a forced copy: device_get is zero-copy for
        # host-resident leaves, and the caller (or a donating train step)
        # may overwrite the live buffers before the worker pickles them
        def fetch(x):
            if (isinstance(x, jax.Array) and not x.is_fully_addressable
                    and not x.is_fully_replicated):
                # multi-host SHARDED leaf: replicate via an XLA all-gather
                # (collective — every process must reach this line; the
                # replicated/sharded split is a global property, so all
                # ranks branch identically), after which the global value
                # is host-readable everywhere.  Replicated-but-remote
                # leaves skip this: device_get reads them directly.
                from jax.sharding import NamedSharding, PartitionSpec as P

                x = _replicator(NamedSharding(x.sharding.mesh, P()))(x)
            return np.array(jax.device_get(x))

        data = jax.tree.map(fetch, dict(payload, epoch=epoch))
        if not write:
            return
        self._pending.append(
            self._ex.submit(_write_blobs, model_dir, data, epoch, save_epoch_copy)
        )

    def wait(self):
        self._drain(block=True)


def _available_epochs(model_dir: str):
    if not os.path.isdir(model_dir):
        return []
    eps = []
    for f in os.listdir(model_dir):
        m = re.fullmatch(r"ep(\d+)\.ckpt", f)
        if m:
            eps.append(int(m.group(1)))
    return sorted(eps)


def load_checkpoint(
    model_dir: str,
    epoch: int = -1,
    explicit_path: Optional[str] = None,
) -> Optional[dict]:
    """epoch=-1: latest.ckpt if present else max epoch copy; epoch=N: epN.ckpt;
    explicit_path overrides (the reference's specified_resume)."""
    if explicit_path:
        path = explicit_path
    elif epoch >= 0:
        path = os.path.join(model_dir, f"ep{epoch}.ckpt")
    else:
        path = os.path.join(model_dir, "latest.ckpt")
        if not os.path.exists(path):
            eps = _available_epochs(model_dir)
            if not eps:
                return None
            path = os.path.join(model_dir, f"ep{eps[-1]}.ckpt")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def load_params(model_dir: str, epoch: int = -1, explicit_path=None):
    """Weights-only load for eval (net_utils.load_network analog)."""
    ckpt = load_checkpoint(model_dir, epoch, explicit_path)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint in {model_dir}")
    return ckpt["params"], ckpt["epoch"]
