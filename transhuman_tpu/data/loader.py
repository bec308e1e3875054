"""Prefetching data loader: overlaps host-side decode/augment with device
compute (the role of the reference's DataLoader worker processes,
make_dataset.py:83-89, num_workers=1).

Thread-pool based: the per-item work is numpy/cv2 (GIL-releasing) and the
device step dominates, so threads (no pickling, shared memory) beat
processes here.  Order is deterministic: items are emitted in the order of
the index list regardless of completion order.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence


class Loader:
    def __init__(
        self,
        fetch: Callable[[int], object],
        indices: Sequence[int],
        num_workers: int = 2,
        prefetch: int = 4,
    ):
        self.fetch = fetch
        self.indices = list(indices)
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return len(self.indices)

    def __iter__(self) -> Iterator:
        if self.num_workers == 1:
            for i in self.indices:
                yield self.fetch(i)
            return
        # keep enough futures in flight to feed EVERY worker plus a ready
        # buffer of `prefetch` — in-flight = prefetch alone capped effective
        # parallelism at prefetch (measured: a 5-worker/2-prefetch loader ran
        # ~2-wide and left the train step 97% input-bound at 512x512 scale)
        in_flight = self.num_workers + self.prefetch
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = iter(self.indices)
            try:
                for _ in range(in_flight):
                    pending.append(pool.submit(self.fetch, next(it)))
            except StopIteration:
                pass
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(self.fetch, next(it)))
                except StopIteration:
                    pass
                yield fut.result()


def batched(iterable: Iterable, n: int):
    """Group an iterable into lists of n (last partial group dropped)."""
    buf = []
    for x in iterable:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
