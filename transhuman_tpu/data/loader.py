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
from typing import Callable, Iterator, Sequence


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
        # 0 = fully synchronous (fetch inline in the consumer thread);
        # >= 1 = that many worker threads with `prefetch` buffered items
        # (num_workers=1 previously fell through to the synchronous path,
        # silently ignoring prefetch — the reference's num_workers=1
        # DataLoader still overlaps via its one worker process)
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return len(self.indices)

    def __iter__(self) -> Iterator:
        if self.num_workers == 0:
            for i in self.indices:
                yield self.fetch(i)
            return
        # keep enough futures in flight to feed EVERY worker plus a ready
        # buffer of `prefetch` — in-flight = prefetch alone capped effective
        # parallelism at prefetch (measured: a 5-worker/2-prefetch loader ran
        # ~2-wide and left the train step 97% input-bound at 512x512 scale)
        in_flight = self.num_workers + self.prefetch
        pool = ThreadPoolExecutor(self.num_workers)
        try:
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
        finally:
            # early consumer exit (KeyboardInterrupt, a raising train step):
            # cancel queued fetches instead of letting up to
            # num_workers+prefetch decodes/device_puts run to completion
            pool.shutdown(wait=False, cancel_futures=True)

