"""Profiling hooks: jax.profiler traces + simple wall-clock scopes.

The reference's tracing story is a single `profiler.record_function`
annotation plus smoothed batch timings (SURVEY.md §5.1); here the same
console telemetry lives in utils/recorder.py and device-level tracing uses
jax.profiler (XLA/TPU traces viewable in TensorBoard/Perfetto/xprof).

Timing discipline (CLAUDE.md): through the axon TPU tunnel,
`jax.block_until_ready` does NOT reliably drain the dispatch queue — only a
host readback of a scalar forces completion.  Both helpers below take the
block's own outputs through a mutable sink so they can force that readback
before stopping the clock/trace (a plain `sync=` argument is evaluated at
`with`-entry and can never reference the block's output).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


def _force_readback(sink: List):
    """Force device completion of the last value the block appended: a
    scalar host fetch of one leaf (NOT block_until_ready — see module
    docstring)."""
    if not sink:
        return
    import jax
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(sink[-1])
              if hasattr(x, "dtype")]
    if leaves:
        float(np.asarray(leaves[0]).reshape(-1)[0])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block.

    Yields a list: append the block's device outputs to it so the exit path
    can force a scalar readback BEFORE stop_trace — otherwise, through the
    axon tunnel, the trace is stopped while device work is still in flight
    and comes back truncated/empty::

        with device_trace(dir) as sink:
            sink.append(step(state, batch))
    """
    import jax

    jax.profiler.start_trace(log_dir)
    sink: List = []
    try:
        yield sink
    finally:
        _force_readback(sink)
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in xprof timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Accumulating wall-clock scopes::

        sw = Stopwatch()
        with sw('render') as sink:
            sink.append(f(x))   # forces a scalar readback before the stop

    Appending the block's device output is what makes the measured time
    the COMPUTE time; an empty sink times only the async dispatch (fine
    for host-only scopes)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        sink: List = []
        try:
            yield sink
        finally:
            _force_readback(sink)
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return "  ".join(
            f"{k}: {v:.4f}s/{self.counts[k]}" for k, v in sorted(self.totals.items())
        )
