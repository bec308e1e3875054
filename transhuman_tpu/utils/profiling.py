"""Profiling hooks: jax.profiler traces + simple wall-clock scopes.

The reference's tracing story is a single `profiler.record_function`
annotation plus smoothed batch timings (SURVEY.md §5.1); here the same
console telemetry lives in utils/recorder.py and device-level tracing uses
jax.profiler (XLA/TPU traces viewable in TensorBoard/Perfetto/xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in xprof timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Accumulating wall-clock scopes: `with sw('encode'): ...`."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return "  ".join(
            f"{k}: {v:.4f}s/{self.counts[k]}" for k, v in sorted(self.totals.items())
        )
