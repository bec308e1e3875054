"""Runtime utilities: recorder/metrics logging, profiling hooks."""

from .recorder import Recorder, SmoothedValue  # noqa: F401
