"""Profiling utilities.

The reference's only observability is wall-clock bookkeeping ("TIME CHECK",
trainers.py:222,345) and a thop FLOP hook. TPU-native equivalents: ``jax.profiler``
traces viewable in TensorBoard/Perfetto, plus a throughput meter for the train loop.
"""
import contextlib
import time
from typing import Optional

from thr3ed_atom_tpu.utils.logging import log


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    log.info(f"capturing jax.profiler trace into {log_dir}")
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sliding-window rays/sec (or any unit/sec) meter for the hot loop."""

    def __init__(self, window: int = 50):
        self._window = window
        self._events = []  # (timestamp, units)

    def tick(self, units: float) -> None:
        self._events.append((time.perf_counter(), units))
        if len(self._events) > self._window:
            self._events.pop(0)

    @property
    def per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        span = self._events[-1][0] - self._events[0][0]
        units = sum(u for _, u in self._events[1:])
        return units / span if span > 0 else 0.0
