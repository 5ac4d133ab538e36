"""Tracing / profiling hooks.

The reference has no built-in profiler (SURVEY.md §5: only CUDA_LAUNCH_BLOCKING
and wall-clock meters).  Here: jax.profiler traces (viewable in TensorBoard /
Perfetto), step timers, and a device-memory probe.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace for the enclosed steps (no-op if logdir None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock iteration/data-time meters (util/misc.py:224-276 analogue)."""

    def __init__(self):
        self.t_last = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0
        self.steps = 0

    def data_ready(self):
        now = time.perf_counter()
        self.data_time += now - self.t_last
        self._t_data = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time += now - self._t_data
        self.t_last = now
        self.steps += 1

    def averages(self) -> Dict[str, float]:
        n = max(self.steps, 1)
        return {"data_time_s": self.data_time / n, "step_time_s": self.step_time / n}


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory usage in GiB (max-GPU-mem print analogue, misc.py:241)."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = round(stats.get("bytes_in_use", 0) / 2**30, 3)
    return out
