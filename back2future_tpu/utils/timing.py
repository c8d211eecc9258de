"""Wall-clock step/data timing.

The reference brackets each batch with torch.Timer pairs and
cutorch.synchronize for honest GPU timing (train.lua:123,193-203,498).
The JAX equivalent: `block_until_ready` on step outputs plus paired
timers for data-loading vs step time. `jax.profiler` trace capture can
be layered on via `trace_dir`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Tracks data-loading time and step time per batch."""

    def __init__(self):
        self._t_mark = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0

    def data_loaded(self):
        now = time.perf_counter()
        self.data_time = now - self._t_mark
        self._t_mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time = now - self._t_mark
        self._t_mark = now


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace capture when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
