"""Tracing / profiling hooks (SURVEY.md §5.1 rebuild requirement).

The reference has no profiling support; here: jax.profiler trace capture
around the streaming loop plus lightweight interval counters (the per-block
BlockStats live in airmodes/dsp/host.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard format) when logdir is set."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Interval throughput/latency meter for the host streaming loop."""

    def __init__(self):
        self.t0 = time.time()
        self.samples = 0
        self.blocks = 0
        self._last = self.t0
        self._last_samples = 0

    def add(self, samples: int) -> None:
        self.samples += samples
        self.blocks += 1

    def interval(self) -> dict:
        now = time.time()
        dt = max(now - self._last, 1e-9)
        rate = (self.samples - self._last_samples) / dt
        self._last, self._last_samples = now, self.samples
        return {"msps": rate / 1e6,
                "avg_msps": self.samples / max(now - self.t0, 1e-9) / 1e6,
                "blocks": self.blocks}
