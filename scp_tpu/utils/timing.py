"""Timing and profiling helpers.

Reference analogue: ad-hoc wall-clock timers (``controllerRuntime``,
``optimizerTime``, ``stepTime`` — main.py:120,142,194; SCP_controller.py:47,71)
dumped to JSON. Here: device-synchronized timers, jax.profiler integration,
and throughput counters.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Timer:
    """Accumulating wall-clock timer with device synchronization."""
    name: str = ""
    total: float = 0.0
    count: int = 0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def timed_blocked(fn, *args, **kw):
    """Run fn, block until device results are ready, return (result, secs)."""
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(n_items: int, seconds: float) -> float:
    return n_items / max(seconds, 1e-12)
