"""Profiling and throughput counters.

The reference computes a frame time and throws it away
(application.cppm:354-356) and has no tracing at all (SURVEY.md §5.1);
here: jax.profiler trace capture + rays/s counters as first-class utilities.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

from realtimeraytracer_tpu.utils import log


@dataclass
class RayCounter:
    """Accumulates ray counts and wall time -> rays/s."""

    rays: int = 0
    seconds: float = 0.0
    _t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, rays: int) -> float:
        dt = time.perf_counter() - self._t0
        self.rays += rays
        self.seconds += dt
        return dt

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rtrt_trace"):
    """Capture a jax.profiler device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to {}", log_dir)


def time_fn(fn, *args, iters: int = 5, warmup: int = 1, **kwargs) -> float:
    """Median wall time of a device computation (blocks on the result)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
