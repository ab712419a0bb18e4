"""Timing and profiling utilities.

The reference instruments with wall-clock timers around the kernel call only
(gettimeofday, advance_mu_t_driver.c:222-245; system_clock,
advance_mu_t_driver.f90:172-214) and reports elapsed ms.  The TPU equivalents
here add two things the async runtime requires:

  * **readback-synced timing** — on this TPU tunnel, dispatch (and even
    compilation) is fully asynchronous and ``block_until_ready`` does not
    synchronize; only a device->host readback does, costing a ~30 ms round
    trip.  ``timed`` therefore times a callable that ends in a scalar
    readback, and ``per_step_time`` differences two step counts so dispatch
    latency, readback and compile-cache effects cancel;
  * **profiler hooks** — ``trace`` wraps a block in a ``jax.profiler`` trace
    for Perfetto/XProf inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def timed(fn: Callable[[], float], repeats: int = 4) -> float:
    """Best-of-N wall-clock of ``fn`` (which must synchronize internally,
    e.g. by returning a Python float read back from device)."""
    fn()  # warm up / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def per_step_time(make_fn: Callable[[int], Callable[[], float]],
                  n1: int = 50, n2: int = 250, repeats: int = 4) -> float:
    """Marginal per-step time of a device-resident loop:
    ``(T(n2) - T(n1)) / (n2 - n1)``.  ``make_fn(n)`` returns a synchronized
    callable running n steps."""
    t1 = timed(make_fn(n1), repeats)
    t2 = timed(make_fn(n2), repeats)
    return (t2 - t1) / (n2 - n1)


def grid_points_per_s(nx: int, ny: int, nz: int, step_seconds: float) -> float:
    return nx * ny * nz / step_seconds


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wrf_tpu_trace"):
    """jax.profiler trace context for kernel-level inspection."""
    with jax.profiler.trace(log_dir):
        yield log_dir
