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


def blocked_counts(inner_steps: int, n1: int = 50, n2: int = 250,
                   min_passes: int = 8) -> tuple[int, int]:
    """Pass-aligned step counts for the marginal method on a temporally
    blocked loop.

    The blocked loops run ``(n_steps-1)//S`` S-substep passes, then
    ``(n_steps-1) % S`` SINGLE-step substeps, then the final substep
    (sharded.py / small_step.py).  If the single-step tail differs
    between the two counts, the marginal blends the blocked rate with
    the single-step rate — at deep S the blend is mostly tail: with the
    default (50, 250), every S in {16,24,32,48,64,96} leaves
    ``200 % S = 8`` extra single substeps (~6 ms) inside a ~10 ms
    signal, which is how an early sweep printed a *negative*-pass-cost
    0.0105 ms/substep at S=96.  The returned counts make ``n-1`` a
    multiple of S on both sides, so the tails are zero, the final
    substep cancels, and the difference is whole blocked passes only.
    """
    S = max(1, int(inner_steps))
    if S == 1:
        return n1, n2
    a1 = S * max(1, round((n1 - 1) / S)) + 1
    # >=min_passes whole passes in the difference: at deep S a 2-3 pass
    # signal (~2 ms) sits below the relay's wall-clock noise (measured:
    # the S=64/96 fast rows printed NEGATIVE marginals at 3/2 passes)
    span = S * max(min_passes, round((n2 - n1) / S))
    return a1, a1 + span


def grid_points_per_s(nx: int, ny: int, nz: int, step_seconds: float) -> float:
    return nx * ny * nz / step_seconds


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wrf_tpu_trace"):
    """jax.profiler trace context for kernel-level inspection."""
    with jax.profiler.trace(log_dir):
        yield log_dir
