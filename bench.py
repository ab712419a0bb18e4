"""Benchmark: advance_mu_t small-step throughput on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "grid-points/s", "vs_baseline": N}

Baseline: the reference's published CUDA number — 74x61x32 grid in 0.051 ms on
3x GTX-680 (reference README.md:16-24) = 2.833e9 grid-points/s for the whole
3-GPU desktop.  ``vs_baseline`` is our single-chip grid-points/s over that.

Config (BASELINE.json configs[1]): 512x512x50 grid, fp32, device-resident
small-step scan.  ``vary_winds`` forces the loop-carried dependence the real
acoustic loop has so XLA cannot hoist physics out of the scan.

Timing methodology: this environment tunnels to the TPU through an async
relay where ``block_until_ready`` does NOT synchronize — only a data readback
does, costing a ~30 ms round trip.  So the loop is timed as the *difference*
between two step counts with a scalar-checksum readback forcing execution:
per_step = (T(n2) - T(n1)) / (n2 - n1).  This cancels dispatch latency,
compile-cache effects and the readback, and (like the reference's timed
window, advance_mu_t_no_async.cu:324-363) excludes host transfers.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPS = 144448 / 51e-6  # 74*61*32 points / 0.051 ms


def _timed_loop(mesh, case, nx, ny, nz, steps):
    """Compiled: run `steps` small steps, return a scalar checksum."""
    from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain

    step = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             vary_winds=True)
    arrays = step.prepare(case_to_domain(case))
    scalars = (case.rdx, case.rdy, case.dts, case.epssm)

    def run():
        out = step(arrays, *scalars)
        # scalar readback is the only true synchronization point here
        return float(jnp.sum(out["t"][:, 0, :]) + jnp.sum(out["mu"]))

    return run


def bench_single_chip(nx=512, ny=512, nz=50, n1=50, n2=250, repeats=4):
    from wrf_tpu.io import fixtures
    from wrf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh([jax.devices()[0]], (1, 1))
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)

    results = {}
    for steps in (n1, n2):
        run = _timed_loop(mesh, case, nx, ny, nz, steps)
        checksum = run()  # compile + warm up (also proves non-NaN execution)
        assert np.isfinite(checksum), f"non-finite checksum at steps={steps}"
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        results[steps] = best

    per_step = (results[n2] - results[n1]) / (n2 - n1)
    points = nx * ny * nz
    return points / per_step, per_step


def _wait_healthy(attempts: int = 10, pause: float = 20.0) -> None:
    """The TPU relay worker takes 1-3 min to restart after a fault; gate
    the benchmark on a trivial computation so a restart window does not
    turn into a failed bench record."""
    for i in range(attempts):
        try:
            if float(jnp.ones((8, 128)).sum()) == 1024.0:
                return
        except Exception:
            pass
        time.sleep(pause)
    raise RuntimeError("TPU backend unhealthy after retries")


def main():
    _wait_healthy()
    gps, per_step = bench_single_chip()
    print(
        json.dumps(
            {
                "metric": "advance_mu_t grid-points/s/chip (512x512x50, device-resident loop)",
                "value": round(gps),
                "unit": "grid-points/s",
                "vs_baseline": round(gps / REFERENCE_GPS, 3),
                "ms_per_step": round(per_step * 1e3, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
