"""Chip sweep of the reference's own benchmark grid (74x61x32).

VERDICT r04 task 4: the one shape the reference published a number for
(0.051 ms on 3x GTX-680, /root/reference/README.md:18-21) is this
framework's weakest exact row (r04: 0.0092 ms/substep exact S=8,
regressed ~6% from r03's 0.0087).  Narrow-lane grids are launch/latency
bound, not bandwidth bound, so the levers differ from the 512^2 rows:

* deeper temporal blocking (mu_t-only substeps couple POINTWISE, so the
  exact trapezoid needs no ring widening and S is limited only by VMEM
  live state — amortizes the per-pass launch/dispatch floor 1/S);
* tj = whole-grid tiles (one program instance per pass);
* the marginal step-count span (a 0.009 ms/substep rate needs thousands
  of substeps for signal above the dispatch noise floor).

Usage: python tools/refgrid_sweep.py [--deep]
Prints one line per arm (two-build marginal, best-of-12).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wrf_tpu.io import fixtures  # noqa: E402
from wrf_tpu.parallel.mesh import make_mesh  # noqa: E402
from wrf_tpu.utils.health import wait_healthy_inline  # noqa: E402
from wrf_tpu.utils.timing import blocked_counts  # noqa: E402

NX, NY, NZ = 74, 61, 32
PTS = NX * NY * NZ
REFERENCE_GPS = 144448 / 51e-6


def marginal(mesh, case, inner, tj=None, n1=200, n2=3400, repeats=12,
             fast=False):
    from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain

    n1, n2 = blocked_counts(inner, n1, n2)
    times = {}
    for steps in (n1, n2):
        loop = ShardedAdvanceMuT(mesh, NX, NY, NZ, case.flags,
                                 n_steps=steps, vary_winds=True,
                                 inner_steps=inner, fast=fast, tj=tj)
        arrays = loop.prepare(case_to_domain(case))
        scalars = (case.rdx, case.rdy, case.dts, case.epssm)

        def run():
            out = loop(arrays, *scalars)
            return float(jnp.sum(out["t"][:, 0, :]) + jnp.sum(out["mu"]))

        chk = run()
        assert np.isfinite(chk)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[n2] - times[n1]) / (n2 - n1)


def main():
    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    case = fixtures.make_case(NX, NY, NZ, halo=3, seed=42)

    arms = [
        ("exact S=8 (r04 prod)", dict(inner=8)),
        ("exact S=8 tj=61", dict(inner=8, tj=61)),
        ("exact S=16", dict(inner=16)),
        ("exact S=16 tj=61", dict(inner=16, tj=61)),
        ("exact S=24", dict(inner=24)),
        ("exact S=32", dict(inner=32)),
    ]
    if "--deep" in sys.argv:
        arms += [
            ("exact S=48", dict(inner=48)),
            ("exact S=64", dict(inner=64)),
        ]
    for name, kw in arms:
        try:
            t0 = time.time()
            per = marginal(mesh, case, **kw)
            print(f"ref-grid {name:22s}: {per*1e3:.4f} ms/substep  "
                  f"{PTS/per:.3e} gpts/s  "
                  f"vs_baseline {PTS/per/REFERENCE_GPS:.2f}  "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"ref-grid {name:22s}: FAILED "
                  f"{type(e).__name__}: {e}"[:300], flush=True)


if __name__ == "__main__":
    main()
