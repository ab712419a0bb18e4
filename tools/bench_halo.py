"""Measure the per-substep halo-exchange overhead on the real chip.

SCALING.md's weak-scaling model charges ~35 us/substep for collective
launch+wire; its stated open risk is the launch overhead of collectives
inside ``lax.scan``.  One chip cannot measure wire time over ICI, but it
CAN measure the launch/scheduling cost: a (1,1) mesh with
``force_exchange=True`` executes the identical in-scan exchange code
(self-ring: ppermute lowers to the same collective-permute structure, the
RDMA kernel runs its real barrier + loopback DMAs).

Per config, the marginal-step method (difference between two substep
counts, scalar-readback synced) cancels dispatch and readback:

    python tools/bench_halo.py [nx ny nz]

Prints per-substep ms for: no exchange, ppermute backend, rdma backend —
the exchange overhead is the difference vs the no-exchange row.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wrf_tpu.io import fixtures
from wrf_tpu.models.small_step import SmallStepLoop
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import case_to_domain


def marginal(case, nx, ny, nz, n1, n2, repeats=4, **kw):
    from wrf_tpu.utils.timing import blocked_counts

    # pass-align the two counts for blocked configs so the single-step
    # tails cancel in the difference
    n1, n2 = blocked_counts(kw.get("inner_steps", 1), n1, n2)
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    times = {}
    for steps in (n1, n2):
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             **kw)
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
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    n1, n2 = 100, 400
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)

    configs = [
        ("no exchange", dict(force_exchange=False)),
        ("ppermute exchange", dict(force_exchange=True,
                                   halo_backend="ppermute")),
        ("rdma exchange", dict(force_exchange=True, halo_backend="rdma")),
        # the overlapped in-kernel form: one launch/substep, RDMAs hidden
        # under the interior tiles' compute (advance_mu_t_pallas overlap)
        ("rdma_overlap", dict(force_exchange=True,
                              halo_backend="rdma_overlap")),
        # BLOCKED variants (depth-4 trapezoid): width-S exchange once per
        # block — ppermute block refresh vs the in-kernel overlapped
        # exchange (coupled_multistep_pallas overlap); overheads are vs
        # the no-exchange BLOCKED baseline
        ("S=4 no exchange", dict(force_exchange=False, inner_steps=4)),
        ("S=4 ppermute blocks", dict(force_exchange=True, inner_steps=4,
                                     halo_backend="ppermute")),
        ("S=4 rdma_overlap", dict(force_exchange=True, inner_steps=4,
                                  halo_backend="rdma_overlap")),
    ]
    base = blk_base = None
    for name, kw in configs:
        per = marginal(case, nx, ny, nz, n1, n2, **kw)
        if base is None:
            base = per
        if name == "S=4 no exchange":
            blk_base = per
        b = blk_base if (name.startswith("S=4") and blk_base) else base
        print(f"{name:>20} ({nx}x{ny}x{nz}): {per*1e3:8.4f} ms/substep"
              f"   overhead {max(per-b,0)*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
