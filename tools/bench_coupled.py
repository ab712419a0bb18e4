"""Ad-hoc TPU timing for the coupled acoustic loop (and mu_t-only loop).

Usage: python tools/bench_coupled.py [nx ny nz [tj]]

Same marginal-step methodology as bench.py (readback-synced difference
between two step counts).
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
from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain


def run_loop(cls, mesh, case, nx, ny, nz, steps, tj, **kw):
    if "--bf16" in sys.argv:
        kw = {**kw, "const_dtype": jnp.bfloat16}
    loop = cls(mesh, nx, ny, nz, case.flags, n_steps=steps, tj=tj, **kw)
    arrays = loop.prepare(case_to_domain(case, with_w=True)
                          if kw.get("with_w") else case_to_domain(case))
    scalars = (case.rdx, case.rdy, case.dts, case.epssm)

    def run():
        out = loop(arrays, *scalars)
        return float(jnp.sum(out["t"][:, 0, :]) + jnp.sum(out["mu"]))

    return run


def marginal(cls, mesh, case, nx, ny, nz, n1, n2, tj, repeats=3, **kw):
    times = {}
    for steps in (n1, n2):
        t0 = time.perf_counter()
        run = run_loop(cls, mesh, case, nx, ny, nz, steps, tj, **kw)
        chk = run()
        print(f"  [{cls.__name__} steps={steps}] compile+warmup "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        assert np.isfinite(chk), f"non-finite checksum at steps={steps}"
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
        print(f"  [{cls.__name__} steps={steps}] best {times[steps]:.3f}s",
              flush=True)
    return (times[n2] - times[n1]) / (n2 - n1)


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")
           and sys.argv[sys.argv.index(a) - 1] != "--only"]
    nx = int(pos[0]) if len(pos) > 0 else 512
    ny = int(pos[1]) if len(pos) > 1 else 512
    nz = int(pos[2]) if len(pos) > 2 else 50
    tj = int(pos[3]) if len(pos) > 3 else None
    n1, n2 = (20, 80) if nx >= 1024 else (50, 250)
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    pts = nx * ny * nz

    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else ""
    if only in ("", "coupled"):
        per = marginal(SmallStepLoop, mesh, case, nx, ny, nz, n1, n2, tj)
        print(f"coupled   {nx}x{ny}x{nz} tj={tj}: {per*1e3:.3f} ms/substep, "
              f"{pts/per/1e9:.2f} G pts/s", flush=True)

    if only == "with_w":
        per = marginal(SmallStepLoop, mesh, case, nx, ny, nz, n1, n2, tj,
                       with_w=True)
        print(f"with_w    {nx}x{ny}x{nz} tj={tj}: {per*1e3:.3f} ms/substep, "
              f"{pts/per/1e9:.2f} G pts/s", flush=True)

    if only in ("", "mu_t"):
        per = marginal(ShardedAdvanceMuT, mesh, case, nx, ny, nz, n1, n2, tj,
                       vary_winds=True)
        print(f"mu_t-only {nx}x{ny}x{nz} tj={tj}: {per*1e3:.3f} ms/substep, "
              f"{pts/per/1e9:.2f} G pts/s", flush=True)


if __name__ == "__main__":
    main()
