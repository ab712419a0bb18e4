"""Chip sweep: 2-D (j, i)-tiled depth-S coupled trapezoid at CONUS
(1500x1500x50) — the VERDICT r04 #1 experiment.  Each row is the
two-build marginal ms/substep (tools/msteps_tune.marginal).

Usage: python tools/conus_2d_sweep.py [S:tj:ti ...]
       (ti 0 = full-row 1-D form; defaults below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from wrf_tpu.io import fixtures  # noqa: E402
from wrf_tpu.parallel.mesh import make_mesh  # noqa: E402
from wrf_tpu.utils.health import wait_healthy_inline  # noqa: E402

from msteps_tune import marginal  # noqa: E402

# feasible VMEM picks (measured budget ~7.2 MB per tj row at 768-lane
# blocks under the 64 MiB scoped limit; the first sweep's tj=8/12 picks
# at ti=512 were over-budget and crashed the compile helper)
DEFAULT = ["4:6:512", "8:4:512", "4:5:768", "8:6:512"]


def main():
    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    nx = ny = 1500
    nz = 50
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    pts = nx * ny * nz
    for spec in (sys.argv[1:] or DEFAULT):
        s_, tj, ti = (int(x) for x in spec.split(":"))
        t0 = time.time()
        try:
            per = marginal(mesh, case, nx, ny, nz, s_, False,
                           tj=tj or None, ti=ti or None, coupled=True,
                           n1=20, n2=80)
            print(f"CONUS coupled S={s_} tj={tj} ti={ti or 'full'}: "
                  f"{per*1e3:.4f} ms/substep ({pts/per/1e9:.2f} G pts/s) "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"CONUS coupled S={s_} tj={tj} ti={ti or 'full'}: "
                  f"ERROR {type(e).__name__}: {str(e)[:300]} "
                  f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
