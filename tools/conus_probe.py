"""One-off chip probe: does the depth-S coupled trapezoid pay at CONUS
scale (1500x1500x50), and which S?  Uses the same two-build marginal as
bench.py (pass-aligned counts).

Usage: python tools/conus_probe.py [S ...]   (default: 1 2 4)

MEASURED (2026-08-17 chip probe, two-build marginal, n1=20 n2=80):
  S=1 8.1075 ms/substep | S=2 7.0060 | S=4 4.5769 (24.6 G pts/s, the
  bench row) | S=8 abandoned — local kernel lowering exceeded 25 min
  CPU at 1500-wide lanes, impractical for any driver.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from wrf_tpu.io import fixtures  # noqa: E402
from wrf_tpu.parallel.mesh import make_mesh  # noqa: E402
from wrf_tpu.utils.health import wait_healthy_inline  # noqa: E402

from msteps_tune import marginal  # noqa: E402


def main():
    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    nx = ny = 1500
    nz = 50
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    pts = nx * ny * nz
    depths = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    for s in depths:
        try:
            per = marginal(mesh, case, nx, ny, nz, s, False, coupled=True,
                           n1=20, n2=80)
            print(f"CONUS coupled S={s}: {per*1e3:.4f} ms/substep "
                  f"({pts/per/1e9:.2f} G pts/s)", flush=True)
        except Exception as e:
            print(f"CONUS coupled S={s}: ERROR {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
