"""Chip probes: remaining 1-D CONUS configs the tj/S sweeps have not
covered — tj=5 (1500 % 5 == 0, skipped by the even-tj sweep), S=6,
and bf16 constant streams at the S=4 record config.

Usage: python tools/conus_extra.py [spec ...]   spec = S:tj[:bf16]
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

DEFAULT = ["4:5", "6:4", "4:4:bf16"]


def main():
    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    nx = ny = 1500
    nz = 50
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    pts = nx * ny * nz
    for spec in (sys.argv[1:] or DEFAULT):
        parts = spec.split(":")
        s_, tj = int(parts[0]), int(parts[1])
        bf16 = len(parts) > 2 and parts[2] == "bf16"
        t0 = time.time()
        try:
            per = marginal(mesh, case, nx, ny, nz, s_, bf16,
                           tj=tj or None, coupled=True, n1=20, n2=80)
            print(f"CONUS coupled S={s_} tj={tj}"
                  f"{' bf16' if bf16 else ''}: {per*1e3:.4f} ms/substep "
                  f"({pts/per/1e9:.2f} G pts/s) [{time.time()-t0:.0f}s]",
                  flush=True)
        except Exception as e:
            print(f"CONUS coupled S={s_} tj={tj}"
                  f"{' bf16' if bf16 else ''}: ERROR "
                  f"{type(e).__name__}: {str(e)[:300]} "
                  f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
