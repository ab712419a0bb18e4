"""Chip cost decomposition of the depth-S coupled trapezoid (VERDICT
r04 #5): where do the 0.55 ms/substep go when the traffic model says
the kernel runs at ~50% of the copy ceiling?

Arms (each its own process-env build, two-build marginal at
512x512x50, S=4, tj=12 — the bench record config):
  exact            the production kernel
  fast             re-associated log-depth ww cumsum (fast class)
  noscan           WRF_TPU_ABLATE=noscan    (ww scan removed)
  nophaseb         WRF_TPU_ABLATE=nophaseb  (theta stencil removed)
  floor            WRF_TPU_ABLATE=noscan,nophaseb (streams + winds only)

Usage: python tools/coupled_decomp.py [S [tj]]
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {here!r})
sys.path.insert(0, os.path.dirname({here!r}))
import jax
from wrf_tpu.io import fixtures
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.utils.health import wait_healthy_inline
from msteps_tune import marginal

wait_healthy_inline()
mesh = make_mesh([jax.devices()[0]], (1, 1))
nx = ny = 512; nz = 50
case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
per = marginal(mesh, case, nx, ny, nz, {S}, False, tj={tj},
               coupled=True, fast={fast})
print(f"RESULT {{per*1e3:.4f}}", flush=True)
"""


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tj = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    arms = [
        ("exact", "", False),
        ("fast", "", True),
        ("noscan", "noscan", False),
        ("nophaseb", "nophaseb", False),
        ("floor", "noscan,nophaseb", False),
        # streams only: wind/mass trapezoid arithmetic deleted too —
        # the gap between this and the traffic model's stream time is
        # the overlapping-window pipeline inefficiency
        ("streams", "noscan,nophaseb,nowind", False),
    ]
    for name, ablate, fast in arms:
        env = dict(os.environ)
        if ablate:
            env["WRF_TPU_ABLATE"] = ablate
        else:
            env.pop("WRF_TPU_ABLATE", None)
        import time
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-c",
             CHILD.format(here=HERE, S=S, tj=tj, fast=fast)],
            env=env, capture_output=True, text=True, timeout=1200)
        val = [ln for ln in out.stdout.splitlines()
               if ln.startswith("RESULT")]
        if val:
            print(f"coupled S={S} tj={tj} {name:9s}: "
                  f"{val[0].split()[1]} ms/substep "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        else:
            print(f"coupled S={S} tj={tj} {name:9s}: FAILED\n"
                  f"{out.stderr[-800:]}", flush=True)


if __name__ == "__main__":
    main()
