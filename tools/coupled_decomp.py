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

With ``--with-w`` (VERDICT r04 task 2) the arms decompose the
coupled+w stack instead — the weakest production row:
  exact+w          the production coupled+w kernel
  fast+w           log-depth ww cumsum AND scaled-cumsum Thomas solve
  nosolve          WRF_TPU_ABLATE=nosolve  (the two sequential Thomas
                   sweeps deleted; rhs/masks/pp update kept)
  nowstep          WRF_TPU_ABLATE=nowstep  (whole implicit substep
                   deleted; w/pp still streamed as carried state)
  floor+w          WRF_TPU_ABLATE=nowstep,noscan,nophaseb,nowind
                   (streams only, incl. w/pp)

Usage: python tools/coupled_decomp.py [S [tj]] [--with-w]
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
               coupled=True, with_w={with_w}, fast={fast})
print(f"RESULT {{per*1e3:.4f}}", flush=True)
"""


def main():
    with_w = "--with-w" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    S = int(pos[0]) if pos else 4
    tj = int(pos[1]) if len(pos) > 1 else (8 if with_w else 12)
    if with_w:
        arms = [
            ("exact+w", "", False),
            ("fast+w", "", True),
            ("nosolve", "nosolve", False),
            ("nowstep", "nowstep", False),
            ("floor+w", "nowstep,noscan,nophaseb,nowind", False),
        ]
    else:
        arms = [
            ("exact", "", False),
            ("fast", "", True),
            ("noscan", "noscan", False),
            ("nophaseb", "nophaseb", False),
            ("floor", "noscan,nophaseb", False),
            # streams only: wind/mass trapezoid arithmetic deleted too —
            # the gap between this and the traffic model's stream time
            # is the overlapping-window pipeline inefficiency
            ("streams", "noscan,nophaseb,nowind", False),
            # slack-attribution arms (r05): DUPLICATE a phase instead
            # of removing it — the schedule stays intact, so the delta
            # vs exact is that phase's truly EXPOSED cost (delta ~=
            # the removal delta => no pipeline slack; delta << removal
            # delta => Mosaic left slack the phase could hide in)
            ("scan2x", "scan2x", False),
            ("theta2x", "theta2x", False),
        ]
    for name, ablate, fast in arms:
        env = dict(os.environ)
        if ablate:
            env["WRF_TPU_ABLATE"] = ablate
        else:
            env.pop("WRF_TPU_ABLATE", None)
        import time
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 CHILD.format(here=HERE, S=S, tj=tj, fast=fast,
                              with_w=with_w)],
                env=env, capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            # a worker-recovery stall can eat an arm's whole budget
            # (the health gate alone is up to 20 min) — skip the arm,
            # keep the rest of the decomposition
            print(f"coupled{'+w' if with_w else ''} S={S} tj={tj} "
                  f"{name:9s}: TIMEOUT after 1800s", flush=True)
            continue
        val = [ln for ln in out.stdout.splitlines()
               if ln.startswith("RESULT")]
        if val:
            tag = "coupled+w" if with_w else "coupled"
            print(f"{tag} S={S} tj={tj} {name:9s}: "
                  f"{val[0].split()[1]} ms/substep "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        else:
            print(f"coupled{'+w' if with_w else ''} S={S} tj={tj} {name:9s}: FAILED\n"
                  f"{out.stderr[-800:]}", flush=True)


if __name__ == "__main__":
    main()
