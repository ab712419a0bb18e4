"""One-off chip probes beyond the main tune sweep (pass-aligned marginal).

Usage: python tools/probe_extras.py

Protocol note: rows in `exps` run through msteps_tune.marginal
(best-of-6); the "best-of-12 long-span" figures below were measured by
separate one-off scripts calling bench.bench_marginal directly — this
file records ALL one-off probe outcomes for audit, whichever harness
produced them.

MEASURED (2026-08-18):
  mu_t bf16 S=32 fast long-span (best-of-6): 0.0192 ms/substep;
    f32 control 0.0230 — the fast-blocked configs swing ~+-25% run to
    run, so bf16-vs-f32 overlaps within noise at this depth (no bench
    row).
  CONUS coupled S=4 bf16 (best-of-6): 4.6523 — measured BEFORE the
    best-of-12 re-run put f32 at 4.55, so bf16 shows NO reproducible
    win at depth on CONUS either (no bench row, not in README).
  ref-grid 74x61x32 (best-of-6, 800-substep span): exact S=8 0.0047,
    coupled S=4 0.0071 — favorable draws: wide-span best-of-12
    re-measurement (3,200-substep span) gives S=1 0.0141 / exact S=8
    0.0091 / coupled S=4 0.0076 (launch-bound at this size), the
    README's official head-to-head numbers.
  fast S ladder (bench_marginal, best-of-12 long spans): S=24 0.0312 |
    S=32 0.0253 | S=40 0.0191 — per-PASS cost flat at ~0.76-0.81 ms,
    so per-substep is C/S by construction (closed-form body); the
    bench fixes S=32 as the representative point rather than chasing S.
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

    # (label, nx, ny, nz, S, bf16, coupled, fast, n1, n2)
    exps = [
        # headline-class bf16: fast S=32 over the same long span the
        # f32 headline uses (0.0169 f32) — does halving constant
        # streams still pay when the pass is this lean?
        ("mu_t bf16 S=32 fast long-span", 512, 512, 50, 32, True,
         False, True, 50, 1250),
        ("mu_t f32 S=32 fast long-span (control)", 512, 512, 50, 32,
         False, False, True, 50, 1250),
        # CONUS depth-4 with bf16 constants (S=1 bf16 measured 7.07 vs
        # 8.3 f32; does the narrowing still pay at S=4's 5.00?)
        ("CONUS coupled S=4 bf16", 1500, 1500, 50, 4, True, True,
         False, 20, 80),
        # the reference's own 74x61x32 benchmark grid, blocked:
        # head-to-head vs its published 0.051 ms on 3x GTX-680
        ("ref-grid 74x61x32 exact S=8", 74, 61, 32, 8, False, False,
         False, 200, 1000),
        ("ref-grid 74x61x32 coupled S=4", 74, 61, 32, 4, False, True,
         False, 200, 1000),
    ]
    cases = {}
    for label, nx, ny, nz, s, bf16, coupled, fast, n1, n2 in exps:
        if (nx, ny, nz) not in cases:
            cases[nx, ny, nz] = fixtures.make_case(nx, ny, nz, halo=3,
                                                   seed=42)
        case = cases[nx, ny, nz]
        pts = nx * ny * nz
        try:
            per = marginal(mesh, case, nx, ny, nz, s, bf16,
                           coupled=coupled, fast=fast, n1=n1, n2=n2)
            print(f"{label}: {per*1e3:.4f} ms/substep "
                  f"({pts/per/1e9:.2f} G pts/s)", flush=True)
        except Exception as e:
            print(f"{label}: ERROR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
