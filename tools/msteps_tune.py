"""Chip tuning for the temporally-blocked kernels: S, tj, ablations.

Usage: python tools/msteps_tune.py
Prints one line per experiment (two-build marginal, 512x512x50).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from wrf_tpu.io import fixtures  # noqa: E402
from wrf_tpu.parallel.mesh import make_mesh  # noqa: E402
from wrf_tpu.utils.health import wait_healthy_inline  # noqa: E402

from bench_msteps import build  # noqa: E402  (same tools dir)


def marginal(mesh, case, nx, ny, nz, inner, bf16, tj=None, ti=None,
             coupled=False, with_w=False, fast=False, n1=50, n2=250):
    # pass-align so the single-step tails cancel (see blocked_counts)
    from wrf_tpu.utils.timing import blocked_counts

    n1, n2 = blocked_counts(inner, n1, n2)
    times = {}
    for steps in (n1, n2):
        run = build(mesh, case, nx, ny, nz, steps, inner, bf16, tj=tj,
                    ti=ti, coupled=coupled, with_w=with_w, fast=fast)
        cs = run()
        assert np.isfinite(cs), f"non-finite checksum {cs}"
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[n2] - times[n1]) / (n2 - n1)


def main():
    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    nx = ny = 512
    nz = 50
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    pts = nx * ny * nz

    # affine-hoisted fast mode (2026-08-17): per-substep work collapsed
    # to ~3 FMA passes, so the S ladder is re-swept.  Earlier probes
    # (OLD per-substep-scan fast): coupled f32 S=2 fast 0.8362 (no gain
    # over non-fast 0.84), coupled bf16 S=2 fast 0.7054 (ditto), mu_t
    # bf16 S=16 fast 0.4121 (bf16 tile params hurt the compute-bound
    # kernel), mu_t f32 S=24 0.4772 / S=32 0.5046 (deep-unroll
    # regression of the old body).
    # MEASURED (2026-08-17 chip sweep, 512x512x50 two-build marginal):
    #   coupled exact trapezoid: S=2 0.84 | S=4 0.5911 (tj=8 0.5919,
    #     tj=12 0.5602) | S=8 0.5517 (tj=12/16: compile helper crash —
    #     tj+2S rows overflow) | bf16 S=4 0.5733, S=8 0.5691 (bf16
    #     stops paying once overlap/compute dominates)
    #   coupled+w: S=4 1.1790 (vs 1.28 at S=2); S=2 fast 1.1857
    #   CONUS S=4 tj ladder (1500-wide): default pick tj=2 4.93,
    #   tj=4 4.0972 (the bench row), tj>=6 compile-crash
    #   coupled+w S=4 tj ladder: default 1.1650, tj=8 1.1444 (the
    #   bench row), tj>=10 compile-crash
    #   S=4 tj ladder (2026-08-18): tj=12 0.5578; tj>=14 ALL
    #   compile-crash — tj=12 is the S=4 VMEM ceiling, the plateau
    #   stands at ~0.55-0.59
    #   coupled fast S=2 0.8040 / bf16 0.7279; general-path A/B 0.8652
    #   mu_t S=8 exact control 0.3607 (matches README);
    #     fast S=8 0.0894 (clean — 200%8==0)
    #   mu_t fast S in {16..96} from that sweep are INVALID: the (50,
    #   250) counts left "200 % S = 8" single-step substeps in the
    #   difference (blocked_counts docstring) — S=96 printed 0.0105,
    #   i.e. a negative implied pass cost.  marginal() now pass-aligns;
    #   the ladder below re-measures with clean counts.
    # MEASURED (aligned sweep #2, same day): mu_t fast f32 S=16 0.0429
    # | S=24 0.0260 | S=32 0.0243 | S=48 0.0277 | S=64/96 NEGATIVE
    # (2-3 pass signal under relay noise — blocked_counts now forces
    # >=8 passes); bf16 fast S=32 0.0131, S=64 0.0231 (noise);
    # mu_t exact S=16 0.3760 (S=8 stays the exact sweet spot);
    # coupled S=6 0.5699, S=8 0.5840 (vs 0.5517 sweep #1 — +-0.03
    # run-to-run), S=12 0.6527 (overlap rows outgrow the stream
    # saving), S=16 / S=8 tj=10 compile crash; coupled+w S=8 1.2215
    # (S=4's 1.1790 is the +w winner).
    exps = [
        # (label, inner, bf16, tj, coupled, ablate, with_w, fast)
        # deep-fast confirmation at >=8-pass signal, best-of-6
        ("mu_t f32 S=8 fast", 8, False, None, False, "", False, True),
        ("mu_t f32 S=24 fast", 24, False, None, False, "", False, True),
        ("mu_t f32 S=32 fast", 32, False, None, False, "", False, True),
        ("mu_t f32 S=48 fast", 48, False, None, False, "", False, True),
        ("mu_t f32 S=64 fast", 64, False, None, False, "", False, True),
        ("mu_t f32 S=96 fast", 96, False, None, False, "", False, True),
        ("mu_t bf16 S=32 fast", 32, True, None, False, "", False, True),
        ("mu_t bf16 S=64 fast", 64, True, None, False, "", False, True),
        ("coupled f32 S=4 tj=12 (confirm)", 4, False, 12, True, "",
         False, False),
        ("coupled+w f32 S=4 (confirm)", 4, False, None, True, "", True,
         False),
    ]
    for exp in exps:
        label, inner, bf16, tj, coupled, ablate, with_w, fast = exp[:8]
        env = exp[8] if len(exp) > 8 else {}
        os.environ["WRF_TPU_ABLATE"] = ablate
        os.environ.update(env)
        try:
            per = marginal(mesh, case, nx, ny, nz, inner, bf16, tj=tj,
                           coupled=coupled, with_w=with_w, fast=fast)
            print(f"{label}: {per*1e3:.4f} ms/substep "
                  f"({pts/per/1e9:.2f} G pts/s)", flush=True)
        except Exception as e:
            print(f"{label}: ERROR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for k_ in env:
                os.environ.pop(k_, None)
    os.environ["WRF_TPU_ABLATE"] = ""


if __name__ == "__main__":
    main()
