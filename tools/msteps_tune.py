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


def marginal(mesh, case, nx, ny, nz, inner, bf16, tj=None, coupled=False,
             with_w=False, fast=False, n1=50, n2=250):
    times = {}
    for steps in (n1, n2):
        run = build(mesh, case, nx, ny, nz, steps, inner, bf16, tj=tj,
                    coupled=coupled, with_w=with_w, fast=fast)
        cs = run()
        assert np.isfinite(cs), f"non-finite checksum {cs}"
        best = float("inf")
        for _ in range(4):
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
    exps = [
        # (label, inner, bf16, tj, coupled, ablate, with_w, fast)
        # closed-form fast body (no per-substep work at all): the S
        # ladder extends until the per-pass streams+precompute stop
        # amortizing; bf16 re-probed because the closed form removed the
        # compute that made bf16 tile params a loss under the old body
        ("mu_t f32 S=8 fast", 8, False, None, False, "", False, True),
        ("mu_t f32 S=16 fast", 16, False, None, False, "", False, True),
        ("mu_t f32 S=24 fast", 24, False, None, False, "", False, True),
        ("mu_t f32 S=32 fast", 32, False, None, False, "", False, True),
        ("mu_t f32 S=48 fast", 48, False, None, False, "", False, True),
        ("mu_t f32 S=64 fast", 64, False, None, False, "", False, True),
        ("mu_t f32 S=96 fast", 96, False, None, False, "", False, True),
        ("mu_t bf16 S=16 fast", 16, True, None, False, "", False, True),
        ("mu_t bf16 S=32 fast", 32, True, None, False, "", False, True),
        ("mu_t f32 S=8 exact (control)", 8, False, None, False, "",
         False, False),
        ("coupled f32 S=2 fast", 2, False, None, True, "", False, True),
        ("coupled bf16 S=2 fast", 2, True, None, True, "", False, True),
        ("coupled+w f32 S=2 fast", 2, False, None, True, "", True, True),
        # depth-S trapezoid (coupled_multistep_pallas): streams/S at
        # (tj+2S)/tj overlap re-stream cost -> bigger tj pays at deep S
        ("coupled f32 S=4", 4, False, None, True, "", False, False),
        ("coupled f32 S=4 tj=8", 4, False, 8, True, "", False, False),
        ("coupled f32 S=4 tj=12", 4, False, 12, True, "", False, False),
        ("coupled f32 S=8", 8, False, None, True, "", False, False),
        ("coupled f32 S=8 tj=12", 8, False, 12, True, "", False, False),
        ("coupled f32 S=8 tj=16", 8, False, 16, True, "", False, False),
        ("coupled bf16 S=4", 4, True, None, True, "", False, False),
        ("coupled bf16 S=8", 8, True, None, True, "", False, False),
        ("coupled+w f32 S=4", 4, False, None, True, "", True, False),
        ("coupled general S=2 (A/B)", 2, False, None, True, "", False,
         False, {"WRF_TPU_COUPLED_GENERAL": "1"}),
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
