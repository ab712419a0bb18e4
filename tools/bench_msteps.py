"""On-chip validation + timing for the temporally-blocked mu_t loop.

Usage: python tools/bench_msteps.py [--quick]

1. correctness: blocked-vs-single bit-equality on the real chip at a
   small grid (the CPU suite proves it in interpret mode; this proves the
   COMPILED kernel);
2. timing: two-build marginal per-substep time at 512x512x50 for
   inner_steps in {1, 2, 4, 8} x {f32, bf16-const}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wrf_tpu.io import fixtures
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain
from wrf_tpu.utils.health import wait_healthy_inline


def build(mesh, case, nx, ny, nz, steps, inner, bf16, tj=None, ti=None,
          coupled=False, with_w=False, fast=False):
    if coupled:
        from wrf_tpu.models.small_step import SmallStepLoop

        loop = SmallStepLoop(
            mesh, nx, ny, nz, case.flags, n_steps=steps,
            inner_steps=inner, tj=tj, ti=ti, with_w=with_w, fast=fast,
            const_dtype=jnp.bfloat16 if bf16 else None)
    else:
        loop = ShardedAdvanceMuT(
            mesh, nx, ny, nz, case.flags, n_steps=steps, vary_winds=True,
            inner_steps=inner, tj=tj, fast=fast,
            const_dtype=jnp.bfloat16 if bf16 else None)
    arrays = loop.prepare(case_to_domain(case, with_w=with_w))
    sc = (case.rdx, case.rdy, case.dts, case.epssm)

    def run():
        out = loop(arrays, *sc)
        return float(jnp.sum(out["t"][:, 0, :]) + jnp.sum(out["mu"]))

    return run


def main():
    quick = "--quick" in sys.argv
    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))

    # -- correctness on chip -------------------------------------------
    nx, ny, nz = 96, 80, 20
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    outs = {}
    for inner in (1, 4):
        loop = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags, n_steps=9,
                                 vary_winds=True, inner_steps=inner)
        arrays = loop.prepare(case_to_domain(case))
        outs[inner] = {k: np.asarray(v) for k, v in
                       loop(arrays, case.rdx, case.rdy, case.dts,
                            case.epssm).items()}
    worst = 0.0
    for k in outs[1]:
        d = float(np.max(np.abs(outs[1][k] - outs[4][k])))
        worst = max(worst, d)
    print(f"chip blocked-vs-single max|diff| = {worst} "
          f"({'BIT-EQUAL' if worst == 0 else 'DIFFERS'})", flush=True)
    assert np.isfinite(worst)

    if quick:
        return

    # -- timing ---------------------------------------------------------
    nx = ny = 512
    nz = 50
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    pts = nx * ny * nz
    n1, n2 = 50, 250
    grid = [(False, False, (1, 2, 4, 8)), (True, False, (1, 2, 4, 8)),
            (False, True, (1, 2)), (True, True, (1, 2))]
    for bf16, coupled, inners in grid:
        for inner in inners:
            times = {}
            try:
                for steps in (n1, n2):
                    run = build(mesh, case, nx, ny, nz, steps, inner, bf16,
                                coupled=coupled)
                    cs = run()
                    assert np.isfinite(cs), f"non-finite checksum {cs}"
                    best = float("inf")
                    for _ in range(4):
                        t0 = time.perf_counter()
                        run()
                        best = min(best, time.perf_counter() - t0)
                    times[steps] = best
                per = (times[n2] - times[n1]) / (n2 - n1)
                print(f"{'coupled' if coupled else 'mu_t'} "
                      f"bf16={int(bf16)} S={inner}: {per*1e3:.4f} ms/substep "
                      f"({pts/per/1e9:.2f} G pts/s)", flush=True)
            except Exception as e:
                print(f"{'coupled' if coupled else 'mu_t'} "
                      f"bf16={int(bf16)} S={inner}: ERROR "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
