"""On-hardware validation battery for paths the CPU test suite cannot reach.

The pytest suite runs on a virtual CPU mesh where the Pallas interpreter
cannot discharge remote DMAs on multi-axis meshes; this tool executes the
corresponding COMPILED paths on the real chip:

  1. standalone RDMA halo refresh (direct ANY-space path, 128-aligned
     lanes; staged path, unaligned lanes) on 1-axis and 2-axis meshes;
  2. the full coupled loop with halo_backend="rdma" vs "ppermute",
     force_exchange=True so the (1,1) mesh executes the exact in-scan
     exchange code of a multi-chip run (self-ring) — outputs must be
     BIT-equal between backends.

Usage: python tools/chip_checks.py  (prints one OK/FAIL line per check)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from wrf_tpu.io import fixtures
from wrf_tpu.models.small_step import SmallStepLoop
from wrf_tpu.parallel.halo import remote_refresh_axis
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain

FAILURES = 0


def check(name, fn):
    global FAILURES
    try:
        fn()
        print(f"OK   {name}", flush=True)
    except Exception as e:
        FAILURES += 1
        print(f"FAIL {name}: {str(e)[:200]}", flush=True)


def refresh_case(mesh, spec, J, K, I):
    x = jnp.arange(J * K * I, dtype=jnp.float32).reshape(J, K, I)
    y = jax.jit(jax.shard_map(lambda x: remote_refresh_axis(x, "j"),
                              mesh=mesh, in_specs=spec, out_specs=spec,
                              check_vma=False))(x)
    ref = np.asarray(x).copy()
    ref[0] = ref[J - 2]      # self-ring: lo halo <- own last interior row
    ref[J - 1] = ref[1]      # hi halo <- own first interior row
    np.testing.assert_array_equal(np.asarray(y), ref)


def loop_backend_equal(nx, ny, nz, steps=4, with_w=False, smdiv=0.0,
                       backends=("ppermute", "rdma"), inner_steps=1):
    case = fixtures.make_case(nx, ny, nz, halo=2, seed=3)
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    outs = {}
    for backend in backends:
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             halo_backend=backend, force_exchange=True,
                             with_w=with_w, smdiv=smdiv,
                             inner_steps=inner_steps)
        arrays = loop.prepare(case_to_domain(case, with_w=with_w))
        out = loop(arrays, case.rdx, case.rdy, case.dts, case.epssm)
        outs[backend] = {k: np.asarray(v) for k, v in out.items()}
    for k in outs["ppermute"]:
        for b in backends[1:]:
            np.testing.assert_array_equal(outs[b][k], outs["ppermute"][k],
                                          err_msg=f"{b}/{k}")


def fast_blocked_tolerance(nx, ny, nz, steps=9, inner=4, rtol=2e-5):
    """COMPILED fast blocked kernel (affine-hoisted) vs the exact blocked
    scan on the chip — XLA-tier tolerance class (drift grows ~linearly
    in the substep count, so deep-S rows pass a wider rtol)."""
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    outs = {}
    for fast in (False, True):
        loop = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags,
                                 n_steps=steps, inner_steps=inner,
                                 fast=fast, vary_winds=True)
        out = loop(loop.prepare(case_to_domain(case)),
                   case.rdx, case.rdy, case.dts, case.epssm)
        outs[fast] = {k: np.asarray(v) for k, v in out.items()}
    for k in outs[False]:
        a, b = outs[False][k], outs[True][k]
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=1e-6 * scale,
                                   err_msg=k)


def deep_blocked_tolerance(nx, ny, nz, steps=9, inner=4, with_w=False,
                           tj=None, ti=None):
    """COMPILED depth-S trapezoid (coupled_multistep_pallas, extended
    pl.Element windows) vs the single-step fused scan on the chip — the
    <=2 ulp/substep trapezoid tolerance class."""
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    outs = {}
    for inner_ in (1, inner):
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             inner_steps=inner_, with_w=with_w,
                             tj=tj if inner_ > 1 else None,
                             ti=ti if inner_ > 1 else None)
        out = loop(loop.prepare(case_to_domain(case, with_w=with_w)),
                   case.rdx, case.rdy, case.dts, case.epssm)
        outs[inner_] = {k: np.asarray(v) for k, v in out.items()}
    for k in outs[1]:
        a, b = outs[1][k], outs[inner][k]
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def carry_alias_bit_equal(nx=512, ny=64, nz=50, steps=9, inner=4,
                          tj=12):
    # dims match the battery's deep_blocked_tolerance wide-lane check —
    # proven on this stack; an untested shape here cost a worker fault
    # (2026-08-21: 256x64x50 crashed the compile helper)
    import os

    from wrf_tpu.models.small_step import SmallStepLoop

    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    outs = {}
    for alias in ("1", "0"):
        os.environ["WRF_TPU_CARRY_ALIAS"] = alias
        try:
            loop = SmallStepLoop(mesh, nx, ny, nz, case.flags,
                                 n_steps=steps, inner_steps=inner, tj=tj)
            arrays = loop.prepare(case_to_domain(case))
            out = loop(arrays, case.rdx, case.rdy, case.dts, case.epssm)
            outs[alias] = {k: np.asarray(v) for k, v in out.items()}
        finally:
            os.environ.pop("WRF_TPU_CARRY_ALIAS", None)
    for k in outs["1"]:
        np.testing.assert_array_equal(outs["1"][k], outs["0"][k],
                                      err_msg=k)


def main():
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1), ("j",))
    mesh2 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("j", "i"))

    check("rdma refresh, 1-axis mesh, aligned lanes (6,50,512)",
          lambda: refresh_case(mesh1, P("j"), 6, 50, 512))
    check("rdma refresh, 1-axis mesh, staged unaligned lanes (6,50,514)",
          lambda: refresh_case(mesh1, P("j"), 6, 50, 514))
    check("rdma refresh, 2-axis mesh coords, aligned (6,16,128)",
          lambda: refresh_case(mesh2, P("j", None, "i"), 6, 16, 128))
    check("rdma refresh, 2-axis mesh coords, staged (6,16,66)",
          lambda: refresh_case(mesh2, P("j", None, "i"), 6, 16, 66))
    check("coupled loop rdma==ppermute, staged lanes (64x48x16, 4 substeps)",
          lambda: loop_backend_equal(64, 48, 16))
    check("coupled loop rdma==ppermute, aligned lanes (126x48x16)",
          lambda: loop_backend_equal(126, 48, 16))
    check("coupled loop rdma==ppermute, +w +smdiv (64x48x16)",
          lambda: loop_backend_equal(64, 48, 16, with_w=True, smdiv=0.1))
    # the OVERLAPPED in-kernel exchange (advance_mu_t_pallas overlap):
    # compiled self-ring — the fused RDMA + permuted grid must reproduce
    # the exchange-then-compute backends bit-for-bit on hardware
    check("coupled loop rdma_overlap==ppermute, staged lanes (64x48x16)",
          lambda: loop_backend_equal(64, 48, 16,
                                     backends=("ppermute", "rdma_overlap")))
    check("coupled loop rdma_overlap==ppermute, aligned (126x48x16)",
          lambda: loop_backend_equal(126, 48, 16,
                                     backends=("ppermute", "rdma_overlap")))
    check("coupled loop rdma_overlap==ppermute, +w (64x48x16)",
          lambda: loop_backend_equal(64, 48, 16, with_w=True,
                                     backends=("ppermute", "rdma_overlap")))
    # round-4: mudf rides the overlapped exchange (divergence damping)
    check("coupled loop rdma_overlap==ppermute, +smdiv (64x48x16)",
          lambda: loop_backend_equal(64, 48, 16, smdiv=0.1,
                                     backends=("ppermute", "rdma_overlap")))
    # round-4: the BLOCKED trapezoid's width-S exchange fused in-kernel
    check("blocked S=4 rdma_overlap==ppermute self-ring (64x48x16)",
          lambda: loop_backend_equal(64, 48, 16, steps=9, inner_steps=4,
                                     backends=("ppermute",
                                               "rdma_overlap")))
    check("fast blocked mu_t vs exact, compiled (96x80x20, S=4)",
          lambda: fast_blocked_tolerance(96, 80, 20))
    check("deep coupled trapezoid vs single, compiled (96x80x20, S=4)",
          lambda: deep_blocked_tolerance(96, 80, 20))
    check("deep coupled trapezoid +w vs single, compiled (96x80x20, S=4)",
          lambda: deep_blocked_tolerance(96, 80, 20, with_w=True))
    # the round-end bench's promoted configs, exercised end-to-end:
    # the headline's S=32 fast path, and the coupled row's tj=12 tile
    # on wide (vmem-limited, ni+2>=384) lanes
    check("bench headline path: fast mu_t vs exact, compiled (S=32)",
          lambda: fast_blocked_tolerance(96, 80, 20, steps=65, inner=32,
                                         rtol=2e-4))
    check("bench coupled path: trapezoid S=4 tj=12, wide lanes "
          "(512x64x50)",
          lambda: deep_blocked_tolerance(512, 64, 50, inner=4, tj=12))
    # round-4: the 2-D (j, i)-tiled trapezoid (lane windows + 128-ring)
    check("2-D lane-tiled trapezoid S=4 ti=128 vs single (288x48x16)",
          lambda: deep_blocked_tolerance(288, 48, 16, inner=4, ti=128))
    check("2-D lane-tiled trapezoid S=4 ti=256 +w (640x48x20)",
          lambda: deep_blocked_tolerance(640, 48, 20, inner=4, ti=256,
                                         with_w=True))
    # round-5: the aliased in-place carry (carry_alias) must be
    # BIT-equal to the fresh-buffer path ON HARDWARE — this is the
    # check that would catch the backward-row race if a future Mosaic
    # changes its fetch/flush ordering (same adds, only buffering
    # differs; WRF_TPU_CARRY_ALIAS=0 is the fresh path)
    check("aliased carry == fresh buffers, compiled bit-equal "
          "(512x64x50, S=4, tj=12)", carry_alias_bit_equal)
    print("FAILURES:", FAILURES)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
