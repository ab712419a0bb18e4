"""Temporally-blocked scan kernel (ops/advance_mu_t_msteps.py).

The blocked kernel must be bit-compatible with S sequential single-step
lean/lite substeps (same arithmetic, same association — see the module
docstring), so the loop-level checks here demand exact equality in
interpret mode and the usual fp32 tolerances against the golden path.
"""

import os

import jax
import numpy as np
import pytest

from wrf_tpu.io import fixtures
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import (
    ShardedAdvanceMuT, case_to_domain, embed_outputs,
)

def _run(case, nx, ny, nz, mesh_shape, n_steps, inner_steps, **kw):
    mesh = make_mesh(
        jax.devices()[: mesh_shape[0] * mesh_shape[1]], mesh_shape)
    loop = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags, n_steps=n_steps,
                             vary_winds=True, inner_steps=inner_steps, **kw)
    arrays = loop.prepare(case_to_domain(case))
    return loop(arrays, case.rdx, case.rdy, case.dts, case.epssm)


@pytest.mark.parametrize("inner_steps,n_steps", [
    (2, 7),
    pytest.param(4, 9, marks=pytest.mark.full),
    pytest.param(3, 3, marks=pytest.mark.full),
])
def test_blocked_equals_single_step(inner_steps, n_steps):
    """inner_steps>1 is bit-identical to the single-step scan (both paths
    run the same per-substep arithmetic in the same association).

    Interpret-tier caveat (measured 2026-08-20): when the block count is
    exactly 1, XLA inlines the length-1 ``lax.scan`` and its CPU FMA-
    contraction choices move a few last ulps between the two program
    shapes (phase A included) — so the exact gate here uses configs with
    >= 2 blocks.  The arithmetic itself is association-identical: the
    eager op-by-op comparison shows phase A (mu, ww seed) bit-equal at
    every depth, and the on-chip compiled path is held to the bench's
    bit-equality claim via tools/chip_checks.py."""
    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    ref = _run(case, nx, ny, nz, (1, 1), n_steps, 1)
    blk = _run(case, nx, ny, nz, (1, 1), n_steps, inner_steps)
    assert set(ref) == set(blk)
    for k in sorted(ref):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(blk[k]), err_msg=k)


@pytest.mark.full
def test_blocked_on_mesh_matches_single_step_on_mesh():
    """Under a 2x2 mesh the blocked scan is bit-identical to the
    single-step scan ON THE SAME MESH (cross-mesh-shape comparisons are
    only tolerance-close, as for every tier: XLA's shape-dependent FMA
    contraction in the lean_constants precompute moves the last ulp)."""
    nx, ny, nz = 32, 24, 10
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=11)
    ref = _run(case, nx, ny, nz, (2, 2), 9, 1)
    blk = _run(case, nx, ny, nz, (2, 2), 9, 4)
    for k in sorted(ref):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(blk[k]), err_msg=k)
    one = _run(case, nx, ny, nz, (1, 1), 9, 4)
    for k in sorted(one):
        scale = max(np.max(np.abs(np.asarray(one[k]))), 1.0)
        np.testing.assert_allclose(
            np.asarray(blk[k]), np.asarray(one[k]),
            rtol=2e-5, atol=1e-6 * scale, err_msg=k)


def test_blocked_vs_golden():
    """10 blocked substeps against the FP-order-exact numpy golden loop,
    at the fp32 tolerances every device tier is held to."""
    from wrf_tpu.ops.reference_numpy import advance_mu_t_numpy

    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    n_steps = 10

    kw = case.kernel_kwargs()
    state = {k: np.asarray(kw[k]) for k in ("ww", "mu", "t", "t_ave")}
    for n in range(n_steps):
        ws = np.float32(1.0) + np.float32(1e-7) * np.float32(n)
        out = advance_mu_t_numpy(**{**kw, **state,
                                    "u": np.asarray(kw["u"]) * ws,
                                    "v": np.asarray(kw["v"]) * ws})
        state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}

    got = _run(case, nx, ny, nz, (1, 1), n_steps, 5)
    emb = embed_outputs(case, got)
    for name in ("ww", "mu", "t", "t_ave", "muave", "muts", "mudf"):
        scale = max(np.max(np.abs(out[name])), 1.0)
        np.testing.assert_allclose(
            emb[name], out[name], rtol=2e-5, atol=2e-6 * scale,
            err_msg=name)


def test_blocked_bf16_const():
    """bf16 constant streams compose with blocking.  Unlike the f32 case
    (bit-equal), the bf16 graphs differ from the single-step path by a
    few last-place f32 roundings: the upcast converts shift XLA's fusion/
    FMA-contraction boundaries between the two program shapes (verified:
    phase A — mu, ww_row — stays bit-equal per substep; only theta's
    multiply-accumulate chain moves by <=1 ulp/substep).  Gate at the
    suite's element-wise fp32 acceptance (scaled atol covers near-zero mu
    cells, where a 1e-6-of-scale diff is many ULP) — orders of magnitude
    under the mode's documented ~0.5%% of scale quantization error
    (tests/test_bf16.py)."""
    import jax.numpy as jnp

    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    ref = _run(case, nx, ny, nz, (1, 1), 7, 1, const_dtype=jnp.bfloat16)
    blk = _run(case, nx, ny, nz, (1, 1), 7, 3, const_dtype=jnp.bfloat16)
    assert set(ref) == set(blk)
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def test_inner_steps_validation():
    mesh = make_mesh(jax.devices()[:1], (1, 1))
    case = fixtures.make_case(16, 12, 8, halo=3, seed=1)
    with pytest.raises(ValueError):
        ShardedAdvanceMuT(mesh, 16, 12, 8, case.flags, inner_steps=0)
    with pytest.raises(ValueError):
        ShardedAdvanceMuT(mesh, 16, 12, 8, case.flags, kernel="xla",
                          inner_steps=2)


# ------------------------------------------------------------------ #
# Coupled (fuse_uv) two-step trapezoid blocking
# ------------------------------------------------------------------ #
def _run_coupled(case, nx, ny, nz, n_steps, inner_steps, **kw):
    from wrf_tpu.models.small_step import SmallStepLoop

    mesh = make_mesh(jax.devices()[:1], (1, 1))
    loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=n_steps,
                         inner_steps=inner_steps, **kw)
    arrays = loop.prepare(
        case_to_domain(case, with_w=kw.get("with_w", False)))
    return loop(arrays, case.rdx, case.rdy, case.dts, case.epssm)


# ---- quick-tier shared case + memoized runs ------------------------- #
# Interpret-mode kernel builds are the quick tier's dominant cost (one
# CPU core here); the quick coupled tests therefore share ONE small case
# and memoize runs by configuration, so e.g. the 5-step single-step
# reference is built once and compared against by several tests.  The
# full tier keeps the original wider, longer, per-test cases.
_QNX, _QNY, _QNZ = 28, 20, 12
_QSTEPS = 5
_qcase_box = []
_qcache = {}


def _quick_case():
    if not _qcase_box:
        _qcase_box.append(fixtures.make_case(_QNX, _QNY, _QNZ, halo=3,
                                             seed=7))
    return _qcase_box[0]


def _run_quick(inner_steps, n_steps=_QSTEPS, **kw):
    key = (n_steps, inner_steps, tuple(sorted(kw.items(), key=str)))
    if key not in _qcache:
        _qcache[key] = _run_coupled(_quick_case(), _QNX, _QNY, _QNZ,
                                    n_steps, inner_steps, **kw)
    return _qcache[key]


@pytest.mark.parametrize("n_steps", [
    _QSTEPS,
    pytest.param(8, marks=pytest.mark.full),
    pytest.param(9, marks=pytest.mark.full),
])
def test_coupled_blocked_vs_single(n_steps):
    """Blocked coupled pairs vs the single-step fused scan.  NOT bit-
    equal (unlike the mu_t-only blocking): the trapezoid kernel's
    program shape moves XLA's FMA/fusion boundaries, so each substep
    re-associates by <=2 ulp — gate at the fp32 tier tolerances."""
    if n_steps == _QSTEPS:
        ref, blk = _run_quick(1), _run_quick(2)
    else:
        nx, ny, nz = 40, 30, 12
        case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
        ref = _run_coupled(case, nx, ny, nz, n_steps, 1)
        blk = _run_coupled(case, nx, ny, nz, n_steps, 2)
    assert set(ref) == set(blk)
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.full
def test_coupled_blocked_vs_golden():
    """10 blocked coupled substeps against the FP-order-exact numpy
    golden loop (small_step_golden), at the standard tier tolerances."""
    from wrf_tpu.models.small_step import small_step_golden
    from wrf_tpu.parallel.sharded import embed_outputs

    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    gold = small_step_golden(case, steps=10)
    got = _run_coupled(case, nx, ny, nz, 10, 2)
    emb = embed_outputs(case, got)
    for name in ("ww", "mu", "t", "t_ave", "u", "v", "muave", "muts",
                 "mudf"):
        scale = max(np.max(np.abs(gold[name])), 1.0)
        np.testing.assert_allclose(
            emb[name], gold[name], rtol=2e-5, atol=2e-6 * scale,
            err_msg=name)


@pytest.mark.full
def test_coupled_blocked_bf16_const():
    """bf16 constant streams compose with coupled blocking."""
    import jax.numpy as jnp

    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    ref = _run_coupled(case, nx, ny, nz, 7, 1, const_dtype=jnp.bfloat16)
    blk = _run_coupled(case, nx, ny, nz, 7, 2, const_dtype=jnp.bfloat16)
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def test_coupled_inner_steps_validation():
    from wrf_tpu.models.small_step import SmallStepLoop

    case = fixtures.make_case(16, 12, 8, halo=3, seed=1)
    mesh1 = make_mesh(jax.devices()[:1], (1, 1))
    with pytest.raises(ValueError):
        SmallStepLoop(mesh1, 16, 12, 8, case.flags, inner_steps=0)
    with pytest.raises(ValueError):
        SmallStepLoop(mesh1, 16, 12, 8, case.flags, inner_steps=2,
                      smdiv=0.1)
    with pytest.raises(ValueError):
        # rdma has no width-S block exchange — rejected when the
        # blocked path engages (n_steps-1 >= inner_steps; an
        # inner_steps>1 CONFIG whose loop is too short to block runs
        # the per-substep rdma path and is legal, models/rk3.py)
        SmallStepLoop(mesh1, 16, 12, 8, case.flags, n_steps=5,
                      inner_steps=2, halo_backend="rdma",
                      force_exchange=True)
    # ...and the same config with a too-short loop constructs fine
    SmallStepLoop(mesh1, 16, 12, 8, case.flags, n_steps=2,
                  inner_steps=2, halo_backend="rdma",
                  force_exchange=True)


# ------------------------------------------------------------------ #
# Depth-S coupled trapezoid (coupled_multistep_pallas, S > 2)
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("inner,n_steps", [
    (3, _QSTEPS),
    pytest.param(4, 9, marks=pytest.mark.full),
    pytest.param(4, 13, marks=pytest.mark.full),
])
def test_coupled_deep_blocked_vs_single(inner, n_steps):
    """The generalized depth-S trapezoid vs the single-step fused scan
    (same tolerance class as the S=2 pair kernel: <=2 ulp/substep
    re-association from moved fusion boundaries)."""
    if n_steps == _QSTEPS:
        ref, blk = _run_quick(1), _run_quick(inner)
    else:
        nx, ny, nz = 40, 30, 12
        case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
        ref = _run_coupled(case, nx, ny, nz, n_steps, 1)
        blk = _run_coupled(case, nx, ny, nz, n_steps, inner)
    assert set(ref) == set(blk)
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.full
def test_coupled_general_s2_matches_pair_kernel():
    """At S=2 the generalized kernel (the r05 DEFAULT — its aliased
    carry beats the pair kernel ~1.7x on chip) agrees with the
    hand-unrolled pair kernel (WRF_TPU_COUPLED_GENERAL=0, kept for
    A/B) within the sequential-path tolerance."""
    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    gen = _run_coupled(case, nx, ny, nz, 9, 2)
    os.environ["WRF_TPU_COUPLED_GENERAL"] = "0"
    try:
        pair = _run_coupled(case, nx, ny, nz, 9, 2)
    finally:
        del os.environ["WRF_TPU_COUPLED_GENERAL"]
    for k in sorted(pair):
        a, b = np.asarray(pair[k]), np.asarray(gen[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def test_coupled_deep_blocked_vs_golden():
    """Depth-4-blocked coupled substeps against the FP-order-exact
    numpy golden loop, at the standard tier tolerances."""
    from wrf_tpu.models.small_step import small_step_golden
    from wrf_tpu.parallel.sharded import embed_outputs

    case = _quick_case()
    gold = small_step_golden(case, steps=_QSTEPS)
    got = _run_quick(4)
    emb = embed_outputs(case, got)
    for name in ("ww", "mu", "t", "t_ave", "u", "v", "muave", "muts",
                 "mudf"):
        scale = max(np.max(np.abs(gold[name])), 1.0)
        np.testing.assert_allclose(
            emb[name], gold[name], rtol=2e-5, atol=2e-6 * scale,
            err_msg=name)


@pytest.mark.full
def test_coupled_deep_blocked_with_w_and_modes():
    """Depth-4 blocking composes with fuse_w, fast scan and bf16
    constant streams."""
    import jax.numpy as jnp

    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    ref = _run_coupled(case, nx, ny, nz, 9, 1, with_w=True)
    blk = _run_coupled(case, nx, ny, nz, 9, 4, with_w=True)
    assert "w" in blk and "pp" in blk
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)
    reff = _run_coupled(case, nx, ny, nz, 9, 1,
                        const_dtype=jnp.bfloat16)
    blkf = _run_coupled(case, nx, ny, nz, 9, 4, fast=True,
                        const_dtype=jnp.bfloat16)
    for k in sorted(reff):
        a, b = np.asarray(reff[k]), np.asarray(blkf[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5 * scale,
                                   err_msg=k)


def test_coupled_blocked_with_w():
    """Blocked coupled+w (Thomas solve fused per inner step) vs the
    single-step fused stack, and vs the golden loop."""
    from wrf_tpu.models.small_step import small_step_golden
    from wrf_tpu.parallel.sharded import embed_outputs

    case = _quick_case()
    ref = _run_quick(1, with_w=True)
    blk = _run_quick(2, with_w=True)
    assert set(ref) == set(blk) and "w" in blk and "pp" in blk
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)
    gold = small_step_golden(case, steps=_QSTEPS, with_w=True)
    emb = embed_outputs(case, blk)
    for name in ("t", "mu", "ww", "u", "v", "w", "pp"):
        scale = max(np.max(np.abs(gold[name])), 1.0)
        np.testing.assert_allclose(
            emb[name], gold[name], rtol=2e-5, atol=2e-6 * scale,
            err_msg=name)


def test_blocked_fast_w_solve():
    """The log-depth (scaled-cumsum) Thomas solve under ``fast`` is
    tolerance-equal to the exact sequential sweeps: both Thomas sweeps
    are affine recurrences with level-constant coefficients, hoisted to
    P/M product scalings (ops/advance_mu_t_msteps._thomas_fast_vectors);
    absolute error is a few ulp of the dominant rhs scale per substep.
    Gate: the same fp32-tier tolerance every blocked path is held to.
    (Quick tier: the generalized deep kernel at S=3, the cheapest depth
    that engages it, at a small shape; the original wider S=4 case and
    the hand-unrolled S=2 pair-kernel wiring run in ``full``.)"""
    exact = _run_quick(3, with_w=True)
    fast = _run_quick(3, with_w=True, fast=True)
    assert set(exact) == set(fast) and "w" in fast and "pp" in fast
    # the fast solver must actually have engaged
    assert any(not np.array_equal(np.asarray(exact[k]), np.asarray(fast[k]))
               for k in ("w", "pp"))
    for k in sorted(exact):
        a, b = np.asarray(exact[k]), np.asarray(fast[k])
        assert np.isfinite(b).all(), k
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.full
def test_blocked_fast_w_solve_full():
    """Exhaustive fast-w coverage: the original wider case at S=4, plus
    the hand-unrolled S=2 pair kernel (shares _w_solver but has its own
    operand wiring)."""
    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    for inner in (4, 2):
        exact = _run_coupled(case, nx, ny, nz, 8, inner, with_w=True)
        fast = _run_coupled(case, nx, ny, nz, 8, inner, with_w=True,
                            fast=True)
        assert any(not np.array_equal(np.asarray(exact[k]),
                                      np.asarray(fast[k]))
                   for k in ("w", "pp"))
        for k in sorted(exact):
            a, b = np.asarray(exact[k]), np.asarray(fast[k])
            assert np.isfinite(b).all(), k
            scale = max(float(np.max(np.abs(a))), 1.0)
            np.testing.assert_allclose(b, a, rtol=2e-5,
                                       atol=1e-6 * scale, err_msg=k)


@pytest.mark.full
def test_blocked_fast_mode():
    """fast mode (affine-hoisted: per-pass ww cumsums of the constant and
    wind-proportional parts, per-substep theta increment G0+s*G1+ws*G2)
    is tolerance-equal to the exact blocked scan and to the golden loop —
    the same re-association class the XLA tier documents."""
    nx, ny, nz = 40, 30, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=7)
    exact = _run(case, nx, ny, nz, (1, 1), 9, 4)
    fast = _run(case, nx, ny, nz, (1, 1), 9, 4, fast=True)
    assert set(exact) == set(fast)
    # the fast path must actually have engaged: its re-associations make
    # bit-identity with the exact scan across EVERY field implausible
    assert any(not np.array_equal(np.asarray(exact[k]), np.asarray(fast[k]))
               for k in exact)
    for k in sorted(exact):
        a, b = np.asarray(exact[k]), np.asarray(fast[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.full
def test_blocked_fast_mode_on_mesh():
    """fast mode composes with the 2-D mesh decomposition: same
    tolerance against the exact blocked scan on the same mesh."""
    nx, ny, nz = 32, 24, 12
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=11)
    exact = _run(case, nx, ny, nz, (2, 2), 5, 4)
    fast = _run(case, nx, ny, nz, (2, 2), 5, 4, fast=True)
    for k in sorted(exact):
        a, b = np.asarray(exact[k]), np.asarray(fast[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.parametrize("mesh_shape", [
    pytest.param((4, 1), marks=pytest.mark.full),
    (2, 2),   # both axes sharded: the quick-tier representative
    pytest.param((1, 4), marks=pytest.mark.full),
])
def test_coupled_blocked_on_mesh(mesh_shape):
    """Multi-chip blocked coupled pairs: ring-2 halos (halo.widen_ring_to)
    with a width-2 exchange per pair — same bytes as the per-substep
    width-1 exchange, half the collective launches.  Must match the
    single-step scan on the same mesh at the tier tolerances."""
    from wrf_tpu.models.small_step import SmallStepLoop

    nx, ny, nz = 32, 24, 10
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=11)
    dom = case_to_domain(case)
    outs = {}
    for inner in (1, 2):
        mesh = make_mesh(
            jax.devices()[: mesh_shape[0] * mesh_shape[1]], mesh_shape)
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=5,
                             inner_steps=inner)
        arrays = loop.prepare(dom)
        outs[inner] = loop(arrays, case.rdx, case.rdy, case.dts,
                           case.epssm)
    for k in sorted(outs[1]):
        a, b = np.asarray(outs[1][k]), np.asarray(outs[2][k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.full
@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2), (1, 4)])
def test_coupled_deep_blocked_on_mesh(mesh_shape):
    """Multi-chip depth-4 trapezoid: ring-4 halos (halo.widen_ring_to)
    with ONE width-4 exchange per block — same bytes as the per-substep
    width-1 exchange, a quarter of the collective launches.  Must match
    the single-step scan on the same mesh at the tier tolerances."""
    from wrf_tpu.models.small_step import SmallStepLoop

    nx, ny, nz = 32, 24, 10
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=11)
    dom = case_to_domain(case)
    outs = {}
    for inner in (1, 4):
        mesh = make_mesh(
            jax.devices()[: mesh_shape[0] * mesh_shape[1]], mesh_shape)
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=5,
                             inner_steps=inner)
        arrays = loop.prepare(dom)
        outs[inner] = loop(arrays, case.rdx, case.rdy, case.dts,
                           case.epssm)
    for k in sorted(outs[1]):
        a, b = np.asarray(outs[1][k]), np.asarray(outs[4][k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def test_regscan_tolerance_equal(monkeypatch):
    """WRF_TPU_REGSCAN=1 (register-chain exact ww scan, deep kernel
    only) performs the same adds in the same order as the scratch
    sweeps; a single deep pass is bit-identical (verified at S=4), but
    the different materialization moves XLA's fusion boundaries in the
    surrounding theta arithmetic, so multi-pass runs drift by the
    trapezoid's documented last-ulp-per-substep class (measured 2.3e-7
    rel on t over 5 substeps).  Chip A/B measured the form SLOWER
    (0.556 vs 0.526 ms/substep, 2026-08-20), so scratch stays the
    default; the knob survives as the documented falsified attempt and
    must keep tracing within the suite tolerance."""
    import wrf_tpu.ops.advance_mu_t_msteps as msteps

    base = _run_quick(3)
    monkeypatch.setenv("WRF_TPU_REGSCAN", "1")
    # engagement spy (ADVICE r04): if the env plumbing or regscan_ok
    # wiring regressed, both runs would take the scratch path and the
    # tolerance comparison below would pass vacuously — record the real
    # _reg_scan results and require the register-chain branch was
    # actually selected at least once during tracing
    seen = []
    real = msteps._reg_scan
    monkeypatch.setattr(msteps, "_reg_scan",
                        lambda: seen.append(real()) or seen[-1])
    reg = _run_coupled(_quick_case(), _QNX, _QNY, _QNZ, _QSTEPS, 3)
    assert any(seen), "register-chain scan path never engaged"
    for k in sorted(base):
        a, b = np.asarray(base[k]), np.asarray(reg[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def test_coupled_deep_ablation_arms_trace(monkeypatch):
    """The perf-debug ablation arms (WRF_TPU_ABLATE, read at trace time)
    must keep TRACING as the kernel evolves — tools/coupled_decomp.py's
    chip decomposition depends on them.  One combined build exercises
    all three branches (noscan + nophaseb + nowind = the stream-floor
    arm); outputs are non-physical by design, so only finiteness and
    shape survival are asserted."""
    import wrf_tpu.ops.advance_mu_t_pallas as amp

    monkeypatch.setenv("WRF_TPU_ABLATE", "noscan,nophaseb,nowind")
    monkeypatch.setattr(amp, "_ABLATE_WARNED", False)
    out = _run_coupled(_quick_case(), _QNX, _QNY, _QNZ, 3, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


@pytest.mark.parametrize("ablate", ["scan2x", "theta2x"])
def test_slack_attribution_arms_trace(monkeypatch, ablate):
    """The scan2x/theta2x slack-attribution arms (duplicate a phase
    in-schedule; tools/coupled_decomp.py r05) must trace AND engage —
    scan2x's double-scanned ww feeds theta, so t diverges from the
    exact run (the final ww itself comes from the closing single-step
    kernel, which the arm does not touch); theta2x engages only via
    its guard select, so its check is finiteness + trace survival."""
    import wrf_tpu.ops.advance_mu_t_pallas as amp

    exact = _run_quick(3)
    monkeypatch.setenv("WRF_TPU_ABLATE", ablate)
    monkeypatch.setattr(amp, "_ABLATE_WARNED", False)
    out = _run_coupled(_quick_case(), _QNX, _QNY, _QNZ, _QSTEPS, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    if ablate == "scan2x":
        assert not np.array_equal(np.asarray(out["t"]),
                                  np.asarray(exact["t"])), \
            "scan2x did not engage (t unchanged)"


@pytest.mark.parametrize("ablate", ["nosolve", "nowstep",
                                    "nowstep,noscan,nophaseb,nowind"])
def test_coupled_w_ablation_arms_trace(monkeypatch, ablate):
    """The with_w decomposition arms (VERDICT r04 task 2: nosolve
    deletes the two sequential Thomas sweeps, nowstep the whole
    implicit substep, the combined string is the +w stream floor) must
    keep tracing — tools/coupled_decomp.py --with-w depends on them.
    nosolve/nowstep must also actually ENGAGE: their w output must
    differ from the exact kernel's (outputs are non-physical by
    design; finiteness plus divergence are the assertions)."""
    import wrf_tpu.ops.advance_mu_t_pallas as amp

    exact = _run_quick(3, with_w=True)
    monkeypatch.setenv("WRF_TPU_ABLATE", ablate)
    monkeypatch.setattr(amp, "_ABLATE_WARNED", False)
    out = _run_coupled(_quick_case(), _QNX, _QNY, _QNZ, _QSTEPS, 3,
                       with_w=True)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert not np.array_equal(np.asarray(out["w"]),
                              np.asarray(exact["w"])), \
        f"{ablate} did not engage (w unchanged)"


def test_coupled_blocked_fast_scan():
    """Coupled pairs with the log-depth ww cumsum (fast=True): tolerance-
    equal to the exact blocked path."""
    exact = _run_quick(2)
    fast = _run_quick(2, fast=True)
    for k in sorted(exact):
        a, b = np.asarray(exact[k]), np.asarray(fast[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


@pytest.mark.parametrize("inner,tj", [
    (3, 3),   # tj == S: stash rows sit exactly on earlier write-window
              # boundaries (the carry_alias gate's edge)
    (3, 2),   # tj < S: carry_alias disabled -> fresh-buffer patch path
])
def test_coupled_carry_alias_tile_boundaries(inner, tj):
    """The aliased in-place carry (r05, coupled_multistep_pallas
    carry_alias) at its gating boundaries must stay tolerance-equal to
    the single-step scan: tj == S is the tightest legal stash layout,
    tj < S falls back to the fresh-buffer patch path."""
    nx, ny, nz = 24, 18, 10
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=9)
    ref = _run_coupled(case, nx, ny, nz, 7, 1)
    blk = _run_coupled(case, nx, ny, nz, 7, inner, tj=tj)
    for k in sorted(ref):
        a, b = np.asarray(ref[k]), np.asarray(blk[k])
        scale = max(float(np.max(np.abs(a))), 1.0)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6 * scale,
                                   err_msg=k)


def test_coupled_carry_alias_kill_switch_bit_equal(monkeypatch):
    """WRF_TPU_CARRY_ALIAS=0 (fresh-buffer path) must be BIT-equal to
    the aliased default — same adds in the same order, only the
    buffering differs.  Interpret-mode equality here; the compiled
    hardware equality is tools/chip_checks.py's carry-alias check."""
    aliased = _run_quick(3)
    monkeypatch.setenv("WRF_TPU_CARRY_ALIAS", "0")
    fresh = _run_coupled(_quick_case(), _QNX, _QNY, _QNZ, _QSTEPS, 3)
    for k in sorted(aliased):
        np.testing.assert_array_equal(np.asarray(fresh[k]),
                                      np.asarray(aliased[k]), err_msg=k)
