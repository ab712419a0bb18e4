"""L2 tests for the fused Pallas kernel (interpreter mode on CPU; the real
TPU path is exercised by bench.py and the verify flow)."""

import numpy as np
import pytest

from tests.conftest import outputs_allclose
from wrf_tpu.io import fixtures
from wrf_tpu.native import advance_mu_t_native
from wrf_tpu.ops.advance_mu_t_pallas import advance_mu_t_pallas


def run_pallas(case, steps=1, tj=None):
    b, flags = case.bounds, case.flags
    i0, i1, j0, j1, k0, k1 = b.loop_bounds(flags)
    kw = case.kernel_kwargs()
    arr = {k: v for k, v in kw.items() if hasattr(v, "ndim")}
    sc = {k: kw[k] for k in ("rdx", "rdy", "dts", "epssm")}
    state = {k: arr[k] for k in ("ww", "mu", "t", "t_ave")}
    out = dict(state)
    for _ in range(steps):
        out = advance_mu_t_pallas(
            **{**arr, **state}, **sc,
            window=(i0, i1, j0, j1), k0=k0, k1=k1, kde=b.mem(b.kde, "k"),
            tj=tj, interpret=True,
        )
        state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}
    return out


def run_native(case, steps=1):
    kw = case.kernel_kwargs()
    state = {k: kw[k] for k in ("ww", "mu", "t", "t_ave")}
    out = dict(state)
    for _ in range(steps):
        out = advance_mu_t_native(**{**kw, **state})
        state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}
    return out


@pytest.mark.parametrize("case_name", ["small_case", "periodic_case", "open_bc_case"])
def test_pallas_matches_oracle(case_name, request):
    case = request.getfixturevalue(case_name)
    outputs_allclose(run_pallas(case), run_native(case))


@pytest.mark.parametrize("tj", [2, 4, 8])
def test_pallas_tile_sizes(small_case, tj):
    """Results are tile-size independent (incl. non-dividing TJ -> padding)."""
    outputs_allclose(run_pallas(small_case, tj=tj), run_native(small_case))


@pytest.mark.full
def test_pallas_multi_step(small_case):
    outputs_allclose(
        run_pallas(small_case, steps=20), run_native(small_case, steps=20),
        rtol=5e-5, atol_scale=2e-6,
    )


def test_pallas_preserves_outside_window(small_case):
    case = small_case
    kw = case.kernel_kwargs()
    out = run_pallas(case)
    i0, i1, j0, j1, k0, k1 = case.bounds.loop_bounds(case.flags)
    ww = np.asarray(out["ww"])
    assert (ww[:j0] == kw["ww"][:j0]).all()
    assert (ww[j1 + 1 :] == kw["ww"][j1 + 1 :]).all()
    assert (ww[:, :, :i0] == kw["ww"][:, :, :i0]).all()
    assert (ww[:, k1 + 1 :, :] == kw["ww"][:, k1 + 1 :, :]).all()
    t = np.asarray(out["t"])
    assert (t[:j0] == kw["t"][:j0]).all()
    muave = np.asarray(out["muave"])
    assert (muave[:j0] == 0).all() and (muave[:, :i0] == 0).all()


def test_pallas_wind_scale(small_case):
    """wind_scale=s must equal pre-scaling u,v by s."""
    case = small_case
    b, flags = case.bounds, case.flags
    i0, i1, j0, j1, k0, k1 = b.loop_bounds(flags)
    kw = case.kernel_kwargs()
    arr = {k: v for k, v in kw.items() if hasattr(v, "ndim")}
    sc = {k: kw[k] for k in ("rdx", "rdy", "dts", "epssm")}
    common = dict(window=(i0, i1, j0, j1), k0=k0, k1=k1,
                  kde=b.mem(b.kde, "k"), interpret=True)
    s = np.float32(1.25)
    a = advance_mu_t_pallas(**arr, **sc, wind_scale=s, **common)
    scaled = {**arr, "u": arr["u"] * s, "v": arr["v"] * s}
    b2 = advance_mu_t_pallas(**scaled, **sc, **common)
    # equal up to FMA-contraction rounding (the in-kernel scale fuses into
    # the flux FMAs; the pre-scaled path materializes the product first)
    outputs_allclose(a, b2)
