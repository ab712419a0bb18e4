"""L2 numerics tests: numpy golden path vs native C++ oracle vs JAX path.

The testing architecture copies the reference's differential strategy
(SURVEY.md §4): every tier is verified against the same oracle, at one step
and after many steps, across boundary-condition variants."""

import numpy as np
import pytest

from tests.conftest import outputs_allclose
from wrf_tpu.io import fixtures
from wrf_tpu.native import advance_mu_t_native
from wrf_tpu.ops.advance_mu_t_jnp import advance_mu_t_jnp
from wrf_tpu.ops.reference_numpy import advance_mu_t_numpy


def run_steps(fn, case, steps=1, **extra):
    kw = case.kernel_kwargs()
    state = {k: kw[k] for k in ("ww", "mu", "t", "t_ave")}
    out = dict(state)
    for _ in range(steps):
        out = fn(**{**kw, **state}, **extra)
        state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}
    return out


CASES = ["small_case", "periodic_case", "open_bc_case"]


@pytest.mark.parametrize("case_name", CASES)
def test_native_matches_numpy_bitwise(case_name, request):
    """The C++ oracle and the numpy golden path agree bit-for-bit — both
    follow the reference's FP association with FMA contraction disabled."""
    case = request.getfixturevalue(case_name)
    a = run_steps(advance_mu_t_numpy, case, steps=1)
    b = run_steps(advance_mu_t_native, case, steps=1)
    for name in a:
        assert (a[name] == b[name]).all(), f"{name} differs bitwise"


def test_native_matches_numpy_100_steps(small_case):
    a = run_steps(advance_mu_t_numpy, small_case, steps=100)
    b = run_steps(advance_mu_t_native, small_case, steps=100)
    for name in a:
        assert (a[name] == b[name]).all(), f"{name} differs bitwise"


@pytest.mark.parametrize("case_name", CASES)
def test_jnp_matches_oracle(case_name, request):
    """The XLA path reassociates the k reduction/scan; fp32 allclose."""
    case = request.getfixturevalue(case_name)
    gold = run_steps(advance_mu_t_native, case, steps=1)
    got = run_steps(advance_mu_t_jnp, case, steps=1)
    outputs_allclose(got, gold)


def test_jnp_matches_oracle_100_steps(small_case):
    """BASELINE acceptance: allclose to the oracle after 100 small steps."""
    gold = run_steps(advance_mu_t_native, small_case, steps=100)
    got = run_steps(advance_mu_t_jnp, small_case, steps=100)
    outputs_allclose(got, gold, rtol=5e-5, atol_scale=5e-6)


def test_jnp_untouched_outside_window(small_case):
    """Cells outside the BC window keep inputs (ww, mu, t, t_ave) or zero."""
    case = small_case
    kw = case.kernel_kwargs()
    out = advance_mu_t_jnp(**kw)
    i0, i1, j0, j1, k0, k1 = case.bounds.loop_bounds(case.flags)
    ww = np.asarray(out["ww"])
    assert (ww[:j0] == kw["ww"][:j0]).all()
    assert (ww[j1 + 1 :] == kw["ww"][j1 + 1 :]).all()
    assert (ww[:, :, :i0] == kw["ww"][:, :, :i0]).all()
    assert (ww[:, :, i1 + 1 :] == kw["ww"][:, :, i1 + 1 :]).all()
    assert (ww[:, k1 + 1 :, :] == kw["ww"][:, k1 + 1 :, :]).all()
    muave = np.asarray(out["muave"])
    assert (muave[:j0] == 0).all() and (muave[:, :i0] == 0).all()
    t = np.asarray(out["t"])
    assert (t[:j0] == kw["t"][:j0]).all()


def test_reference_size_grid(reference_size_case):
    """The 74×61×32 reference-fixture grid (BASELINE.md configs[0])."""
    gold = run_steps(advance_mu_t_native, reference_size_case, steps=1)
    got = run_steps(advance_mu_t_jnp, reference_size_case, steps=1)
    outputs_allclose(got, gold)


class TestFixtureRoundtrip:
    def test_golden_fixture_verifies(self, tmp_path, small_case):
        """Minted fixture: reload it, rerun the kernel, diff against the
        stored goldens with the reference comparator suite."""
        d = fixtures.write_case(small_case, tmp_path / "fx", steps=3)
        case2, steps = fixtures.read_case(d)
        golden = fixtures.read_golden(d, case2.bounds)
        out = run_steps(advance_mu_t_numpy, case2, steps=steps)
        from wrf_tpu.compare import compare
        for name in ("ww", "t", "t_ave", "mu", "muave", "muts", "mudf"):
            r = compare(out[name], golden[name], name)
            assert r.all_equal, str(r)

    def test_native_driver_cli(self, tmp_path, small_case):
        """The native CLI driver reproduces the goldens exactly."""
        import subprocess
        from pathlib import Path
        d = fixtures.write_case(small_case, tmp_path / "fx", steps=2)
        driver = Path(__file__).resolve().parents[1] / "wrf_tpu/native/wrf_tpu_driver"
        if not driver.exists():
            subprocess.run(["make", "-s"], cwd=driver.parent, check=True)
        proc = subprocess.run(
            [str(driver), str(d)], capture_output=True, text=True, check=True
        )
        assert proc.stdout.count("diff=0") == 8, proc.stdout
