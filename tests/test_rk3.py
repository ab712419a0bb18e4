"""RK3 shell tests: mesh-decomposed RK3 step vs the golden-path RK3."""

import jax
import numpy as np

from tests.conftest import outputs_allclose
from wrf_tpu.models.rk3 import RK3Integrator, rk3_golden, rk3_stages
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import case_to_domain, embed_domain, embed_outputs


def test_stage_schedule():
    assert rk3_stages(6) == ((1.0 / 3.0, 1), (0.5, 3), (1.0, 6))
    assert rk3_stages(4) == ((1.0 / 3.0, 1), (0.5, 2), (1.0, 4))


def test_rk3_matches_golden(small_case):
    case = small_case
    mesh = make_mesh(jax.devices(), (4, 2))
    nx, ny, nz = case.bounds.ide, case.bounds.jde, case.bounds.kdim
    rk3 = RK3Integrator(mesh, nx, ny, nz, case.flags, acoustic_steps=4,
                        kernel="xla")
    arrays = rk3.prepare(case_to_domain(case))
    dt = case.dts * 4
    out = rk3.step(arrays, case.rdx, case.rdy, dt, case.epssm)

    gold = rk3_golden(case, acoustic_steps=4, dt=dt)
    kw = case.kernel_kwargs()
    got = {}
    for name in ("ww", "mu", "t", "t_ave", "u", "v"):
        got[name] = embed_domain(np.asarray(out[name]), np.asarray(kw[name]),
                                 case.bounds)
    outputs_allclose(got, {k: gold[k] for k in got},
                     rtol=5e-5, atol_scale=2e-6)


def test_rk3_with_w_matches_golden(small_case):
    """RK3 over the full substep (uv + mu/t + implicit w), pallas kernel."""
    case = small_case
    mesh = make_mesh(jax.devices()[:4], (2, 2))
    nx, ny, nz = case.bounds.ide, case.bounds.jde, case.bounds.kdim
    rk3 = RK3Integrator(mesh, nx, ny, nz, case.flags, acoustic_steps=4,
                        kernel="pallas", with_w=True)
    arrays = rk3.prepare(case_to_domain(case, with_w=True))
    dt = case.dts * 4
    out = rk3.step(arrays, case.rdx, case.rdy, dt, case.epssm)

    gold = rk3_golden(case, acoustic_steps=4, dt=dt, with_w=True)
    names = ("ww", "mu", "t", "t_ave", "u", "v", "w", "pp")
    got = embed_outputs(case, {n: out[n] for n in names})
    outputs_allclose(got, {k: gold[k] for k in got},
                     rtol=5e-5, atol_scale=2e-6)


def test_rk3_tendency_hook(small_case):
    """The hook can rescale the slow tendencies and sees provisional outputs."""
    case = small_case
    mesh = make_mesh(jax.devices()[:1], (1, 1))
    nx, ny, nz = case.bounds.ide, case.bounds.jde, case.bounds.kdim
    rk3 = RK3Integrator(mesh, nx, ny, nz, case.flags, acoustic_steps=2,
                        kernel="xla")
    arrays = rk3.prepare(case_to_domain(case))
    seen = []

    def hook(stage, prev_out, stage_arrays):
        seen.append((stage, prev_out is not None))
        return {"ft": stage_arrays["ft"] * 0.0}

    out = rk3.step(arrays, case.rdx, case.rdy, case.dts * 2, case.epssm,
                   tendency_fn=hook)
    assert seen == [(0, False), (1, True), (2, True)]
    assert np.isfinite(np.asarray(out["t"])).all()
