"""Reduced-precision (bf16) constant-stream mode.

The production loops are HBM-bandwidth-bound, so narrowing the
never-written 3-D bases (t_1, tconst, dvdxi_const, the static-flux
fields, and the read-only winds of the wind_scale path) to bf16 buys
their full share of the step time.  The error contract: bf16 quantizes
the constant BASES, so outputs deviate from the f32 loop proportionally
to the integrated forcing signal (~0.4 % of it), not cumulatively with
step count — state and outputs always stay f32 (quantizing state would
swallow small increments entirely).

Measured on the 40x36x12 case after 6 substeps (2x2 virtual mesh):
t/mu/ww within 0.2-0.6 % of the f32 loop.  The assertions below hold a
3x headroom over that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrf_tpu.io import fixtures
from wrf_tpu.models.small_step import SmallStepLoop
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain


@pytest.fixture(scope="module")
def case():
    return fixtures.make_case(40, 36, 12, halo=2, seed=11)


@pytest.mark.parametrize("cls,kw", [
    pytest.param(SmallStepLoop, {}, marks=pytest.mark.full),
    pytest.param(SmallStepLoop, {"with_w": True},
                 marks=pytest.mark.full),
    (ShardedAdvanceMuT, {"vary_winds": True}),
])
def test_bf16_const_streams_track_f32(case, cls, kw):
    nx, ny, nz = 40, 36, 12
    mesh = make_mesh(jax.devices()[:4], (2, 2))
    sc = (case.rdx, case.rdy, case.dts, case.epssm)
    dom = case_to_domain(case, with_w=kw.get("with_w", False))

    ref = cls(mesh, nx, ny, nz, case.flags, n_steps=6, **kw)
    out_f32 = ref(ref.prepare(dom), *sc)
    lo = cls(mesh, nx, ny, nz, case.flags, n_steps=6,
             const_dtype=jnp.bfloat16, **kw)
    out_bf = lo(lo.prepare(dom), *sc)

    drifted = False
    fields = ("t", "mu", "ww", "muts")
    if kw.get("with_w"):
        fields += ("w", "pp")
    for n in fields:
        a, b = np.asarray(out_f32[n]), np.asarray(out_bf[n])
        assert b.dtype == np.float32          # outputs stay f32
        assert np.isfinite(b).all()
        scale = np.max(np.abs(a))
        err = np.max(np.abs(a - b))
        assert err <= 2e-2 * scale, (n, err, scale)
        drifted |= err > 0
    assert drifted  # the mode is actually active (not silently ignored)


def test_bf16_state_operand_rejected(case):
    """State/aliased operands must not ride bf16 — the wrapper rejects
    them instead of silently quantizing carried state."""
    from wrf_tpu.ops.advance_mu_t_pallas import advance_mu_t_pallas

    b, flags = case.bounds, case.flags
    i0, i1, j0, j1, k0, k1 = b.loop_bounds(flags)
    kw = case.kernel_kwargs()
    arrs = {k: v for k, v in kw.items() if hasattr(v, "ndim")}
    sc = {k: kw[k] for k in ("rdx", "rdy", "dts", "epssm")}
    arrs["t"] = jnp.asarray(arrs["t"], jnp.bfloat16)
    with pytest.raises(ValueError, match="bf16 't'"):
        advance_mu_t_pallas(
            **arrs, **sc, window=(i0, i1, j0, j1), k0=k0, k1=k1,
            kde=b.mem(b.kde, "k"), interpret=True)


def test_const_dtype_requires_pallas(case):
    mesh = make_mesh(jax.devices()[:1], (1, 1))
    with pytest.raises(ValueError, match="pallas"):
        SmallStepLoop(mesh, 40, 36, 12, case.flags, kernel="xla",
                      const_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="pallas"):
        ShardedAdvanceMuT(mesh, 40, 36, 12, case.flags, kernel="xla",
                          const_dtype=jnp.bfloat16)
