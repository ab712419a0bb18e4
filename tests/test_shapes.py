"""Shape fuzzing: the Pallas kernel across awkward grid geometries.

The j-tiling (tj selection + padding), lane masking and vertical-bound
masking must hold for any domain shape, not just the friendly benchmark
sizes — these sweeps pin the padding/tiling edge cases against the golden
path (interpret mode on CPU)."""

import numpy as np
import pytest

from tests.conftest import outputs_allclose
from wrf_tpu.grid import ConfigFlags
from wrf_tpu.io import fixtures
from wrf_tpu.ops.advance_mu_t_pallas import advance_mu_t_pallas
from wrf_tpu.ops.reference_numpy import advance_mu_t_numpy

ARG_NAMES = (
    "ww", "ww_1", "u", "u_1", "v", "v_1", "mu", "mut", "muu", "muv",
    "t", "t_1", "ft", "mu_tend", "dnw", "fnm", "fnp", "rdnw",
    "msfuy", "msfvx_inv", "msftx", "msfty", "rdx", "rdy", "dts", "epssm",
)


def pallas_vs_golden(case, tj=None):
    kw = case.kernel_kwargs()
    i0, i1, j0, j1, k0, k1 = case.bounds.loop_bounds(case.flags)
    gold = advance_mu_t_numpy(**kw)
    out = advance_mu_t_pallas(
        **{k: kw[k] for k in ARG_NAMES}, t_ave=kw["t_ave"],
        window=(i0, i1, j0, j1), k0=k0, k1=k1,
        kde=case.bounds.mem(case.bounds.kde, "k"),
        tj=tj, interpret=True,
    )
    outputs_allclose(out, gold, rtol=5e-5, atol_scale=2e-6,
                     fields=("ww", "t", "t_ave", "mu", "muave", "muts",
                             "mudf"))


@pytest.mark.parametrize("shape,halo", [
    ((33, 17, 12), 1),   # odd extents, minimal halo
    ((13, 29, 7), 2),    # nx < ny, tiny K
    ((65, 9, 24), 3),    # few j rows vs large halo
    ((129, 11, 9), 2),   # wide i, shallow
])
def test_pallas_odd_shapes(shape, halo):
    nx, ny, nz = shape
    case = fixtures.make_case(nx, ny, nz, halo=halo, seed=nx + ny)
    pallas_vs_golden(case)


@pytest.mark.parametrize("tj", [1, 2, 4, 8])
def test_pallas_tile_sizes(small_case, tj):
    """Every j-tile size (incl. tj=1 where boundary rows ARE the shifts,
    and tj not dividing the row count so the pad path runs)."""
    pallas_vs_golden(small_case, tj=tj)


def test_pallas_odd_shape_periodic():
    case = fixtures.make_case(
        21, 15, 10, halo=2, seed=9,
        flags=ConfigFlags(periodic_x=True, specified=True),
    )
    pallas_vs_golden(case)
