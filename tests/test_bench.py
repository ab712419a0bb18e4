"""End-to-end validation of bench.py's config matrix plumbing.

The round-end bench runs on real hardware at production sizes; what CAN
break silently between rounds is the plumbing — a spec row naming a
loop/flag combination that no longer constructs, or the headline
extraction drifting off its named config.  Every SPECS row is executed
here through the same _build -> _make_run -> bench_marginal path the
chip run uses, at tiny sizes on the virtual CPU mesh (Pallas interpret
mode), mirroring how the reference validates its CUDA driver wiring on
small grids before timing runs (reference advance_mu_t_driver.c usage).
"""

import json

import jax
import numpy as np
import pytest

import bench
from wrf_tpu.io import fixtures
from wrf_tpu.parallel.mesh import make_mesh


def _tiny_dims(inner):
    # time-blocked rows need enough substeps for two distinct counts
    # that are both multiples of S; spatial dims stay interpreter-tiny
    s = int(str(inner).rstrip("f"))
    return 40, 30, 12, s, 2 * s


@pytest.mark.parametrize(
    "name,coupled,with_w,bf16,inner,tj",
    [(r[0], r[4], r[5], r[6], r[7], r[9]) for r in bench.SPECS],
)
def test_spec_row_executes(name, coupled, with_w, bf16, inner, tj):
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    nx, ny, nz, n1, n2 = _tiny_dims(inner)
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    fast = isinstance(inner, str) and inner.endswith("f")
    per = bench.bench_marginal(
        mesh, case, nx, ny, nz, n1=n1, n2=n2, repeats=1,
        coupled=coupled, with_w=with_w, bf16=bf16,
        inner_steps=int(str(inner).rstrip("f")), fast=fast, tj=tj,
        min_passes=1)
    assert np.isfinite(per)


def test_blocked_counts_pass_aligned():
    # the marginal's two counts must leave ZERO single-step tail at any
    # depth, or the difference blends blocked and single-step rates
    from wrf_tpu.utils.timing import blocked_counts

    for s in (2, 4, 8, 16, 24, 32, 48, 64, 96):
        n1, n2 = blocked_counts(s, 50, 250)
        assert (n1 - 1) % s == 0 and (n2 - 1) % s == 0 and n2 > n1
    assert blocked_counts(1, 50, 250) == (50, 250)


def test_emit_headline_is_the_named_config(capsys):
    records = [
        {"config": "coupled 512x512x50", "gpts_per_s": 99, "ms_per_step": 9,
         "vs_baseline": 9},
        {"config": "mu_t 512x512x50", "gpts_per_s": 123, "ms_per_step": 1.0,
         "vs_baseline": 4.5},
    ]
    bench._emit(records)
    out = json.loads(capsys.readouterr().out)
    assert out["value"] == 123  # the named headline row, not the first
    assert out["vs_baseline"] == 4.5
    assert out["configs"] == records


def test_emit_missing_headline_is_flagged(capsys):
    bench._emit([{"config": "mu_t 512x512x50",
                  "error": "RuntimeError: boom"}])
    out = json.loads(capsys.readouterr().out)
    assert out["value"] == 0
    assert "headline_error" in out
