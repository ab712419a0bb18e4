"""Checkpoint/resume tests: stop-and-resume is exact."""

import numpy as np

from wrf_tpu.io import fixtures
from wrf_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from wrf_tpu.models.small_step import small_step_golden


def test_roundtrip(tmp_path, small_case):
    kw = small_case.kernel_kwargs()
    state = {k: np.asarray(kw[k]) for k in ("ww", "mu", "t", "t_ave", "u", "v")}
    d = save_checkpoint(tmp_path / "ck", state, step=7, extra={"dts": 2.0})
    back, step, extra = load_checkpoint(d)
    assert step == 7 and extra == {"dts": 2.0}
    for name, arr in state.items():
        assert (back[name] == arr).all(), name


def test_resume_is_exact(tmp_path, small_case):
    """Run 6 golden substeps straight vs 3 + checkpoint + 3: identical."""
    import dataclasses
    case = small_case
    straight = small_step_golden(case, 6)

    half = small_step_golden(case, 3)
    state = {k: half[k] for k in ("ww", "mu", "t", "t_ave", "u", "v")}
    d = save_checkpoint(tmp_path / "ck", state, step=3)
    restored, step, _ = load_checkpoint(d)
    assert step == 3

    fields = dict(case.fields)
    fields["grid_ww"] = restored["ww"]
    fields["grid_mu_2"] = restored["mu"]
    fields["grid_t_2"] = restored["t"]
    fields["t_2save"] = restored["t_ave"]
    fields["grid_u_2"] = restored["u"]
    fields["grid_v_2"] = restored["v"]
    resumed_case = dataclasses.replace(case, fields=fields)
    resumed = small_step_golden(resumed_case, 3)

    for name in ("ww", "mu", "t", "t_ave", "u", "v"):
        assert (resumed[name] == straight[name]).all(), name


def test_roundtrip_with_w(tmp_path, small_case):
    """Checkpoints carry the vertical-acoustics extension state too."""
    case = small_case
    out = small_step_golden(case, 2, with_w=True)
    state = {k: np.asarray(out[k]) for k in
             ("ww", "mu", "t", "t_ave", "u", "v", "w", "pp")}
    d = save_checkpoint(tmp_path / "ckw", state, step=2)
    back, step, _ = load_checkpoint(d)
    assert step == 2
    for name, arr in state.items():
        assert (back[name] == arr).all(), name
