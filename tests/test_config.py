"""L1 tests: the namelist config record and its projections."""

import pytest

from wrf_tpu.config import (
    C_PROJECTION_FIELDS, ConfigFlags26, GridConfigRecord, RECORD_FIELDS,
)
from wrf_tpu.grid import ConfigFlags


def test_schema_counts():
    """SURVEY.md §2: 1,368 int + 222 real + 96 logical + 110 character."""
    counts = {}
    for f in RECORD_FIELDS:
        counts[f["type"]] = counts.get(f["type"], 0) + 1
    assert counts == {"int": 1368, "float": 222, "bool": 96, "str": 110}
    assert len(C_PROJECTION_FIELDS) == 26


def test_record_defaults_and_access():
    rec = GridConfigRecord(run_days=5, gmt=12.5, input_from_file=True,
                           rsmas_data_path="/data")
    assert rec.run_days == 5
    assert rec.gmt == 12.5
    assert rec.input_from_file is True
    assert rec.rsmas_data_path == "/data"
    assert rec.run_hours == 0
    with pytest.raises(AttributeError):
        _ = rec.not_a_field
    with pytest.raises(AttributeError):
        rec.not_a_field = 1


def test_kernel_flags_projection():
    rec = GridConfigRecord(specified=True, periodic_x=False, nested=False)
    assert rec.kernel_flags() == ConfigFlags(
        nested=False, periodic_x=False, specified=True
    )
    proj = rec.c_projection()
    assert proj.specified == 1 and proj.periodic_x == 0
    assert proj.kernel_flags() == rec.kernel_flags()


def test_blob_roundtrip():
    rec = GridConfigRecord(
        run_days=3, start_year=2026, gmt=6.25, input_from_file=True,
        input_inname="wrfinput_d<domain>", specified=True,
    )
    blob = rec.to_blob()
    # 1686 numeric fields x 4B + 110 char fields x 256B
    assert len(blob) == (1368 + 222 + 96) * 4 + 110 * 256
    rec2 = GridConfigRecord.from_blob(blob)
    assert rec2 == rec
    assert rec2.input_inname == "wrfinput_d<domain>"


def test_blob_big_endian():
    rec = GridConfigRecord(run_days=1)
    blob = rec.to_blob()
    # field 0 is first_item_in_struct (0), field 1 run_days = 1, big-endian
    assert blob[4:8] == (1).to_bytes(4, "big")


def test_flag_files_roundtrip(tmp_path):
    proj = ConfigFlags26(specified=1, periodic_x=0, nested=0,
                         h_sca_adv_order=5, bl_pbl_physics=2)
    proj.save_flag_files(tmp_path)
    assert (tmp_path / "config_flags_specified.bin").exists()
    back = ConfigFlags26.load_flag_files(tmp_path)
    assert back == proj


def test_flag_files_interop_with_fixtures(tmp_path):
    """The fixture writer's 3 flag files load into the 26-field projection."""
    from wrf_tpu.io import fixtures
    case = fixtures.make_case(8, 8, 4, halo=1, seed=1)
    d = fixtures.write_case(case, tmp_path / "fx")
    proj = ConfigFlags26.load_flag_files(d)
    assert proj.kernel_flags() == case.flags


def test_dynamics_params_drive_the_loop():
    """The namelist dynamics group configures the acoustic loop (the
    reference consumed only 3 BC flags of its 1,796-field record; the
    framework consumes the dyn_em timestep/damping group too)."""
    from wrf_tpu.config import GridConfigRecord, dynamics_params
    rec = GridConfigRecord(
        dx=12000.0, dy=12000.0, time_step=72, time_step_sound=6,
        epssm=0.1, smdiv=0.1, specified=True,
    )
    p = dynamics_params(rec)
    assert p["rdx"] == 1.0 / 12000.0
    assert p["dts"] == 12.0
    assert p["acoustic_steps"] == 6
    assert p["smdiv"] == 0.1 and p["epssm"] == 0.1
    assert p["flags"].specified and not p["flags"].periodic_x

    # and they plug straight into the golden loop
    import numpy as np
    from wrf_tpu.io import fixtures
    from wrf_tpu.models.small_step import small_step_golden
    case = fixtures.make_case(12, 10, 6, halo=2, seed=3, flags=p["flags"])
    out = small_step_golden(case, 2, smdiv=p["smdiv"])
    assert np.isfinite(out["mu"]).all()
