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


# ---------------------------------------------------------------------- #
# Fortran namelist.input text front end
# ---------------------------------------------------------------------- #
WRF_NAMELIST = """
&time_control
 run_days   = 0,           ! comment after a value
 run_hours  = 6,
 auxinput4_inname = "wrflowinp_d<domain>",
/
&domains
 time_step       = 72,
 max_dom         = 2,
 e_we            = 150, 121,
 dx              = 12000.0, 4000.0,
 dy              = 12000.,  4000.,
/
&dynamics
 rk_ord      = 3,
 epssm       = 1.d-1, 0.1,
 smdiv       = 0.1, 2*0.1,
 time_step_sound = 6, 6,
 non_hydrostatic = .true., .true.,
/
&bdy_control
 specified  = .true.
 periodic_x = F,
 nested     = .false., .true.,
/
"""


def test_parse_namelist_text():
    from wrf_tpu.config import parse_namelist_text
    g = parse_namelist_text(WRF_NAMELIST)
    assert g["time_control"]["run_days"] == [0]
    assert g["time_control"]["auxinput4_inname"] == ["wrflowinp_d<domain>"]
    assert g["domains"]["e_we"] == [150, 121]
    assert g["domains"]["dx"] == [12000.0, 4000.0]
    assert g["dynamics"]["epssm"] == [0.1, 0.1]          # d-exponent
    assert g["dynamics"]["smdiv"] == [0.1, 0.1, 0.1]     # 2*0.1 repetition
    assert g["bdy_control"]["specified"] == [True]       # no trailing comma
    assert g["bdy_control"]["periodic_x"] == [False]     # bare F
    assert g["bdy_control"]["nested"] == [False, True]


def test_parse_namelist_single_line_and_comments():
    from wrf_tpu.config import parse_namelist_text
    g = parse_namelist_text("&dynamics epssm=0.2, smdiv='a!b' / ! trailing")
    assert g["dynamics"]["epssm"] == [0.2]
    assert g["dynamics"]["smdiv"] == ["a!b"]  # ! inside quotes kept


def test_read_namelist_record_and_dynamics(tmp_path):
    """A WRF namelist.input file drives the loop config end-to-end."""
    from wrf_tpu.config import dynamics_params, read_namelist
    path = tmp_path / "namelist.input"
    path.write_text(WRF_NAMELIST)
    rec = read_namelist(path)
    assert rec.time_step == 72 and rec.time_step_sound == 6
    assert rec.dx == 12000.0 and rec.epssm == pytest.approx(0.1)
    assert rec.specified is True and rec.periodic_x is False
    assert rec.nested is False        # domain column 0
    p = dynamics_params(rec)
    assert p["dts"] == pytest.approx(12.0)
    assert p["flags"].specified and not p["flags"].nested

    # per-domain column selection (column past list end clamps to last)
    rec2 = read_namelist(path, domain=1)
    assert rec2.dx == 4000.0 and rec2.nested is True
    assert rec2.time_step == 72       # 1-column list clamps


def test_read_namelist_unknown_fields():
    from wrf_tpu.config import read_namelist
    text = "&domains not_a_wrf_field = 1, dx = 100.0 /"
    rec = read_namelist(text)         # lenient by default
    assert rec.dx == 100.0
    with pytest.raises(AttributeError, match="not_a_wrf_field"):
        read_namelist(text, strict=True)


def test_config_converter_cli(tmp_path):
    """The config CLI converts namelist.input text into every format the
    ecosystem uses: JSON overrides, the Fortran stream blob, per-flag
    binary files."""
    from wrf_tpu import config as cfg
    nml = tmp_path / "namelist.input"
    nml.write_text(WRF_NAMELIST)
    out_json = tmp_path / "rec.json"
    out_blob = tmp_path / "rec.bin"
    flags_dir = tmp_path / "flags"
    rc = cfg.main([str(nml), "--json", str(out_json),
                   "--blob", str(out_blob), "--flag-files", str(flags_dir)])
    assert rc == 0

    import json as _json
    ov = _json.loads(out_json.read_text())
    assert ov["time_step"] == 72 and ov["specified"] is True
    assert "periodic_x" not in ov  # default (False) omitted from overrides

    # the blob round-trips through the Fortran-stream codec
    rec = cfg.GridConfigRecord.load(out_blob)
    assert rec.time_step == 72 and rec.dx == 12000.0

    # the flag files load back into the 26-int projection
    proj = cfg.ConfigFlags26.load_flag_files(flags_dir)
    assert proj.specified == 1 and proj.periodic_x == 0

    # JSON output feeds back in (load_any auto-detect) losslessly vs the
    # parsed namelist (the blob rounds reals to f32, so compare origins)
    assert cfg.load_any(out_json) == cfg.read_namelist(str(nml))
    # and the blob round-trips as itself
    assert cfg.load_any(out_blob) == rec
