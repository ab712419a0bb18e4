"""Adversarial reference-dataset byte-compatibility.

The framework claims its fixture format is byte-compatible with the
reference's golden dataset (big-endian float32, one file per field, laid
out exactly as a Fortran ``(i, k, j)`` array written through stream I/O —
reference: advance_mu_t_driver.f90:330, advance_mu_t_driver.c:302-415).

These tests verify that claim with fixtures written by an INDEPENDENT
serializer: explicit Fortran-convention triple loops over ``struct.pack``
big-endian floats, never touching ``wrf_tpu.io.codec``.  Any drift in
endianness, element order, axis convention, or file naming makes them fail.
"""

from __future__ import annotations

import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from wrf_tpu import driver
from wrf_tpu.grid import GridBounds
from wrf_tpu.io import fixtures


def fortran_write_3d(path: Path, arr_jki: np.ndarray) -> None:
    """Write a (j, k, i) array exactly as Fortran stream I/O writes the
    equivalent ``A(i, k, j)`` column-major array: i fastest, then k, then j,
    each element one big-endian float32.  Independent of io.codec."""
    jdim, kdim, idim = arr_jki.shape
    with open(path, "wb") as f:
        for j in range(jdim):
            for k in range(kdim):
                for i in range(idim):
                    f.write(struct.pack(">f", float(arr_jki[j, k, i])))


def fortran_write_2d(path: Path, arr_ji: np.ndarray) -> None:
    jdim, idim = arr_ji.shape
    with open(path, "wb") as f:
        for j in range(jdim):
            for i in range(idim):
                f.write(struct.pack(">f", float(arr_ji[j, i])))


def fortran_write_1d(path: Path, vec: np.ndarray) -> None:
    with open(path, "wb") as f:
        for v in vec:
            f.write(struct.pack(">f", float(v)))


def fortran_write_int(path: Path, value: int) -> None:
    path.write_bytes(struct.pack(">i", int(value)))


def write_adversarial_fixture(case, outdir: Path, steps: int = 1) -> Path:
    """A complete fixture directory in the reference's naming and format,
    written entirely by the independent serializer; goldens come from the
    FP-order-exact numpy reference (not the C++ oracle the normal minting
    path uses)."""
    outdir.mkdir(parents=True, exist_ok=True)
    b = case.bounds

    for name, value in zip(GridBounds.FIELD_ORDER, b.as_tuple()):
        fortran_write_int(outdir / f"{name}.bin", value)
    for name, value in (("grid_rdx", case.rdx), ("grid_rdy", case.rdy),
                        ("dts_rk", case.dts), ("grid_epssm", case.epssm)):
        (outdir / f"{name}.bin").write_bytes(struct.pack(">f", value))
    fortran_write_int(outdir / "config_flags_nested.bin", case.flags.nested)
    fortran_write_int(outdir / "config_flags_periodic_x.bin",
                      case.flags.periodic_x)
    fortran_write_int(outdir / "config_flags_specified.bin",
                      case.flags.specified)
    fortran_write_int(outdir / "steps.bin", steps)

    for name, arr in case.fields.items():
        arr = np.asarray(arr)
        if arr.ndim == 3:
            fortran_write_3d(outdir / f"{name}.bin", arr)
        elif arr.ndim == 2:
            fortran_write_2d(outdir / f"{name}.bin", arr)
        else:
            fortran_write_1d(outdir / f"{name}.bin", arr)

    # goldens via the numpy reference path (independent of run_golden)
    from wrf_tpu.ops.reference_numpy import advance_mu_t_numpy
    kw = case.kernel_kwargs()
    state = {k: kw[k] for k in ("ww", "mu", "t", "t_ave")}
    for _ in range(steps):
        out = advance_mu_t_numpy(**{**kw, **state})
        state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}
    fortran_write_3d(outdir / "grid_ww_output.bin", out["ww"])
    fortran_write_3d(outdir / "ww1_output.bin",
                     np.asarray(case.fields["ww1"]))
    fortran_write_3d(outdir / "grid_t_2_output.bin", out["t"])
    fortran_write_3d(outdir / "t_2save_output.bin", out["t_ave"])
    fortran_write_2d(outdir / "grid_mu_2_output.bin", out["mu"])
    fortran_write_2d(outdir / "muave_output.bin", out["muave"])
    fortran_write_2d(outdir / "grid_muts_output.bin", out["muts"])
    fortran_write_2d(outdir / "grid_mudf_output.bin", out["mudf"])
    return outdir


def test_codec_element_order_and_endianness(tmp_path):
    """Position-encoded probe: element (i, k, j) of the Fortran array must
    land at ``[j, k, i]`` of the decoded array, bit-for-bit."""
    jdim, kdim, idim = 5, 3, 7
    probe = np.empty((jdim, kdim, idim), np.float32)
    for j in range(jdim):
        for k in range(kdim):
            for i in range(idim):
                probe[j, k, i] = np.float32(j * 10000 + k * 100 + i + 0.5)
    fortran_write_3d(tmp_path / "probe.bin", probe)
    from wrf_tpu.io import codec
    got = codec.read_field(tmp_path / "probe.bin", (jdim, kdim, idim))
    np.testing.assert_array_equal(got, probe)
    # and the write side round-trips against the independent reader
    codec.write_field(tmp_path / "probe2.bin", probe)
    assert (tmp_path / "probe2.bin").read_bytes() == \
        (tmp_path / "probe.bin").read_bytes()


def test_read_case_from_adversarial_fixture(tmp_path, small_case):
    """read_case decodes an independently-serialized fixture bit-for-bit."""
    d = write_adversarial_fixture(small_case, tmp_path / "fx", steps=2)
    case, steps = fixtures.read_case(d)
    assert steps == 2
    assert case.bounds == small_case.bounds
    assert case.flags == small_case.flags
    assert case.rdx == np.float32(small_case.rdx)
    assert case.dts == np.float32(small_case.dts)
    for name, arr in small_case.fields.items():
        np.testing.assert_array_equal(
            case.fields[name], np.asarray(arr, np.float32), err_msg=name)


def test_python_driver_on_adversarial_fixture(tmp_path, small_case, capsys):
    """The CLI driver verifies the numpy tier bit-exactly against goldens
    that were serialized by the independent writer."""
    d = write_adversarial_fixture(small_case, tmp_path / "fx", steps=2)
    rc = driver.main([str(d), "--tier", "numpy"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert out.count("different=0") == len(driver.GOLDEN_FILES), out


def test_native_driver_on_adversarial_fixture(tmp_path, small_case):
    """The native C++ CLI driver consumes the independent fixture and
    reproduces its goldens exactly (the numpy path and the C++ oracle are
    bit-identical by contract)."""
    d = write_adversarial_fixture(small_case, tmp_path / "fx", steps=2)
    binary = Path(__file__).resolve().parents[1] / \
        "wrf_tpu/native/wrf_tpu_driver"
    if not binary.exists():
        subprocess.run(["make", "-s"], cwd=binary.parent, check=True)
    proc = subprocess.run([str(binary), str(d)], capture_output=True,
                          text=True, check=True)
    assert proc.stdout.count("diff=0") == 8, proc.stdout
