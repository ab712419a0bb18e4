"""L1 foundation tests: grid bounds, comparators, binary codec."""

import numpy as np
import pytest

from wrf_tpu.compare import NaNError, compare, compare_window, float_ulps
from wrf_tpu.grid import ConfigFlags, GridBounds
from wrf_tpu.io import codec


class TestGridBounds:
    def test_for_domain(self):
        b = GridBounds.for_domain(74, 61, 32, halo=3)
        assert (b.ids, b.ide, b.jds, b.jde, b.kds, b.kde) == (1, 74, 1, 61, 1, 32)
        assert (b.ims, b.ime) == (-2, 77)
        assert b.idim == 80 and b.jdim == 67 and b.kdim == 32
        assert b.shape3 == (67, 32, 80)

    def test_loop_bounds_specified(self):
        # specified/nested (non-periodic): one extra row shaved at every
        # global edge (reference: module_small_step_em.f90:97-106)
        b = GridBounds.for_domain(10, 8, 4, halo=2)
        i0, i1, j0, j1, k0, k1 = b.loop_bounds(ConfigFlags(specified=True))
        # its=ids=1 -> start at ids+1=2 -> mem offset 2-(-1)=3
        assert (i0, i1) == (b.mem(2, "i"), b.mem(8, "i"))
        assert (j0, j1) == (b.mem(2, "j"), b.mem(6, "j"))
        assert (k0, k1) == (0, 2)

    def test_loop_bounds_periodic_x(self):
        b = GridBounds.for_domain(10, 8, 4, halo=2)
        f = ConfigFlags(periodic_x=True, specified=True)
        i0, i1, j0, j1, _, _ = b.loop_bounds(f)
        # periodic x: no i shrink beyond the staggered edge
        assert (i0, i1) == (b.mem(1, "i"), b.mem(9, "i"))
        assert (j0, j1) == (b.mem(2, "j"), b.mem(6, "j"))

    def test_loop_bounds_open(self):
        b = GridBounds.for_domain(10, 8, 4, halo=2)
        f = ConfigFlags(specified=False)
        i0, i1, j0, j1, _, _ = b.loop_bounds(f)
        assert (i0, i1) == (b.mem(1, "i"), b.mem(9, "i"))
        assert (j0, j1) == (b.mem(1, "j"), b.mem(7, "j"))


class TestULP:
    def test_adjacent_floats(self):
        one = np.float32(1.0)
        nxt = np.nextafter(one, np.float32(2.0), dtype=np.float32)
        assert float_ulps(one, nxt) == 1
        assert float_ulps(one, one) == 0

    def test_sign_straddle(self):
        # distance across zero is the sum of both sides' distances to zero
        tiny = np.float32(1e-45)  # smallest subnormal
        assert float_ulps(tiny, -tiny) == 2
        assert float_ulps(np.float32(0.0), tiny) == 1

    def test_matches_native(self):
        from wrf_tpu.native import _get_lib
        lib = _get_lib()
        rng = np.random.default_rng(3)
        a = rng.standard_normal(100).astype(np.float32)
        b = (a + rng.standard_normal(100).astype(np.float32) * 1e-6).astype(np.float32)
        py = float_ulps(a, b)
        for x, y, expect in zip(a, b, py):
            assert lib.wrf_float_ulps(float(x), float(y)) == expect


class TestCompare:
    def test_identical(self):
        x = np.linspace(-5, 5, 100, dtype=np.float32)
        r = compare(x, x, "x")
        assert r.all_equal and r.max_ulp == 0 and r.rmse == 0.0

    def test_metrics(self):
        g = np.array([1.0, 2.0, 0.0, -4.0], dtype=np.float32)
        a = np.array([1.0, 2.5, 0.0, -4.0], dtype=np.float32)
        r = compare(a, g, "f")
        assert r.equal == 3 and r.different == 1
        assert r.max_abs_err == pytest.approx(0.5)
        assert r.max_rel_err == pytest.approx(0.2)
        assert r.rmse == pytest.approx(0.25)

    def test_zero_handling(self):
        # reference: when either side is zero, rel err = other magnitude
        g = np.array([0.0], dtype=np.float32)
        a = np.array([0.25], dtype=np.float32)
        assert compare(a, g).max_rel_err == pytest.approx(0.25)

    def test_nan_tripwire(self):
        good = np.ones(4, dtype=np.float32)
        bad = good.copy()
        bad[2] = np.nan
        with pytest.raises(NaNError):
            compare(bad, good)
        with pytest.raises(NaNError):
            compare(good, bad)

    def test_windowed(self):
        g = np.zeros((6, 8), dtype=np.float32)
        a = g.copy()
        a[0, :] = 99.0  # corruption outside the window
        r = compare_window(a, g, "f", i_slice=slice(2, 6), j_slice=slice(1, 5))
        assert r.all_equal

    def test_matches_native_compare(self):
        from wrf_tpu.native import compare_native
        rng = np.random.default_rng(5)
        g = rng.standard_normal(1000).astype(np.float32)
        a = (g + rng.standard_normal(1000).astype(np.float32) * 1e-5).astype(np.float32)
        py = compare(a, g)
        nat = compare_native(a, g)
        assert nat.equal == py.equal and nat.different == py.different
        assert nat.max_ulp == py.max_ulp
        assert nat.max_abs_err == pytest.approx(py.max_abs_err, rel=1e-6)
        assert nat.max_rel_err == pytest.approx(py.max_rel_err, rel=1e-6)
        assert nat.rmse == pytest.approx(py.rmse, rel=1e-6)


class TestCodec:
    def test_int_roundtrip(self, tmp_path):
        p = tmp_path / "v.bin"
        codec.write_int(p, -12345)
        assert codec.read_int(p) == -12345
        # big-endian on disk
        assert p.read_bytes() == (-12345).to_bytes(4, "big", signed=True)

    def test_real_roundtrip(self, tmp_path):
        p = tmp_path / "r.bin"
        codec.write_real(p, 1.5)
        assert codec.read_real(p) == 1.5
        assert p.read_bytes() == np.array([1.5], ">f4").tobytes()

    def test_field_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((5, 4, 7)).astype(np.float32)
        p = tmp_path / "f.bin"
        codec.write_field(p, x)
        y = codec.read_field(p, x.shape)
        assert (x == y).all()
        # i-fastest element order on disk
        raw = np.frombuffer(p.read_bytes(), dtype=">f4")
        assert raw[1] == x[0, 0, 1]
        assert raw[7] == x[0, 1, 0]
        assert raw[28] == x[1, 0, 0]

    def test_nan_tripwire(self, tmp_path):
        x = np.ones((2, 2), dtype=np.float32)
        x[1, 1] = np.nan
        p = tmp_path / "n.bin"
        codec.write_field(p, x)
        with pytest.raises(ValueError):
            codec.read_field(p, x.shape)

    def test_native_codec_interop(self, tmp_path):
        """Native driver's codec and the Python codec read the same bytes."""
        from wrf_tpu.io import fixtures
        case = fixtures.make_case(8, 8, 4, halo=1, seed=3)
        d = fixtures.write_case(case, tmp_path / "fx", steps=1)
        case2, steps = fixtures.read_case(d)
        assert steps == 1
        assert case2.bounds == case.bounds
        for name, arr in case.fields.items():
            assert (case2.fields[name] == arr).all(), name


def test_4d_field_utilities(tmp_path):
    """The reference's 4-D field cluster (read_data_4d / swap_data_4d /
    compare_4d, common.cu:10-48, 330-427): round-trip a 4-D species field
    through the codec in both layouts, cross-check the native layout swap
    against the Python one, and run a windowed 4-D comparison."""
    import numpy as np
    from wrf_tpu.compare import compare_window
    from wrf_tpu.io import codec
    from wrf_tpu.native import swap_4d_native

    rng = np.random.default_rng(21)
    sdim, jdim, kdim, idim = 3, 5, 4, 7
    a = rng.standard_normal((sdim, jdim, kdim, idim)).astype(np.float32)

    codec.write_field(tmp_path / "q4.bin", a)
    back = codec.read_field_4d(tmp_path / "q4.bin", (sdim, jdim, kdim, idim))
    np.testing.assert_array_equal(back, a)
    swapped = codec.read_field_4d(tmp_path / "q4.bin",
                                  (sdim, jdim, kdim, idim), layout="jski")
    np.testing.assert_array_equal(swapped, np.swapaxes(a, 0, 1))
    np.testing.assert_array_equal(codec.swap_field_4d(swapped), a)

    # native swap agrees bit-for-bit with the Python one
    np.testing.assert_array_equal(swap_4d_native(swapped), a)

    # windowed 4-D comparison excludes the perturbed halo cells
    b = a.copy()
    b[:, 0, :, :] += 1.0
    b[:, :, :, -1] += 1.0
    r = compare_window(b, a, "q4", i_slice=slice(1, -1),
                       j_slice=slice(1, -1), s_slice=slice(None))
    assert r.all_equal
    r_full = compare_window(b, a, "q4", i_slice=slice(None),
                            j_slice=slice(None))
    assert not r_full.all_equal
