import os

import numpy as np
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import (SpectralCube, VaryingResolutionSpectralCube,
                               StokesSpectralCube, Quantity)
from spectral_cube_tpu.io.fits_low import (Header, HDU, BinTableHDU,
                                           read_fits, write_fits)

from conftest import base_header, make_cube_file, make_vr_cube_file, \
    make_beams_table


def test_header_card_parsing():
    from spectral_cube_tpu.io.fits_low import _parse_card
    assert _parse_card("SIMPLE  =                    T / conform"[:80]) == \
        ("SIMPLE", True, "conform")
    k, v, c = _parse_card(
        "CRVAL1  =    2.31837500515E+01  / ra".ljust(80))
    assert k == "CRVAL1" and v == pytest.approx(23.18375)
    k, v, c = _parse_card("OBJECT  = 'M33     '           / name".ljust(80))
    assert v == "M33"
    k, v, c = _parse_card("NAXIS   =                    3".ljust(80))
    assert v == 3 and isinstance(v, int)


def test_fits_roundtrip_dtypes(tmp_path):
    for dtype in ("f4", "f8", "i2", "i4"):
        data = (np.random.RandomState(0).rand(3, 4, 5) * 100).astype(dtype)
        path = str(tmp_path / f"t_{dtype}.fits")
        write_fits(path, [HDU(data=data, header=Header())])
        back = read_fits(path)[0].data
        np.testing.assert_allclose(back, data)


def test_bscale_bzero(tmp_path):
    h = Header()
    h["BSCALE"] = 0.5
    h["BZERO"] = 100.0
    raw = np.arange(12, dtype="i2").reshape(3, 4)
    path = str(tmp_path / "scaled.fits")
    # write raw with scaling keywords; reader must apply them
    hdu = HDU(data=raw, header=h)
    write_fits(path, [hdu])
    back = read_fits(path)[0]
    np.testing.assert_allclose(back.data, raw * 0.5 + 100.0)


def test_read_cube_orients_any_permutation(tmp_path):
    """Axis-permutation independence (the reference's adv/advs/dvsa/...
    fixtures, conftest.py:50-58)."""
    rng = np.random.RandomState(5)
    data = rng.rand(4, 3, 2)  # [spec, lat, lon]
    base = base_header()
    # write permuted versions with matching permuted headers
    perms = {
        "adv": ([0, 1, 2], [1, 2, 3]),        # numpy [s,y,x]; fits axes x,y,s
        "vad": ([2, 0, 1], None),
        "dva": ([1, 0, 2], None),
    }
    # construct permuted header manually for each data transpose
    for name, (tr, _) in perms.items():
        pdata = data.transpose(tr)
        h = Header()
        h["BUNIT"] = "K"
        h["RESTFRQ"] = 1.42040571841e9
        # numpy axis i is FITS axis ndim-i; map base fits axes accordingly
        fits_axis_of_np = {0: 3, 1: 2, 2: 1}  # for [s,y,x]
        for new_np_ax, old_np_ax in enumerate(tr):
            old_fits = fits_axis_of_np[old_np_ax]
            new_fits = 3 - new_np_ax
            for key in ("CTYPE", "CRVAL", "CDELT", "CRPIX", "CUNIT"):
                src = f"{key}{old_fits}"
                if src in base:
                    h[f"{key}{new_fits}"] = base[src]
            h[f"NAXIS{new_fits}"] = pdata.shape[new_np_ax]
        h["NAXIS"] = 3
        path = str(tmp_path / f"{name}.fits")
        write_fits(path, [HDU(data=pdata, header=h)])
        cube = SpectralCube.read(path)
        assert cube.shape == (4, 3, 2), name
        np.testing.assert_allclose(
            np.asarray(cube.unmasked_data[:].value), data, err_msg=name)
        assert cube.wcs.ctype[2].startswith("VRAD")
        # derived quantities must be permutation-invariant too (the
        # reference's test_transpose / strategies-consistent invariant)
        m0 = np.asarray(cube.moment0().value)
        aw = np.asarray(cube.argmax_world(axis=0).value)
        if name == "adv":
            m0_ref, aw_ref = m0, aw
        else:
            np.testing.assert_allclose(m0, m0_ref, rtol=1e-7,
                                       err_msg=name)
            np.testing.assert_allclose(aw, aw_ref, rtol=1e-10,
                                       err_msg=name)


def test_cube_write_read_roundtrip(tmp_path, cube_adv):
    cube, data = cube_adv
    path = str(tmp_path / "out.fits")
    cube.write(path)
    c2 = SpectralCube.read(path)
    np.testing.assert_allclose(np.asarray(c2.unmasked_data[:].value), data,
                               equal_nan=True, rtol=1e-7)
    assert c2.wcs.check_equality(cube.wcs, wcs_tolerance=1e-10)
    assert c2.unit == cube.unit
    assert c2.beam == cube.beam


def test_write_no_overwrite(tmp_path, cube_adv):
    cube, _ = cube_adv
    path = str(tmp_path / "x.fits")
    cube.write(path)
    with pytest.raises(OSError):
        cube.write(path)
    cube.write(path, overwrite=True)


def test_vr_cube_read(cube_vr):
    cube, data = cube_vr
    assert isinstance(cube, VaryingResolutionSpectralCube)
    assert len(cube.unmasked_beams) == 4
    assert cube.unmasked_beams[0].major.to_value("deg") * 3600 == \
        pytest.approx(1.0, rel=1e-5)


def test_vr_cube_write_roundtrip(tmp_path, cube_vr):
    cube, data = cube_vr
    path = str(tmp_path / "vr_out.fits")
    cube.write(path)
    c2 = SpectralCube.read(path)
    assert isinstance(c2, VaryingResolutionSpectralCube)
    assert len(c2.unmasked_beams) == 4
    assert c2.unmasked_beams[2].major.to_value("deg") == pytest.approx(
        cube.unmasked_beams[2].major.to_value("deg"), rel=1e-5)


def test_4d_stokes_read(tmp_path):
    rng = np.random.RandomState(9)
    data4 = rng.rand(2, 4, 3, 2)  # [stokes, spec, lat, lon]
    h = base_header()
    h["NAXIS"] = 4
    h["NAXIS4"] = 2
    if "WCSAXES" in h:
        h["WCSAXES"] = 4
    h["CTYPE4"] = "STOKES"
    h["CRVAL4"] = 1.0
    h["CDELT4"] = 1.0
    h["CRPIX4"] = 1.0
    path = str(tmp_path / "stokes.fits")
    write_fits(path, [HDU(data=data4, header=h)])
    sc = StokesSpectralCube.read(path)
    assert set(sc.components) == {"I", "Q"}
    np.testing.assert_allclose(
        np.asarray(sc["I"].unmasked_data[:].value), data4[0])
    np.testing.assert_allclose(
        np.asarray(sc["Q"].unmasked_data[:].value), data4[1])


def test_4d_single_stokes_collapses(tmp_path):
    rng = np.random.RandomState(9)
    data4 = rng.rand(1, 4, 3, 2)
    h = base_header()
    h["NAXIS"] = 4
    h["NAXIS4"] = 1
    h["CTYPE4"] = "STOKES"
    path = str(tmp_path / "stokes1.fits")
    write_fits(path, [HDU(data=data4, header=h)])
    cube = SpectralCube.read(path)
    assert isinstance(cube, SpectralCube)
    assert cube.shape == (4, 3, 2)


def test_lmv_reader_reference_file():
    lmv = "/root/reference/spectral_cube/tests/data/example_cube.lmv"
    if not os.path.exists(lmv):
        pytest.skip("reference LMV example not available")
    cube = SpectralCube.read(lmv)
    assert cube.shape == (7, 4, 3)
    assert cube.unit == u.Jy / u.beam
    assert cube.wcs.ctype[2] == "VELO"
    m0 = cube.moment0()
    assert np.isfinite(np.asarray(m0.value)).all()


def test_lmv_matches_reference_fits_export():
    """The reference ships the same cube as FITS; our LMV decode must agree."""
    lmv = "/root/reference/spectral_cube/tests/data/example_cube.lmv"
    fits = "/root/reference/spectral_cube/tests/data/example_cube.fits"
    if not (os.path.exists(lmv) and os.path.exists(fits)):
        pytest.skip("reference example files not available")
    c1 = SpectralCube.read(lmv)
    c2 = SpectralCube.read(fits)
    np.testing.assert_allclose(np.asarray(c1.unmasked_data[:].value),
                               np.asarray(c2.unmasked_data[:].value),
                               rtol=1e-6, equal_nan=True)


def test_casa_reader_rejects_non_image():
    from spectral_cube_tpu.io.casa_image import load_casa_image
    from spectral_cube_tpu.utils import FITSReadError
    with pytest.raises(FITSReadError):
        load_casa_image("/nonexistent.image")


def test_format_detection(tmp_path, cube_adv):
    from spectral_cube_tpu.io import _detect_format
    cube, _ = cube_adv
    path = str(tmp_path / "det.fits")
    cube.write(path)
    assert _detect_format(path) == "fits"
    assert _detect_format("x.lmv") == "class_lmv"


def test_native_decoder_matches_numpy(tmp_path):
    """The C++ fused decoder must agree bit-for-bit with the numpy path."""
    from spectral_cube_tpu.io import native
    if not native.native_available():
        pytest.skip("no C++ toolchain available")
    rng = np.random.RandomState(0)
    data = rng.randn(64, 64, 64).astype("f4")
    data[0, 0, 0] = np.nan
    path = str(tmp_path / "native.bin")
    with open(path, "wb") as f:
        f.write(data.astype(">f4").tobytes())
    # force the native path regardless of size threshold
    old = native._MIN_NATIVE_ELEMENTS
    native._MIN_NATIVE_ELEMENTS = 0
    try:
        out = native.decode_payload(path, 0, data.size, -32)
    finally:
        native._MIN_NATIVE_ELEMENTS = old
    np.testing.assert_array_equal(out.reshape(data.shape), data)
    st = native.native_stats_f32(data.ravel())
    dd = data[np.isfinite(data)].astype("f8")
    assert st["npts"] == dd.size
    assert st["sum"] == pytest.approx(dd.sum(), rel=1e-9)


def test_mosaic_cubes_user_api(tmp_path):
    from spectral_cube_tpu.cube_utils import mosaic_cubes
    p1, d1 = make_cube_file(tmp_path, "mc1.fits", shape=(2, 10, 10),
                            with_nan=False)
    c1 = SpectralCube.read(p1)
    h2 = base_header(nx=10, ny=10, nchan=2)
    h2["CRVAL1"] = c1.header["CRVAL1"] + 6 * abs(c1.header["CDELT1"])
    from spectral_cube_tpu.io.fits_low import HDU, write_fits
    d2 = np.random.RandomState(2).rand(2, 10, 10)
    p2 = str(tmp_path / "mc2.fits")
    write_fits(p2, [HDU(data=d2, header=h2)])
    c2 = SpectralCube.read(p2)
    mosaic = mosaic_cubes([c1, c2])
    assert mosaic.shape[0] == 2
    assert mosaic.shape[2] > 10  # wider than either input
    vals = np.asarray(mosaic.unmasked_data[:].value)
    assert np.isfinite(vals).sum() > 100


def test_vr_onedspectrum_roundtrip(tmp_path, cube_vr):
    """A VaryingResolutionOneDSpectrum writes its BEAMS bintable and
    reads back as the VR class with the same beams (reference
    tests/test_io.py:119-136)."""
    from spectral_cube_tpu import OneDSpectrum
    from spectral_cube_tpu.lower_dimensional_structures import (
        VaryingResolutionOneDSpectrum)
    cube, _ = cube_vr
    spec = cube[:, 1, 1]
    assert isinstance(spec, VaryingResolutionOneDSpectrum)
    spec.write(str(tmp_path / "vrspec.fits"))
    back = OneDSpectrum.read(str(tmp_path / "vrspec.fits"))
    assert isinstance(back, VaryingResolutionOneDSpectrum)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(spec.value), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.beams.major.value),
                               np.asarray(spec.beams.major.value),
                               rtol=1e-6)


def test_beam_table_units_honored(tmp_path, cube_vr):
    """TUNITn on the BEAMS bintable is honored: AIPS writes degrees
    (reference regression #737, tests/test_io.py:139-149); unitless
    tables default to arcsec/arcsec/deg."""
    import spectral_cube_tpu.io.fits_low as fl
    from spectral_cube_tpu.cube import _beams_from_bintable
    cube, _ = cube_vr
    spec = cube[:, 0, 0]
    spec.write(str(tmp_path / "v.fits"))
    hdus = fl.read_fits(str(tmp_path / "v.fits"))
    bt = [h for h in hdus if isinstance(h, fl.BinTableHDU)][0]
    arcsec_vals = np.asarray(bt["BMAJ"], dtype=float)
    # degree units: values are interpreted 3600x larger
    bt.units = {"BMAJ": "deg", "BMIN": "deg", "BPA": "deg"}
    b_deg = _beams_from_bintable(bt)
    np.testing.assert_allclose(np.asarray(b_deg.major.to("arcsec").value),
                               arcsec_vals * 3600.0, rtol=1e-6)
    # unitless: CASA default arcsec
    bt.units = {}
    b_def = _beams_from_bintable(bt)
    np.testing.assert_allclose(np.asarray(b_def.major.to("arcsec").value),
                               arcsec_vals, rtol=1e-6)


def test_4d_fullstokes_with_beams_table(tmp_path, cube_vr):
    """A 4-D cube with a BEAMS bintable reads as a StokesSpectralCube of
    VaryingResolutionSpectralCubes (reference
    test_io.py:151 test_vrsc_fullstokes_read_fits); a shared NPOL=1
    table applies to every stokes plane."""
    import spectral_cube_tpu.io.fits_low as fl
    from spectral_cube_tpu import SpectralCube, StokesSpectralCube
    from spectral_cube_tpu.cube import VaryingResolutionSpectralCube
    cube, _ = cube_vr
    cube.write(str(tmp_path / "vr_4dsrc.fits"))
    hdus = fl.read_fits(str(tmp_path / "vr_4dsrc.fits"))
    img = hdus[0]
    bt = [h for h in hdus if isinstance(h, fl.BinTableHDU)][0]
    d3 = np.asarray(img.data)
    d4 = np.stack([d3, d3 * 2.0])
    h = fl.Header(img.header)
    h["NAXIS"] = 4
    h["NAXIS4"] = 2
    if "WCSAXES" in h:
        h["WCSAXES"] = 4
    h["CTYPE4"] = "STOKES"
    h["CRVAL4"] = 1.0
    h["CDELT4"] = 1.0
    h["CRPIX4"] = 1.0
    h["CUNIT4"] = ""
    fl.write_fits(str(tmp_path / "full.fits"), [fl.HDU(d4, h), bt])
    out = StokesSpectralCube.read(str(tmp_path / "full.fits"))
    assert isinstance(out, StokesSpectralCube)
    assert sorted(out.components) == ["I", "Q"]
    for comp in out.components:
        c = out[comp]
        assert isinstance(c, VaryingResolutionSpectralCube)
        assert len(c.beams) == cube.shape[0]
        np.testing.assert_allclose(
            np.asarray(c.beams.major.value),
            np.asarray(cube.beams.major.value), rtol=1e-6)


def test_native_stats_matches_numpy():
    """The C++ one-pass stats binding agrees with numpy (NaN-aware)."""
    from spectral_cube_tpu.io import native
    if not native.native_available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(5)
    arr = rng.rand(10000).astype(np.float32)
    arr[::97] = np.nan
    out = native.native_stats_f32(arr)
    valid = arr[np.isfinite(arr)]
    assert int(out["npts"]) == valid.size
    np.testing.assert_allclose(out["min"], valid.min(), rtol=1e-6)
    np.testing.assert_allclose(out["max"], valid.max(), rtol=1e-6)
    np.testing.assert_allclose(out["sum"], valid.sum(dtype=np.float64),
                               rtol=1e-5)
    np.testing.assert_allclose(out["sumsq"],
                               (valid.astype(np.float64) ** 2).sum(),
                               rtol=1e-5)

def _build_type2_lmv(endian, full_sections=False):
    """Minimal valid GDF type-2 file (2x2x2 cube) in either endianness,
    mirroring exactly the field walk of class_lmv._read_type2."""
    import struct

    e = endian
    out = bytearray(1024 + 4 * 8)

    def put(off, fmt, *vals):
        struct.pack_into(e + fmt, out, off, *vals)
        return off + struct.calcsize(e + fmt)

    out[0:12] = b"GILDAS" + (b"<" if e == "<" else b">") + b"IMAGE"
    o = 12
    o = put(o, "i", 0)          # data format code
    o = put(o, "q", 1)          # number of data blocks
    o = put(o, "i", 2)          # header blocks
    o = put(o, "i", 0)          # trailing blocks
    o = put(o, "i", 20)         # version
    o = put(o, "i", 0)          # gdf type
    o = put(o, "i", 0)          # dim section start
    o = put(o, "i", 0)          # padding

    o = 64
    o = put(o, "i", 0)          # dim section words
    o = put(o, "i", 0)          # blanking section start
    o = put(o, "i", 7)          # mdim
    o = put(o, "i", 3)          # ndim
    o = put(o, "7q", 2, 2, 2, 0, 0, 0, 0)
    o = put(o, "i", 0)          # blanking words
    o = put(o, "i", 0)          # extrema section start
    o = put(o, "f", -999.0)     # bval
    o = put(o, "f", 0.0)        # tolerance
    o = put(o, "i", 0)          # extrema words
    o = put(o, "i", 0)          # coordinate section start
    o = put(o, "2f", 0.0, 1.0)  # min/max
    o = put(o, "2q", 0, 7)      # min/max locations
    o = put(o, "i", 0)          # coordinate words
    o = put(o, "i", 0)          # description section start
    conv = [1.0, 0.1, 0.001,    # RA: ref, val [rad], inc [rad]
            1.0, -0.5, 0.001,   # DEC
            1.0, -10.0, 1.0]    # VELOCITY [km/s]
    o = put(o, "21d", *(conv + [0.0] * 12))
    o = put(o, "i", 0)          # description words
    o = put(o, "i", 0)          # null section start
    for s in ["K", "RA", "DEC", "VELOCITY", "", "", "", ""]:
        out[o:o + 12] = s.ljust(12).encode("ascii")
        o += 12

    o = 512
    o = put(o, "i", 0)          # position words
    o = put(o, "i", 0)          # projection section start
    out[o:o + 12] = b"TESTOBJ     "
    out[o + 12:o + 24] = b"EQUATORIAL  "
    o += 24
    o = put(o, "2d", 0.1, -0.5)   # ra, dec [rad]
    o = put(o, "2d", 0.0, 0.0)    # lii, bii
    o = put(o, "f", 2000.0)       # equinox
    if not full_sections:
        o = put(o, "i", 0)        # projection words (none)
        o = put(o, "i", 0)        # spectroscopy section start
        o = put(o, "i", 0)        # spectroscopy words (none)
        o = put(o, "i", 0)        # next section start
        o = put(o, "i", 0)        # resolution words (none)
        o = put(o, "i", 0)
    else:
        # projection section: 9 words (a0, d0, pang f64; ptyp, xaxi,
        # yaxi i32)
        o = put(o, "i", 9)
        o = put(o, "i", 0)        # spectroscopy section start
        o = put(o, "3d", 0.1, -0.5, 0.25)   # a0, d0, pang [rad]
        o = put(o, "3i", 4, 1, 2)           # ptyp=gnomonic, xaxi, yaxi
        # spectroscopy section: 14 words in image_def.f90 order
        o = put(o, "i", 14)
        o = put(o, "i", 0)        # next section start
        o = put(o, "d", -0.0625)            # fres [MHz]
        o = put(o, "d", 89.0)               # image frequency [MHz]
        o = put(o, "d", 115271.2018)        # rest frequency [MHz]
        o = put(o, "f", 0.162)              # vres [km/s]
        o = put(o, "f", 5.5)                # voff [km/s]
        o = put(o, "f", 1.0001)             # doppler factor
        o = put(o, "i", 3)                  # frequency axis
        out[o:o + 12] = b"CO(1-0)     "     # line name (3 words)
        o += 12
        o = put(o, "i", 1)                  # velocity type (LSR)
        # resolution section: 3 words (bmaj, bmin, bpa [rad])
        o = put(o, "i", 3)
        o = put(o, "i", 0)
        o = put(o, "3f", 2e-5, 1e-5, 0.5)
        o = put(o, "i", 0)        # next (noise) section: none
        o = put(o, "i", 0)

    vals = [float(i) for i in range(8)]
    vals[3] = -999.0              # one blanked voxel
    put(1024, "8f", *vals)
    return bytes(out)


def test_lmv_big_endian_type2_reads_identically(tmp_path):
    """EEEI (big-endian) type-2 GDF files decode correctly (regression:
    the old reader warned 'byte-swapped on read' but decoded every field
    little-endian, so version read as 335544320 and parsing failed)."""
    import spectral_cube_tpu.io.class_lmv as lmv_mod

    ple = tmp_path / "little.lmv"
    pbe = tmp_path / "big.lmv"
    ple.write_bytes(_build_type2_lmv("<"))
    pbe.write_bytes(_build_type2_lmv(">"))
    data_le, hdr_le = lmv_mod.read_lmv(str(ple))
    data_be, hdr_be = lmv_mod.read_lmv(str(pbe))
    assert hdr_le["NAXIS"] == 3 and hdr_le["OBJECT"] == "TESTOBJ"
    assert np.isnan(data_le).sum() == 1
    np.testing.assert_array_equal(data_be, data_le)
    assert hdr_be == hdr_le


def test_fits_long_string_continue_roundtrip(tmp_path):
    """Header string values longer than one card round-trip via the
    OGIP 1.0 CONTINUE convention (regression: they were truncated past
    the closing quote, corrupting the card)."""
    from spectral_cube_tpu.io.fits_low import (
        Header, parse_header, format_header)

    long_val = ("/data/surveys/alma/band6/" + "x" * 80 +
                "/final_cube_v2.image.fits")
    quoted = "it's a cube with 'quoted' segments " * 4
    h = Header()
    h["SIMPLE"] = True
    h["BITPIX"] = -32
    h["NAXIS"] = 0
    h["ORIGIN"] = long_val
    h["OBJECT"] = quoted
    h["SHORT"] = "plain"
    back = parse_header(format_header(h))
    assert back["ORIGIN"] == long_val
    assert back["OBJECT"] == quoted.rstrip()
    assert back["SHORT"] == "plain"


def test_bscale_roundtrip_no_double_scaling(tmp_path):
    """Re-writing a cube read from a scaled file must not re-apply
    BSCALE/BZERO on the next read (regression: 100 came back as 150)."""
    h = Header()
    h["BSCALE"] = 0.5
    h["BZERO"] = 100.0
    raw = np.zeros((3, 4), dtype="i2")
    p1 = str(tmp_path / "s1.fits")
    write_fits(p1, [HDU(data=raw, header=h)])
    first = read_fits(p1)[0]
    np.testing.assert_allclose(first.data, 100.0)
    p2 = str(tmp_path / "s2.fits")
    write_fits(p2, [HDU(data=first.data, header=first.header)])
    again = read_fits(p2)[0]
    np.testing.assert_allclose(again.data, 100.0)


def test_scaled_bitpix32_promotes_to_float64(tmp_path):
    """The unsigned-int convention (BITPIX=32, BZERO=2**31) must decode
    in float64: float32 quantizes to +-128 counts near 2**31."""
    h = Header()
    h["BZERO"] = float(2 ** 31)
    raw = np.array([[-2147483648 + 5, -2147483648 + 131]], dtype="i4")
    p = str(tmp_path / "u32.fits")
    write_fits(p, [HDU(data=raw, header=h)])
    back = read_fits(p)[0]
    assert back.data.dtype == np.float64
    np.testing.assert_allclose(back.data, [[5.0, 131.0]])


def test_bintable_array_column_roundtrip(tmp_path):
    """Fixed-length array columns (TFORM '2E') write back out — the
    module docstring's promise (regression: broadcast error)."""
    from spectral_cube_tpu.io.fits_low import BinTableHDU
    cols = {"VEC": np.arange(10, dtype=np.float32).reshape(5, 2),
            "SCAL": np.arange(5, dtype=np.float64)}
    bt = BinTableHDU(columns=cols, name="TEST")
    p = str(tmp_path / "bt.fits")
    write_fits(p, [HDU(data=None, header=Header()), bt])
    back = read_fits(p)
    tbl = [x for x in back if isinstance(x, BinTableHDU)][0]
    np.testing.assert_allclose(np.asarray(tbl.columns["VEC"]),
                               cols["VEC"])
    np.testing.assert_allclose(np.asarray(tbl.columns["SCAL"]),
                               cols["SCAL"])


def test_find_image_hdu_skips_dataless_primary(tmp_path):
    """An empty primary followed by a table raises FITSReadError, not
    AttributeError on NoneType."""
    from spectral_cube_tpu.io.fits_low import BinTableHDU
    from spectral_cube_tpu.io.fits import _find_image_hdu
    from spectral_cube_tpu.utils import FITSReadError
    bt = BinTableHDU(columns={"X": np.arange(3, dtype=np.float32)},
                     name="T")
    p = str(tmp_path / "empty.fits")
    write_fits(p, [HDU(data=None, header=Header()), bt])
    with pytest.raises(FITSReadError):
        _find_image_hdu(read_fits(p))


def test_truncated_fits_payload_no_crash(tmp_path):
    """A payload shorter than the header promises must fail over to the
    numpy path (which raises cleanly) — the native mmap previously read
    past EOF, which is a SIGBUS process kill."""
    from spectral_cube_tpu.io import native as natmod
    h = Header()
    h["BSCALE"] = 2.0  # force the scaled/native decode path
    data = np.arange(2 ** 21, dtype="i2").reshape(1, -1)
    p = str(tmp_path / "trunc.fits")
    write_fits(p, [HDU(data=data, header=h)])
    size = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(size - 4096)
    # direct native call: must return gracefully (numpy fallback raises
    # ValueError or returns short), never SIGBUS
    try:
        out = natmod.decode_payload(p, 2880, 2 ** 21, 16, bscale=2.0)
        assert len(out) <= 2 ** 21
    except ValueError:
        pass


def test_native_stats_all_nan_and_inf(tmp_path):
    """npts counts FINITE values only (inf excluded), and an all-NaN
    array reports NaN extrema instead of the +-1e300 fold sentinels."""
    from spectral_cube_tpu.io.native import native_stats_f32
    arr = np.array([1.0, np.inf, -np.inf, np.nan, 3.0], dtype=np.float32)
    st = native_stats_f32(np.ascontiguousarray(arr))
    if st is None:
        pytest.skip("native library unavailable")
    assert st["npts"] == 2
    assert st["min"] == 1.0 and st["max"] == 3.0
    assert st["sum"] == 4.0
    st2 = native_stats_f32(np.full(8, np.nan, dtype=np.float32))
    assert st2["npts"] == 0 and np.isnan(st2["min"]) and np.isnan(st2["max"])


# ---------------------------------------------------------------------------
# reference test_io.py scenario battery (names mirror the reference's)
# ---------------------------------------------------------------------------

def _ref_io_imports():
    from ref_fixtures import (data_adv, data_advs, data_vda_beams,
                              data_sdav_beams, prepare_4_beams_table,
                              jybeam_header)
    return (data_adv, data_advs, data_vda_beams, data_sdav_beams,
            prepare_4_beams_table, jybeam_header)


REF_DATA = "/root/reference/spectral_cube/tests/data"


@pytest.mark.skipif(not os.path.exists(f"{REF_DATA}/example_cube.lmv"),
                    reason="reference fixtures absent")
def test_lmv_fits():
    """reference tests/test_io.py:16-26: the FITS and LMV versions of the
    same cube agree in shape."""
    c1 = SpectralCube.read(f"{REF_DATA}/example_cube.fits")
    c2 = SpectralCube.read(f"{REF_DATA}/example_cube.lmv")
    assert c1.shape == c2.shape


def test_3d_4d_stokes(tmp_path):
    """reference tests/test_io.py:29-40: 3-D data under a 4-D header reads
    like the plain 3-D file."""
    (data_adv, data_advs, *_ ) = _ref_io_imports()
    from spectral_cube_tpu.io.fits_low import read_fits
    p3, d3 = data_adv(tmp_path, "a3.fits")
    p4, d4 = data_advs(tmp_path, "a4.fits")
    h4 = read_fits(p4)[0].header
    p3b = str(tmp_path / "a3b.fits")
    write_fits(p3b, [HDU(data=d3, header=h4)])
    c1 = SpectralCube.read(p3)
    SpectralCube.read(p4)
    c3 = SpectralCube.read(p3b)
    assert c1.shape == c3.shape


def test_4d_stokes_read_3d(tmp_path):
    """reference tests/test_io.py:55-61: StokesSpectralCube.read works on
    a plain 3-D file."""
    from spectral_cube_tpu import StokesSpectralCube
    (data_adv, *_ ) = _ref_io_imports()
    p3, d3 = data_adv(tmp_path, "s3.fits")
    c = StokesSpectralCube.read(p3)
    assert isinstance(c, StokesSpectralCube)


def test_3d_beams(tmp_path):
    """reference tests/test_io.py:64-67: BEAMS table reads in arcsec."""
    (_, _, data_vda_beams, *_ ) = _ref_io_imports()
    p, d = data_vda_beams(tmp_path, "b3.fits")
    c = SpectralCube.read(p)
    np.testing.assert_almost_equal(float(c.beams[0].major.value), 0.4)
    np.testing.assert_almost_equal(float(c.beams[0].minor.value), 0.1)


def test_4d_beams(tmp_path):
    """reference tests/test_io.py:70-73."""
    (_, _, _, data_sdav_beams, *_ ) = _ref_io_imports()
    p, d = data_sdav_beams(tmp_path, "b4.fits")
    c = SpectralCube.read(p)
    np.testing.assert_almost_equal(float(c.beams[0].major.value), 0.4)
    np.testing.assert_almost_equal(float(c.beams[0].minor.value), 0.1)


def _455_header():
    (*_, jybeam_header) = _ref_io_imports()
    h = jybeam_header()
    h["BUNIT"] = "K"
    h["NAXIS"] = 3
    h["NAXIS1"] = 5
    h["NAXIS2"] = 5
    h["NAXIS3"] = 4
    for k in ("CDELT4", "CRPIX4", "CRVAL4", "CTYPE4", "CUNIT4", "NAXIS4",
              "BMAJ", "BMIN", "BPA"):
        try:
            del h[k]
        except Exception:
            pass
    h["CASAMBM"] = True
    return h


def test_4d_beams_nounits(tmp_path):
    """reference tests/test_io.py:76-82: a BEAMS table without TUNIT cards
    defaults to arcsec."""
    (*_, prepare_4_beams_table, _) = _ref_io_imports()
    bt = prepare_4_beams_table()
    bt.units = {}
    p = str(tmp_path / "bnu.fits")
    write_fits(p, [HDU(data=np.zeros((4, 5, 5)), header=_455_header()), bt])
    c = SpectralCube.read(p)
    np.testing.assert_almost_equal(float(c.beams[0].major.value), 0.4)
    assert str(c.beams[0].major.unit) == "arcsec"


def test_3d_beams_roundtrip(tmp_path):
    """reference tests/test_io.py:85-99."""
    (_, _, data_vda_beams, *_ ) = _ref_io_imports()
    p, d = data_vda_beams(tmp_path, "brt.fits")
    c = SpectralCube.read(p)
    f = str(tmp_path / "brt_out.fits")
    c.write(f)
    c2 = SpectralCube.read(f)
    assert np.all(np.asarray(c.filled_data[:].value)
                  == np.asarray(c2.filled_data[:].value))
    np.testing.assert_almost_equal(float(c2.beams[0].major.value), 0.4)
    np.testing.assert_almost_equal(float(c2.beams[0].minor.value), 0.1)
    assert str(c2.beams[0].major.unit) == "arcsec"


def test_4d_beams_roundtrip(tmp_path):
    """reference tests/test_io.py:102-117."""
    (_, _, _, data_sdav_beams, *_ ) = _ref_io_imports()
    p, d = data_sdav_beams(tmp_path, "brt4.fits")
    c = SpectralCube.read(p)
    f = str(tmp_path / "brt4_out.fits")
    c.write(f)
    c2 = SpectralCube.read(f)
    assert np.all(np.asarray(c.filled_data[:].value)
                  == np.asarray(c2.filled_data[:].value))
    np.testing.assert_almost_equal(float(c2.beams[0].major.value), 0.4)
    assert str(c2.beams[0].major.unit) == "arcsec"


def test_1d_beams(tmp_path):
    """reference tests/test_io.py:128-137: a 1-D spectrum + BEAMS table
    reads to a VaryingResolutionOneDSpectrum."""
    from collections import OrderedDict
    from spectral_cube_tpu.io.fits_low import BinTableHDU, read_fits
    from spectral_cube_tpu import OneDSpectrum
    from spectral_cube_tpu.lower_dimensional_structures import (
        VaryingResolutionOneDSpectrum)
    h = Header()
    h["SIMPLE"] = True
    h["BITPIX"] = -64
    h["NAXIS"] = 1
    h["NAXIS1"] = 5
    h["CTYPE1"] = "VRAD"
    h["CUNIT1"] = "km/s"
    h["CRVAL1"] = 0.0
    h["CDELT1"] = 1.0
    h["CRPIX1"] = 1.0
    h["BUNIT"] = "K"
    bt = BinTableHDU(columns=OrderedDict(
        BMAJ=np.array([0.5, 0.4, 0.3, 0.4, 0.5], "f4"),
        BMIN=np.array([0.1, 0.2, 0.3, 0.2, 0.1], "f4"),
        BPA=np.zeros(5, "f4"),
        CHAN=np.arange(5, dtype="i4"),
        POL=np.zeros(5, dtype="i4")), name="BEAMS",
        units={"BMAJ": "arcsec", "BMIN": "arcsec", "BPA": "deg"})
    bt.header["NCHAN"] = 5
    bt.header["NPOL"] = 1
    p = str(tmp_path / "spec5.fits")
    write_fits(p, [HDU(data=np.arange(5, dtype=float), header=h), bt])
    spec = OneDSpectrum.from_hdu(read_fits(p))
    np.testing.assert_almost_equal(np.asarray(spec.value), np.arange(5.0))
    assert isinstance(spec, VaryingResolutionOneDSpectrum)
    assert len(spec.beams) == 5


def test_aips_beams_units(tmp_path):
    """reference tests/test_io.py:140-149 (regression 737): AIPS-style
    'DEGREES' TUNIT in the BEAMS table."""
    (*_, prepare_4_beams_table, _) = _ref_io_imports()
    bt = prepare_4_beams_table()
    bt.columns["BMAJ"] = (np.asarray(bt.columns["BMAJ"]) / 3600) \
        .astype("f4")
    bt.columns["BMIN"] = (np.asarray(bt.columns["BMIN"]) / 3600) \
        .astype("f4")
    bt.units = {"BMAJ": "DEGREES", "BMIN": "DEGREES", "BPA": "deg"}
    p = str(tmp_path / "aips.fits")
    write_fits(p, [HDU(data=np.zeros((4, 5, 5)), header=_455_header()), bt])
    c = SpectralCube.read(p)
    np.testing.assert_almost_equal(float(c.beams[0].major.to_value("deg")),
                                   0.4 / 3600, decimal=10)
    np.testing.assert_almost_equal(
        float(c.beams[0].major.to_value("arcsec")), 0.4)


def test_write_read_write_idempotent(tmp_path):
    """Repeated round-trips converge to byte-identical files: provenance
    HISTORY cards dedupe instead of accumulating without bound."""
    p0, d = make_cube_file(tmp_path, name="idem.fits")
    c = SpectralCube.read(p0)
    p1 = str(tmp_path / "g1.fits")
    c.write(p1)
    c2 = SpectralCube.read(p1)
    p2 = str(tmp_path / "g2.fits")
    c2.write(p2)
    c3 = SpectralCube.read(p2)
    p3 = str(tmp_path / "g3.fits")
    c3.write(p3)
    assert open(p2, "rb").read() == open(p3, "rb").read()
    h = c3.header
    assert h["HISTORY"].count("Written by spectral_cube_tpu") == 1


def _raw_fits(cards, payload):
    """Minimal hand-built FITS: primary header-only HDU + one extension."""
    def block(cardlist):
        txt = "".join(c.ljust(80) for c in cardlist + ["END"])
        return txt.ljust(-(-len(txt) // 2880) * 2880).encode("ascii")
    primary = block(["SIMPLE  =                    T",
                     "BITPIX  =                    8",
                     "NAXIS   =                    0",
                     "EXTEND  =                    T"])
    ext = block(cards)
    pad = (-len(payload)) % 2880
    return primary + ext + payload + b"\x00" * pad


def test_bintable_row_stride_wider_than_model(tmp_path):
    """NAXIS1 wider than the modeled columns (e.g. unparsed trailing
    bytes): rows must still parse at the true stride via explicit
    offsets — previously every row after the first was garbled."""
    from spectral_cube_tpu.io.fits_low import read_fits
    import struct
    nrows, rowlen = 5, 12   # 4 (float32 E) + 4 (int32 J) + 4 pad
    payload = b""
    for i in range(nrows):
        payload += struct.pack(">f", 1.5 * i) + struct.pack(">i", 10 + i)
        payload += b"\xde\xad\xbe\xef"   # unmodeled trailing bytes
    cards = ["XTENSION= 'BINTABLE'",
             "BITPIX  =                    8",
             "NAXIS   =                    2",
             f"NAXIS1  =                   {rowlen}",
             f"NAXIS2  =                    {nrows}",
             "PCOUNT  =                    0",
             "GCOUNT  =                    1",
             "TFIELDS =                    2",
             "TTYPE1  = 'VALS    '",
             "TFORM1  = '1E      '",
             "TTYPE2  = 'IDX     '",
             "TFORM2  = '1J      '",
             "EXTNAME = 'WIDE    '"]
    path = str(tmp_path / "wide.fits")
    open(path, "wb").write(_raw_fits(cards, payload))
    hdus = read_fits(path)
    table = [h for h in hdus if getattr(h, "columns", None)][0]
    np.testing.assert_allclose(np.asarray(table["VALS"]),
                               1.5 * np.arange(5))
    np.testing.assert_array_equal(np.asarray(table["IDX"]),
                                  10 + np.arange(5))


def test_bintable_unreadable_tform_skipped(tmp_path):
    """A variable-length-array TFORM the reader does not model warns and
    skips that extension instead of aborting the whole file."""
    from spectral_cube_tpu.io.fits_low import read_fits
    cards = ["XTENSION= 'BINTABLE'",
             "BITPIX  =                    8",
             "NAXIS   =                    2",
             "NAXIS1  =                    8",
             "NAXIS2  =                    1",
             "PCOUNT  =                    0",
             "GCOUNT  =                    1",
             "TFIELDS =                    1",
             "TTYPE1  = 'BLOB    '",
             "TFORM1  = 'PJ(4)   '",
             "EXTNAME = 'PROV    '"]
    path = str(tmp_path / "vla.fits")
    open(path, "wb").write(_raw_fits(cards, b"\x00" * 8))
    with pytest.warns(UserWarning, match="skipping unreadable"):
        hdus = read_fits(path)
    assert all(getattr(h, "columns", None) is None for h in hdus)


def test_write_bool_and_object_image_dtypes(tmp_path):
    """Image writer coerces bool -> uint8 and unsupported dtypes ->
    float64."""
    from spectral_cube_tpu.io.fits_low import HDU, Header, write_fits, \
        read_fits
    mask = np.zeros((3, 4), bool)
    mask[1, 2] = True
    path = str(tmp_path / "b.fits")
    write_fits(path, [HDU(data=mask, header=Header())])
    back = read_fits(path)[0]
    np.testing.assert_array_equal(np.asarray(back.data, bool), mask)
    # float16 has no BITPIX: upcast to float64 round-trips values
    half = np.arange(6, dtype=np.float16).reshape(2, 3) / 4
    path2 = str(tmp_path / "h.fits")
    write_fits(path2, [HDU(data=half, header=Header())])
    back2 = read_fits(path2)[0]
    assert back2.data.dtype.itemsize == 8
    np.testing.assert_allclose(np.asarray(back2.data), half)


def test_bintable_multidim_and_string_columns_roundtrip(tmp_path):
    """Sub-shaped (rep-count) numeric columns, logical columns, and
    string columns survive a write->read round trip."""
    from collections import OrderedDict
    from spectral_cube_tpu.io.fits_low import (BinTableHDU, write_fits,
                                               read_fits)
    vecs = np.arange(12, dtype="f4").reshape(4, 3)
    flags = np.array([True, False, True, True])
    names = np.array([b"aa", b"bb", b"cc", b"dd"], dtype="S2")
    bt = BinTableHDU(columns=OrderedDict(VEC=vecs, OK=flags, NAME=names),
                     name="MIX")
    path = str(tmp_path / "mix.fits")
    write_fits(path, [bt])
    back = [h for h in read_fits(path)
            if getattr(h, "columns", None)][0]
    np.testing.assert_allclose(np.asarray(back["VEC"]), vecs)
    np.testing.assert_array_equal(np.asarray(back["OK"], bool), flags)
    assert [v.decode() if isinstance(v, bytes) else str(v)
            for v in back["NAME"]] == ["aa", "bb", "cc", "dd"]


@pytest.mark.parametrize("endian", ["<", ">"])
def test_lmv_type2_full_sections(tmp_path, endian):
    """Type-2 projection/spectroscopy/resolution sections parse with the
    image_def.f90 field order (regression: the line name was read FIRST
    and the doppler word skipped, garbling RESTFREQ/VRES and shifting
    the resolution section by one word)."""
    import spectral_cube_tpu.io.class_lmv as lmv_mod
    p = tmp_path / f"full_{'le' if endian == '<' else 'be'}.lmv"
    p.write_bytes(_build_type2_lmv(endian, full_sections=True))
    data, hdr = lmv_mod.read_lmv(str(p))
    assert hdr["LINE"].strip() == "CO(1-0)"
    assert hdr["RESTFREQ"] == pytest.approx(115271.2018e6, rel=1e-12)
    assert hdr["FRES"] == pytest.approx(-0.0625)
    assert hdr["VRES"] == pytest.approx(0.162, rel=1e-6)
    assert hdr["VELO-LSR"] == pytest.approx(5.5, rel=1e-6)
    # resolution section lands on the right words: rad -> deg
    assert hdr["BMAJ"] == pytest.approx(np.degrees(2e-5), rel=1e-6)
    assert hdr["BMIN"] == pytest.approx(np.degrees(1e-5), rel=1e-6)
    assert hdr["BPA"] == pytest.approx(np.degrees(0.5), rel=1e-6)
    # projection re-anchoring: CRVALs of the projected axes come from
    # a0/d0, converted to degrees
    assert hdr["CRVAL1"] == pytest.approx(np.degrees(0.1), rel=1e-9)
    assert hdr["CRVAL2"] == pytest.approx(np.degrees(-0.5), rel=1e-9)
    assert np.isnan(data).sum() == 1


def _write_stokes4(tmp_path, name, crval4, ncomp=2, cdelt4=1.0):
    rng = np.random.RandomState(3)
    data4 = rng.rand(ncomp, 4, 3, 2)
    h = base_header()
    h["NAXIS"] = 4
    h["NAXIS4"] = ncomp
    h["CTYPE4"] = "STOKES"
    h["CRVAL4"] = crval4
    h["CDELT4"] = cdelt4
    h["CRPIX4"] = 1.0
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=data4, header=h)])
    return path, data4


def test_read_stokes_extracts_I_with_warning(tmp_path):
    """SpectralCube.read of a 4-D Stokes file returns the I component with
    a StokesWarning — reference normalize_cube_stokes, io/core.py:175-192."""
    from spectral_cube_tpu.utils import StokesWarning
    path, data4 = _write_stokes4(tmp_path, "iq.fits", crval4=1.0)
    with pytest.warns(StokesWarning, match="I component"):
        cube = SpectralCube.read(path)
    assert not isinstance(cube, StokesSpectralCube)
    np.testing.assert_allclose(
        np.asarray(cube.unmasked_data[:].value), data4[0])


def test_read_stokes_without_I_raises(tmp_path):
    """A Stokes file without an I component cannot be read through the
    single-cube entry point (reference io/core.py:186-188)."""
    path, _ = _write_stokes4(tmp_path, "xxyy.fits", crval4=-5.0,
                             cdelt4=-1.0)   # XX, YY
    with pytest.raises(ValueError, match="does not have an I component"):
        SpectralCube.read(path)
    sc = StokesSpectralCube.read(path)   # full-component path still works
    assert set(sc.components) == {"XX", "YY"}


def test_read_in_memory_hdu_touches_no_disk(tmp_path, monkeypatch):
    """read_cube of an in-memory HDU parses it directly — the reference
    serves HDUs zero-copy (io/core.py:111-130); the old temp-file round
    trip is gone."""
    import spectral_cube_tpu.io as scio

    def _bomb(*a, **k):
        raise AssertionError("in-memory HDU read wrote to disk")

    monkeypatch.setattr(scio, "write_fits", _bomb)
    monkeypatch.setattr("tempfile.NamedTemporaryFile", _bomb)
    rng = np.random.RandomState(4)
    data = rng.rand(4, 3, 2).astype(np.float32)
    hdu = HDU(data=data, header=base_header())
    cube = scio.read_cube(hdu)
    np.testing.assert_allclose(np.asarray(cube.unmasked_data[:].value),
                               data, rtol=1e-7)
    # a list of HDUs works too
    cube2 = scio.read_cube([hdu])
    np.testing.assert_allclose(np.asarray(cube2.unmasked_data[:].value),
                               data, rtol=1e-7)


def test_read_foreign_hdu_duck_typed(tmp_path):
    """Objects with .header/.data (e.g. astropy HDUs) read without
    serialization."""

    class FakeHDU:
        def __init__(self, data, header):
            self.data = data
            self.header = dict(header.items())
        name = "PRIMARY"

    rng = np.random.RandomState(5)
    data = rng.rand(4, 3, 2).astype(np.float32)
    from spectral_cube_tpu.io import read_cube
    cube = read_cube(FakeHDU(data, base_header()))
    np.testing.assert_allclose(np.asarray(cube.unmasked_data[:].value),
                               data, rtol=1e-7)
