"""Reference test_spectral_cube.py scenario battery.

Names mirror the reference suite's; fixtures are byte-faithful
reconstructions (ref_fixtures.py) and every expected value is re-derived
independently.  f32 device storage compares at 2e-7 where the reference
compares exactly.
"""

import warnings

import numpy as np
import pytest

from ref_fixtures import (data_adv, data_advs, data_vda_beams,
                          data_sdav_beams, cube_and_raw, prepare_adv_data,
                          prepare_advs_data, jybeam_header, transpose)
from spectral_cube_tpu.io.fits_low import HDU, Header, write_fits
from spectral_cube_tpu import (SpectralCube, VaryingResolutionSpectralCube,
                               BooleanArrayMask, FunctionMask, OneDSpectrum,
                               Projection, Beam, utils)
from spectral_cube_tpu.beams import Beams, BeamUnitsError
from spectral_cube_tpu.lower_dimensional_structures import (
    VaryingResolutionOneDSpectrum)
from spectral_cube_tpu import units as u
from spectral_cube_tpu.units import Quantity
from spectral_cube_tpu.wcs import WCS
from spectral_cube_tpu.wcs import spectral as spx

BUNITS = ["Jy / beam", "K", "Jy / sr", "Jy / pix", "Jy / arcsec2",
          "mJy / beam", "mK"]


def test_huge_disallowed(tmp_path):
    """reference test_spectral_cube.py:104-130: _is_huge honors
    cube_utils.MEMORY_THRESHOLD and gates whole-cube arithmetic."""
    from spectral_cube_tpu import cube_utils
    cube, data = cube_and_raw(tmp_path, "h.fits")
    assert not cube._is_huge
    old = cube_utils.MEMORY_THRESHOLD
    try:
        cube_utils.MEMORY_THRESHOLD = 10
        assert cube._is_huge
        with pytest.raises(ValueError, match="cube into memory"):
            cube + Quantity(5, cube.unit)
        cube.allow_huge_operations = True
        cube + Quantity(5, cube.unit)
    finally:
        cube_utils.MEMORY_THRESHOLD = old


def test_read_write_rountrip(tmp_path):
    """reference test_spectral_cube.py:966-977."""
    cube, data = cube_and_raw(tmp_path, "rt.fits")
    f = str(tmp_path / "rt_out.fits")
    cube.write(f)
    cube2 = SpectralCube.read(f)
    assert cube.shape == cube2.shape
    np.testing.assert_allclose(np.asarray(cube.unmasked_data[:].value),
                               np.asarray(cube2.unmasked_data[:].value),
                               rtol=1e-7)


def _dummy_cube():
    data = np.array([[[0, 1, 2, 3, 4]]], dtype=float)
    wcs = WCS(naxis=3)
    wcs.ctype = ["RA---TAN", "DEC--TAN", "VELO-HEL"]
    m1 = FunctionMask(lambda d, w, view=(): np.asarray(d)[view] > 0)
    return SpectralCube(data, wcs=wcs, mask=m1)


def test_with_mask_with_boolean_array():
    """reference test_spectral_cube.py:1024-1030."""
    cube = _dummy_cube()
    mask = np.random.random(cube.shape) > 0.5
    cube2 = cube.with_mask(mask, inherit_mask=False)
    assert isinstance(cube2._mask, BooleanArrayMask)
    np.testing.assert_array_equal(np.asarray(cube2._mask.include()), mask)


def test_with_mask_with_good_array_shape():
    """reference test_spectral_cube.py:1033-1038: a (1, 5) mask broadcasts
    up to (1, 1, 5)."""
    cube = _dummy_cube()
    mask = np.zeros((1, 5), dtype=bool)
    cube2 = cube.with_mask(mask, inherit_mask=False)
    assert isinstance(cube2._mask, BooleanArrayMask)
    np.testing.assert_array_equal(np.asarray(cube2._mask.include()),
                                  mask.reshape((1, 1, 5)))


def test_with_mask_with_bad_array_shape():
    """reference test_spectral_cube.py:1041-1047."""
    cube = _dummy_cube()
    with pytest.raises(ValueError):
        cube.with_mask(np.zeros((5, 5), dtype=bool))


def test_preserve_spectral_unit(tmp_path):
    """reference test_spectral_cube.py:1068-1080: the preferred spectral
    unit survives with_fill_value."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube_freq = cube.with_spectral_unit(u.Unit("GHz"))
    assert str(cube_freq.spectral_axis.unit) == "GHz"
    new_cube = cube_freq.with_fill_value(fill_value=3.4)
    assert str(new_cube.spectral_axis.unit) == "GHz"


def test_endians():
    """reference test_spectral_cube.py:1083-1115: big- and little-endian
    arrays produce identical device data."""
    big = np.array([[[1], [2]]], dtype=">f4")
    lil = np.array([[[1], [2]]], dtype="<f4")
    w = WCS(naxis=3)
    w.ctype = ["RA", "DEC", "VELO"]
    xb = np.asarray(SpectralCube(data=big, wcs=w)._get_filled_data())
    xl = np.asarray(SpectralCube(data=lil, wcs=w)._get_filled_data())
    np.testing.assert_array_equal(xb, xl)


def test_header_naxis(tmp_path):
    """reference test_spectral_cube.py:1118-1127: a 4-D single-Stokes file
    reads to a 3-axis header."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    h = cube.header
    assert h["NAXIS"] == 3
    assert h["NAXIS1"] == d.shape[3]
    assert h["NAXIS2"] == d.shape[2]
    assert h["NAXIS3"] == d.shape[1]
    assert "NAXIS4" not in h


def test_slice_wcs_reversal(tmp_path):
    """reference test_spectral_cube.py:1173-1193: double spectral reversal
    is the identity, including world extrema and coordinate maps."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    view = (slice(None, None, -1), slice(None), slice(None))
    rcube = cube[view]
    rrcube = rcube[view]
    sa = np.asarray(cube.spectral_axis.value)
    np.testing.assert_array_equal(np.diff(sa),
                                  -np.diff(np.asarray(
                                      rcube.spectral_axis.value)))
    np.testing.assert_array_equal(np.asarray(rrcube.spectral_axis.value), sa)
    np.testing.assert_array_equal(np.asarray(rcube.spectral_axis.value),
                                  sa[::-1])
    np.testing.assert_array_equal(np.asarray(rrcube.world_extrema.value),
                                  np.asarray(cube.world_extrema.value))
    scm, scm2 = cube.spatial_coordinate_map, rrcube.spatial_coordinate_map
    np.testing.assert_array_equal(np.asarray(scm2[0].value),
                                  np.asarray(scm[0].value))
    np.testing.assert_array_equal(np.asarray(scm2[1].value),
                                  np.asarray(scm[1].value))


def test_spectral_slice_preserve_units(tmp_path):
    """reference test_spectral_cube.py:1196-1206."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p).with_spectral_unit(u.Unit("km/s"))
    sl = cube[:, 0, 0]
    assert str(cube.spectral_axis.unit) == "km / s"
    assert str(sl.spectral_axis.unit) == "km / s"


def test_header_units_consistent(tmp_path):
    """reference test_spectral_cube.py:1209-1233."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube_ms = cube.with_spectral_unit(u.Unit("m/s"))
    cube_Mms = cube.with_spectral_unit(u.Unit("Mm/s"))
    assert cube.header["CUNIT3"].replace(" ", "") in ("kms-1", "km/s")
    assert cube_ms.header["CUNIT3"].replace(" ", "") in ("ms-1", "m/s")
    assert cube_Mms.header["CUNIT3"].replace(" ", "") in ("Mms-1", "Mm/s")
    np.testing.assert_allclose(cube_Mms.header["CDELT3"],
                               cube.header["CDELT3"] / 1e3, rtol=1e-3)
    np.testing.assert_allclose(cube.header["CDELT3"] * 1e3,
                               cube_ms.header["CDELT3"], rtol=1e-2)
    assert cube.with_spectral_unit(u.Unit("Hz")).header["CUNIT3"] == "Hz"
    assert cube.with_spectral_unit(u.Unit("GHz")).header["CUNIT3"] == "GHz"


def test_invalid_spectral_unit_conventions(tmp_path):
    """reference test_spectral_cube.py:1264-1273."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    with pytest.raises(ValueError, match="radio, optical"):
        cube.with_spectral_unit(u.Unit("km/s"),
                                velocity_convention="invalid convention")


def test_airwave_to_wave(tmp_path):
    """reference test_spectral_cube.py:1287-1300: AWAV -> WAVE applies the
    air->vacuum correction along the axis."""
    d, h = prepare_adv_data()
    h["CTYPE3"] = "AWAV"
    h["CUNIT3"] = "m"
    h["CDELT3"] = 1e-7
    h["CRVAL3"] = 5e-7
    p = str(tmp_path / "awav.fits")
    write_fits(p, [HDU(data=d, header=h)])
    cube = SpectralCube.read(p)
    ax1 = np.asarray(cube.spectral_axis.value)
    ax2 = np.asarray(cube.with_spectral_unit(u.Unit("m"))
                     .spectral_axis.value)
    np.testing.assert_almost_equal(spx.air_to_vac(ax1), ax2)


def test_preserves_header_values(tmp_path):
    """reference test_spectral_cube.py:1368-1383: non-WCS header cards
    survive projection."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._header["OBJECT"] = "TestName"
    proj = cube.sum(axis=0, how="auto")
    assert isinstance(proj, Projection)
    assert proj.header["OBJECT"] == "TestName"
    assert proj.hdu.header["OBJECT"] == "TestName"


@pytest.mark.parametrize("func", ("sum", "std", "max", "min", "mean"))
def test_oned_numpy(func, tmp_path):
    """reference test_spectral_cube.py:1415-1433."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    spec = getattr(cube, func)(axis=(1, 2))
    dspec = getattr(d, func)(axis=(2, 3)).squeeze()
    assert isinstance(spec, (OneDSpectrum, VaryingResolutionOneDSpectrum))
    np.testing.assert_allclose(np.asarray(spec.value), dspec, rtol=2e-6)
    assert str(cube.unit) == str(spec.unit)


def test_oned_slice(tmp_path):
    """reference test_spectral_cube.py:1436-1448."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    spec = cube[:, 0, 0]
    assert isinstance(spec, OneDSpectrum)
    np.testing.assert_allclose(np.asarray(spec.value), d[0, :, 0, 0],
                               rtol=2e-7)
    assert spec.header["BUNIT"] == cube.header["BUNIT"]


def test_oned_slice_beams(tmp_path):
    """reference test_spectral_cube.py:1451-1465."""
    p, d = data_sdav_beams(tmp_path)
    cube = SpectralCube.read(p)
    spec = cube[:, 0, 0]
    assert isinstance(spec, VaryingResolutionOneDSpectrum)
    np.testing.assert_allclose(np.asarray(spec.value), d[:, 0, 0, 0],
                               rtol=2e-7)
    assert hasattr(spec, "beams")
    assert "BMAJ" in spec.hdulist[1].columns


def test_subcube_slab_beams(tmp_path):
    """reference test_spectral_cube.py:1468-1482: the sliced cube's BEAMS
    bintable re-numbers CHAN from 0."""
    p, d = data_sdav_beams(tmp_path)
    cube = SpectralCube.read(p)
    slcube = cube[1:]
    chans = np.asarray(slcube.hdulist[1].columns["CHAN"])
    assert (chans == np.arange(slcube.shape[0])).all()
    assert np.all(cube.beams[1:] == slcube.beams)


def test_preserve_bunit(tmp_path):
    """reference test_spectral_cube.py:1528-1542."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    assert cube.header["BUNIT"] == "K"
    d2, h2 = prepare_advs_data()
    h2["BUNIT"] = "Jy"
    p2 = str(tmp_path / "pb2.fits")
    write_fits(p2, [HDU(data=d2, header=h2)])
    cube = SpectralCube.read(p2)
    assert str(cube.unit) == "Jy"
    assert cube.header["BUNIT"] == "Jy"


def test_preserve_beam(tmp_path):
    """reference test_spectral_cube.py:1545-1551: Beam.from_fits_header
    accepts the filename."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    beam = Beam.from_fits_header(p)
    assert cube.beam == beam


def test_beam_attach_to_header(tmp_path):
    """reference test_spectral_cube.py:1554-1569."""
    cube, data = cube_and_raw(tmp_path, "bath.fits")
    header = Header(cube._header)
    for k in ("BMAJ", "BMIN", "BPA"):
        del header[k]
    newcube = SpectralCube(data=data, wcs=cube.wcs, header=header,
                           beam=cube.beam)
    assert cube.header["BMAJ"] == newcube.header["BMAJ"]
    assert cube.header["BMIN"] == newcube.header["BMIN"]
    assert cube.header["BPA"] == newcube.header["BPA"]
    assert newcube.meta["beam"] == cube.beam


def test_beam_custom(tmp_path):
    """reference test_spectral_cube.py:1572-1615."""
    cube, data = cube_and_raw(tmp_path, "bc.fits")
    header = Header(cube._header)
    beam = Beam.from_fits_header(header)
    for k in ("BMAJ", "BMIN", "BPA"):
        del header[k]
    newcube = SpectralCube(data=data, wcs=cube.wcs, header=header)
    with pytest.raises(utils.NoBeamError):
        newcube.beam
    newcube = newcube.with_beam(beam=beam)
    assert newcube.beam == cube.beam
    assert cube.header["BMAJ"] == newcube.header["BMAJ"]
    assert newcube.meta["beam"] == cube.beam
    newbeam = Beam(beam.major * 2)
    newcube2 = newcube.with_beam(beam=newbeam)
    assert newcube2.beam == newbeam
    assert newcube2.header["BMAJ"] == float(newbeam.major.value)
    assert newcube2.meta["beam"] == newbeam


def test_cube_with_no_beam(tmp_path):
    """reference test_spectral_cube.py:1618-1643."""
    cube, data = cube_and_raw(tmp_path, "cnb.fits")
    header = Header(cube._header)
    beam = Beam.from_fits_header(header)
    for k in ("BMAJ", "BMIN", "BPA"):
        del header[k]
    newcube = SpectralCube(data=data, wcs=cube.wcs, header=header)
    with pytest.raises(utils.NoBeamError):
        newcube.beam
    assert hasattr(newcube, "_beam")
    newcube.with_beam(beam=beam).beam


def test_multibeam_custom(tmp_path):
    """reference test_spectral_cube.py:1646-1662."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    new_beams = Beams(Quantity([1.0] * cube.shape[0], "deg"))
    newcube = cube.with_beams(new_beams, raise_error_jybm=False)
    assert np.all(new_beams == newcube.beams)


def test_multibeam_custom_wrongshape(tmp_path):
    """reference test_spectral_cube.py:1665-1674."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    with pytest.raises(ValueError):
        cube.with_beams(Beams(Quantity([1.0], "deg")),
                        raise_error_jybm=False)


def test_multibeam_jybm_error(tmp_path):
    """reference test_spectral_cube.py:1677-1686: swapping beams under
    Jy/beam units raises BeamUnitsError."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    new_beams = Beams(Quantity([1.0] * cube.shape[0], "deg"))
    with pytest.raises(BeamUnitsError):
        cube.with_beams(new_beams, raise_error_jybm=True)


def test_multibeam_slice(tmp_path):
    """reference test_spectral_cube.py:1689-1722: beams present in arcsec
    (their table unit) and slice in lockstep everywhere."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    assert isinstance(cube, VaryingResolutionSpectralCube)
    np.testing.assert_almost_equal(float(cube.beams[0].major.value), 0.4)
    np.testing.assert_almost_equal(float(cube.beams[0].minor.value), 0.1)
    np.testing.assert_almost_equal(float(cube.beams[3].major.value), 0.4)
    scube = cube[:2, :, :]
    np.testing.assert_almost_equal(float(scube.beams[0].major.value), 0.4)
    np.testing.assert_almost_equal(float(scube.beams[1].major.value), 0.3)
    flatslice = cube[0, :, :]
    np.testing.assert_almost_equal(flatslice.header["BMAJ"], 0.4 / 3600.0)
    spec = cube[:, 0, 0]
    assert np.all(cube.beams == spec.beams)
    spec_part = cube[:1, 0, 0]
    assert len(np.atleast_1d(spec_part.value)) == 1
    assert cube.beams[0] == spec.beams[0]


def test_basic_unit_conversion(tmp_path):
    """reference test_spectral_cube.py:1724-1734."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    mK = cube.to(u.Unit("mK"))
    np.testing.assert_allclose(np.asarray(mK.filled_data[:].value),
                               np.asarray(cube.filled_data[:].value) * 1e3,
                               rtol=1e-6)


def test_basic_unit_conversion_beams(tmp_path):
    """reference test_spectral_cube.py:1737-1749."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    cube._unit = u.Unit("K")
    cube._meta["BUNIT"] = "K"
    mK = cube.to(u.Unit("mK"))
    np.testing.assert_allclose(np.asarray(mK.filled_data[:].value),
                               np.asarray(cube.filled_data[:].value) * 1e3,
                               rtol=1e-6)


def test_unit_conversion_brightness_temperature_without_beam(tmp_path):
    """reference test_spectral_cube.py:1751-1773: Jy/sr <-> K without any
    beam, against the reference's hard-coded factors."""
    p, d = data_adv(tmp_path)
    c0 = SpectralCube.read(p)
    cube = SpectralCube(np.asarray(c0.unmasked_data[:].value), wcs=c0.wcs)
    cube._unit = u.Unit("Jy / sr")
    cube._meta["BUNIT"] = "sr-1 Jy"
    assert cube._beam is None
    with pytest.raises(utils.NoBeamError):
        cube.beam
    bt = cube.to(u.Unit("K"))
    np.testing.assert_allclose(
        np.asarray(bt.filled_data[:].value),
        np.asarray(cube.filled_data[:].value) * 1.60980084e-05, rtol=1e-4)
    back = bt.to(u.Unit("Jy / arcsec2"))
    np.testing.assert_allclose(
        np.asarray(back.filled_data[:].value),
        np.asarray(cube.filled_data[:].value) / 4.25451703e+10, rtol=1e-4)


@pytest.mark.parametrize("init_unit", BUNITS)
def test_unit_conversions_general(init_unit, tmp_path):
    """reference test_spectral_cube.py:1776-1791: all brightness-unit
    combos round-trip."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = init_unit
    cube._unit = u.Unit(init_unit)
    for targ in BUNITS:
        newcube = cube.to(u.Unit(targ))
        if targ == init_unit:
            np.testing.assert_allclose(
                np.asarray(newcube.filled_data[:].value),
                np.asarray(cube.filled_data[:].value), rtol=1e-6)
        else:
            rt = newcube.to(u.Unit(init_unit))
            np.testing.assert_allclose(
                np.asarray(rt.filled_data[:].value),
                np.asarray(cube.filled_data[:].value), rtol=1e-5)


@pytest.mark.parametrize("init_unit", BUNITS)
def test_multibeam_unit_conversions_general(init_unit, tmp_path):
    """reference test_spectral_cube.py:1793-1811."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = init_unit
    cube._unit = u.Unit(init_unit)
    for targ in BUNITS:
        newcube = cube.to(u.Unit(targ))
        if targ == init_unit:
            np.testing.assert_allclose(
                np.asarray(newcube.filled_data[:].value),
                np.asarray(cube.filled_data[:].value), rtol=1e-6)
        else:
            rt = newcube.to(u.Unit(init_unit))
            np.testing.assert_allclose(
                np.asarray(rt.filled_data[:].value),
                np.asarray(cube.filled_data[:].value), rtol=1e-5)


def test_beam_jpix_checks_array(tmp_path):
    """reference test_spectral_cube.py:1813-1846: Jy/beam <-> Jy/pix <-> K
    chains through pixels_per_beam."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = "Jy / beam"
    cube._unit = u.Unit("Jy / beam")
    jtok = np.asarray(cube.beam.jtok(
        cube.with_spectral_unit(u.Unit("GHz")).spectral_axis).value)
    ppb = float(cube.pixels_per_beam)
    cube_jypix = cube.to(u.Unit("Jy / pix"))
    np.testing.assert_allclose(np.asarray(cube_jypix.filled_data[:].value),
                               np.asarray(cube.filled_data[:].value) / ppb,
                               rtol=1e-6)
    Kcube = cube.to(u.Unit("K"))
    np.testing.assert_allclose(
        np.asarray(Kcube.filled_data[:].value),
        np.asarray(cube_jypix.filled_data[:].value)
        * jtok[:, None, None] * ppb, rtol=1e-5)
    rt = cube_jypix.to(u.Unit("Jy / beam"))
    np.testing.assert_allclose(np.asarray(cube.filled_data[:].value),
                               np.asarray(rt.filled_data[:].value),
                               rtol=1e-6)
    K2 = cube_jypix.to(u.Unit("K"))
    np.testing.assert_allclose(np.asarray(Kcube.filled_data[:].value),
                               np.asarray(K2.filled_data[:].value),
                               rtol=1e-6)


def test_multibeam_jpix_checks_array(tmp_path):
    """reference test_spectral_cube.py:1849-1884: per-channel
    pixels_per_beam for VRSC."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = "Jy / beam"
    cube._unit = u.Unit("Jy / beam")
    jtok = np.asarray(cube.jtok_factors())
    ppb = np.asarray(cube.pixels_per_beam)
    cube_jypix = cube.to(u.Unit("Jy / pix"))
    np.testing.assert_allclose(
        np.asarray(cube_jypix.filled_data[:].value),
        np.asarray(cube.filled_data[:].value) / ppb[:, None, None],
        rtol=1e-6)
    Kcube = cube.to(u.Unit("K"))
    np.testing.assert_allclose(
        np.asarray(Kcube.filled_data[:].value),
        np.asarray(cube_jypix.filled_data[:].value)
        * jtok[:, None, None] * ppb[:, None, None], rtol=1e-5)
    rt = cube_jypix.to(u.Unit("Jy / beam"))
    np.testing.assert_allclose(np.asarray(cube.filled_data[:].value),
                               np.asarray(rt.filled_data[:].value),
                               rtol=1e-6)


def test_beam_jtok_array(tmp_path):
    """reference test_spectral_cube.py:1887-1900."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = "Jy / beam"
    cube._unit = u.Unit("Jy / beam")
    jtok = np.asarray(cube.beam.jtok(
        cube.with_spectral_unit(u.Unit("GHz")).spectral_axis).value)
    K = cube.to(u.Unit("K"))
    np.testing.assert_allclose(
        np.asarray(K.filled_data[:].value),
        np.asarray(cube.filled_data[:].value) * jtok[:, None, None],
        rtol=1e-5)


def test_multibeam_jtok_array(tmp_path):
    """reference test_spectral_cube.py:1902-1925."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    assert cube.meta["BUNIT"].strip() == "Jy / beam"
    jtok = np.array([float(bm.jtok(frq).value) for bm, frq in
                     zip(cube.beams,
                         cube.with_spectral_unit(u.Unit("GHz"))
                         .spectral_axis)])
    K = cube.to(u.Unit("K"))
    np.testing.assert_allclose(
        np.asarray(K.filled_data[:].value),
        np.asarray(cube.filled_data[:].value) * jtok[:, None, None],
        rtol=1e-5)


def test_varyres_unitconversion_roundtrip(tmp_path):
    """reference test_spectral_cube.py:1964-1975."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    assert str(cube.unit) == "Jy / beam"
    rt = cube.to(u.Unit("mJy / beam")).to(u.Unit("Jy / beam"))
    np.testing.assert_allclose(np.asarray(rt.filled_data[:].value),
                               np.asarray(cube.filled_data[:].value),
                               rtol=1e-6)


def test_append_beam_to_hdr(tmp_path):
    """reference test_spectral_cube.py:1978-1987: the regenerated header's
    beam cards equal the file's EXACTLY (full double precision through the
    write -> read -> Beam -> header chain)."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    orig = jybeam_header()
    assert cube.header["BMAJ"] == orig["BMAJ"]
    assert cube.header["BMIN"] == orig["BMIN"]
    assert cube.header["BPA"] == orig["BPA"]


def test_cube_with_swapped_axes(tmp_path):
    """reference test_spectral_cube.py:1990-1998 (regression 208)."""
    d, h = prepare_adv_data()
    d2, h2 = transpose(d, h, [2, 0, 1])
    d2, h2 = transpose(d2, h2, [2, 1, 0])
    p = str(tmp_path / "vda.fits")
    write_fits(p, [HDU(data=d2, header=h2)])
    cube = SpectralCube.read(p)
    cube.filled_data[:]


def test_jybeam_lower(tmp_path):
    """reference test_spectral_cube.py:2000-2023 (+ whitespace variant):
    case/spacing-forgiving BUNIT parsing."""
    d, h = prepare_adv_data()
    for bunit in ("Jy/beam", " Jy / beam "):
        h2 = Header(h)
        h2["BUNIT"] = bunit
        p = str(tmp_path / f"jb_{len(bunit)}.fits")
        write_fits(p, [HDU(data=d, header=h2)])
        cube = SpectralCube.read(p)
        assert str(cube.unit) == "Jy / beam"


def test_beam_proj_meta(tmp_path):
    """reference test_spectral_cube.py:2026-2062: projections carry the
    beam in meta."""
    cube, data = cube_and_raw(tmp_path, "bpm.fits")
    moment = cube.moment0(axis=0)
    assert "beam" in moment.meta
    assert moment.wcs is not None
    slc = cube[0, :, :]
    assert "beam" in slc.meta
    proj = cube.max(axis=0)
    assert "beam" in proj.meta
