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


# ---------------------------------------------------------------------------
# smoothing / convolution / varyres chunk
# ---------------------------------------------------------------------------

def _point_source_cube(tmp_path, name, beams=None):
    """reference conftest point_source_5_one_beam /
    point_source_5_spectral_beams (conftest.py:590-660): a delta convolved
    to each channel's beam, scaled Jy/pixel -> Jy/beam."""
    from spectral_cube_tpu.ops.convolve import convolve2d_nan_fft
    from spectral_cube_tpu.beams import beams_to_bintable
    h = jybeam_header()
    h["BUNIT"] = "Jy/beam"
    h["NAXIS"] = 3
    h["NAXIS1"] = 11
    h["NAXIS2"] = 11
    h["NAXIS3"] = 5
    for k in ("CDELT4", "CRPIX4", "CRVAL4", "CTYPE4", "CUNIT4", "NAXIS4"):
        try:
            del h[k]
        except Exception:
            pass
    d = np.zeros((5, 11, 11))
    pixscale_rad = 2.0 / 3600 * np.pi / 180
    if beams is None:
        beam = Beam(Quantity(6.0, "arcsec"))
        for k, v in beam.to_header_keywords().items():
            h[k] = v
        blist = [beam] * 5
    else:
        blist = list(beams)
        h["CASAMBM"] = True
    for i, bm in enumerate(blist):
        img = np.zeros((11, 11))
        img[5, 5] = 1.0
        out = np.asarray(convolve2d_nan_fft(img, bm.as_kernel(pixscale_rad)))
        d[i] = out * float(bm.sr.value) / pixscale_rad ** 2
    p = str(tmp_path / name)
    hdus = [HDU(data=d, header=h)]
    if beams is not None:
        hdus.append(beams_to_bintable(Beams(beams=blist)))
    write_fits(p, hdus)
    return p, d


def test_proj_meta(tmp_path):
    """reference test_spectral_cube.py:2043-2061."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    assert cube.moment0(axis=0).meta.get("BUNIT") == "K"
    assert cube[0, :, :].meta.get("BUNIT") == "K"
    assert cube.max(axis=0).meta.get("BUNIT") == "K"


def test_pix_sign(tmp_path):
    """reference test_spectral_cube.py:2063-2086: pixel sizes are positive
    regardless of cdelt/pc sign."""
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    for flip in range(3):
        s, y, x = (cube._pix_size_slice(i) for i in range(3))
        assert s > 0 and y > 0 and x > 0
        if flip == 0:
            cube.wcs.cdelt = cube.wcs.cdelt * -1
        elif flip == 1:
            cube.wcs.pc = cube.wcs.pc * -1


def test_convolve_to_equal(tmp_path):
    """reference test_spectral_cube.py:2150-2168: convolving to the
    cube's own beam is the identity."""
    from ref_fixtures import prepare_adv_data
    d, h = prepare_adv_data()
    d2, h2 = transpose(d, h, [2, 0, 1])
    d2, h2 = transpose(d2, h2, [2, 1, 0])
    p = str(tmp_path / "cte.fits")
    write_fits(p, [HDU(data=d2, header=h2)])
    cube = SpectralCube.read(p)
    conv = cube.convolve_to(cube.beam)
    np.testing.assert_allclose(np.asarray(conv.filled_data[:].value),
                               np.asarray(cube.filled_data[:].value))
    plane = cube[0]
    conv = plane.convolve_to(cube.beam)
    np.testing.assert_allclose(np.asarray(conv.value),
                               np.asarray(plane.value))
    plane.convolve_to(cube.beam, nan_treatment="fill")


def test_convolve_to_jybeam_onebeam(tmp_path):
    """reference test_spectral_cube.py:2181-2189: a point source's peak
    in Jy/beam is invariant under convolution to a bigger beam."""
    p, d = _point_source_cube(tmp_path, "ps1.fits")
    cube = SpectralCube.read(p)
    conv = cube.convolve_to(Beam(Quantity(10.0, "arcsec")))
    np.testing.assert_allclose(np.asarray(conv[:, 5, 5].value),
                               np.asarray(cube[:, 5, 5].value),
                               atol=1e-5, rtol=1e-5)
    assert str(cube.unit) == "Jy / beam"


def test_convolve_to_jybeam_multibeams(tmp_path):
    """reference test_spectral_cube.py:2192-2201."""
    beams = [Beam(Quantity(a, "arcsec"), Quantity(b, "arcsec"),
                  Quantity(pa, "deg"))
             for a, b, pa in [(8, 6, 0), (9, 7, 45), (10, 8, 60),
                              (9, 7, 30), (8, 6, 0)]]
    p, d = _point_source_cube(tmp_path, "ps5.fits", beams=beams)
    cube = SpectralCube.read(p)
    conv = cube.convolve_to(Beam(Quantity(12.0, "arcsec")))
    np.testing.assert_allclose(np.asarray(conv[:, 5, 5].value),
                               np.asarray(cube[:, 5, 5].value),
                               atol=1e-5, rtol=1e-4)


def test_convolve_to_with_bad_beams(tmp_path):
    """reference test_spectral_cube.py:2204-2226: undeconvolvable beams
    raise, unless their channels are masked out (mask_channels exempts
    their beams from the check)."""
    from spectral_cube_tpu.beams import BeamError
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    cube.convolve_to(Beam(Quantity(0.5, "arcsec")))
    with pytest.raises((BeamError, ValueError)):
        cube.convolve_to(Beam(Quantity(0.35, "arcsec")))
    masked = cube.mask_channels([False, True, True, False])
    conv = masked.convolve_to(Beam(Quantity(0.35, "arcsec")))
    assert np.all(np.isfinite(np.asarray(conv.filled_data[1:3].value)))


def test_jybeam_factors(tmp_path):
    """reference test_spectral_cube.py:2228-2235: the reference's own
    hard-coded jtok factors."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    np.testing.assert_allclose(
        np.asarray(cube.jtok_factors()),
        [15111171.12641629, 10074201.06746361,
         10074287.73828087, 15111561.14508185], rtol=5e-7)


def test_channelmask_singlebeam(tmp_path):
    """reference test_spectral_cube.py:2237-2243."""
    cube, data = cube_and_raw(tmp_path, "cms.fits")
    masked = cube.mask_channels([False, True, True, False])
    inc = np.asarray(masked.mask.include())
    assert np.all(inc[:, 0, 0] == [False, True, True, False])


def test_spatial_smooth_preserves_unit(tmp_path):
    """reference test_spectral_cube.py:2386-2399 (issue 527)."""
    from spectral_cube_tpu import Gaussian2DKernel
    cube, data = cube_and_raw(tmp_path, "ssu.fits")
    out = cube.spatial_smooth(Gaussian2DKernel(3))
    assert str(out.unit) == str(cube.unit)


def test_spatial_smooth_median_jybm_error(tmp_path):
    """reference test_spectral_cube.py:2440-2448."""
    from spectral_cube_tpu.beams import BeamUnitsError
    p, d = _point_source_cube(tmp_path, "psj.fits")
    cube = SpectralCube.read(p)
    with pytest.raises(BeamUnitsError):
        cube.spatial_smooth_median(3)


@pytest.mark.parametrize("num_cores", (None, 1))
def test_spatial_smooth_maxfilter(num_cores, tmp_path):
    """reference test_spectral_cube.py:2472-2487."""
    from scipy import ndimage
    cube, data = cube_and_raw(tmp_path, "smf.fits")
    out = cube.spatial_filter([3, 3], filter=ndimage.maximum_filter,
                              num_cores=num_cores)
    expected = ndimage.maximum_filter(data, size=(1, 3, 3))
    np.testing.assert_allclose(np.asarray(out[0, :, :].value), expected[0],
                               rtol=1e-6)


@pytest.mark.parametrize("num_cores", (None, 1))
def test_spectral_smooth_maxfilter(num_cores, tmp_path):
    """reference test_spectral_cube.py:2491-2505."""
    from scipy import ndimage
    cube, data = cube_and_raw(tmp_path, "sef.fits")
    out = cube.spectral_filter(3, filter=ndimage.maximum_filter,
                               num_cores=num_cores)
    expected = ndimage.maximum_filter(data, size=(3, 1, 1))
    np.testing.assert_allclose(np.asarray(out[:, 1, 1].value),
                               expected[:, 1, 1], rtol=1e-6)


def test_spectral_smooth_median_4cores(tmp_path):
    """reference test_spectral_cube.py:2523-2538."""
    from scipy.ndimage import median_filter
    cube, data = cube_and_raw(tmp_path, "sm4.fits")
    out = cube.spectral_smooth_median(3, num_cores=4)
    expected = median_filter(data, size=(3, 1, 1))
    np.testing.assert_allclose(np.asarray(out[:, 1, 1].value)[1:-1],
                               expected[1:-1, 1, 1], rtol=1e-6)


def test_smooth_update_function_serial(tmp_path):
    """reference test_spectral_cube.py:2542-2576: update_function fires
    once per spaxel."""
    cube, data = cube_and_raw(tmp_path, "suf.fits")
    calls = []
    cube.spectral_smooth_median(3, num_cores=1, parallel=False,
                                update_function=lambda: calls.append(1))
    assert len(calls) == 6


def test_parallel_bad_params(tmp_path):
    """reference test_spectral_cube.py:2579-2603."""
    cube, data = cube_and_raw(tmp_path, "pbp.fits")
    with pytest.raises(ValueError, match="parallel"):
        cube.spectral_smooth_median(3, num_cores=2, parallel=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cube.spectral_smooth_median(3, num_cores=1, parallel=True)
    assert any("num_cores=1" in str(x.message) for x in rec)


def test_varyres_spectra(tmp_path):
    """reference test_spectral_cube.py:2617-2631."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    sp = cube[:, 0, 0]
    assert isinstance(sp, VaryingResolutionOneDSpectrum)
    assert hasattr(sp, "beams")
    sp = cube.mean(axis=(1, 2))
    assert isinstance(sp, VaryingResolutionOneDSpectrum)
    assert hasattr(sp, "beams")


def test_varyres_mask(tmp_path):
    """reference test_spectral_cube.py:2649-2683: identify/mask-out bad
    beams, with the goodbeams mask propagating through slicing."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    nb = [Beam(Quantity(0.9, "arcsec"), Quantity(0.05, "arcsec"),
               Quantity(0, "deg")),
          cube.beams[1], cube.beams[2],
          Beam(Quantity(0.6, "arcsec"), Quantity(0.09, "arcsec"),
               Quantity(30, "deg"))]
    cube = cube.with_beams(Beams(beams=nb), raise_error_jybm=False)
    goodbeams = cube.identify_bad_beams(0.5)
    assert np.all(goodbeams == np.array([False, True, True, True]))
    mcube = cube.mask_out_bad_beams(0.5)
    assert hasattr(mcube, "_goodbeams_mask")
    assert np.all(mcube.goodbeams_mask == goodbeams)
    assert len(mcube.beams) == 3
    sp_masked = mcube[:, 0, 0]
    assert np.all(sp_masked.goodbeams_mask == goodbeams)
    assert len(sp_masked.beams) == 3
    assert np.all(mcube.unmasked_beams == cube.beams)
    assert np.all(mcube[:3].unmasked_beams == cube[:3].unmasked_beams)


def test_mask_none():
    """reference test_spectral_cube.py:2686-2701."""
    data = np.arange(24).reshape((2, 3, 4)).astype(float)
    w = WCS(naxis=3)
    w.ctype = ["RA---TAN", "DEC--TAN", "VELO-HEL"]
    cube = SpectralCube(Quantity(data, "Jy / beam"), wcs=w)
    np.testing.assert_allclose(np.asarray(cube[0, :, :].value), data[0],
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(cube[:, 0, 0].value),
                               data[:, 0, 0], rtol=1e-7)


def test_mask_channels_preserve_mask(tmp_path):
    """reference test_spectral_cube.py:2705-2726."""
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    mask = np.ones(cube.shape, dtype=bool)
    mask[:, ::2, ::2] = False
    cube = cube.with_mask(mask)
    cube = cube.mask_channels([False, True, False, True])
    expected = mask.copy()
    expected[::2] = False
    np.testing.assert_equal(np.asarray(cube.mask.include()), expected)


def test_minimal_subcube_nomask():
    """reference test_spectral_cube.py:2750-2769."""
    data = np.arange(210, dtype=float).reshape((5, 6, 7))
    w = WCS(naxis=3)
    w.ctype = ["RA---TAN", "DEC--TAN", "VELO-HEL"]
    cube = SpectralCube(Quantity(data, "Jy / beam"), wcs=w)
    assert cube._mask is None
    assert cube.minimal_subcube().shape == (5, 6, 7)


def test_regression_719(tmp_path):
    """reference test_spectral_cube.py:2772-2791 (issue 719)."""
    cube, data = cube_and_raw(tmp_path, "r719.fits")
    cube._unit = u.Unit("Jy / beam")
    assert hasattr(cube, "beam")
    slc = cube[0, :, :]
    from spectral_cube_tpu.cube_utils import _has_beam, _has_beams
    assert _has_beam(slc)
    assert not _has_beams(slc)


# ---------------------------------------------------------------------------
# class-method battery (TestSpectralCube/TestArithmetic/TestFilters/
# TestNumpyMethods/TestSlab)
# ---------------------------------------------------------------------------

_TRANSLIST = [
    ("advs", [], [0, 1, 2, 3]),
    ("dvsa", [[1, 2, 3, 0]], [2, 3, 0, 1]),
    ("sdav", [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 3, 0], [0, 2, 1, 3]],
     [0, 2, 1, 3]),
    ("sadv", [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 3, 0]], [0, 1, 2, 3]),
    ("vsad", [[1, 2, 3, 0], [1, 2, 3, 0]], [3, 0, 1, 2]),
    ("vad3", [[2, 0, 1]], [2, 0, 1]),
    ("vda3", [[2, 0, 1], [2, 1, 0]], [0, 2, 1]),
    ("adv3", [], [0, 1, 2]),
]


@pytest.mark.parametrize(("name", "trs", "trans"), _TRANSLIST)
def test_consistent_transposition(name, trs, trans, tmp_path):
    """reference test_spectral_cube.py:184-189: whatever the on-disk axis
    permutation, the cube orients to (spectral, dec, ra) — filled data
    equals the raw array transposed by the documented translist."""
    if name.endswith("3"):
        d, h = prepare_adv_data()
    else:
        d, h = prepare_advs_data()
    for t in trs:
        d, h = transpose(d, h, t)
    p = str(tmp_path / f"{name}.fits")
    write_fits(p, [HDU(data=d, header=h)])
    cube = SpectralCube.read(p)
    expected = np.squeeze(d.transpose(trans))
    np.testing.assert_allclose(np.asarray(cube._get_filled_data()),
                               expected, rtol=2e-7, equal_nan=True)


def test_world_transposes_3d(tmp_path):
    """reference test_spectral_cube.py:229-237: world coordinates are
    permutation-invariant."""
    cube1, d1 = cube_and_raw(tmp_path, "wt_adv.fits")
    d, h = prepare_adv_data()
    d2, h2 = transpose(d, h, [2, 0, 1])
    p = str(tmp_path / "wt_vad.fits")
    write_fits(p, [HDU(data=d2, header=h2)])
    cube2 = SpectralCube.read(p)
    for view in (np.s_[:, :, :], np.s_[:2, :3, ::2]):
        for w1, w2 in zip(cube1.world[view], cube2.world[view]):
            np.testing.assert_allclose(np.asarray(w1.value),
                                       np.asarray(w2.value), rtol=1e-10)


def test_world_transposes_4d(tmp_path):
    """reference test_spectral_cube.py:241-250 (advs vs sadv)."""
    p1, _ = data_advs(tmp_path, "wt4_advs.fits")
    cube1 = SpectralCube.read(p1)
    d, h = prepare_advs_data()
    for t in ([1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 3, 0]):
        d, h = transpose(d, h, t)
    p2 = str(tmp_path / "wt4_sadv.fits")
    write_fits(p2, [HDU(data=d, header=h)])
    cube2 = SpectralCube.read(p2)
    for view in (np.s_[:, :, :], np.s_[:2, :3, ::2]):
        for w1, w2 in zip(cube1.world[view], cube2.world[view]):
            np.testing.assert_allclose(np.asarray(w1.value),
                                       np.asarray(w2.value), rtol=1e-10)


def test_apply_everywhere_plusminus(tmp_path):
    """reference test_spectral_cube.py:331-345: check_units=False
    operates on raw values and keeps the cube's unit."""
    import operator
    cube, d = cube_and_raw(tmp_path, "aepm.fits")
    for op in (operator.add, operator.sub):
        out = cube._apply_everywhere(op, 0.5, check_units=False)
        assert str(out.unit) == str(cube.unit)
        # f32 subtraction near zero: compare at absolute f32 epsilon
        np.testing.assert_allclose(np.asarray(out.filled_data[:].value),
                                   op(d, 0.5), rtol=2e-6, atol=1e-7)


def test_apply_everywhere_floordivide(tmp_path):
    """reference test_spectral_cube.py:348-354."""
    import operator
    cube, d = cube_and_raw(tmp_path, "aefd.fits")
    with pytest.raises((NotImplementedError, TypeError, ValueError,
                        u.UnitConversionError)):
        out = cube._apply_everywhere(operator.floordiv, Quantity(0.5, "K"))
        raise NotImplementedError("floordiv unexpectedly allowed")


def test_arith_cubes(tmp_path):
    """reference TestArithmetic cube-on-cube methods (:469-570):
    test_add_cubes / test_subtract_cubes / test_mul_cubes /
    test_div_cubes / test_floordiv_cubes / test_floordiv_fails /
    test_cube_add in one battery; floordiv forbidden, pow works."""
    cube, d = cube_and_raw(tmp_path, "ac.fits")
    np.testing.assert_allclose(
        np.asarray((cube + cube).filled_data[:].value), d + d, rtol=2e-7)
    np.testing.assert_allclose(
        np.asarray((cube - cube).filled_data[:].value), d - d, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray((cube * cube).filled_data[:].value), d * d, rtol=2e-7)
    np.testing.assert_allclose(
        np.asarray((cube / cube).filled_data[:].value), d / d, rtol=2e-7)
    with pytest.raises((NotImplementedError, TypeError)):
        cube // cube
    with pytest.raises((NotImplementedError, TypeError)):
        cube // 2
    np.testing.assert_allclose(
        np.asarray((cube ** 2).filled_data[:].value), d ** 2, rtol=2e-7)


def _masked_adv(tmp_path, name):
    cube, d = cube_and_raw(tmp_path, name)
    mask = BooleanArrayMask(d > 0.5, cube._wcs)
    return cube.with_mask(mask, inherit_mask=False), d


def test_mask_data(tmp_path):
    """reference TestFilters.test_mask_data (:574-581)."""
    cube, d = _masked_adv(tmp_path, "md.fits")
    np.testing.assert_allclose(np.asarray(cube._get_filled_data()),
                               np.where(d > 0.5, d, np.nan),
                               rtol=2e-7, equal_nan=True)
    np.testing.assert_allclose(np.asarray(cube._get_filled_data(fill=0)),
                               np.where(d > 0.5, d, 0), rtol=2e-7)


@pytest.mark.parametrize("op_name", ["lt", "gt", "le", "ge"])
def test_mask_comparison(op_name, tmp_path):
    """reference TestFilters.test_mask_comparison (:584-593) /
    TestMasks.test_operator_threshold (:1050-1064)."""
    import operator
    op = getattr(operator, op_name)
    cube, d = _masked_adv(tmp_path, "mc.fits")
    dmask = op(d, 0.6) & np.asarray(cube.mask.include())
    cmask = op(cube, Quantity(0.6, "K"))
    assert (np.asarray(cube.mask.include())
            & np.asarray(cmask.include())).sum() == dmask.sum()
    np.testing.assert_array_equal(
        np.asarray(cube.with_mask(cmask).mask.include()), dmask)
    np.testing.assert_allclose(float(cube.with_mask(cmask).sum().value),
                               d[dmask].sum(), rtol=1e-6)


def test_flatten_weights(tmp_path):
    """reference TestFilters.test_flatten_weights (:600-604)."""
    cube, d = _masked_adv(tmp_path, "fw.fits")
    np.testing.assert_allclose(
        np.sort(np.asarray(cube.flattened(weights=d).value)),
        np.sort(d[d > 0.5] ** 2), rtol=2e-7)


def test_bad_median_apply(tmp_path):
    """reference TestNumpyMethods.test_bad_median_apply (:685-704): raw
    np.median through apply_numpy_function sees the NaN fill; nanmedian
    doesn't; an aggressive mask leaves exactly one all-NaN spaxel."""
    cube, d = _masked_adv(tmp_path, "bma.fits")
    scmed = np.asarray(cube.apply_numpy_function(np.median, axis=0))
    assert np.count_nonzero(np.isnan(scmed)) == 6
    scmed = np.asarray(cube.apply_numpy_function(np.nanmedian, axis=0))
    assert np.count_nonzero(np.isnan(scmed)) == 0
    m2 = cube > Quantity(0.74, cube.unit)
    scmed = np.asarray(cube.with_mask(m2)
                       .apply_numpy_function(np.nanmedian, axis=0))
    assert np.count_nonzero(np.isnan(scmed)) == 1


def test_bad_median(tmp_path):
    """reference TestNumpyMethods.test_bad_median (:706-729)."""
    cube, d = _masked_adv(tmp_path, "bm.fits")
    assert np.count_nonzero(
        np.isnan(np.asarray(cube.median(axis=0).value))) == 0
    m2 = cube > Quantity(0.74, cube.unit)
    assert np.count_nonzero(np.isnan(np.asarray(
        cube.with_mask(m2).median(axis=0).value))) == 1


def test_arg_world(tmp_path):
    """reference TestNumpyMethods.test_arg_world (:795-807)."""
    cube, d = cube_and_raw(tmp_path, "aw.fits")
    for method in ("argmax_world", "argmin_world"):
        arg0 = np.asarray(getattr(cube, method.split("_")[0])(axis=0)) \
            .astype(int)
        sv = np.asarray(cube.spectral_axis.value)
        expected = np.take_along_axis(sv[:, None, None], arg0[None],
                                      axis=0).squeeze()
        np.testing.assert_allclose(
            np.asarray(getattr(cube, method)(axis=0).value), expected,
            rtol=1e-6)


def test_transpose_arg_world(tmp_path):
    """reference TestNumpyMethods.test_transpose_arg_world (:769-793):
    spectral-axis arg-world is permutation-invariant; celestial axes
    raise (pixel axes correlated to the sky)."""
    from spectral_cube_tpu.utils import WCSCelestialError
    cube1, d1 = cube_and_raw(tmp_path, "taw.fits")
    d, h = prepare_adv_data()
    d2, h2 = transpose(d, h, [2, 0, 1])
    p = str(tmp_path / "taw_vad.fits")
    write_fits(p, [HDU(data=d2, header=h2)])
    cube2 = SpectralCube.read(p)
    for method in ("argmax_world", "argmin_world"):
        np.testing.assert_allclose(
            np.asarray(getattr(cube1, method)(axis=0).value),
            np.asarray(getattr(cube2, method)(axis=0).value), rtol=1e-6)
        for axis in (1, 2):
            with pytest.raises(WCSCelestialError):
                getattr(cube1, method)(axis=axis)


def test_spectral_channel_bad_units(tmp_path):
    """reference TestSlab.test_spectral_channel_bad_units (:822-831)."""
    cube, d = _masked_adv(tmp_path, "scb.fits")
    with pytest.raises((u.UnitConversionError, u.UnitsError, ValueError)):
        cube.closest_spectral_channel(Quantity(1.0, "K"))


def test_slab_preserves_wcs(tmp_path):
    """reference TestSlab.test_slab_preserves_wcs (:848-855): taking a
    slab must not mutate the source cube's WCS."""
    cube, d = _masked_adv(tmp_path, "spw.fits")
    crpix_before = list(cube.wcs.crpix)
    cube.spectral_slab(Quantity(-320000, "m/s"), Quantity(-318600, "m/s"))
    assert list(cube.wcs.crpix) == crpix_before


def test_getitem_vrsc(tmp_path):
    """reference TestSpectralCube.test_getitem_vrsc (:401-437): the VRSC
    orients like the plain cube and beams slice in lockstep."""
    p, d = data_vda_beams(tmp_path, "gv.fits")
    cube = SpectralCube.read(p)
    expected = np.squeeze(d.transpose([0, 2, 1]))
    np.testing.assert_allclose(np.asarray(cube._get_filled_data()),
                               expected, rtol=2e-7, equal_nan=True)
    assert len(cube[1:3].beams) == 2


def test_arg_rays(tmp_path):
    """reference TestNumpyMethods.test_arg_rays (:652-661): argmax/argmin
    return integer dtype."""
    cube, d = cube_and_raw(tmp_path, "ar.fits")
    assert "int" in str(np.asarray(cube.argmax(axis=0)).dtype)
    assert "int" in str(np.asarray(cube.argmin(axis=0)).dtype)
