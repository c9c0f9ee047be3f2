"""Replay of the reference test suite's hard-coded expected values.

The reference's fixtures are deterministic (np.random.seed in its
conftest), so its tests' literal expected arrays transfer verbatim: every
number asserted here is copy-typed from
/root/reference/spectral_cube/tests/test_spectral_cube.py or
test_moments.py, and the cubes are rebuilt byte-identically by
tests/ref_fixtures.py.  Agreement pins this package's semantics (kernel
discretization, NaN treatment, moment coordinates, mad_std definition)
to the reference's own published numbers rather than to self-consistency.
"""

import numpy as np
import pytest

from ref_fixtures import cube_and_raw, jybeam_header, prepare_adv_data

from spectral_cube_tpu import SpectralCube
from spectral_cube_tpu.convolution import Gaussian2DKernel, Tophat2DKernel
from spectral_cube_tpu.io.fits_low import Header, HDU, write_fits
from spectral_cube_tpu.units import Quantity, Unit


# ----------------------------------------------------------------------
# test_spectral_cube.py replays (data_adv, seed 96)
# ----------------------------------------------------------------------

def test_mad_std_ref_values(tmp_path):
    """reference test_spectral_cube.py:2246-2268."""
    cube, data = cube_and_raw(tmp_path)
    result = np.array([[0.3099842, 0.2576232],
                       [0.1822292, 0.6101782],
                       [0.2819404, 0.2084236]])
    np.testing.assert_almost_equal(np.asarray(cube.mad_std(axis=0).value),
                                   result)
    # masked variant gives the same numbers (mask excludes nothing < .98)
    mcube = cube.with_mask(cube < Quantity(0.98, "K"))
    np.testing.assert_almost_equal(np.asarray(mcube.mad_std(axis=0).value),
                                   result)


def test_mad_std_nan_ref_values(tmp_path):
    """reference test_spectral_cube.py:2271-2312: NaN voxels are ignored
    and the auto NaN-mask counts 23 valid voxels."""
    d, h = prepare_adv_data()
    d[1, 1, 0] = np.nan
    path = str(tmp_path / "adv_nan.fits")
    write_fits(path, [HDU(data=d, header=h)])
    cube = SpectralCube.read(path)
    result = np.array([[0.30998422, 0.25762317],
                       [0.24100427, 0.6101782],
                       [0.28194039, 0.20842358]])
    assert int(np.asarray(cube.mask.include()).sum()) == 23
    np.testing.assert_almost_equal(np.asarray(cube.mad_std(axis=0).value),
                                   result)


def test_mad_std_params_ref(tmp_path):
    """reference test_spectral_cube.py:2315-2342: other axes + how= run."""
    cube, data = cube_and_raw(tmp_path)
    result = np.array([[0.3099842, 0.2576232],
                       [0.1822292, 0.6101782],
                       [0.2819404, 0.2084236]])
    np.testing.assert_almost_equal(
        np.asarray(cube.mad_std(axis=0, how="cube").value), result)
    cube.mad_std(axis=1)
    cube.mad_std(axis=(1, 2))


def test_spatial_smooth_g2d_ref_values(tmp_path):
    """reference test_spectral_cube.py:2363-2384 (Gaussian2DKernel(3))."""
    cube, data = cube_and_raw(tmp_path)
    cube_g2d = cube.spatial_smooth(Gaussian2DKernel(3))
    result0 = np.array([[0.0585795, 0.0588712],
                        [0.0612525, 0.0614312],
                        [0.0576757, 0.057723]])
    np.testing.assert_almost_equal(np.asarray(cube_g2d[0].value), result0)
    result2 = np.array([[0.027322, 0.027257],
                        [0.0280423, 0.02803],
                        [0.0259688, 0.0260123]])
    np.testing.assert_almost_equal(np.asarray(cube_g2d[2].value), result2)
    # issue527 regression: smoothing preserves the unit
    assert cube_g2d.unit == cube.unit


def test_spatial_smooth_t2d_ref_values(tmp_path):
    """reference test_spectral_cube.py:2401-2424 (Tophat2DKernel(3))."""
    cube, data = cube_and_raw(tmp_path)
    cube_t2d = cube.spatial_smooth(Tophat2DKernel(3))
    result0 = np.array([[0.1265607, 0.1265607],
                        [0.1265607, 0.1265607],
                        [0.1265607, 0.1265607]])
    np.testing.assert_almost_equal(np.asarray(cube_t2d[0].value), result0)
    result2 = np.array([[0.0585135, 0.0585135],
                        [0.0585135, 0.0585135],
                        [0.0585135, 0.0585135]])
    np.testing.assert_almost_equal(np.asarray(cube_t2d[2].value), result2)


def test_spatial_maxfilter_ref_values(tmp_path):
    """reference test_spectral_cube.py:2472-2488."""
    from scipy import ndimage
    cube, data = cube_and_raw(tmp_path)
    out = cube.spatial_filter([3, 3], filter=ndimage.maximum_filter)
    result = np.array([[0.90950237, 0.90950237],
                       [0.90950237, 0.90950237],
                       [0.90388047, 0.90388047]])
    np.testing.assert_almost_equal(np.asarray(out[0, :, :].value), result)


def test_spectral_maxfilter_ref_values(tmp_path):
    """reference test_spectral_cube.py:2491-2505."""
    from scipy import ndimage
    cube, data = cube_and_raw(tmp_path)
    out = cube.spectral_filter(3, filter=ndimage.maximum_filter)
    result = np.array([0.90388047, 0.90388047, 0.96629004, 0.96629004])
    np.testing.assert_almost_equal(np.asarray(out[:, 1, 1].value), result)


def test_spectral_smooth_median_ref_values(tmp_path):
    """reference test_spectral_cube.py:2508-2521."""
    cube, data = cube_and_raw(tmp_path)
    out = cube.spectral_smooth_median(3)
    result = np.array([0.9038805, 0.1431722, 0.1431722, 0.96629])
    np.testing.assert_almost_equal(np.asarray(out[:, 1, 1].value), result)


def test_unitless_comparison_ref(tmp_path):
    """reference test_spectral_cube.py:2802-2812 (issue 819): a
    dimensionless cube compares against bare numbers."""
    cube, data = cube_and_raw(tmp_path)
    cube._unit = Quantity(1.0, "").unit
    cube > 1  # must not raise


# ----------------------------------------------------------------------
# test_moments.py "back of the book" replays (arange(27) cube)
# ----------------------------------------------------------------------

def moment_cube_path(tmp_path):
    """reference test_moments.py:58-70 moment_cube."""
    h = Header()
    h["SIMPLE"] = True
    h["BITPIX"] = -64
    h["NAXIS"] = 3
    h["NAXIS1"] = 3
    h["NAXIS2"] = 3
    h["NAXIS3"] = 3
    for i, (ctype, cunit, cdelt, crval) in enumerate([
            ("RA---TAN", "deg", -1e-5, 0.0),
            ("DEC--TAN", "deg", 2e-5, 1e-3),
            ("VELO", "km/s", 3e-5, 2e-3)], start=1):
        h[f"CTYPE{i}"] = ctype
        h[f"CUNIT{i}"] = cunit
        h[f"CDELT{i}"] = cdelt
        h[f"CRVAL{i}"] = crval
        h[f"CRPIX{i}"] = 1.0
    h["BUNIT"] = "K"
    data = np.arange(27, dtype=float).reshape(3, 3, 3)
    path = str(tmp_path / "moment_cube.fits")
    write_fits(path, [HDU(data=data, header=h)])
    return path


# the reference's "back of the book" tables (test_moments.py:14-49), in
# units of dv = 3e-2 m/s, dy = 2e-5 deg, dx = 1e-5 deg
_DV, _DY, _DX = 3e-2, 2e-5, 1e-5
_M0 = [np.array([[27, 30, 33], [36, 39, 42], [45, 48, 51]]) * _DV,
       np.array([[9, 12, 15], [36, 39, 42], [63, 66, 69]]) * _DY,
       np.array([[3, 12, 21], [30, 39, 48], [57, 66, 75]]) * _DX]
_M1 = [np.array([[1.66666667, 1.6, 1.54545455],
                 [1.5, 1.46153846, 1.42857143],
                 [1.4, 1.375, 1.35294118]]) * _DV + 2.0,
       np.array([[1.66666667, 1.5, 1.4],
                 [1.16666667, 1.15384615, 1.14285714],
                 [1.0952381, 1.09090909, 1.08695652]]) * _DY,
       np.array([[1.66666667, 1.16666667, 1.0952381],
                 [1.06666667, 1.05128205, 1.04166667],
                 [1.03508772, 1.03030303, 1.02666667]]) * _DX]
_M2 = [np.array([[0.22222222, 0.30666667, 0.36914601],
                 [0.41666667, 0.45364892, 0.4829932],
                 [0.50666667, 0.52604167, 0.54209919]]) * _DV ** 2,
       np.array([[0.22222222, 0.41666667, 0.50666667],
                 [0.63888889, 0.64299803, 0.6462585],
                 [0.65759637, 0.6584022, 0.65910523]]) * _DY ** 2,
       np.array([[0.22222222, 0.63888889, 0.65759637],
                 [0.66222222, 0.66403682, 0.66493056],
                 [0.66543552, 0.66574839, 0.66595556]]) * _DX ** 2]
_BOOK = {0: _M0, 1: _M1, 2: _M2}
# expected units: spectral moments in m/s powers, spatial in deg powers
_BOOK_UNIT = {(0, 0): "K m / s", (1, 0): "m / s", (2, 0): "m2 / s2",
              (0, 1): "K deg", (1, 1): "deg", (2, 1): "deg2",
              (0, 2): "K deg", (1, 2): "deg", (2, 2): "deg2"}


@pytest.mark.parametrize("order", [0, 1, 2])
@pytest.mark.parametrize("axis", [0, 1, 2])
def test_moments_book_values(tmp_path, order, axis):
    """reference test_moments.py:98-120 test_reference: every (order,
    axis) moment matches the hand-computed table at rtol 2e-7 (the
    reference's own tolerance, loosened to 1e-5 for spatial f32 trig)."""
    import warnings
    sc = SpectralCube.read(moment_cube_path(tmp_path))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mom = sc.moment(order=order, axis=axis)
    expected = _BOOK[order][axis]
    got = mom.to(_BOOK_UNIT[(order, axis)])
    rtol = 2e-7 if axis == 0 else 1e-5
    np.testing.assert_allclose(np.asarray(got.value), expected, rtol=rtol,
                               atol=1e-30)


def test_regions_spectral_range(tmp_path):
    """reference test_subcubes.py:160-206 test_regions_spectral: a region
    meta['range'] selects a spectral slab, and veltype GAMMA/BETA/Z
    ranges (converted through the matching doppler convention) select the
    same channels as the plain velocity range."""
    from spectral_cube_tpu.region import Region
    from spectral_cube_tpu.units import (doppler_optical, doppler_z,
                                         doppler_beta, doppler_gamma,
                                         spectral)
    from spectral_cube_tpu.wcs.spectral import _rest_freq_si

    cube, data = cube_and_raw(tmp_path)
    rf = Quantity(_rest_freq_si(cube._wcs), "Hz").to(
        "GHz", equivalencies=spectral())

    def box(**meta):
        return Region("box", "image", [0.5, 1.0, 2.0, 1.0], meta=meta)

    vel_range = [Quantity(-318.0, "km/s"), Quantity(-320.0, "km/s")]
    sc1 = cube.subcube_from_regions([box(range=vel_range)])
    dsum = np.nansum(data[1:-1, 1, :])
    np.testing.assert_allclose(float(sc1.sum().value), dsum, rtol=1e-7)

    # the same range expressed as frequencies (cube is VOPT)
    freq_range = [v.to("GHz", equivalencies=doppler_optical(rf))
                  for v in vel_range]
    sc2 = cube.subcube_from_regions([box(range=freq_range)])
    np.testing.assert_allclose(float(sc2.sum().value), dsum, rtol=1e-7)

    # and as GAMMA / BETA / Z velocities with the veltype declared
    for veltype, conv in [("GAMMA", doppler_gamma), ("BETA", doppler_beta),
                          ("Z", doppler_z)]:
        rng = [f.to("km/s", equivalencies=conv(rf)) for f in freq_range]
        sc = cube.subcube_from_regions(
            [box(range=rng, veltype=veltype, restfreq=rf)])
        np.testing.assert_allclose(float(sc.sum().value), dsum, rtol=1e-7)

    # unsupported veltype raises like the reference
    with pytest.raises(ValueError):
        cube.subcube_from_regions(
            [box(range=vel_range, veltype="BOGUS")])


def test_mask_spectral_unit_ref(tmp_path):
    """reference test_masks.py:237-251 + :296-325: masks carrying a WCS
    convert their spectral axis; the VOPT->Hz crval matches the
    header-derived value; FunctionMask copies; composites delegate."""
    from spectral_cube_tpu import (BooleanArrayMask, FunctionMask, LazyMask,
                                   CompositeMask)
    cube, data = cube_and_raw(tmp_path)
    mask = BooleanArrayMask(data > 0, cube._wcs)
    mf = mask.with_spectral_unit("Hz")
    assert mf._wcs.ctype[2] == "FREQ-W2F"
    rest = 1.42040571841e9
    c = 299792458.0
    outcv = c / (c / rest * (1 + (-321214.698632) / c))
    np.testing.assert_allclose(mf._wcs.crval[2], outcv, rtol=1e-12)
    m2 = LazyMask(lambda x: x > 0, cube=cube)
    assert m2.with_spectral_unit("Hz")._wcs.ctype[2] == "FREQ-W2F"
    m1 = FunctionMask(lambda x: x > 0)
    m1.with_spectral_unit("Hz")
    comp = CompositeMask(m1, m2).with_spectral_unit("Hz")
    assert comp._mask2._wcs.ctype[2] == "FREQ-W2F"


def test_wcs_validity_check_failure_ref(tmp_path):
    """reference test_masks.py:263-295: a 5th-decimal crval difference
    raises ValueError("WCS does not match mask WCS"); wcs_tolerance=1e-4
    accepts it and the downstream slab/convert/moment flow works."""
    import copy
    from spectral_cube_tpu import BooleanArrayMask
    cube, data = cube_and_raw(tmp_path)
    wcs2 = copy.deepcopy(cube._wcs)
    wcs2.crval[2] += 0.00001
    mask = BooleanArrayMask(data > 0, wcs2)
    with pytest.raises(ValueError, match="WCS does not match mask WCS"):
        cube.with_mask(mask)
    c2 = cube.with_mask(mask, wcs_tolerance=1e-4)
    assert c2._wcs_tolerance == 1e-4
    s2 = c2.spectral_slab(Quantity(-2, "km/s"), Quantity(2, "km/s"))
    s3 = s2.with_spectral_unit("km/s", velocity_convention="radio")
    s3.moment(order=1)


def test_boolean_array_composite_mask_ref(tmp_path):
    """reference test_masks.py:569-583: composing a lazy mask with a
    plain 2-D bool array broadcasts, and the masked sum lands in the
    reference's (9.0, 9.1) K window."""
    cube, data = cube_and_raw(tmp_path)
    med = cube.median()
    arrmask = np.asarray(cube.max(axis=0).value) > float(med.value)
    mcube = cube.with_mask((cube > med) & arrmask)
    s = float(mcube.sum().value)
    assert 9.0 < s < 9.1
    # reflected composition works too
    mcube2 = cube.with_mask(arrmask & (cube > med))
    np.testing.assert_allclose(float(mcube2.sum().value), s, rtol=1e-7)


def test_numpy_ma_tools_ref(tmp_path):
    """reference test_masks.py:520-548: np.ma.is_masked/getmask work on
    masked cubes and their 1-D/2-D slices."""
    cube, data = cube_and_raw(tmp_path)
    mcube = cube.with_mask(cube > cube.median())
    assert np.ma.core.is_masked(mcube)
    assert np.ma.core.getmask(mcube) is not None
    assert np.ma.core.is_masked(mcube[:, 0, 0])
    assert np.ma.core.is_masked(mcube[0, :, :])


def test_filled_ref(tmp_path):
    """reference test_masks.py:551-566: filled() equals filled(nan) and
    NaN positions equal the exclusion mask."""
    cube, data = cube_and_raw(tmp_path)
    mcube = cube.with_mask(cube > cube.median())
    assert np.isnan(mcube._fill_value)
    f1 = np.asarray(mcube.filled(np.nan))
    f2 = np.asarray(mcube.filled())
    np.testing.assert_allclose(f1, f2, equal_nan=True)
    assert (np.isnan(f1) == np.asarray(mcube.mask.exclude())).all()


def _delta_cube_255(tmp_path, nchan=2, beams=None):
    """reference conftest prepare_255_header + data_255_delta: the
    header_jybeam WCS in K units, a delta function at the center of a
    5x5 plane in channel 0 (or every channel for the beams variant)."""
    h = jybeam_header()
    for k in [k for k in h.keys() if k.endswith("4")]:
        del h[k]
    h["NAXIS"] = 3
    h["NAXIS1"] = 5
    h["NAXIS2"] = 5
    h["NAXIS3"] = nchan
    h["BUNIT"] = "K"
    d = np.zeros((nchan, 5, 5))
    if beams is None:
        d[0, 2, 2] = 1.0
        hdus = [HDU(data=d, header=h)]
    else:
        d[:, 2, 2] = 1.0
        del h["BMAJ"], h["BMIN"], h["BPA"]
        h["CASAMBM"] = True
        hdus = [HDU(data=d, header=h), beams]
    path = str(tmp_path / "delta255.fits")
    write_fits(path, hdus)
    return SpectralCube.read(path)


def test_convolution_ref_values(tmp_path):
    """reference test_regrid.py:33-57 test_convolution: convolving the
    1" delta cube to 1.8027756" produces exactly the normalized 5x5
    Gaussian2DKernel of the 1.5" deconvolved beam, and the empty channel
    stays all zero."""
    from spectral_cube_tpu.beams import Beam, SIGMA_TO_FWHM
    cube = _delta_cube_255(tmp_path)
    target = Beam(Quantity(1.802775637731995, "arcsec"),
                  Quantity(1.802775637731995, "arcsec"), Quantity(0, "deg"))
    conv = cube.convolve_to(target)
    sigma_pix = (1.5 / SIGMA_TO_FWHM) / (5.555555561268e-4 * 3600)
    expected = Gaussian2DKernel(sigma_pix, x_size=5, y_size=5)
    np.testing.assert_almost_equal(np.asarray(conv.filled_data[0].value),
                                   expected.array)
    assert np.all(np.asarray(conv.filled_data[1].value) == 0.0)


def test_beams_convolution_ref_values(tmp_path):
    """reference test_regrid.py:60-79 test_beams_convolution: each
    channel of a 4-beam VR delta cube convolves to the target beam's
    per-channel deconvolved kernel."""
    from spectral_cube_tpu.beams import Beam, Beams, beams_to_bintable
    majors = [0.4, 0.3, 0.3, 0.4]
    minors = [0.1, 0.2, 0.2, 0.1]
    pas = [0, 45, 60, 30]
    blist = [Beam(Quantity(a, "arcsec"), Quantity(b, "arcsec"),
                  Quantity(p, "deg"))
             for a, b, p in zip(majors, minors, pas)]
    bt = beams_to_bintable(Beams(beams=blist))
    cube = _delta_cube_255(tmp_path, nchan=4, beams=bt)
    target = Beam(Quantity(1.802775637731995, "arcsec"),
                  Quantity(1.802775637731995, "arcsec"), Quantity(0, "deg"))
    conv = cube.convolve_to(target)
    pixscale = Quantity(5.555555561268e-4, "deg")
    for ii, bm in enumerate(blist):
        expected = target.deconvolve(bm).as_kernel(pixscale, x_size=5,
                                                   y_size=5)
        expected = np.asarray(expected) / np.asarray(expected).sum()
        np.testing.assert_almost_equal(
            np.asarray(conv.filled_data[ii].value), expected)


@pytest.mark.parametrize("order", [0, 1, 2])
@pytest.mark.parametrize("axis", [0, 1, 2])
def test_strategies_consistent(tmp_path, order, axis):
    """reference test_moments.py:82-93: every how= strategy returns the
    same moments (one fused kernel here — the strategies are aliases)."""
    import warnings as _w
    sc = SpectralCube.read(moment_cube_path(tmp_path))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        ms = [np.asarray(sc.moment(axis=axis, order=order, how=h).value)
              for h in ("cube", "slice", "ray", "auto")]
    for m in ms[1:]:
        np.testing.assert_allclose(ms[0], m, rtol=2e-7, atol=1e-30)


@pytest.mark.parametrize("order", [0, 1, 2])
@pytest.mark.parametrize("axis", [0, 1, 2])
def test_consistent_mask_handling(tmp_path, order, axis):
    """reference test_moments.py:106-116: masked moments agree across
    strategies."""
    import warnings as _w
    sc0 = SpectralCube.read(moment_cube_path(tmp_path))
    sc = sc0.with_mask(sc0 > Quantity(4, "K"))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        ms = [np.asarray(sc.moment(axis=axis, order=order, how=h).value)
              for h in ("cube", "slice", "ray")]
    for m in ms[1:]:
        np.testing.assert_allclose(ms[0], m, rtol=2e-7, atol=1e-30,
                                   equal_nan=True)


def test_convenience_methods(tmp_path):
    """reference test_moments.py:118-125: moment0/1/2 against the book."""
    import warnings as _w
    sc = SpectralCube.read(moment_cube_path(tmp_path))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        np.testing.assert_allclose(
            np.asarray(sc.moment0(axis=0).to(_BOOK_UNIT[(0, 0)]).value),
            _BOOK[0][0], rtol=2e-7)
        np.testing.assert_allclose(
            np.asarray(sc.moment1(axis=2).to(_BOOK_UNIT[(1, 2)]).value),
            _BOOK[1][2], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sc.moment2(axis=1).to(_BOOK_UNIT[(2, 1)]).value),
            _BOOK[2][1], rtol=1e-5)


def test_preserve_unit(tmp_path):
    """reference test_moments.py:148-157: moments after
    with_spectral_unit(km/s) come out in km/s."""
    sc = SpectralCube.read(moment_cube_path(tmp_path)) \
        .with_spectral_unit(Unit.parse("km/s"))
    m0 = sc.moment0(axis=0)
    m1 = sc.moment1(axis=0)
    np.testing.assert_allclose(np.asarray(m0.to("K km / s").value),
                               _BOOK[0][0] / 1e3, rtol=2e-7)
    np.testing.assert_allclose(np.asarray(m1.to("km / s").value),
                               _BOOK[1][0] / 1e3, rtol=2e-7)
    assert str(m1.unit) == "km / s"


def test_with_flux_unit(tmp_path):
    """reference test_moments.py:159-179 (+ test_how_withfluxunit): flux
    units survive the spectral-unit change and the moment."""
    sc = SpectralCube.read(moment_cube_path(tmp_path))
    sc._unit = Unit.parse("K")
    sck = sc.with_spectral_unit(Unit.parse("km/s"))
    assert str(sc.filled_data[:].unit) == "K"
    m0 = sck.moment0(axis=0)
    np.testing.assert_allclose(np.asarray(m0.to("K km / s").value),
                               _BOOK[0][0] / 1e3, rtol=2e-7)


def test_subcube_reference_world_values(tmp_path):
    """reference test_subcubes.py:25-95 test_subcube, replayed with its
    literal world coordinates: wcslib maps 24.06269/24.06206 deg (RA),
    29.93464/29.93522 deg (Dec) and -320/-319 km/s onto the same pixel
    ranges as the integer bounds on the data_advs fixture
    (header_jybeam.hdr RA---SIN/DEC--SIN + VOPT).  This pins the celestial
    pixel<->world solver to numbers that originate in the reference
    ecosystem, not in this repo's oracle generator."""
    from ref_fixtures import data_advs

    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    deg = Unit.parse("deg")
    kms = Unit.parse("km/s")

    sc1x = cube.subcube(xlo=1, xhi=3)
    sc2x = cube.subcube(xlo=Quantity(24.06269, deg),
                        xhi=Quantity(24.06206, deg))
    sc2b = cube.subcube(xlo=Quantity(24.06206, deg),
                        xhi=Quantity(24.06269, deg))
    sc3x = cube.subcube(xlo=Quantity(24.06269, deg), xhi=3)
    sc4x = cube.subcube(xlo=1, xhi=Quantity(24.06206, deg))
    for sc in (sc1x, sc2x, sc2b, sc3x, sc4x):
        assert sc.shape == (2, 3, 2)
        assert sc._wcs == sc1x._wcs

    sc1y = cube.subcube(ylo=1, yhi=3)
    sc2y = cube.subcube(ylo=Quantity(29.93464, deg),
                        yhi=Quantity(29.93522, deg))
    sc3y = cube.subcube(ylo=1, yhi=Quantity(29.93522, deg))
    sc4y = cube.subcube(ylo=Quantity(29.93464, deg), yhi=3)
    for sc in (sc1y, sc2y, sc3y, sc4y):
        assert sc.shape == (2, 2, 4)
        assert sc._wcs == sc1y._wcs

    sc1xy = cube.subcube(xlo=1, xhi=3, ylo=1, yhi=3)
    sc2xy = cube.subcube(xlo=Quantity(24.06269, deg), xhi=3,
                         ylo=1, yhi=Quantity(29.93522, deg))
    sc3xy = cube.subcube(xlo=1, xhi=Quantity(24.06206, deg),
                         ylo=Quantity(29.93464, deg), yhi=3)
    for sc in (sc1xy, sc2xy, sc3xy):
        assert sc.shape == (2, 2, 2)
        assert sc._wcs == sc1xy._wcs

    sc1z = cube.subcube(zlo=1, zhi=2)
    sc2z = cube.subcube(zlo=Quantity(-320, kms), zhi=Quantity(-319, kms))
    sc3z = cube.subcube(zlo=1, zhi=Quantity(-319, kms))
    sc4z = cube.subcube(zlo=Quantity(-320, kms), zhi=2)
    for sc in (sc1z, sc2z, sc3z, sc4z):
        assert sc.shape == (1, 3, 4)
        assert sc._wcs == sc1z._wcs

    sc5 = cube.subcube()
    assert sc5.shape == cube.shape
    assert sc5._wcs == cube._wcs
    np.testing.assert_array_equal(
        np.asarray(sc5.unmasked_data[:].value),
        np.asarray(cube.unmasked_data[:].value))
