import numpy as np
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu.units import Quantity, Unit
from spectral_cube_tpu.wcs import (WCS, convert_spectral_axis,
                                   determine_ctype_from_vconv,
                                   determine_vconv_from_ctype,
                                   air_to_vac, vac_to_air)

from conftest import base_header

C_KMS = 299792.458


@pytest.fixture
def wcs3d():
    return WCS(header=base_header(nx=8, ny=6, nchan=4, ctype3="FREQ",
                                  cunit3="Hz", crval3=1.37835e9,
                                  cdelt3=9.765e4))


def test_axis_classification(wcs3d):
    assert wcs3d.lon_axis == 0
    assert wcs3d.lat_axis == 1
    assert wcs3d.spec == 2
    assert wcs3d.has_celestial
    assert wcs3d.projection_code == "SIN"


@pytest.mark.parametrize("proj", ["TAN", "SIN", "ARC", "STG", "ZEA", "CAR",
                                  "SFL", "AIT"])
def test_projection_roundtrip(proj, wcs3d):
    w = wcs3d.deepcopy()
    w.ctype[0] = f"RA---{proj}"
    w.ctype[1] = f"DEC--{proj}"
    px = np.array([0.0, 3.0, 7.0])
    py = np.array([0.0, 2.0, 5.0])
    pz = np.array([0.0, 1.0, 3.0])
    wx, wy, wz = w.pix2world(px, py, pz)
    bx, by, bz = w.world2pix(wx, wy, wz)
    assert np.allclose(bx, px, atol=1e-7)
    assert np.allclose(by, py, atol=1e-7)
    assert np.allclose(bz, pz, atol=1e-7)


def test_crval_at_crpix(wcs3d):
    wx, wy, wz = wcs3d.pix2world(np.array([1.0]), np.array([1.0]),
                                 np.array([0.0]))
    assert wx[0] == pytest.approx(23.1837, abs=1e-10)
    assert wy[0] == pytest.approx(30.5765, abs=1e-10)
    assert wz[0] == pytest.approx(1.37835e9, abs=1e-3)


def test_galactic_car():
    h = base_header(nchan=4, ctype3="FREQ", cunit3="Hz", crval3=1.4e9,
                    cdelt3=1e5)
    h["CTYPE1"] = "GLON-CAR"
    h["CRVAL1"] = 30.0
    h["CTYPE2"] = "GLAT-CAR"
    h["CRVAL2"] = 0.0
    w = WCS(header=h)
    px = np.array([0.0, 1.0])
    py = np.array([0.0, 2.0])
    pz = np.array([0.0, 0.0])
    wx, wy, _ = w.pix2world(px, py, pz)
    bx, by, _ = w.world2pix(wx, wy, np.array([1.4e9, 1.4e9]))
    assert np.allclose(bx, px, atol=1e-8)
    assert np.allclose(by, py, atol=1e-8)


def test_slice_step_and_offset(wcs3d):
    # numpy view order: (spec, lat, lon)
    ws = wcs3d.slice((slice(1, None), slice(None), slice(2, None)),
                     shape=(4, 6, 8))
    assert ws.crpix[2] == wcs3d.crpix[2] - 1
    assert ws.crpix[0] == wcs3d.crpix[0] - 2
    # step slicing matches the reference's half-pixel-aware formula
    w2 = wcs3d.slice((slice(0, None, 2), slice(None), slice(None)),
                     shape=(4, 6, 8))
    assert w2.cdelt[2] == pytest.approx(wcs3d.cdelt[2] * 2)
    expected_crp = (wcs3d.crpix[2] - 0 - 0.5) / 2 + 0.5
    assert w2.crpix[2] == pytest.approx(expected_crp)


def test_slice_reverse(wcs3d):
    wr = wcs3d.slice((slice(None, None, -1), slice(None), slice(None)),
                     shape=(4, 6, 8))
    sv = wcs3d.spectral_axis_values(4)
    svr = wr.spectral_axis_values(4)
    assert np.allclose(svr, sv[::-1])


def test_dropaxis_swap_reindex(wcs3d):
    w2 = wcs3d.dropaxis(2)
    assert w2.naxis == 2 and w2.spec == -1
    ws = wcs3d.swapaxes(0, 2)
    assert ws.spec == 0 and ws.lon_axis == 2
    cel = wcs3d.celestial
    assert cel.naxis == 2 and cel.has_celestial


def test_check_equality(wcs3d):
    assert wcs3d.check_equality(wcs3d.deepcopy())
    w2 = wcs3d.deepcopy()
    w2.crval[0] += 1e-3
    assert not wcs3d.check_equality(w2)
    assert wcs3d.check_equality(w2, wcs_tolerance=1.0)


def test_header_roundtrip(wcs3d):
    h = wcs3d.to_header()
    w2 = WCS(header=h)
    assert wcs3d.check_equality(w2, wcs_tolerance=1e-12)


# ---------------------------------------------------------------------------
# spectral conversions (reference test_spectral_axis.py semantics)
# ---------------------------------------------------------------------------
def test_determine_ctype():
    assert determine_ctype_from_vconv("FREQ", Unit.parse("km / s"),
                                      "radio") == "VRAD"
    assert determine_ctype_from_vconv("FREQ", Unit.parse("km / s"),
                                      "optical") == "VOPT-F2W"
    assert determine_ctype_from_vconv("FREQ", Unit.parse("km / s"),
                                      "relativistic") == "VELO-F2V"
    assert determine_ctype_from_vconv("VELO-F2V", Unit.parse("Hz")) == "FREQ"
    assert determine_ctype_from_vconv("VELO-F2V", Unit.parse("m")) == \
        "WAVE-F2W"
    assert determine_ctype_from_vconv("FREQ", Unit.parse("m")) == "WAVE-F2W"


def test_determine_vconv():
    assert determine_vconv_from_ctype("VRAD") == "radio"
    assert determine_vconv_from_ctype("VOPT-F2W") == "optical"
    assert determine_vconv_from_ctype("VELO-F2V") == "relativistic"


def test_freq_to_vrad_and_back(wcs3d):
    f0 = 1.42040571841e9
    w2 = convert_spectral_axis(wcs3d, Unit.parse("km / s"), "VRAD")
    vexp = C_KMS * (f0 - 1.37835e9) / f0
    assert w2.crval[2] == pytest.approx(vexp, rel=1e-12)
    assert w2.cdelt[2] == pytest.approx(-C_KMS * 9.765e4 / f0, rel=1e-12)
    w3 = convert_spectral_axis(w2, Unit.parse("Hz"), "FREQ")
    assert w3.crval[2] == pytest.approx(1.37835e9, rel=1e-12)
    assert w3.cdelt[2] == pytest.approx(9.765e4, rel=1e-10)


def test_nonlinear_vopt_exact(wcs3d):
    """VOPT-F2W evaluates linearly in frequency, exactly (wcslib parity)."""
    f0 = 1.42040571841e9
    w4 = convert_spectral_axis(wcs3d, Unit.parse("km / s"), "VOPT-F2W")
    sv_freq = wcs3d.spectral_axis_values(4)
    sv_vopt = w4.spectral_axis_values(4)
    vopt_exact = C_KMS * (f0 - sv_freq) / sv_freq
    assert np.allclose(sv_vopt, vopt_exact, rtol=1e-12)


def test_velocity_roundtrip_through_wave(wcs3d):
    w_wave = convert_spectral_axis(wcs3d, Unit.parse("m"), "WAVE-F2W")
    w_back = convert_spectral_axis(w_wave, Unit.parse("Hz"), "FREQ")
    assert w_back.crval[2] == pytest.approx(wcs3d.crval[2], rel=1e-12)
    assert w_back.cdelt[2] == pytest.approx(wcs3d.cdelt[2], rel=1e-10)


def test_speed_to_speed_no_rest_rescales_unit():
    """Same velocity convention, no rest value: the unit scale still
    applies (regression: km/s -> m/s returned the WCS untouched, leaving
    the axis a factor of 1000 off the requested unit)."""
    h = base_header(ctype3="VRAD", cunit3="km/s")
    del h["RESTFRQ"]
    w = WCS(header=h)
    out = convert_spectral_axis(w, Unit.parse("m / s"), "VRAD")
    assert str(out.cunit[2]) == "m / s"
    assert out.crval[2] == pytest.approx(w.crval[2] * 1000.0)
    assert out.cdelt[2] == pytest.approx(w.cdelt[2] * 1000.0)
    # changing convention without a rest value is impossible
    with pytest.raises(ValueError):
        convert_spectral_axis(w, Unit.parse("m / s"), "VOPT")


def test_air_vac_roundtrip():
    lam = 5000e-10  # 5000 Angstrom
    vac = air_to_vac(lam)
    air = vac_to_air(vac)
    assert air == pytest.approx(lam, rel=1e-9)
    assert vac > lam  # vacuum wavelength is longer


def test_greisen2006_worked_example():
    """Greisen et al. 2006 paper values (reference
    tests/test_spectral_axis.py uses greisen2006.hdr): VOPT axis with
    RESTWAV, converting the barycentric frequency table."""
    h = base_header(nchan=4, ctype3="FREQ", cunit3="Hz",
                    crval3=1.37835117405e9, cdelt3=9.765625e4)
    h["RESTFRQ"] = 1.420405752e9
    w = WCS(header=h)
    wv = convert_spectral_axis(w, Unit.parse("m / s"), "VOPT-F2W")
    # independent optical velocity: c*(f0-f)/f
    f0, f = 1.420405752e9, 1.37835117405e9
    assert wv.crval[2] == pytest.approx(299792458.0 * (f0 - f) / f,
                                        rel=1e-12)
    # derivative: dVopt/df = -c*f0/f^2
    assert wv.cdelt[2] == pytest.approx(-299792458.0 * f0 / f ** 2
                                        * 9.765625e4, rel=1e-12)


def test_projection_math_traces_in_jit(wcs3d):
    """The projection functions are jnp-evaluable inside jit (device-side
    world coordinates for regrid targets)."""
    import jax
    import jax.numpy as jnp
    from spectral_cube_tpu.wcs import projections as prj

    ap, dp, phip = wcs3d._celestial_pole()

    @jax.jit
    def roundtrip(x, y):
        phi, theta = prj.proj_xy2native("SIN", x, y, xp=jnp)
        lon, lat = prj.native_to_celestial(phi, theta, ap, dp, phip, xp=jnp)
        phi2, theta2 = prj.celestial_to_native(lon, lat, ap, dp, phip,
                                               xp=jnp)
        return prj.proj_native2xy("SIN", phi2, theta2, xp=jnp)

    x = jnp.asarray(np.linspace(-0.01, 0.01, 32))
    y = jnp.asarray(np.linspace(-0.01, 0.01, 32))
    x2, y2 = roundtrip(x, y)
    # float32 trig chains: ~5e-6 deg roundtrip error
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=2e-5)


def test_slice_composition_law(wcs3d):
    """Randomized: slicing a WCS twice equals slicing once with the
    composed view — pix2world agrees at every remaining pixel (the
    reference accumulated years of crpix/cdelt edge-case fixes here;
    composition closure catches sign/offset regressions).

    Only one of the two slices may carry step > 1: the half-pixel
    binned-block convention (reference wcs_utils.py:307-332) regroups
    blocks under step-of-step, so step x step deliberately does not
    compose — matching the reference."""
    rng = np.random.RandomState(3)
    n = 24
    for trial in range(8):
        step_first = trial % 2 == 0
        s1 = slice(rng.randint(0, 4), n - rng.randint(0, 4),
                   rng.choice([1, 2, 3]) if step_first else 1)
        m = len(range(*s1.indices(n)))
        if m < 3:
            continue
        s2 = slice(rng.randint(0, 2), m - rng.randint(0, 2),
                   1 if step_first else rng.choice([1, 2]))
        w1 = wcs3d.slice((s1, slice(None), slice(None)), shape=(n, 6, 8))
        w12 = w1.slice((s2, slice(None), slice(None)), shape=(m, 6, 8))
        idx = np.arange(n)[s1][s2].astype(float)
        if idx.size == 0:
            continue
        # the binned-block convention centers a step-s view pixel on the
        # middle of its s-pixel block: original pixel a + j*s + (s-1)/2
        step = (s1.step or 1) * (s2.step or 1)
        idx = idx + (step - 1) / 2.0
        direct = wcs3d.pix2world(np.zeros(idx.size), np.zeros(idx.size),
                                 idx)
        composed = w12.pix2world(np.zeros(idx.size), np.zeros(idx.size),
                                 np.arange(idx.size, dtype=float))
        np.testing.assert_allclose(np.asarray(composed[2]),
                                   np.asarray(direct[2]), rtol=1e-12)


def test_reverse_slice_composition(wcs3d):
    """Reversing twice is the identity on the spectral coordinate."""
    n = 10
    w = wcs3d.slice((slice(None, None, -1), slice(None), slice(None)),
                    shape=(n, 6, 8))
    w2 = w.slice((slice(None, None, -1), slice(None), slice(None)),
                 shape=(n, 6, 8))
    idx = np.arange(n, dtype=float)
    a = wcs3d.pix2world(np.zeros(n), np.zeros(n), idx)
    b = w2.pix2world(np.zeros(n), np.zeros(n), idx)
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(a[2]),
                               rtol=1e-12)


def test_celestial_partner_drop_warns(wcs3d):
    """Removing one celestial axis while keeping the other warns (the
    remaining coordinate is only valid at the dropped axis's reference
    pixel — reference wcs_utils.drop_axis / test_wcs_utils.py:194-215)."""
    import warnings
    from spectral_cube_tpu.utils import WCSWarning
    with pytest.warns(WCSWarning, match="is being removed"):
        wcs3d.dropaxis(0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        wcs3d.dropaxis(2)          # non-celestial: silent
        wcs3d.reindex([1, 0, 2])   # permutation keeps both: silent


def test_cylindrical_crval2_zero_longitudes():
    """Regression: cylindrical/conic projections with CRVAL2 at the
    fiducial latitude (the all-sky / galactic-plane setup) had every
    longitude 180 deg off — celestial_pole's dp=+-90 case dropped the
    Paper II eq. 9-10 phase terms."""
    from spectral_cube_tpu.wcs import WCS
    for code in ("CAR", "SFL", "MER", "AIT", "CEA"):
        h = {"NAXIS": 2, "CTYPE1": f"RA---{code}",
             "CTYPE2": f"DEC--{code}", "CRVAL1": 45.0, "CRVAL2": 0.0,
             "CRPIX1": 10.0, "CRPIX2": 10.0, "CDELT1": -0.5,
             "CDELT2": 0.5, "CUNIT1": "deg", "CUNIT2": "deg"}
        w = WCS(header=h)
        lon, lat = w.pix2world(np.array([9.0]), np.array([9.0]))
        assert abs(float(np.asarray(lon)[0]) - 45.0) < 1e-9, code
        assert abs(float(np.asarray(lat)[0])) < 1e-9, code
    # galactic all-sky anchor: pixel offsets map linearly in CAR
    h2 = {"NAXIS": 2, "CTYPE1": "GLON-CAR", "CTYPE2": "GLAT-CAR",
          "CRVAL1": 0.0, "CRVAL2": 0.0, "CRPIX1": 180.5, "CRPIX2": 90.5,
          "CDELT1": -1.0, "CDELT2": 1.0, "CUNIT1": "deg", "CUNIT2": "deg"}
    w2 = WCS(header=h2)
    lon, _ = w2.pix2world(np.array([0.0]), np.array([89.5]))
    assert abs((float(np.asarray(lon)[0]) - 179.5) % 360.0) < 1e-6


def test_mixed_cd_cdelt_header():
    """CD cards for the celestial axes + CDELT3 for the spectral axis (a
    common archival layout): the spectral CDELT must survive instead of
    being zeroed into a singular pc row."""
    from spectral_cube_tpu.wcs import WCS
    h = {"NAXIS": 3, "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
         "CTYPE3": "FREQ", "CRVAL1": 50.0, "CRVAL2": 30.0,
         "CRVAL3": 1.4e9, "CRPIX1": 5.0, "CRPIX2": 5.0, "CRPIX3": 1.0,
         "CD1_1": -1e-3, "CD1_2": 1e-5, "CD2_1": 1e-5, "CD2_2": 1e-3,
         "CDELT3": 1e6, "CUNIT1": "deg", "CUNIT2": "deg", "CUNIT3": "Hz"}
    w = WCS(header=h)
    assert w.cdelt[2] == 1e6
    sv = w.spectral_axis_values(3)
    np.testing.assert_allclose(np.asarray(sv),
                               [1.4e9, 1.4e9 + 1e6, 1.4e9 + 2e6])
    # world2pix must not hit a singular matrix
    lon, lat, sp = w.pix2world(np.array([2.0]), np.array([3.0]),
                               np.array([1.0]))
    x, y, z = w.world2pix(np.asarray(lon), np.asarray(lat), np.asarray(sp))
    np.testing.assert_allclose([float(np.asarray(x)[0]),
                                float(np.asarray(y)[0]),
                                float(np.asarray(z)[0])],
                               [2.0, 3.0, 1.0], atol=1e-8)


def test_partial_reverse_slice_world_values(wcs3d):
    """Every element of arr[start:stop:-1] keeps its world coordinate
    (the reference's slice_wcs anchors at stop-1, which is only right
    for full reversals — documented divergence, we track numpy)."""
    n = 10
    sv = np.asarray(wcs3d.spectral_axis_values(n))
    for sl in (slice(None, None, -1), slice(8, 2, -1),
               slice(None, 3, -1), slice(7, None, -1)):
        ref = sv[sl]
        ws = wcs3d.slice((sl, slice(None), slice(None)), shape=(n, 6, 8))
        got = np.asarray(ws.spectral_axis_values(len(ref)))
        np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_equinox_string_tolerated():
    from spectral_cube_tpu.wcs import WCS
    h = {"NAXIS": 2, "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
         "CRVAL1": 10.0, "CRVAL2": 10.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
         "CDELT1": -0.1, "CDELT2": 0.1, "CUNIT1": "deg", "CUNIT2": "deg",
         "EQUINOX": "J2000.0"}
    assert WCS(header=h).equinox == 2000.0


def test_no_spectral_axis_raises(wcs3d):
    import pytest
    cel = wcs3d.celestial
    for call in (lambda: cel.spectral, lambda: cel.spectral_unit,
                 lambda: cel.spectral_axis_values(4)):
        with pytest.raises(ValueError, match="no spectral axis"):
            call()


def test_crota_legacy_rotation():
    """Legacy CDELT+CROTA2 headers load with the AIPS rotation folded
    into the pc matrix (regression: silently identity => all coordinates
    rotated wrong)."""
    h = base_header()
    h["CROTA2"] = 30.0
    w = WCS(header=h)
    r = np.radians(30.0)
    cl, cb = w.cdelt[0], w.cdelt[1]
    np.testing.assert_allclose(w.pc[0, 0], np.cos(r), rtol=1e-12)
    np.testing.assert_allclose(w.pc[1, 1], np.cos(r), rtol=1e-12)
    np.testing.assert_allclose(w.pc[0, 1], -cb / cl * np.sin(r),
                               rtol=1e-12)
    np.testing.assert_allclose(w.pc[1, 0], cl / cb * np.sin(r), rtol=1e-12)
    # a PC/CD header with CROTA present must NOT double-apply
    h2 = base_header()
    h2["CROTA2"] = 30.0
    h2["PC1_1"] = 1.0
    w2 = WCS(header=h2)
    np.testing.assert_allclose(w2.pc, np.eye(3), atol=1e-12)


def test_check_equality_reference_frames():
    """WCSes in different velocity/celestial frames are NOT equal, while
    differing rest frequencies warn and compare equal (the reference's
    velocity-cube allowance, wcs_utils.py:404-412)."""
    import warnings
    from spectral_cube_tpu.utils import WCSWarning

    h = base_header()
    w1 = WCS(header=h)
    h2 = base_header()
    w2 = WCS(header=h2)
    assert w1.check_equality(w2)
    w2.specsys = "LSRK"
    w1.specsys = "BARYCENT"
    assert not w1.check_equality(w2)
    w2.specsys = "BARYCENT"
    w2.restfrq = w1.restfrq * 1.1
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert w1.check_equality(w2)
    assert any("RESTFRQ" in str(r.message) for r in rec)


def test_air_sampled_ctype_evaluates():
    """CTYPE axes sampled linearly in air wavelength (XXXX-A2Y codes)
    evaluate: _from_freq('AWAV') exists and inverts air_to_vac to the
    ~4e-9 relative residual of the Greisen division-form inverse."""
    from spectral_cube_tpu.wcs.spectral import spectral_value_transform
    lam_air = 5000e-10
    val, deriv = spectral_value_transform("AWAV", "AWAV", None)
    np.testing.assert_allclose(val(lam_air), lam_air, rtol=1e-8)
    # FREQ -> AWAV roundtrip through vacuum
    to_f, _ = spectral_value_transform("AWAV", "FREQ", None)
    from_f, dfrom = spectral_value_transform("FREQ", "AWAV", None)
    f = to_f(lam_air)
    np.testing.assert_allclose(from_f(f), lam_air, rtol=1e-8)
    # analytic derivative vs finite difference (h large enough that the
    # float64 wavelength quantization ~5e-23 m stays below the signal)
    h = 1e6
    fd = (from_f(f + h) - from_f(f - h)) / (2 * h)
    np.testing.assert_allclose(dfrom(f), fd, rtol=1e-5)


def test_unparseable_cunit_warns():
    import warnings
    from spectral_cube_tpu.utils import WCSWarning
    h = base_header()
    h["CUNIT3"] = "MHZ"
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        WCS(header=h)
    assert any(isinstance(r.message, WCSWarning)
               and "CUNIT" in str(r.message) for r in rec)


def test_slice_pixel_shape_fits_order():
    """WCS.slice(numpy_order=False) writes the new pixel_shape to the
    FITS-order axes (regression: hardcoded numpy-order transposed it)."""
    h = base_header(nx=10, ny=6, nchan=4)
    w = WCS(header=h)
    w.pixel_shape = (10, 6, 4)  # FITS order (x, y, chan)
    out = w.slice((slice(0, 5), slice(0, 3), slice(0, 2)),
                  shape=(10, 6, 4), numpy_order=False)
    assert out.pixel_shape == (5, 3, 2)


def test_manual_wcs_list_assignment_and_blank_cunit():
    """Hand-built WCS with astropy-style list assignment and blank CUNIT:
    lists normalize to ndarrays (reindex/celestial use fancy indexing) and
    blank celestial CUNIT defaults to deg (FITS Paper I sec 2.3; reference
    tests build such WCSes all over, e.g. test_projection.py:477-533)."""
    w = WCS(naxis=2)
    w.wcs.ctype = ['RA---TAN', 'DEC--TAN']
    w.wcs.cdelt = [-1e-4, 1e-4]
    w.wcs.crval = [10.0, 20.0]
    assert isinstance(w.cdelt, np.ndarray)
    cel = w.celestial            # exercises fancy-index reindex
    lon, lat = cel.pix2world(np.array([0.0]), np.array([0.0]))
    np.testing.assert_allclose([lon[0], lat[0]], [10.0, 20.0], atol=1e-9)
    # string cunit assignment parses to Unit
    w.wcs.cunit = ['deg', 'deg']
    lon2, lat2 = w.pix2world(np.array([0.0]), np.array([0.0]))
    np.testing.assert_allclose([lon2[0], lat2[0]], [10.0, 20.0], atol=1e-9)


def test_projection_convolve_and_world_with_manual_wcs():
    """Projection ops work on a hand-built (headerless) celestial WCS
    (reference test_projection.py:591-599, :908-941)."""
    import jax
    from spectral_cube_tpu import Projection
    from spectral_cube_tpu.units import Quantity
    from spectral_cube_tpu.beams import Beam
    w = WCS(naxis=2)
    w.wcs.ctype = ['RA---TAN', 'DEC--TAN']
    w.wcs.cdelt = [-1e-4, 1e-4]
    data = np.arange(25.0).reshape(5, 5)
    p = Projection(data, unit="Jy / beam", wcs=w,
                   beam=Beam(Quantity(1.0, "arcsec"), Quantity(1.0, "arcsec"),
                             Quantity(0.0, "deg")))
    out = p.convolve_to(Beam(Quantity(2.0, "arcsec"), Quantity(2.0, "arcsec"),
                             Quantity(0.0, "deg")))
    assert isinstance(out, Projection) and out.shape == (5, 5)
    # flux conserved for Jy/beam under beam-area rescale: peak grows
    lat, lon = p.world[:]
    assert np.asarray(lat.value).shape == (5, 5)


def test_invalid_velocity_convention_raises():
    """An explicitly-given but unrecognized velocity convention raises
    (reference test_spectral_cube.py:1264-1272), even when the input axis
    is already a velocity (VRAD) and would otherwise pass through."""
    import pytest
    from spectral_cube_tpu.wcs.spectral import determine_ctype_from_vconv
    with pytest.raises(ValueError, match="radio, optical"):
        determine_ctype_from_vconv("VRAD", "km / s",
                                   velocity_convention="bogus")
    assert determine_ctype_from_vconv("VRAD", "km / s") == "VRAD"


def test_nir_sinfoni_wave_to_velocity():
    """The reference's NIR SINFONI worked example
    (test_spectral_axis.py:536-595): a linear WAVE axis (um) converted to
    radio/optical velocity about a 2.1218 um rest line.  Via the cube API
    the ctype becomes the nonlinear 'VRAD-W2F'/'VOPT-W2V'-style code and
    the axis evaluates exactly (the reference's own linear-ctype variant
    is a tangent approximation; its test class is never collected).
    Conventions: VOPT = c(lam-lam0)/lam0, VRAD = c(lam-lam0)/lam."""
    import numpy as np
    from spectral_cube_tpu import SpectralCube
    from spectral_cube_tpu.wcs import WCS, convert_spectral_axis
    from spectral_cube_tpu.units import Quantity
    c = 299792458.0
    w = WCS(naxis=3)
    w.ctype = ["RA---TAN", "DEC--TAN", "WAVE"]
    w.cunit = ["deg", "deg", "um"]
    w.crval = [0, 0, 2.20000004768372]
    w.crpix = [1, 1, 1109.]
    w.cdelt = [-1e-3, 1e-3, 0.000245000002905726]
    cube = SpectralCube(np.zeros((1200, 2, 2), np.float32), wcs=w,
                        unit="Jy")
    lam = ((np.arange(1200) - 1108) * 0.000245000002905726e-6
           + 2.20000004768372e-6)
    lam0 = 2.1218e-6
    rest = Quantity(2.1218, "um")

    vrad = cube.with_spectral_unit("km / s", velocity_convention="radio",
                                   rest_value=rest)
    assert vrad.wcs.ctype[2].startswith("VRAD-W2F")
    np.testing.assert_allclose(np.asarray(vrad.spectral_axis.value),
                               c * (lam - lam0) / lam / 1e3, atol=1e-6)

    vopt = cube.with_spectral_unit("km / s", velocity_convention="optical",
                                   rest_value=rest)
    np.testing.assert_allclose(np.asarray(vopt.spectral_axis.value),
                               c * (lam - lam0) / lam0 / 1e3, atol=1e-6)

    # the raw linear-ctype converter writes the exact tangent at crval
    w2 = convert_spectral_axis(w, "km / s", "VOPT", rest_value=rest)
    lam_c, dlam = 2.20000004768372e-6, 0.000245000002905726e-6
    np.testing.assert_allclose(w2.crval[2], c*(lam_c-lam0)/lam0/1e3,
                               rtol=1e-12)
    np.testing.assert_allclose(w2.cdelt[2], c*dlam/lam0/1e3, rtol=1e-12)


def test_wcs_to_header_roundtrip_full_cards():
    """to_header emits PC/RESTWAV/SPECSYS/RADESYS/EQUINOX/LONPOLE/LATPOLE/
    PV cards, and a WCS rebuilt from that header compares equal."""
    w = WCS(naxis=3)
    w.ctype = ["RA---TAN", "DEC--TAN", "WAVE"]
    w.crval = [150.0, 2.5, 5.1e-7]
    w.crpix = [10.0, 12.0, 3.0]
    w.cdelt = [-1e-3, 1e-3, 1e-10]
    w.cunit = [Unit.parse("deg"), Unit.parse("deg"), Unit.parse("m")]
    w.pc = np.array([[0.9, 0.1, 0], [-0.1, 0.9, 0], [0, 0, 1.0]])
    w.restwav = 5.2e-7
    w.specsys = "LSRK"
    w.radesys = "FK5"
    w.equinox = 2000.0
    w.lonpole = 180.0
    w.latpole = 2.5
    w.pv[(0, 1)] = 0.0
    h = w.to_header()
    assert h["PC1_1"] == pytest.approx(0.9)
    assert h["PC1_2"] == pytest.approx(0.1)
    assert h["RESTWAV"] == pytest.approx(5.2e-7)
    assert h["SPECSYS"] == "LSRK"
    assert h["RADESYS"] == "FK5"
    assert h["EQUINOX"] == 2000.0
    assert h["LONPOLE"] == 180.0
    assert h["LATPOLE"] == 2.5
    assert h["PV1_1"] == 0.0
    back = WCS(header=h)
    assert back.check_equality(w)
    assert back == w           # __eq__ delegates to check_equality
    assert (w == 3.0) is False or (w == 3.0) is NotImplemented \
        or not (w == 3.0)      # non-WCS comparison does not crash


def test_wcs_equality_pv_defaults():
    """An absent PV lambda card on CEA means lambda=1, so a WCS with the
    explicit default compares equal to one without the card (the
    reference's wcslib-backed check_equality semantics)."""
    base = {"NAXIS": 2, "CTYPE1": "RA---CEA", "CTYPE2": "DEC--CEA",
            "CRVAL1": 10.0, "CRVAL2": 0.0, "CRPIX1": 5.0, "CRPIX2": 5.0,
            "CDELT1": -0.01, "CDELT2": 0.01,
            "CUNIT1": "deg", "CUNIT2": "deg"}
    w1 = WCS(header=base)
    w2 = WCS(header={**base, "PV2_1": 1.0})
    assert w1.check_equality(w2)
    assert w2.check_equality(w1)
    w3 = WCS(header={**base, "PV2_1": 0.5})
    assert not w1.check_equality(w3)
