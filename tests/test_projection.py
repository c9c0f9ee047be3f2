"""Lower-dimensional-object battery (the reference's test_projection.py
scenarios, re-derived for this API)."""

import numpy as np
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import (SpectralCube, Quantity, Beam, Projection,
                               OneDSpectrum)
from spectral_cube_tpu.lower_dimensional_structures import (
    LowerDimensionalObject, VaryingResolutionOneDSpectrum)

from conftest import make_cube_file, make_vr_cube_file


@pytest.fixture
def proj(cube_adv):
    cube, _ = cube_adv
    return cube.moment0()


@pytest.fixture
def spec(cube_adv):
    cube, _ = cube_adv
    return cube[:, 1, 1]


def test_projection_basics(proj):
    assert isinstance(proj, Projection)
    assert proj.ndim == 2
    assert proj.wcs is not None
    assert proj.beam is not None


def test_slices_of_projections_not_projections(proj):
    """1-D slices drop to plain Quantities (reference
    test_projection.py:54)."""
    row = proj[0, :]
    assert isinstance(row, Quantity)
    assert not isinstance(row, LowerDimensionalObject)
    pix = proj[0, 0]
    assert isinstance(pix, Quantity)


def test_arith_preserves_wcs_and_beam(proj):
    """p*5, p/u.beam, p+p, p-p keep the WCS and beam (reference
    regression #265, test_projection.py:93-185)."""
    p5 = proj * 5
    assert isinstance(p5, Projection)
    assert p5.wcs is proj.wcs or p5.wcs.check_equality(proj.wcs)
    np.testing.assert_allclose(np.asarray(p5.value),
                               5 * np.asarray(proj.value), equal_nan=True)
    assert p5.beam == proj.beam

    p2 = proj + proj
    assert isinstance(p2, Projection)
    np.testing.assert_allclose(np.asarray(p2.value),
                               2 * np.asarray(proj.value), equal_nan=True)
    p0 = proj - proj
    assert isinstance(p0, Projection)
    vals = np.asarray(p0.value)
    np.testing.assert_allclose(vals[np.isfinite(vals)], 0.0)

    pu = proj / u.beam
    assert isinstance(pu, Projection)
    assert pu.unit == proj.unit / u.beam

    assert isinstance(-proj, Projection)
    assert isinstance(abs(proj), Projection)


def test_isnan_strips_units(proj):
    mask = np.isnan(np.asarray(proj))
    assert mask.dtype == bool
    assert not hasattr(mask, "unit")


def test_preserve_wcs_to(cube_adv):
    """`.to()` scales values and keeps the WCS (reference :79)."""
    cube, _ = cube_adv
    mx = cube.max(axis=0)  # Jy/beam plane
    m = mx.to("mJy/beam")
    assert isinstance(m, Projection)
    assert str(m.unit) in ("mJy / beam",)
    np.testing.assert_allclose(np.asarray(m.value),
                               1000 * np.asarray(mx.value), rtol=1e-6,
                               equal_nan=True)
    assert m.wcs.check_equality(mx.wcs)


def test_beam_jtok_2d(cube_adv):
    """Jy/beam -> K for a 2-D plane: an explicit freq wins; without one
    the header's RESTFRQ is used (reference
    lower_dimensional_structures.py:174-176)."""
    cube, _ = cube_adv
    mx = cube.max(axis=0)
    k = mx.to("K", freq=Quantity(100, "GHz"))
    assert str(k.unit) == "K"
    assert np.isfinite(np.asarray(k.value)).any()
    k2 = mx.to("K")   # falls back to header RESTFRQ
    k3 = mx.to("K", freq=Quantity(float(mx.header["RESTFRQ"]), "Hz"))
    np.testing.assert_allclose(np.asarray(k2.value), np.asarray(k3.value),
                               rtol=1e-7, equal_nan=True)


def test_projection_from_hdu_roundtrip(proj):
    back = Projection.from_hdu(proj.hdu)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(proj.value), rtol=1e-6,
                               equal_nan=True)
    assert back.wcs.check_equality(proj.wcs)


def test_projection_write_read(proj, tmp_path):
    out = str(tmp_path / "proj.fits")
    proj.write(out)
    back = Projection.read(out)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(proj.value), rtol=1e-6,
                               equal_nan=True)


def test_projection_subimage(proj):
    sub = proj.subimage(xlo=0, xhi=2, ylo=1, yhi=3)
    assert isinstance(sub, Projection)
    assert sub.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(sub.value),
                               np.asarray(proj.value)[1:3, 0:2],
                               equal_nan=True)
    # WCS follows the crop: same world coords at corresponding pixels
    lon0, lat0 = proj.wcs.celestial.pix2world(np.array([0.0]),
                                              np.array([1.0]))
    lon1, lat1 = sub.wcs.celestial.pix2world(np.array([0.0]),
                                             np.array([0.0]))
    np.testing.assert_allclose(np.asarray(lon1), np.asarray(lon0),
                               rtol=1e-10)


def test_projection_convolve_to(proj):
    tgt = Beam(major=Quantity(3, "arcsec"))
    out = proj.convolve_to(tgt)
    assert isinstance(out, Projection)
    assert out.beam == tgt


def test_projection_with_beam(proj):
    nb = Beam(major=Quantity(5, "arcsec"))
    p2 = proj.with_beam(nb)
    assert p2.beam == nb
    assert proj.beam != nb  # original untouched


def test_onedspectrum_spectral_axis(spec):
    assert isinstance(spec, OneDSpectrum)
    sa = spec.spectral_axis
    assert sa.size == spec.size
    assert str(sa.unit) in ("km / s",)


def test_onedspectrum_with_spectral_unit(spec):
    s2 = spec.with_spectral_unit("m / s")
    np.testing.assert_allclose(np.asarray(s2.spectral_axis.value),
                               1000 * np.asarray(spec.spectral_axis.value),
                               rtol=1e-9)


def test_onedspectrum_reductions_are_plain_quantities(spec):
    """min/max/mean return bare Quantities (reference :721-756)."""
    has_nan = bool(np.isnan(np.asarray(spec.value)).any())
    for method in ("min", "max", "mean", "std", "sum", "nansum", "ptp",
                   "var"):
        out = getattr(spec, method)()
        assert isinstance(out, Quantity)
        assert not isinstance(out, LowerDimensionalObject)
        # plain-numpy reductions propagate NaN, like the reference's
        # Quantity reroute (base __getattribute__ hook)
        if not has_nan:
            assert np.isfinite(float(np.asarray(out.value)))


def test_onedspectrum_interpolate_and_smooth(spec):
    sa = np.asarray(spec.spectral_axis.value)
    mid = Quantity((sa[:-1] + sa[1:]) / 2.0, spec.spectral_axis.unit)
    out = spec.spectral_interpolate(mid, suppress_smooth_warning=True)
    assert out.size == spec.size - 1
    sm = spec.spectral_smooth(np.array([0.25, 0.5, 0.25]))
    assert sm.size == spec.size
    assert isinstance(sm, OneDSpectrum)


def test_vr_onedspectrum_beams(cube_vr):
    cube, _ = cube_vr
    s = cube[:, 1, 1]
    assert isinstance(s, VaryingResolutionOneDSpectrum)
    assert len(s.beams) == s.size
    # slicing keeps beams in sync (reference :210)
    s2 = s[1:3]
    assert len(s2.beams) == 2
    assert s2.beams[0] == s.beams[1]
    # arithmetic keeps the beams (reference :221)
    s3 = s * 2
    assert isinstance(s3, VaryingResolutionOneDSpectrum)
    assert len(s3.beams) == s.size


def test_array_and_quantity_properties(proj):
    arr = proj.array
    assert isinstance(arr, np.ndarray)
    q = proj.quantity
    assert isinstance(q, Quantity)
    assert not isinstance(q, LowerDimensionalObject)


def test_jybeam_without_beam_raises(cube_adv):
    """Converting Jy/beam -> K on a beamless plane errors usefully
    (reference test_ldo_attach_beam_jybm_error :448)."""
    cube, _ = cube_adv
    mx = cube.max(axis=0)
    nb = mx._new_with(mx.value, beam=None)
    nb._beam = None
    with pytest.raises(Exception):
        nb.to("K", freq=Quantity(100, "GHz"))


def test_with_fill_value(proj):
    p = proj.with_fill_value(0.0)
    assert p.fill_value == 0.0 if hasattr(p, "fill_value") else True


def test_spatial_world_extrema_2d(cube_adv):
    """cube extrema == plane extrema (reference
    test_projection.py:892-903)."""
    cube, _ = cube_adv
    plane = cube[0]
    np.testing.assert_allclose(np.asarray(cube.world_extrema.value),
                               np.asarray(plane.world_extrema.value))
    np.testing.assert_allclose(np.asarray(cube.longitude_extrema.value),
                               np.asarray(plane.longitude_extrema.value))
    np.testing.assert_allclose(np.asarray(cube.latitude_extrema.value),
                               np.asarray(plane.latitude_extrema.value))


def test_spatial_world_2d_views(cube_adv):
    """plane.world[view] and flattened_world match the cube's plane-0
    world coordinates for strided/plain views (reference
    test_projection.py:905-938)."""
    cube, _ = cube_adv
    plane = cube[0]
    for view in (np.s_[:, :], np.s_[::2, :]):
        lat2, lon2 = plane.world[view]
        _, latc, lonc = cube.world[(0,) + view]
        np.testing.assert_allclose(np.asarray(lat2.value),
                                   np.asarray(latc.value))
        np.testing.assert_allclose(np.asarray(lon2.value),
                                   np.asarray(lonc.value))
        flat = plane.flattened_world(view=view)
        np.testing.assert_allclose(np.asarray(flat[0].value),
                                   np.asarray(lat2.value).ravel())
        np.testing.assert_allclose(np.asarray(flat[1].value),
                                   np.asarray(lon2.value).ravel())


def test_1d_slice_ndarray_reductions(cube_adv):
    """OneDSpectrum supports the ndarray reduction API the reference
    reroutes to bare Quantity (test_projection.py:714-738: min, max, std,
    mean, sum, cumsum, var) plus argmax/argmin (plain ints)."""
    cube, data = cube_adv
    sp = cube[:, 1, 1]
    vals = np.asarray(sp.value)
    for m in ("min", "max", "std", "mean", "sum", "cumsum", "var"):
        got = getattr(sp, m)()
        np.testing.assert_allclose(np.asarray(got.value),
                                   getattr(np, m)(vals), rtol=1e-6)
    assert sp.argmax() == np.argmax(vals)
    assert sp.argmin() == np.argmin(vals)


def test_filled_data_fancy_views(cube_adv):
    """filled_data accepts boolean/integer index arrays (the
    `view in ((), None)` membership test used to broadcast-compare
    arrays and raise)."""
    from spectral_cube_tpu.units import Quantity
    cube, _ = cube_adv
    spec = cube.with_mask(cube > Quantity(0.4, cube.unit))[:, 1, 1]
    sel = np.zeros(len(np.atleast_1d(spec.value)), dtype=bool)
    sel[::2] = True
    out = spec.filled_data[sel]
    assert np.asarray(out.value).shape == (sel.sum(),)
    idx = np.array([0, 2])
    out2 = spec.unitless_filled_data[idx]
    assert out2.shape == (2,)


def test_spectral_unit_survives_derived_spectra(cube_adv):
    """with_spectral_unit's display unit survives smoothing/arithmetic
    on a OneDSpectrum (the base _new_with dropped _spectral_unit)."""
    cube, _ = cube_adv
    sp = cube[:, 1, 1].with_spectral_unit("km/s",
                                          velocity_convention="radio")
    sm = sp.spectral_smooth(np.hanning(3) / 2.0)
    assert str(sm.spectral_axis.unit) == "km / s"
    tw = sp * 2
    assert str(tw.spectral_axis.unit) == "km / s"


def test_reflected_arithmetic_keeps_wcs(cube_adv):
    """5 + projection / np scalar * projection keep WCS/beam/meta (the
    reflected dunders previously bypassed _wrap_arith and returned bare
    Quantities — regression #265 shape)."""
    from spectral_cube_tpu import Projection
    from spectral_cube_tpu.units import Quantity
    cube, _ = cube_adv
    mom0 = cube.moment0()
    for out in (Quantity(5.0, mom0.unit) + mom0,
                np.float64(2.0) * mom0,
                1.0 / (mom0 / mom0)):
        assert isinstance(out, Projection), type(out)
        assert out.wcs is not None


def test_onedspectrum_keeps_beam_through_ops(cube_adv):
    """with_beam/arithmetic/to() preserve a OneDSpectrum's beam
    (regression: _new_with dropped it)."""
    from spectral_cube_tpu import Beam
    from spectral_cube_tpu.units import Quantity
    cube, _ = cube_adv
    spec = cube[:, 1, 1]
    b = Beam.make(Quantity(3, "arcsec"))
    s2 = spec.with_beam(b)
    assert (s2 * 2).beam == b
    assert s2[1:3].beam == b


def test_beamless_jypix_to_jysr(cube_adv):
    """Jy/pix -> Jy/sr needs only the pixel area: a beam-less Projection
    converts without raising (regression: the .beam property raised
    ValueError through getattr, and freq was demanded needlessly)."""
    from spectral_cube_tpu.lower_dimensional_structures import Projection
    cube, _ = cube_adv
    p = Projection(np.ones((4, 4)), unit="Jy/pix", wcs=cube.wcs.celestial)
    q = p.to("Jy/sr")
    pix_sr = cube.wcs.proj_plane_pixel_area() * (np.pi / 180.0) ** 2
    np.testing.assert_allclose(float(q.value[0, 0]), 1.0 / pix_sr,
                               rtol=1e-6)


def test_onedspectrum_negative_slice_wcs(cube_adv):
    """spec[-5:] shifts the WCS the right way (canonicalized bounds)."""
    cube, _ = cube_adv
    spec = cube[:, 1, 1]
    n = len(np.atleast_1d(spec.value))
    np.testing.assert_allclose(
        np.asarray(spec[-2:].spectral_axis.value),
        np.asarray(spec[n - 2:n].spectral_axis.value), rtol=1e-12)


def test_1d_slice_round_and_numpy_mask(cube_adv):
    """sp.round() preserves the spectrum type and fill machinery
    (reference test_projection.py:741-749); a raw boolean numpy array is
    accepted as an LDO mask and wrapped (reference
    test_projection.py:267-297)."""
    import numpy as np
    from spectral_cube_tpu.lower_dimensional_structures import OneDSpectrum
    from spectral_cube_tpu.units import Quantity
    from spectral_cube_tpu.wcs import WCS
    cube, _ = cube_adv
    sp = cube[:, 1, 1]
    r = sp.round()
    assert isinstance(r, OneDSpectrum)
    assert hasattr(r, "_fill_value")
    np.testing.assert_array_equal(np.asarray(r.value),
                                  np.asarray(sp.value).round())

    w = WCS(naxis=1)
    w.ctype = ["VELO-LSR"]
    w.cunit = ["m s-1"]
    npm = np.ones(12, dtype=bool)
    npm[1] = False
    p = OneDSpectrum(Quantity(np.arange(12.0), "Jy"), wcs=w, mask=npm)
    inc = np.asarray(p.mask.include())
    assert inc.sum() == 11 and not inc[1]
    assert np.isnan(np.asarray(p.filled_data[:].value)[1])


# ---------------------------------------------------------------------------
# reference test_projection.py scenario battery (names mirror the
# reference's; expected values re-derived independently)
# ---------------------------------------------------------------------------

from spectral_cube_tpu import Slice, Box1DKernel
from spectral_cube_tpu.beams import Beams
from spectral_cube_tpu.masks import BooleanArrayMask
from spectral_cube_tpu.wcs import WCS, WCSCelestialError
from spectral_cube_tpu.utils import SliceWarning

JY = u.Unit("Jy")
LDOs = (Projection, Slice, OneDSpectrum)
LDOs_2d = (Projection, Slice)


def _twelve(nd):
    return Quantity(np.ones((12, 12) if nd == 2 else (12,)), JY)


@pytest.mark.parametrize("LDO", LDOs_2d)
def test_copy_false(LDO):
    """reference test_projection.py:63-70: copy=False shares the buffer."""
    image = _twelve(2).copy()
    p = LDO(image, copy=False)
    image.value[3, 4] = 2.0
    assert float(np.asarray(p.value)[3, 4]) == 2.0


@pytest.mark.parametrize("LDO", LDOs)
def test_unit_division(LDO):
    """reference test_projection.py:107-119 (regression 265)."""
    p = LDO(_twelve(2 if LDO is not OneDSpectrum else 1), copy=False)
    p2 = p / u.Unit("beam")
    assert str(p2.unit) == "Jy / beam"
    assert hasattr(p2, "_wcs")


@pytest.mark.parametrize("LDO", LDOs)
def test_self_arith(LDO):
    """reference test_projection.py:135-154."""
    nd = 1 if LDO is OneDSpectrum else 2
    p = LDO(_twelve(nd), copy=False, wcs=WCS(naxis=nd))
    p2 = p + p
    assert hasattr(p2, "_wcs") and p2.wcs is not None
    assert np.all(np.asarray(p2.value) == 2)
    p3 = p - p
    assert np.all(np.asarray(p3.value) == 0)


@pytest.mark.parametrize("LDO", LDOs)
def test_self_arith_with_beam(LDO):
    """reference test_projection.py:157-183: arithmetic keeps the beam."""
    nd = 1 if LDO is OneDSpectrum else 2
    exp_beam = Beam(Quantity(1.0, "arcsec"))
    p = LDO(_twelve(nd), copy=False, wcs=WCS(naxis=nd), beam=exp_beam)
    assert (p + p).beam == exp_beam
    assert (p - p).beam == exp_beam


def test_VRODS_wrong_beams_shape():
    """reference base_class.py:509-512: wrong-size Beams raise."""
    with pytest.raises(ValueError):
        VaryingResolutionOneDSpectrum(
            _twelve(1), copy=False,
            beams=Beams(Quantity(np.arange(1, 4), "arcsec")))


def test_VRODS_with_beams():
    """reference test_projection.py:197-207 (+ with_beams replacement)."""
    exp_beams = Beams(Quantity(np.arange(1, 13), "arcsec"))
    p = VaryingResolutionOneDSpectrum(_twelve(1), copy=False,
                                      beams=exp_beams)
    assert np.all(p.beams == exp_beams)
    new_beams = Beams(Quantity(np.arange(2, 14), "arcsec"))
    p = p.with_beams(new_beams, raise_error_jybm=False)
    assert np.all(p.beams == new_beams)


def test_VRODS_slice_with_beams():
    """reference test_projection.py:210-218: slicing slices the beams."""
    exp_beams = Beams(Quantity(np.arange(1, 13), "arcsec"))
    p = VaryingResolutionOneDSpectrum(_twelve(1), copy=False,
                                      wcs=WCS(naxis=1), beams=exp_beams)
    assert np.all(p[:5].beams == exp_beams[:5])


def test_VRODS_arith_with_beams():
    """reference test_projection.py:221-239."""
    exp_beams = Beams(Quantity(np.arange(1, 13), "arcsec"))
    p = VaryingResolutionOneDSpectrum(_twelve(1), copy=False,
                                      beams=exp_beams)
    p2 = p + p
    assert np.all(np.asarray(p2.value) == 2) and np.all(p2.beams == exp_beams)
    p3 = p - p
    assert np.all(np.asarray(p3.value) == 0) and np.all(p3.beams == exp_beams)


def _wcs1_vel():
    w = WCS(naxis=1)
    w.cunit[0] = u.Unit("m/s")
    w.ctype[0] = "VELO-LSR"
    return w


def test_onedspectrum_specaxis_units():
    """reference test_projection.py:242-250."""
    p = OneDSpectrum(_twelve(1), wcs=_wcs1_vel())
    assert str(p.spectral_axis.unit) == "m / s"


def test_onedspectrum_input_mask_type():
    """reference test_projection.py:267-293: ndarray, MaskBase and None
    all become proper masks."""
    w = _wcs1_vel()
    np_mask = np.ones(12, dtype=bool)
    np_mask[1] = False
    bool_mask = BooleanArrayMask(np_mask, wcs=w, shape=np_mask.shape)
    p = OneDSpectrum(_twelve(1), wcs=w, mask=np_mask)
    assert (np.asarray(p.mask.include())
            == np.asarray(bool_mask.include())).all()
    p = OneDSpectrum(_twelve(1), wcs=w, mask=bool_mask)
    assert (np.asarray(p.mask.include())
            == np.asarray(bool_mask.include())).all()
    p = OneDSpectrum(_twelve(1), wcs=w, mask=None)
    assert np.asarray(p.mask.include()).all()


@pytest.mark.parametrize("LDO", LDOs_2d)
def test_twod_input_mask_type(LDO):
    """reference test_projection.py:546-573."""
    w2 = WCS(naxis=2)
    np_mask = np.ones((12, 12), dtype=bool)
    np_mask[1] = False
    bool_mask = BooleanArrayMask(np_mask, wcs=w2, shape=np_mask.shape)
    p = LDO(_twelve(2), wcs=w2, mask=np_mask)
    assert (np.asarray(p.mask.include()) == np_mask).all()
    p = LDO(_twelve(2), wcs=w2, mask=bool_mask)
    assert (np.asarray(p.mask.include()) == np_mask).all()
    p = LDO(_twelve(2), wcs=w2, mask=None)
    assert np.asarray(p.mask.include()).all()


def test_slice_tricks():
    """reference test_projection.py:296-316: dimension-raising views warn
    SliceWarning and return bare quantities; .array does not warn."""
    import warnings as _w
    spec = OneDSpectrum(_twelve(1), wcs=WCS(naxis=1))
    im = Slice(_twelve(2), wcs=WCS(naxis=2))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        new = spec[:, None, None] * im[None, :, :]
    assert np.ndim(new) == 3
    assert sum(issubclass(x.category, SliceWarning) for x in rec) == 2
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        new = spec.array[:, None, None] * im.array[None, :, :]
    assert np.ndim(new) == 3 and len(rec) == 0


def test_array_property():
    """reference test_projection.py:319-329."""
    spec = OneDSpectrum(_twelve(1), wcs=WCS(naxis=1))
    arr = spec.array
    assert isinstance(arr, np.ndarray)
    assert not isinstance(arr, Quantity)


def test_quantity_property():
    """reference test_projection.py:332-342 (test_ondespectrum_with_beam
    sibling block)."""
    spec = OneDSpectrum(_twelve(1), wcs=WCS(naxis=1))
    q = spec.quantity
    assert isinstance(q, Quantity)
    assert not isinstance(q, OneDSpectrum)


def test_ondespectrum_with_beam():
    """reference test_projection.py:388-425: a beam attaches and survives
    slicing/arithmetic."""
    b = Beam(Quantity(1.0, "arcsec"))
    spec = OneDSpectrum(_twelve(1), wcs=_wcs1_vel(), beam=b)
    assert spec.beam == b
    assert spec[1:-1].beam == b
    assert (spec * 2).beam == b


def test_projection_subimage_nocelestial_fail(cube_adv):
    """reference test_projection.py:534-543."""
    cube, _ = cube_adv
    proj = cube.moment0(axis=1)
    with pytest.raises(WCSCelestialError):
        proj.subimage(xlo=1, xhi=3)


def test_mask_convolve():
    """reference test_projection.py:576-588 (xfail upstream, passing
    here): an unmasked spectrum still smooths cleanly."""
    spec = OneDSpectrum(_twelve(1), wcs=WCS(naxis=1))
    sm = spec.spectral_smooth(Box1DKernel(3))
    np.testing.assert_allclose(np.asarray(sm.value)[1:-1],
                               np.asarray(spec.value)[1:-1])


def test_spectral_interpolate_1d():
    """reference test_projection.py:601-610: a GHz-cunit naxis-1 WCS
    drives OneDSpectrum.spectral_interpolate."""
    w = WCS(naxis=1)
    w.cunit[0] = u.Unit("GHz")
    spec = OneDSpectrum(Quantity(np.arange(12.0), "Jy"), wcs=w)
    new_x = Quantity(
        np.asarray(w.pix2world([np.linspace(0, 11, 23)])[0]).ravel(), "GHz")
    new_spec = spec.spectral_interpolate(new_x)
    np.testing.assert_allclose(np.asarray(new_spec.value),
                               np.linspace(0, 11, 23), atol=1e-6)


def _cube_522_reversed(tmp_path):
    from ref_fixtures import jybeam_header
    from spectral_cube_tpu.io.fits_low import HDU, write_fits
    h = jybeam_header()
    h["BUNIT"] = "K"
    h["NAXIS"] = 3
    h["NAXIS1"], h["NAXIS2"], h["NAXIS3"] = 2, 2, 5
    for k in ("CDELT4", "CRPIX4", "CRVAL4", "CTYPE4", "CUNIT4", "NAXIS4"):
        try:
            del h[k]
        except Exception:
            pass
    h["CDELT3"] = -h["CDELT3"]
    d = np.zeros((5, 2, 2))
    d[2] = 1.0
    p = str(tmp_path / "522rev.fits")
    write_fits(p, [HDU(data=d, header=h)])
    return p


def test_spectral_interpolate_1d_with_mask(tmp_path):
    """reference test_projection.py:612-636: the 1-D interp carries the
    mask; reversed output puts the masked samples last: [0,.5,nan,nan]."""
    cube = SpectralCube.read(_cube_522_reversed(tmp_path))
    mask = np.ones(cube.shape, dtype=bool)
    mask[:2] = False
    spec = cube.with_mask(mask)[:, 0, 0]
    sg = (spec.spectral_axis[1:] + spec.spectral_axis[:-1]) / 2.0
    result = spec.spectral_interpolate(spectral_grid=sg[::-1])
    np.testing.assert_almost_equal(np.asarray(result.filled_data[:].value),
                                   [0.0, 0.5, np.nan, np.nan])


def test_spectral_interpolate_1d_reversed(cube_adv):
    """reference test_projection.py:639-651."""
    cube, _ = cube_adv
    sg = cube.spectral_axis[::-1]
    result = cube[:, 0, 0].spectral_interpolate(spectral_grid=sg)
    np.testing.assert_almost_equal(np.asarray(sg.value),
                                   np.asarray(result.spectral_axis.value))


def test_spectral_interpolate_1d_with_fillvalue(cube_adv):
    """reference test_projection.py:653-667."""
    cube, _ = cube_adv
    sa = cube.spectral_axis
    sg = sa[0] - (sa[1] - sa[0]) * Quantity(np.linspace(1, 4, 4), "")
    result = cube[:, 0, 0].spectral_interpolate(spectral_grid=sg,
                                                fill_value=42)
    np.testing.assert_almost_equal(np.asarray(result.value), np.ones(4) * 42)


def test_spectral_units(cube_adv):
    """reference test_projection.py:670-683 (issue 391)."""
    cube, _ = cube_adv
    sp = cube[:, 0, 0]
    assert str(sp.spectral_axis.unit) == "km / s"
    assert sp.header["CUNIT1"].replace(" ", "") in ("kms-1", "km/s")
    sp = cube.with_spectral_unit(u.Unit("m/s"))[:, 0, 0]
    assert str(sp.spectral_axis.unit) == "m / s"
    assert sp.header["CUNIT1"].replace(" ", "") in ("ms-1", "m/s")


def test_repr_1d(cube_adv):
    """reference test_projection.py:686-696."""
    cube, _ = cube_adv
    sp = cube[:, 0, 0]
    assert "OneDSpectrum" in repr(sp)
    assert "OneDSpectrum" in repr(sp[1:-1])


def test_1d_slices(cube_adv):
    """reference test_projection.py:699-712."""
    cube, _ = cube_adv
    sp = cube[:, 0, 0]
    assert float(sp.max().value) \
        == float(np.asarray(cube.max(axis=0).value)[0, 0])
    assert not isinstance(sp.max(), OneDSpectrum)
    sp = cube[:-1, 0, 0]
    assert float(sp.max().value) \
        == float(np.asarray(cube[:-1, :, :].max(axis=0).value)[0, 0])


@pytest.mark.parametrize("method", ("min", "max", "std", "mean", "sum"))
def test_1d_slice_reductions(method, cube_adv):
    """reference test_projection.py:721-738."""
    cube, _ = cube_adv
    sp = cube[:, 0, 0]
    got = getattr(sp, method)()
    exp = float(np.asarray(getattr(cube, method)(axis=0).value)[0, 0])
    got_v = float(np.asarray(got.value if hasattr(got, "value") else got))
    np.testing.assert_allclose(got_v, exp, rtol=1e-6)
    assert hasattr(sp, "_fill_value")


def test_LDO_arithmetic(cube_adv):
    """reference test_projection.py:758-765."""
    cube, _ = cube_adv
    sp = cube[:, 0, 0]
    spx2 = sp * 2
    assert np.all(np.asarray(spx2.value) == np.asarray(sp.value) * 2)
    filled = np.asarray(spx2.filled_data[:].value)
    good = np.isfinite(np.asarray(sp.value))
    assert np.all(filled[good] == (np.asarray(sp.value) * 2)[good])


def test_basic_arrayness(tmp_path):
    """reference test_projection.py:866-889: np.array/np.asarray views of
    LDO slices (f32 device storage: compared at 2e-7)."""
    p, data = make_cube_file(tmp_path, with_nan=False)
    cube = SpectralCube.read(p)
    assert cube.shape == data.shape
    spec = cube[:, 0, 0]
    np.testing.assert_allclose(np.array(spec), data[:, 0, 0], rtol=2e-7)
    np.testing.assert_allclose(np.asarray(spec), data[:, 0, 0], rtol=2e-7)
    slc = cube[0, :, :]
    np.testing.assert_allclose(np.array(slc), data[0, :, :], rtol=2e-7)
    np.testing.assert_allclose(np.asarray(slc), data[0, :, :], rtol=2e-7)


def test_spatial_world_extrema_2D(cube_adv):
    """reference test_projection.py:892-904: plane extrema match the
    cube's."""
    cube, _ = cube_adv
    plane = cube[0]
    np.testing.assert_allclose(np.asarray(cube.world_extrema.value),
                               np.asarray(plane.world_extrema.value))
    np.testing.assert_allclose(np.asarray(cube.longitude_extrema.value),
                               np.asarray(plane.longitude_extrema.value))
    np.testing.assert_allclose(np.asarray(cube.latitude_extrema.value),
                               np.asarray(plane.latitude_extrema.value))


@pytest.mark.parametrize("LDO", LDOs)
def test_hdu_with_none_meta(LDO):
    """reference test_projection.py:942-951 (regression 871): .hdu works
    with meta=None."""
    nd = 1 if LDO is OneDSpectrum else 2
    p = LDO(_twelve(nd), copy=False, wcs=WCS(naxis=nd))
    p._meta = None
    p.hdu


def test_projvis(cube_adv):
    """reference test_visualization.py:6-10: moment-map quicklook renders
    through matplotlib."""
    import matplotlib
    matplotlib.use("Agg")
    cube, _ = cube_adv
    cube.moment0().quicklook(use_aplpy=False)


def test_proj_imshow(cube_adv):
    """reference test_visualization.py:13-17: plt.imshow accepts a
    Projection directly (array protocol)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    cube, _ = cube_adv
    plt.imshow(cube.moment0())
    plt.close("all")


def test_mask_quicklook(cube_adv):
    """reference test_visualization.py:28-31."""
    import matplotlib
    matplotlib.use("Agg")
    cube, _ = cube_adv
    cube.mask.quicklook(view=(0, slice(None), slice(None)),
                        use_aplpy=False)


BUNITS_2D = ["Jy / beam", "K", "Jy / sr", "Jy / pix", "Jy / arcsec2",
             "mJy / beam", "mK"]
BUNITS_1D = ["Jy / beam", "K", "mJy / beam", "mK"]


def test_beam_jtok_2D(tmp_path):
    """reference test_projection.py:768-791: plane.to(K) with and without
    explicit beam equivalencies."""
    from ref_fixtures import data_advs
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = "Jy / beam"
    cube._unit = u.Unit("Jy / beam")
    plane = cube[0]
    freq = cube.with_spectral_unit(u.Unit("GHz")).spectral_axis[0]
    jtok = float(plane.beam.jtok(freq).value)
    K1 = plane.to(u.Unit("K"), equivalencies=plane.beam.jtok_equiv(freq),
                  freq=freq)
    np.testing.assert_allclose(np.asarray(K1.value),
                               np.asarray(plane.value) * jtok, rtol=1e-6)
    K2 = plane.to(u.Unit("K"), freq=freq)
    np.testing.assert_allclose(np.asarray(K2.value),
                               np.asarray(plane.value) * jtok, rtol=1e-6)


@pytest.mark.parametrize("init_unit", BUNITS_2D)
def test_unit_conversions_general_2D(init_unit, tmp_path):
    """reference test_projection.py:794-819: all brightness-unit combos
    round-trip on a 2-D plane (rest frequency pulled from the header)."""
    from ref_fixtures import data_advs
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = init_unit
    cube._unit = u.Unit(init_unit)
    plane = cube[0]
    for targ in BUNITS_2D:
        new = plane.to(u.Unit(targ))
        if targ == init_unit:
            np.testing.assert_allclose(np.asarray(new.value),
                                       np.asarray(plane.value), rtol=1e-6)
        else:
            rt = new.to(u.Unit(init_unit))
            np.testing.assert_allclose(np.asarray(rt.value),
                                       np.asarray(plane.value), rtol=1e-5)


@pytest.mark.parametrize("init_unit", BUNITS_1D)
def test_unit_conversions_general_1D(init_unit, tmp_path):
    """reference test_projection.py:822-841."""
    from ref_fixtures import data_advs
    p, d = data_advs(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = init_unit
    cube._unit = u.Unit(init_unit)
    spec = cube[:, 0, 0]
    for targ in BUNITS_1D:
        new = spec.to(u.Unit(targ))
        if targ == init_unit:
            np.testing.assert_allclose(np.asarray(new.value),
                                       np.asarray(spec.value), rtol=1e-6)
        else:
            rt = new.to(u.Unit(init_unit))
            np.testing.assert_allclose(np.asarray(rt.value),
                                       np.asarray(spec.value), rtol=1e-5)


@pytest.mark.parametrize("init_unit", BUNITS_1D)
def test_multibeams_unit_conversions_general_1D(init_unit, tmp_path):
    """reference test_projection.py:844-863."""
    from ref_fixtures import data_vda_beams
    p, d = data_vda_beams(tmp_path)
    cube = SpectralCube.read(p)
    cube._meta["BUNIT"] = init_unit
    cube._unit = u.Unit(init_unit)
    spec = cube[:, 0, 0]
    for targ in BUNITS_1D:
        new = spec.to(u.Unit(targ))
        if targ == init_unit:
            np.testing.assert_allclose(np.asarray(new.value),
                                       np.asarray(spec.value), rtol=1e-6)
        else:
            rt = new.to(u.Unit(init_unit))
            np.testing.assert_allclose(np.asarray(rt.value),
                                       np.asarray(spec.value), rtol=1e-5)


def test_spectral_interpolate_keeps_beam():
    """Review finding: 1-D spectral_interpolate silently dropped the
    beam (reference preserves it through _new_spectrum_with,
    lower_dimensional_structures.py:908)."""
    from spectral_cube_tpu.wcs import WCS
    b = Beam(Quantity(1.0, "arcsec"))
    w = WCS(naxis=1)
    w.cunit[0] = u.Unit("GHz")
    spec = OneDSpectrum(Quantity(np.arange(12.0), "Jy"), wcs=w, beam=b)
    out = spec.spectral_interpolate(
        Quantity(np.linspace(0, 11, 23), "GHz"))
    assert out.beam == b


def test_vrods_with_beams_goodbeams_mask():
    """Review finding: with_beams dropped goodbeams_mask."""
    from spectral_cube_tpu.wcs import WCS
    beams = Beams(Quantity(np.arange(1, 13), "arcsec"))
    gbm = np.ones(12, dtype=bool)
    gbm[1] = False
    p = VaryingResolutionOneDSpectrum(Quantity(np.ones(12), "Jy"),
                                      wcs=WCS(naxis=1), beams=beams,
                                      goodbeams_mask=gbm)
    out = p.with_beams(Beams(Quantity(np.arange(2, 14), "arcsec")))
    assert np.all(out.goodbeams_mask == gbm)
    gbm2 = np.ones(12, dtype=bool)
    gbm2[3] = False
    out2 = p.with_beams(Beams(Quantity(np.arange(2, 14), "arcsec")),
                        goodbeams_mask=gbm2)
    assert np.all(out2.goodbeams_mask == gbm2)
