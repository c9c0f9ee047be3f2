"""Module-function surface of wcs_utils/cube_utils — the reference's
free-function spellings (reference tests/test_wcs_utils.py and
tests/test_cube_utils.py).  Expected numbers are the reference's own
hard-coded values."""
import numpy as np
import pytest

from spectral_cube_tpu.wcs import WCS
from spectral_cube_tpu import wcs_utils
from spectral_cube_tpu.wcs_utils import (
    drop_axis, add_stokes_axis_to_wcs, wcs_swapaxes, reindex_wcs,
    axis_names, slice_wcs, check_equality, strip_wcs_from_header,
    diagonal_wcs_to_cdelt, is_pixel_axis_to_wcs_correlated,
    find_spatial_pixel_index)
from spectral_cube_tpu.cube_utils import (
    is_huge, iterator_strategy, try_load_beam, try_load_beams,
    beams_to_bintable, beam_props, convert_bunit, largest_beam,
    smallest_beam)


def _wcs3(ctypes=("RA---SIN", "DEC--SIN", "VRAD")):
    w = WCS(naxis=3)
    w.ctype = list(ctypes)
    w.cunit = ["deg", "deg", "m s-1"]
    return w


def test_wcs_dropping_and_swapping():
    """reference test_wcs_utils.py:16-61."""
    w = _wcs3()
    d = drop_axis(w, 0)
    assert d.naxis == 2 and list(d.ctype) == ["DEC--SIN", "VRAD"]
    s = wcs_swapaxes(w, 0, 2)
    assert list(s.ctype) == ["VRAD", "DEC--SIN", "RA---SIN"]
    r = reindex_wcs(w, [2, 1, 0])
    assert list(r.ctype) == ["VRAD", "DEC--SIN", "RA---SIN"]


def test_add_stokes():
    """reference test_wcs_utils.py:64-69: insertion works at any index."""
    w = _wcs3()
    for ii in range(4):
        out = add_stokes_axis_to_wcs(w, ii)
        assert out.naxis == 4
        assert out.ctype[ii] == "STOKES"


def test_axis_names():
    """reference test_wcs_utils.py:97-101."""
    assert axis_names(_wcs3()) == ["RA", "DEC", "VRAD"]
    assert axis_names(_wcs3(("VOPT", "RA---TAN", "DEC--TAN"))) == \
        ["VOPT", "RA", "DEC"]


def test_wcs_slice():
    """reference test_wcs_utils.py:104-108 (exact crpix values)."""
    w = WCS(naxis=3)
    w.crpix = [50., 45., 30.]
    out = slice_wcs(w, (slice(10, 20), slice(None), slice(20, 30)))
    np.testing.assert_allclose(out.crpix, [30., 45., 20.])


def test_wcs_slice_reversal_and_roundtrip():
    """reference test_wcs_utils.py:110-146."""
    w = WCS(naxis=3)
    w.crpix = [50., 45., 30.]
    w.crval = [0., 0., 0.]
    w.cdelt = [1., 1., 1.]
    rev = slice_wcs(w, (slice(None, None, -1), slice(None), slice(None)),
                    shape=[100, 150, 200])
    spaxis = np.ravel(np.asarray(
        w.sub([0]).wcs_pix2world(np.arange(100), 0), dtype=float))
    new_spaxis = np.ravel(np.asarray(
        rev.sub([0]).wcs_pix2world(np.arange(100), 0), dtype=float))
    np.testing.assert_allclose(spaxis, new_spaxis[::-1])
    r2 = slice_wcs(rev, (slice(None, None, -1), slice(None), slice(None)),
                   shape=[100, 150, 200])
    r3 = slice_wcs(r2, (slice(None, None, -1), slice(None), slice(None)),
                   shape=[100, 150, 200])
    r4 = slice_wcs(r3, (slice(None, None, -1), slice(None), slice(None)),
                   shape=[100, 150, 200])
    assert check_equality(r4, r2)


def test_wcs_downsampling_crpix():
    """reference test_wcs_utils.py:217-244 (pen-and-paper values)."""
    w = WCS(naxis=1)
    w.ctype = ["FREQ"]
    w.crpix = [1.]
    assert slice_wcs(w, slice(0, None, 1)).crpix[0] == 1
    assert slice_wcs(w, slice(0, None, 2)).crpix[0] == 0.75
    assert slice_wcs(w, slice(0, None, 4)).crpix[0] == 0.625
    assert slice_wcs(w, slice(2, None, 1)).crpix[0] == -1
    assert slice_wcs(w, slice(2, None, 2)).crpix[0] == -0.25
    assert slice_wcs(w, slice(2, None, 4)).crpix[0] == 0.125


def test_wcs_comparison_tolerance():
    """reference test_wcs_utils.py:147-172."""
    w1 = WCS(naxis=3); w1.crpix = [50., 45., 30.]
    w2 = WCS(naxis=3); w2.crpix = [50., 45., 30.]
    w3 = WCS(naxis=3); w3.crpix = [50., 45., 31.]
    w4 = WCS(naxis=3); w4.crpix = [50., 45., 30.0001]
    assert check_equality(w1, w2)
    assert not check_equality(w1, w3)
    assert check_equality(w1, w3, wcs_tolerance=1.0e1)
    assert not check_equality(w1, w4)
    assert check_equality(w1, w4, wcs_tolerance=1e-3)


def test_strip_wcs_from_header(cube_adv):
    """reference test_wcs_utils.py:174-192: no WCS keyword survives."""
    cube, _ = cube_adv
    hdr = cube.header
    stripped = strip_wcs_from_header(hdr)
    for k in stripped.keys():
        for frag in ("CRPIX", "CRVAL", "CDELT", "CTYPE", "CUNIT", "PC",
                     "NAXIS", "RESTFRQ"):
            assert not str(k).startswith(frag), k


def test_diagonal_wcs_to_cdelt():
    """reference wcs_utils.py:478-490: diagonal PC folds into CDELT."""
    w = _wcs3()
    w.cdelt = [1., 2., 3.]
    w.pc = np.diag([2., 1., 0.5])
    out = diagonal_wcs_to_cdelt(w)
    np.testing.assert_allclose(out.cdelt, [2., 2., 1.5])
    np.testing.assert_allclose(out.pc, np.eye(3))
    # off-diagonal PC: untouched
    w.pc = np.array([[1., 0.1, 0], [0, 1, 0], [0, 0, 1.]])
    assert diagonal_wcs_to_cdelt(w) is w


def test_pixel_axis_correlation_gate():
    """Rotated PC couples the spatial axes (reference
    wcs_utils.py:493-514)."""
    w = _wcs3()
    assert is_pixel_axis_to_wcs_correlated(w, 1)  # lat: projection-coupled
    assert not is_pixel_axis_to_wcs_correlated(w, 0)  # spectral


def test_find_spatial_pixel_index(cube_adv):
    cube, _ = cube_adv
    xlo, xhi, ylo, yhi = find_spatial_pixel_index(cube, "min", "max",
                                                  "min", "max")
    assert (xlo, ylo) == (0, 0)
    assert xhi >= cube.shape[2] - 1 and yhi >= cube.shape[1] - 1


def test_cube_utils_misc(cube_adv):
    """is_huge / iterator_strategy / convert_bunit / beam functions
    (reference test_cube_utils.py + cube_utils.py:270-508)."""
    cube, _ = cube_adv
    assert not is_huge(cube)
    assert iterator_strategy(cube) == "cube"
    assert str(convert_bunit("JY/BEAM")) == "Jy / beam"
    with pytest.warns(UserWarning):
        assert convert_bunit("notaunit~~") is None

    from spectral_cube_tpu.beams import Beam
    from spectral_cube_tpu.units import Quantity
    beams = [Beam(Quantity(a, "arcsec")) for a in (1.0, 2.0, 3.0)]
    assert largest_beam(beams) == beams[2]
    assert smallest_beam(beams) == beams[0]
    maj, mnr, pa = beam_props(beams, includemask=[True, False, True])
    assert len(np.asarray(maj.value)) == 2
    hdu = beams_to_bintable(beams)
    assert hdu.header["NCHAN"] == 3


def test_try_load_beam_paths(cube_adv):
    cube, _ = cube_adv
    hdr = dict(cube.header)
    hdr["BMAJ"] = 1e-3; hdr["BMIN"] = 1e-3; hdr["BPA"] = 0.0
    b = try_load_beam(hdr)
    assert b is not None and abs(b.major.to_value("deg") - 1e-3) < 1e-12
    assert try_load_beam({}) is None


# ---------------------------------------------------------------------------
# reference test_wcs_utils.py scenario battery
# ---------------------------------------------------------------------------

def test_wcs_swapping():
    """reference test_wcs_utils.py:40-61: pc diagonals permute under
    swapaxes."""
    w = WCS(naxis=4)
    w.pc = np.diag(np.arange(1.0, 5.0))
    for (a, b), diag in [((0, 1), [2, 1, 3, 4]), ((0, 3), [4, 2, 3, 1]),
                         ((2, 3), [1, 2, 4, 3])]:
        sw = wcs_utils.wcs_swapaxes(w, a, b)
        np.testing.assert_array_equal(np.diag(np.asarray(sw.pc)), diag)


def test_pixel_shape_preserved_on_reindex():
    """reference test_wcs_utils.py:72-94 (regression 1000): pixel_shape
    follows drop/swap/add-stokes instead of resetting."""
    w = WCS(naxis=3)
    w.ctype = ["GLON-CAR", "GLAT-CAR", "VRAD"]
    w.pixel_shape = (4321, 2161, 118)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        assert tuple(wcs_utils.drop_axis(w, 2).pixel_shape) == (4321, 2161)
        assert tuple(wcs_utils.drop_axis(w, 0).pixel_shape) == (2161, 118)
    assert tuple(wcs_utils.wcs_swapaxes(w, 0, 2).pixel_shape) \
        == (118, 2161, 4321)
    assert tuple(wcs_utils.add_stokes_axis_to_wcs(w, 0).pixel_shape) \
        == (1, 4321, 2161, 118)
    bare = WCS(naxis=3)
    assert wcs_utils.drop_axis(bare, 2).pixel_shape is None


def test_reversal_roundtrip():
    """reference test_wcs_utils.py:122-152: a reversed axis reads its
    world values in reverse order, and double-reversal converges."""
    w = WCS(naxis=3)
    w.crpix = np.array([50.0, 45.0, 30.0])
    w.crval = np.zeros(3)
    w.cdelt = np.ones(3)
    view = (slice(None, None, -1), slice(None), slice(None))
    shape = [100, 150, 200]
    wn = wcs_utils.slice_wcs(w, view, shape=shape)

    def spaxis(wx):
        # world values along FITS axis 3 (the reversed numpy axis 0)
        pix = [np.zeros(100), np.zeros(100), np.arange(100.0)]
        return np.asarray(wx.pix2world(*pix)[2])

    np.testing.assert_allclose(spaxis(w), spaxis(wn)[::-1])
    rr = wcs_utils.slice_wcs(wn, view, shape=shape)
    np.testing.assert_allclose(spaxis(w), spaxis(rr))
    rrr = wcs_utils.slice_wcs(rr, view, shape=shape)
    rrrr = wcs_utils.slice_wcs(rrr, view, shape=shape)
    assert wcs_utils.check_equality(rrrr, rr)


def test_wcs_slice_unmatched_celestial():
    """reference test_wcs_utils.py:194-215: dropping one member of a
    celestial pair warns."""
    import warnings as _w
    w = WCS(naxis=3)
    w.ctype = ["RA---TAN", "DEC--TAN", "FREQ"]
    w.crpix = np.array([50.0, 45.0, 30.0])
    for ax in (0, 1):
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            wcs_utils.drop_axis(w, ax)
        assert any("removed" in str(x.message) for x in rec)
