import warnings

import numpy as np
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import (SpectralCube, VaryingResolutionSpectralCube,
                               Beam, Beams, Quantity,
                               VaryingResolutionOneDSpectrum, Slice)
from spectral_cube_tpu.utils import (NonFiniteBeamsWarning,
                                     BeamAverageWarning)

from conftest import make_vr_cube_file


def test_beams_attached(cube_vr):
    cube, _ = cube_vr
    assert isinstance(cube, VaryingResolutionSpectralCube)
    assert len(cube.unmasked_beams) == cube.shape[0]
    majors = cube.unmasked_beams.major.to_value("arcsec")
    np.testing.assert_allclose(majors, np.linspace(1.0, 1.5, 4), rtol=1e-5)


def test_beam_length_mismatch_raises(cube_vr):
    cube, data = cube_vr
    with pytest.raises(ValueError):
        VaryingResolutionSpectralCube(
            data=cube._data, wcs=cube.wcs,
            beams=Beams(major=Quantity([1, 2], "arcsec")))


def test_nonfinite_beams_masked(tmp_path):
    majors = np.array([1.0, np.nan, 1.2, 1.3], dtype="f4")
    path, data = make_vr_cube_file(tmp_path, major_arcsec=majors)
    with pytest.warns(NonFiniteBeamsWarning):
        cube = SpectralCube.read(path)
    assert not cube.goodbeams_mask[1]
    filled = np.asarray(cube.filled_data[:].value)
    assert np.isnan(filled[1]).all()


def test_spectral_slicing_keeps_beams(cube_vr):
    cube, _ = cube_vr
    sub = cube[1:3]
    assert isinstance(sub, VaryingResolutionSpectralCube)
    assert len(sub.unmasked_beams) == 2
    assert sub.unmasked_beams[0] == cube.unmasked_beams[1]


def test_channel_slice_gets_single_beam(cube_vr):
    cube, _ = cube_vr
    sl = cube[2]
    assert isinstance(sl, Slice)
    assert sl.beam == cube.unmasked_beams[2]


def test_spectrum_slice_gets_beams(cube_vr):
    cube, _ = cube_vr
    spec = cube[:, 1, 1]
    assert isinstance(spec, VaryingResolutionOneDSpectrum)
    assert len(spec.beams) == 4


def test_2d_slice_along_spectral_forbidden(cube_vr):
    cube, _ = cube_vr
    with pytest.raises(NotImplementedError):
        cube[:, 1, :]


def test_moment_requires_matched_beams(cube_vr):
    cube, _ = cube_vr
    # beams differ by ~50% in area: spectral reductions must raise
    with pytest.raises(ValueError):
        cube.moment0()
    with pytest.raises(ValueError):
        cube.sum(axis=0)
    # spatial reductions are fine
    cube.sum(axis=1)


@pytest.mark.filterwarnings("ignore::spectral_cube_tpu.utils.BeamAverageWarning")
def test_beam_threshold_override(cube_vr):
    cube, _ = cube_vr
    cube.beam_threshold = 2.0  # very loose: allow the variation
    m0 = cube.moment0()
    assert m0.shape == cube.shape[1:]


def test_identify_and_mask_bad_beams(tmp_path):
    majors = np.array([1.0, 1.01, 5.0, 1.02], dtype="f4")
    path, _ = make_vr_cube_file(tmp_path, major_arcsec=majors)
    cube = SpectralCube.read(path)
    good = cube.identify_bad_beams(threshold=0.5)
    assert list(good) == [True, True, False, True]
    masked = cube.mask_out_bad_beams(0.5)
    filled = np.asarray(masked.filled_data[:].value)
    assert np.isnan(filled[2]).all()
    assert not masked.goodbeams_mask[2]


def test_average_beams(cube_vr):
    cube, _ = cube_vr
    avg = cube.average_beams()
    majors = cube.unmasked_beams.major.to_value("deg")
    assert avg.major.to_value("deg") == pytest.approx(majors.mean(),
                                                      rel=1e-6)


def test_common_beam_contains_all(cube_vr):
    cube, _ = cube_vr
    cb = cube.common_beam()
    for b in cube.beams:
        cb.deconvolve(b)


def test_spectral_interpolate_raises(cube_vr):
    cube, _ = cube_vr
    with pytest.raises(AttributeError):
        cube.spectral_interpolate(Quantity(np.array([-321.0, -320.0]),
                                           "km / s"))
    with pytest.raises(AttributeError):
        cube.spectral_smooth(np.ones(3) / 3)


def test_jtok_factors(cube_vr):
    cube, _ = cube_vr
    factors = cube.jtok_factors()
    assert factors.shape == (4,)
    assert (factors > 0).all()
    # bigger beams -> smaller K per Jy/beam
    assert factors[0] > factors[-1]


def test_to_kelvin_per_channel(cube_vr):
    cube, data = cube_vr
    kcube = cube.to("K")
    factors = cube.jtok_factors()
    got = np.asarray(kcube.unmasked_data[:].value)
    expected = data * factors[:, None, None]
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.filterwarnings("ignore::spectral_cube_tpu.utils.BeamAverageWarning")
def test_with_beams(cube_vr):
    cube, _ = cube_vr
    nb = Beams(major=Quantity([2, 2, 2, 2], "arcsec"))
    out = cube.with_beams(nb, raise_error_jybm=False)
    assert out.unmasked_beams[0].major.to_value("arcsec") == \
        pytest.approx(2.0)
    # now beams match: moments work
    m0 = out.moment0()
    assert m0.shape == cube.shape[1:]


def test_casambm_header(cube_vr):
    cube, _ = cube_vr
    assert cube.header["CASAMBM"] is True


def test_varyres_moment_attaches_average_beam(cube_vr):
    """Spectral reductions of a VR cube attach the average beam with the
    averaging warning (reference issue364 regression,
    test_spectral_cube.py test_varyres_moment_logic_issue364)."""
    cube, data = cube_vr
    cube.beam_threshold = 1.0
    with pytest.warns(BeamAverageWarning):
        m0 = cube.moment(order=0)
    assert m0.beam is not None
    assert "beam" in m0.meta
    expected = cube.average_beams()
    assert m0.beam.major.to_value("deg") == pytest.approx(
        expected.major.to_value("deg"))
    with pytest.warns(BeamAverageWarning):
        mx = cube.max(axis=0)
    assert mx.beam is not None


def test_vr_oned_collapse_carries_beams(cube_vr):
    """Collapsing a VR cube over the sky keeps the per-channel beams on
    the resulting spectrum (reference test_oned_collapse_beams)."""
    cube, data = cube_vr
    sp = cube.mean(axis=(1, 2))
    assert hasattr(sp, "beams")
    assert len(sp.beams) == cube.shape[0]


def test_convolve_to_with_nan_beam(tmp_path):
    """Channels whose beams are non-finite are skipped (NaN output)
    instead of crashing the kernel builder (reference
    spectral_cube.py:4216-4231 skips bad channels), and the bad-beam
    warning fires once at attach, not per derived operation."""
    import warnings
    from conftest import make_vr_cube_file
    from spectral_cube_tpu import SpectralCube, Beams
    from spectral_cube_tpu.units import Quantity

    pv, _ = make_vr_cube_file(tmp_path, shape=(5, 8, 8))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vr = SpectralCube.read(str(pv))
    majs = np.asarray(vr.unmasked_beams.major.to("arcsec").value).copy()
    majs[2] = np.nan
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        vr2 = vr.with_beams(Beams(major=Quantity(majs, "arcsec")), raise_error_jybm=False)
    assert sum("Non-finite" in str(w.message) for w in rec) == 1
    assert not np.asarray(vr2.get_mask_array())[2].any()
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        derived = vr2[1:, :, :] * 2
        np.asarray(derived.filled_data[:2])
    assert sum("Non-finite" in str(w.message) for w in rec2) == 0
    out = vr2.convolve_to(vr2.beams.common_beam())
    a = np.asarray(out.unmasked_data[:])
    assert np.isnan(a[2]).all()
    assert np.isfinite(a[0]).any()


def test_beams_scalar_broadcast():
    from spectral_cube_tpu import Beams
    from spectral_cube_tpu.units import Quantity
    b = Beams(major=Quantity([1.0, 2.0, 3.0], "arcsec"),
              minor=Quantity(0.5, "arcsec"))
    assert len(b) == 3
    np.testing.assert_allclose(np.asarray(b.minor.to("arcsec").value),
                               [0.5, 0.5, 0.5])


def test_convolve_to_allow_smaller_passes_channels_through(tmp_path):
    """allow_smaller=True: channels whose beam cannot be deconvolved from
    the target pass through unconvolved with unit factor 1 (reference
    spectral_cube.py:4195-4204 appends kernel=None/factor 1); with
    allow_smaller=False the same call raises BeamError."""
    import warnings
    from conftest import make_vr_cube_file
    from spectral_cube_tpu import SpectralCube, Beams
    from spectral_cube_tpu.beams import BeamError
    from spectral_cube_tpu.units import Quantity

    pv, data = make_vr_cube_file(tmp_path, shape=(4, 16, 16))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vr = SpectralCube.read(str(pv))
    majs = np.asarray(vr.unmasked_beams.major.to("arcsec").value).copy()
    majs[1] = majs.max() * 3.0  # bigger than any target we pick below
    vr = vr.with_beams(Beams(major=Quantity(majs, "arcsec")), raise_error_jybm=False)
    # target: slightly larger than every beam EXCEPT channel 1
    target = vr.unmasked_beams[0].convolve(vr.unmasked_beams[0])
    with pytest.raises(BeamError):
        vr.convolve_to(target)
    out = vr.convolve_to(target, allow_smaller=True)
    a = np.asarray(out.unmasked_data[:])
    # the undeconvolvable channel passed through unchanged
    np.testing.assert_allclose(a[1], data[1], rtol=1e-6, equal_nan=True)
    # the other channels were genuinely convolved (changed)
    assert not np.allclose(a[0], data[0], rtol=1e-4, equal_nan=True)


def test_pixels_per_beam_filters_bad_beams(cube_vr):
    """Review finding: pixels_per_beam iterated the unfiltered beams,
    leaking NaN entries for bad channels (reference iterates the
    goodbeams-filtered set, base_class.py:552-560)."""
    cube, _ = cube_vr
    mcube = cube.mask_channels([True, False, True, True])
    ppb = np.asarray(mcube.pixels_per_beam)
    assert len(ppb) == 3
    assert np.isfinite(ppb).all()


def test_apply_function_beam_check_on_spectral_axis(cube_vr):
    """apply_function / apply_numpy_function over the spectral axis of a
    varying-resolution cube require matched beams (the reference's
    __getattribute__ hook at spectral_cube.py:4077-4095 wraps both in
    _handle_beam_areas_wrapper); spatial axes and axis=None are exempt."""
    vr, data = cube_vr  # beams 1.0..1.5 arcsec: far beyond the threshold
    with pytest.raises(ValueError):
        vr.apply_function(np.mean, axis=0)
    with pytest.raises(ValueError):
        vr.apply_numpy_function(np.nansum, axis=0)
    with pytest.raises(ValueError):
        vr.apply_numpy_function(np.nansum, axis=(0, 1))
    # non-spectral applications proceed
    out = vr.apply_function(np.mean, axis=1)
    assert out.shape == (data.shape[0], data.shape[2])
    scalar = vr.apply_function(np.sum, axis=None)
    assert np.isfinite(float(getattr(scalar, "value", scalar)))
    # equal beams pass the check
    eq = vr.with_beams(Beams(beams=[vr.unmasked_beams[0]] * data.shape[0]),
                       raise_error_jybm=False)
    res = eq.apply_function(np.mean, axis=0)
    assert res.shape == data.shape[1:]


def test_apply_function_positional_axis_signature_parity(cube_vr):
    """Review finding: the VRSC overrides narrowed the base signatures —
    positional axis must both work AND trigger the beam check."""
    vr, data = cube_vr
    with pytest.raises(ValueError):
        vr.apply_function(np.mean, 0)        # positional spectral axis
    with pytest.raises(ValueError):
        vr.apply_numpy_function(np.nansum, np.nan, False, None, False, 0)
    out = vr.apply_function(np.mean, 1)      # positional spatial axis ok
    assert out.shape == (data.shape[0], data.shape[2])
    out2 = vr.apply_numpy_function(np.nansum, np.nan, False, None, False, 1)
    assert out2.shape == (data.shape[0], data.shape[2])
    # positional weights (3rd positional of the base signature)
    w = np.ones(data.shape)
    out3 = vr.apply_function(np.sum, 1, w)
    np.testing.assert_allclose(out3, vr.apply_function(np.sum, axis=1,
                                                       weights=w),
                               equal_nan=True)


def test_apply_function_axis_none_ignores_weights(cube_vr):
    """Reference spectral_cube.py:1049: the axis=None path calls
    flattened() without weights."""
    vr, data = cube_vr
    w = np.full(data.shape, 3.0)
    a = vr.apply_function(np.sum, axis=None, weights=w)
    b = vr.apply_function(np.sum, axis=None)
    assert float(getattr(a, "value", a)) == pytest.approx(
        float(getattr(b, "value", b)))
