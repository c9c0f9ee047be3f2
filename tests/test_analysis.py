import warnings

import numpy as np
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, OneDSpectrum, Quantity
from spectral_cube_tpu.analysis_utilities import (fourier_shift,
                                                  stack_spectra, stack_cube)
from spectral_cube_tpu.io.fits_low import HDU, write_fits

from conftest import base_header, gaussian_line_cube, make_cube_file


def test_fourier_shift_integer():
    x = np.zeros(32)
    x[10] = 1.0
    out = fourier_shift(x, 5)
    assert np.argmax(out) == 15
    assert out[15] == pytest.approx(1.0, rel=1e-6)


def test_fourier_shift_preserves_nan():
    x = np.sin(np.linspace(0, 4 * np.pi, 64))
    x[20] = np.nan
    out = fourier_shift(x, 3)
    assert np.isnan(out[23])
    assert np.isfinite(out[40])


def test_fourier_shift_all_nan():
    x = np.full(16, np.nan)
    out = fourier_shift(x, 2)
    assert np.isnan(out).all()


def make_shifted_gaussian_cube(tmp_path, nchan=64, ny=4, nx=5, sigma=4.0):
    """Each spaxel hosts a Gaussian line at a known, distinct velocity —
    the reference's stacking ground truth (test_analysis_functions.py)."""
    rng = np.random.RandomState(0)
    v = np.arange(nchan, dtype=float)  # km/s, channel width 1
    centers = 20 + 20 * rng.rand(ny, nx)  # km/s
    data = np.exp(-0.5 * ((v[:, None, None] - centers[None]) / sigma) ** 2)
    h = base_header(nx=nx, ny=ny, nchan=nchan, ctype3="VRAD",
                    cunit3="km/s", crval3=0.0, cdelt3=1.0)
    path = str(tmp_path / "shifted.fits")
    write_fits(path, [HDU(data=data, header=h)])
    return SpectralCube.read(path), centers


def test_stack_spectra_recovers_line(tmp_path):
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    vsurf = Quantity(centers, "km / s")
    stacked = stack_spectra(cube, vsurf, v0=Quantity(32.0, "km / s"))
    assert isinstance(stacked, OneDSpectrum)
    vals = np.asarray(stacked.value)
    sv = np.asarray(stacked.spectral_axis.value)
    # stacked line peaks at v0 and matches the intrinsic width
    peak_v = sv[np.nanargmax(vals)]
    assert peak_v == pytest.approx(32.0, abs=1.0)
    assert np.nanmax(vals) == pytest.approx(1.0, rel=0.02)
    # fitted second moment ~ sigma
    w = np.nan_to_num(vals)
    m1 = (w * sv).sum() / w.sum()
    m2 = (w * (sv - m1) ** 2).sum() / w.sum()
    assert np.sqrt(m2) == pytest.approx(4.0, rel=0.1)


def test_stack_spectra_pads_edges(tmp_path):
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    vsurf = Quantity(centers, "km / s")
    stacked = stack_spectra(cube, vsurf, v0=Quantity(32.0, "km / s"),
                            pad_edges=True)
    assert stacked.size >= cube.shape[0]


def test_stack_spectra_bad_velocities_warn(tmp_path):
    from spectral_cube_tpu.utils import BadVelocitiesWarning
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    bad = centers.copy()
    bad[0, 0] = 1e6
    with pytest.warns(BadVelocitiesWarning):
        stack_spectra(cube, Quantity(bad, "km / s"),
                      v0=Quantity(32.0, "km / s"))


def test_stack_spectra_validation(tmp_path):
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    with pytest.raises(ValueError):
        stack_spectra(cube, Quantity(np.full_like(centers, np.nan),
                                     "km / s"))
    with pytest.raises(ValueError):
        stack_spectra(cube, Quantity(centers[:2], "km / s"))
    with pytest.raises(ValueError):
        stack_spectra(cube, Quantity(centers, "km / s"),
                      v0=Quantity(1e9, "km / s"))


def test_stack_cube_two_lines(tmp_path):
    """Two lines at known rest frequencies stack onto one velocity grid."""
    nchan = 128
    f0 = 100e9
    df = 1e6
    freqs = f0 + np.arange(nchan) * df
    # two gaussian lines in frequency space
    l1, l2 = 100.02e9, 100.08e9
    sig = 3e6
    spec = (np.exp(-0.5 * ((freqs - l1) / sig) ** 2)
            + np.exp(-0.5 * ((freqs - l2) / sig) ** 2))
    data = np.broadcast_to(spec[:, None, None], (nchan, 3, 3)).copy()
    h = base_header(nx=3, ny=3, nchan=nchan, ctype3="FREQ", cunit3="Hz",
                    crval3=f0, cdelt3=df)
    path = str(tmp_path / "twoline.fits")
    write_fits(path, [HDU(data=data, header=h)])
    cube = SpectralCube.read(path)
    out = stack_cube(cube,
                     [Quantity(l1, "Hz"), Quantity(l2, "Hz")],
                     vmin=Quantity(-40, "km / s"),
                     vmax=Quantity(40, "km / s"))
    vals = np.asarray(out.unmasked_data[:, 1, 1].value)
    sv = np.asarray(out.spectral_axis.value)
    # the stacked line peaks near v=0
    assert abs(sv[np.nanargmax(vals)]) < 5.0
    # stacking two identical lines: peak amplitude ~1 (each line ~1 + tail)
    assert np.nanmax(vals) == pytest.approx(1.0, rel=0.1)


def test_stack_spectra_all_bad_velocities_raises(tmp_path):
    """An entirely out-of-range velocity surface raises a clear
    ValueError (not a zero-size reduction crash)."""
    from spectral_cube_tpu.utils import BadVelocitiesWarning
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    with pytest.warns(BadVelocitiesWarning):
        with pytest.raises(ValueError, match="outside the cube's spectral"):
            stack_spectra(cube, Quantity(np.full_like(centers, 1e6),
                                         "km / s"),
                          v0=Quantity(32.0, "km / s"))


def test_fourier_shift_pad_with_valid_zeros():
    """add_pad pads with valid zeros like the reference
    (analysis_utilities.py:59-63): NaN padding shifted into the data
    and blanked real edge channels."""
    from spectral_cube_tpu.analysis_utilities import fourier_shift
    out = fourier_shift(np.ones(8), 2.5, add_pad=True)
    assert out.size == 11
    assert np.isfinite(out).all()


def test_stack_spectra_weighted_mean(tmp_path):
    """weights= computes sum(w*s)/sum(w): uniform weights leave the
    stack unchanged and zero-weight spaxels drop out entirely."""
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    vmap = Quantity(centers, "km / s")
    base = stack_spectra(cube, vmap, v0=Quantity(32.0, "km / s"))
    w2 = np.full(centers.shape, 2.0)
    doubled_w = stack_spectra(cube, vmap, v0=Quantity(32.0, "km / s"),
                              weights=w2)
    np.testing.assert_allclose(np.asarray(doubled_w.value),
                               np.asarray(base.value), rtol=1e-5,
                               atol=1e-7)
    # zero-weight half: result equals stacking only the weighted half
    wsel = np.ones(centers.shape)
    wsel[:, : centers.shape[1] // 2] = 0.0
    sel = stack_spectra(cube, vmap, v0=Quantity(32.0, "km / s"),
                        weights=wsel)
    assert np.isfinite(np.asarray(sel.value)).any()
    assert not np.allclose(np.nanmax(np.asarray(sel.value)), 0.0)


def test_stack_spectra_weights_with_custom_function_refused(cube_adv):
    """weights + a custom stack_function is ambiguous (a bare multiply is
    biased by the mean weight) — refuse instead of silently mis-stacking."""
    from spectral_cube_tpu.analysis_utilities import stack_spectra
    cube, data = cube_adv
    vel = np.zeros(cube.shape[1:])
    w = np.ones(cube.shape[1:])
    with pytest.raises(ValueError):
        stack_spectra(cube, vel, weights=w, stack_function=np.nanmean)


def make_vrad_cube(tmp_path, nchan=64, ny=3, nx=4, sigma=8.0):
    """Gaussian-line cube on a VRAD axis centered on v=0 (the reference's
    generate_gaussian_cube layout, tests/utilities.py:52-111)."""
    data, v = gaussian_line_cube(shape=(nchan, ny, nx), sigma=sigma)
    h = base_header(nx=nx, ny=ny, nchan=nchan, ctype3="VRAD",
                    cunit3="km/s", crval3=float(v[0]), cdelt3=1.0)
    path = str(tmp_path / "vrad_gauss.fits")
    write_fits(path, [HDU(data=data, header=h)])
    return SpectralCube.read(path)


def test_cube_stacking_list_and_out_of_band(tmp_path):
    """reference test_analysis_functions.py:89-131 test_cube_stacking:
    stacking two frequency-labeled copies of one cube over their own rest
    frequencies reproduces the plain velocity slab, and an out-of-band
    line in the linelist is skipped rather than crashing."""
    cube = make_vrad_cube(tmp_path)
    c1 = cube.with_spectral_unit("GHz", velocity_convention="radio",
                                 rest_value=Quantity(1.0, "GHz"))
    c2 = cube.with_spectral_unit("GHz", velocity_convention="radio",
                                 rest_value=Quantity(2.0, "GHz"))
    vmin, vmax = Quantity(-10.0, "km/s"), Quantity(10.0, "km/s")
    linelist = [Quantity(1.0, "GHz"), Quantity(2.0, "GHz")]

    stacked = stack_cube([c1, c2], linelist=linelist, vmin=vmin, vmax=vmax,
                         average=np.nanmean, convolve_beam=None,
                         return_cutouts=False)
    expected = np.asarray(cube.spectral_slab(vmin, vmax).filled_data[:].value)
    np.testing.assert_allclose(np.asarray(stacked.filled_data[:].value),
                               expected, rtol=1e-5, atol=1e-6)
    assert stacked.meta["stacked_lines"] == linelist
    # rest frequency is no longer defined on the stacked cube
    assert not stacked._wcs.restfrq

    # one cube, two lines, one out of band: same answer
    stacked2 = stack_cube(c1, linelist=linelist, vmin=vmin, vmax=vmax,
                          average=np.nanmean, convolve_beam=None)
    np.testing.assert_allclose(np.asarray(stacked2.filled_data[:].value),
                               expected, rtol=1e-5, atol=1e-6)
    assert stacked2.meta["stacked_lines"] == [linelist[0]]

    # mismatched spatial shapes refuse
    small = make_vrad_cube(tmp_path, ny=2, nx=2)
    with pytest.raises(ValueError, match="same spatial shape"):
        stack_cube([c1, small.with_spectral_unit(
            "GHz", velocity_convention="radio",
            rest_value=Quantity(1.0, "GHz"))],
            linelist=linelist, vmin=vmin, vmax=vmax)

    # return_hdu / return_cutouts plumbing
    hdu, cuts = stack_cube(c1, linelist=[Quantity(1.0, "GHz")], vmin=vmin,
                           vmax=vmax, return_hdu=True, return_cutouts=True)
    assert hasattr(hdu, "header") and len(cuts) == 1


def test_stacking_padding_direction(tmp_path):
    """reference test_analysis_functions.py:249-282: with all shifts
    non-positive the padded spectral axis extends to exactly
    [-60, 49] km/s for a 100-channel cube and the stacked profile matches
    the true Gaussian to std(resid) <= 1e-3."""
    vel = np.array([[0.0, 5.0], [5.0, 10.0]])
    nchan = 100
    v = (np.arange(nchan) - nchan // 2) * 1.0
    data = np.exp(-0.5 * ((v[:, None, None] - vel[None]) / 8.0) ** 2)
    h = base_header(nx=2, ny=2, nchan=nchan, ctype3="VRAD",
                    cunit3="km/s", crval3=float(v[0]), cdelt3=1.0)
    p = str(tmp_path / "paddir.fits")
    write_fits(p, [HDU(data=data, header=h)])
    cube = SpectralCube.read(p)
    st = stack_spectra(cube, Quantity(vel, "km/s"), v0=Quantity(0, "km/s"),
                       stack_function=np.nanmean, pad_edges=True)
    sv = np.asarray(st.spectral_axis.value)
    assert sv.min() == -60.0 and sv.max() == 49.0
    true_spectrum = np.exp(-0.5 * (sv / 8.0) ** 2)
    assert np.std(np.abs(np.asarray(st.value) - true_spectrum)) <= 1e-3


def test_stacking_shape_failure(tmp_path):
    """reference test_analysis_functions.py:325-361 (issue 466): wrong
    surface shape and all-NaN surfaces raise the reference's messages."""
    cube, centers = make_shifted_gaussian_cube(tmp_path)
    with pytest.raises(ValueError,
                       match="Velocity surface map does not match"):
        stack_spectra(cube, Quantity(centers[:-1, :-1], "km/s"),
                      v0=Quantity(32.0, "km/s"))
    with pytest.raises(ValueError,
                       match="velocity_surface contains no finite values"):
        stack_spectra(cube, Quantity(np.full(centers.shape, np.nan), "km/s"),
                      v0=Quantity(32.0, "km/s"))


# ---------------------------------------------------------------------------
# reference test_analysis_functions.py stacking battery (names mirror the
# reference's; generate_gaussian_cube re-derived from utilities.py:53-120
# with per-spaxel means locked to within 25% of the spectral span)
# ---------------------------------------------------------------------------

def _gauss_cube(tmp_path, nchan=100, ny=12, nx=12, amp=1.0, sigma=8.0,
                v0=0.0, spec_scale=1.0, noise=None, seed=1):
    rng = np.random.RandomState(seed)
    quarter = nchan // 4
    vels = v0 + (rng.rand(ny, nx) - 0.5) * 2 * quarter * abs(spec_scale)
    # pin the extremes so the padded size is deterministic (the reference
    # generator's means span the full +/- quarter range)
    vels[0, 0] = v0 - quarter * abs(spec_scale)
    vels[0, 1] = v0 + quarter * abs(spec_scale)
    v = v0 + (np.arange(nchan) - nchan / 2) * spec_scale
    data = amp * np.exp(-0.5 * ((v[:, None, None] - vels[None]) / sigma) ** 2)
    if noise:
        data = data + rng.randn(*data.shape) * noise
    h = base_header(nx=nx, ny=ny, nchan=nchan, ctype3="VRAD", cunit3="km/s",
                    crval3=float(v[0]), cdelt3=float(spec_scale))
    p = str(tmp_path / f"gauss_{seed}.fits")
    write_fits(p, [HDU(data=data, header=h)])
    return SpectralCube.read(p), Quantity(vels, "km/s")


def _gaussian(x, amp, v0, sigma):
    return amp * np.exp(-0.5 * ((x - v0) / sigma) ** 2)


def test_stacking_reversed_specaxis(tmp_path):
    """reference test_analysis_functions.py:170-203: stacking on a
    descending spectral axis keeps the axis and recovers the line."""
    cube, vels = _gauss_cube(tmp_path, spec_scale=-1.0, seed=2)
    stacked = stack_spectra(cube, vels, v0=Quantity(0.0, "km/s"),
                            pad_edges=False)
    true = _gaussian(np.asarray(stacked.spectral_axis.value), 1.0, 0.0, 8.0)
    assert np.nanstd(np.abs(np.asarray(stacked.value) - true)) <= 1e-3
    np.testing.assert_allclose(np.asarray(stacked.spectral_axis.value),
                               np.asarray(cube.spectral_axis.value),
                               rtol=1e-6)


def test_stacking_wpadding(tmp_path):
    """reference test_analysis_functions.py:206-246: pad_edges grows the
    axis by the maximum shift (~25% per side for these velocities)."""
    cube, vels = _gauss_cube(tmp_path, seed=4)
    stacked = stack_spectra(cube, vels, v0=Quantity(0.0, "km/s"),
                            pad_edges=True)
    true = _gaussian(np.asarray(stacked.spectral_axis.value), 1.0, 0.0, 8.0)
    assert np.nanstd(np.abs(np.asarray(stacked.value) - true)) <= 1e-3
    stack_shape = int(cube.shape[0] * 1.5)
    assert abs(len(np.atleast_1d(stacked.value)) - stack_shape) <= 1


def test_stacking_woffset(tmp_path):
    """reference test_analysis_functions.py:284-321: absolute velocity
    offsets don't bias the stack."""
    cube, vels = _gauss_cube(tmp_path, v0=100.0, seed=3)
    stacked = stack_spectra(cube, vels, v0=Quantity(100.0, "km/s"),
                            pad_edges=True)
    true = _gaussian(np.asarray(stacked.spectral_axis.value),
                     1.0, 100.0, 8.0)
    assert np.nanstd(np.abs(np.asarray(stacked.value) - true)) <= 1e-3
    stack_shape = int(cube.shape[0] * 1.5)
    assert abs(len(np.atleast_1d(stacked.value)) - stack_shape) <= 1


def test_stacking_noisy(tmp_path):
    """reference test_analysis_functions.py:324-361: noise averages down
    in the stack."""
    cube, vels = _gauss_cube(tmp_path, noise=0.01, seed=5)
    stacked = stack_spectra(cube, vels, v0=Quantity(0.0, "km/s"),
                            pad_edges=True)
    true = _gaussian(np.asarray(stacked.spectral_axis.value), 1.0, 0.0, 8.0)
    resid = np.abs(np.asarray(stacked.value) - true)
    assert np.nanstd(resid[np.isfinite(resid)]) <= 1e-3


def test_stacking_badvels(tmp_path):
    """reference test_analysis_functions.py:135-167 (regression 493): an
    out-of-range velocity warns and is excluded without biasing."""
    from spectral_cube_tpu.utils import BadVelocitiesWarning
    cube, vels = _gauss_cube(tmp_path, seed=6)
    v2 = Quantity(np.asarray(vels.value).copy(), "km/s")
    v2.value[5, 7] = 500.0
    with pytest.warns(BadVelocitiesWarning):
        stacked = stack_spectra(cube, v2, v0=Quantity(0.0, "km/s"),
                                pad_edges=False)
    true = _gaussian(np.asarray(stacked.spectral_axis.value), 1.0, 0.0, 8.0)
    assert np.nanstd(np.abs(np.asarray(stacked.value) - true)) <= 1e-3


def test_stack_cube_beamless(tmp_path):
    """Review finding: stack_cube crashed with NoBeamError on beam-less
    cubes instead of stacking them as-is."""
    nchan, f0, df = 64, 100e9, 1e6
    freqs = f0 + np.arange(nchan) * df
    l1 = 100.02e9
    spec = np.exp(-0.5 * ((freqs - l1) / 3e6) ** 2)
    data = np.broadcast_to(spec[:, None, None], (nchan, 3, 3)).copy()
    h = base_header(nx=3, ny=3, nchan=nchan, ctype3="FREQ", cunit3="Hz",
                    crval3=f0, cdelt3=df, beam=False)
    p = str(tmp_path / "beamless.fits")
    write_fits(p, [HDU(data=data, header=h)])
    cube = SpectralCube.read(p)
    assert cube._beam is None
    out = stack_cube([cube, cube], [Quantity(l1, "Hz")],
                     vmin=Quantity(-40, "km / s"),
                     vmax=Quantity(40, "km / s"))
    assert out is not None
