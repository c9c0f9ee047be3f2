"""Convolution, reprojection, interpolation, downsampling tests
(the reference's test_regrid.py battery, re-derived)."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, Beam, Quantity
from spectral_cube_tpu.io.fits_low import Header, HDU, write_fits
from spectral_cube_tpu.ops.convolve import convolve2d_nan_fft
from spectral_cube_tpu.ops.interpolate import downsample_axis

from conftest import base_header, make_cube_file, make_vr_cube_file


def make_delta_cube(tmp_path, shape=(2, 25, 25), beam_arcsec=None,
                    pixscale_deg=5.55e-4):
    """Delta-function cube: ground truth for convolution (the reference's
    data_255_delta fixture, conftest.py:429-436)."""
    nchan, ny, nx = shape
    data = np.zeros(shape)
    data[:, ny // 2, nx // 2] = 1.0
    h = base_header(nx=nx, ny=ny, nchan=nchan, beam=False)
    h["CDELT1"] = -pixscale_deg
    h["CDELT2"] = pixscale_deg
    h["BUNIT"] = "K"
    if beam_arcsec is not None:
        h["BMAJ"] = beam_arcsec / 3600.0
        h["BMIN"] = beam_arcsec / 3600.0
        h["BPA"] = 0.0
    path = str(tmp_path / "delta.fits")
    write_fits(path, [HDU(data=data, header=h)])
    return SpectralCube.read(path), data


def test_convolve_delta_gives_kernel(tmp_path):
    """Convolving a delta function reproduces the deconvolved kernel."""
    pix_deg = 5.55e-4
    cube, _ = make_delta_cube(tmp_path, beam_arcsec=2 * pix_deg * 3600)
    target = Beam.make(Quantity(6 * pix_deg, "deg"))
    out = cube.convolve_to(target)
    img = np.asarray(out.unmasked_data[1].value)
    # peak at center, gaussian shape with correct width
    iy, ix = np.unravel_index(np.argmax(img), img.shape)
    assert (iy, ix) == (12, 12)
    conv_beam = target.deconvolve(cube.beam)
    kernel = conv_beam.as_kernel(Quantity(pix_deg, "deg").to("rad"),
                                 x_size=25, y_size=25)
    np.testing.assert_allclose(img, kernel, atol=1e-6)


def test_convolve_point_source_peak_preserved_jybm(tmp_path):
    """Jy/beam point source: convolution rescales so the peak stays 1
    (the physically-calibrated fixture, reference conftest.py:589-659)."""
    pix_deg = 5.55e-4
    nchan, ny, nx = 2, 25, 25
    beam0 = Beam.make(Quantity(4 * pix_deg, "deg"))
    # a point source observed with beam0, in Jy/beam: gaussian with peak 1
    kernel0 = np.asarray(beam0.as_kernel(Quantity(pix_deg, "deg").to("rad"),
                                         x_size=25, y_size=25))
    img = kernel0 / kernel0.max()
    data = np.broadcast_to(img, (nchan, ny, nx)).copy()
    h = base_header(nx=nx, ny=ny, nchan=nchan, beam=False)
    h["CDELT1"] = -pix_deg
    h["CDELT2"] = pix_deg
    h["BUNIT"] = "Jy/beam"
    h["BMAJ"] = h["BMIN"] = 4 * pix_deg
    h["BPA"] = 0.0
    path = str(tmp_path / "point.fits")
    write_fits(path, [HDU(data=data, header=h)])
    cube = SpectralCube.read(path)
    target = Beam.make(Quantity(5 * pix_deg, "deg"))
    out = cube.convolve_to(target)
    peak = float(np.asarray(out.unmasked_data[0].value).max())
    assert peak == pytest.approx(1.0, rel=0.01)


def test_convolve2d_nan_interpolation():
    img = np.ones((16, 16))
    img[8, 8] = np.nan
    k = np.ones((3, 3)) / 9.0
    out = np.asarray(convolve2d_nan_fft(img, k))
    # NaN gets interpolated from neighbors (all ones)
    assert out[8, 8] == pytest.approx(1.0, rel=1e-6)


def test_convolve_to_same_beam_identity(tmp_path):
    pix_deg = 5.55e-4
    cube, data = make_delta_cube(tmp_path, beam_arcsec=4 * pix_deg * 3600)
    out = cube.convolve_to(cube.beam)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value), data,
                               atol=1e-6)


def test_vr_convolve_to_common(cube_vr):
    cube, data = cube_vr
    common = cube.common_beam()
    out = cube.convolve_to(common)
    from spectral_cube_tpu import SpectralCube as SC
    assert isinstance(out, SC)
    assert out.beam == common
    assert np.isfinite(np.asarray(out.unmasked_data[:].value)).all()


def test_vr_convolve_smaller_raises(cube_vr):
    cube, _ = cube_vr
    small = Beam.make(Quantity(0.5, "arcsec"))
    from spectral_cube_tpu.beams import BeamError
    with pytest.raises(BeamError):
        cube.convolve_to(small)


def test_spectral_interpolate_linear_data(cube_adv):
    cube, data = cube_adv
    sv = np.asarray(cube.spectral_axis.value)
    # interpolation onto midpoints of a linear function is exact
    lin = np.arange(4)[:, None, None] * np.ones((4, 3, 2))
    cube2 = cube._new_cube_with(data=jnp.asarray(lin), mask=None)
    mid = Quantity((sv[:-1] + sv[1:]) / 2.0, "km / s")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = cube2.spectral_interpolate(mid)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value),
                               (lin[:-1] + lin[1:]) / 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.spectral_axis.value),
                               mid.value, rtol=1e-10)


def test_spectral_interpolate_nonlinear_grid_raises(cube_adv):
    cube, _ = cube_adv
    with pytest.raises(ValueError):
        cube.spectral_interpolate(Quantity(np.array([-321.0, -320.0,
                                                     -318.0]), "km / s"))


def test_spectral_interpolate_nyquist_warning(tmp_path):
    from spectral_cube_tpu.utils import SmoothingWarning
    path, data = make_cube_file(tmp_path, shape=(16, 3, 2))
    cube = SpectralCube.read(path)
    sv = np.asarray(cube.spectral_axis.value)
    coarse = Quantity(np.linspace(sv[0], sv[-1], 4), "km / s")
    with pytest.warns(SmoothingWarning):
        cube.spectral_interpolate(coarse)


@pytest.mark.parametrize("estimator", ["mean", "sum", "median"])
def test_downsample_axis(estimator):
    data = np.arange(24.0).reshape(6, 2, 2)
    out = np.asarray(downsample_axis(jnp.asarray(data), 2, 0,
                                     estimator=estimator))
    npfn = {"mean": np.nanmean, "sum": np.nansum,
            "median": np.nanmedian}[estimator]
    expected = np.stack([npfn(data[i:i + 2], axis=0)
                         for i in range(0, 6, 2)])
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_downsample_ragged_tail():
    data = np.arange(10.0).reshape(5, 2, 1)
    out = np.asarray(downsample_axis(jnp.asarray(data), 2, 0,
                                     estimator="mean"))
    assert out.shape == (3, 2, 1)
    # last block has one sample
    np.testing.assert_allclose(out[2, :, 0], data[4, :, 0])


def test_cube_downsample_wcs(cube_adv):
    cube, data = cube_adv
    out = cube.downsample_axis(2, axis=0)
    assert out.shape == (2, 3, 2)
    sv = np.asarray(cube.spectral_axis.value)
    svd = np.asarray(out.spectral_axis.value)
    # downsampled channel centers at block centers
    np.testing.assert_allclose(svd, [(sv[0] + sv[1]) / 2,
                                     (sv[2] + sv[3]) / 2], rtol=1e-9)


def test_reproject_identity(cube_adv):
    cube, data = cube_adv
    hdr = cube.header
    out = cube.reproject(hdr)
    got = np.asarray(out.unmasked_data[:].value)
    np.testing.assert_allclose(got, data, rtol=1e-5, atol=1e-6,
                               equal_nan=True)
    assert out.wcs.check_equality(cube.wcs, wcs_tolerance=1e-9)


def test_reproject_offset_halfpixel(tmp_path):
    path, data = make_cube_file(tmp_path, shape=(3, 16, 16), with_nan=False)
    cube = SpectralCube.read(path)
    hdr = cube.header
    hdr["CRPIX1"] = float(hdr["CRPIX1"]) + 0.5  # shift grid by half pixel
    out = cube.reproject(hdr)
    got = np.asarray(out.unmasked_data[:].value)
    # output pixel x samples input x - 0.5: average of x-1 and x neighbors
    expected = 0.5 * (data[:, :, :-1] + data[:, :, 1:])
    np.testing.assert_allclose(got[:, :, 1:], expected, rtol=2e-2,
                               atol=2e-2)


def test_mosaic_two_offset_cubes(tmp_path):
    """Mosaicking two overlapping cubes reproduces both footprints
    (reference mosaic_cubes, cube_utils.py:791-856)."""
    from spectral_cube_tpu.cube_utils import combine_headers
    from spectral_cube_tpu.ops.regrid import mosaic_add
    p1, d1 = make_cube_file(tmp_path, "m1.fits", shape=(2, 12, 12),
                            with_nan=False)
    c1 = SpectralCube.read(p1)
    h2 = base_header(nx=12, ny=12, nchan=2)
    h2["CRVAL1"] = c1.header["CRVAL1"] + 8 * abs(c1.header["CDELT1"])
    rng = np.random.RandomState(1)
    d2 = rng.rand(2, 12, 12)
    p2 = str(tmp_path / "m2.fits")
    write_fits(p2, [HDU(data=d2, header=h2)])
    c2 = SpectralCube.read(p2)

    target = combine_headers(c1.header, c2.header)
    nz, ny, nx = 2, int(target["NAXIS2"]), int(target["NAXIS1"])
    accum = jnp.zeros((nz, ny, nx))
    weights = jnp.zeros((nz, ny, nx))
    for c in (c1, c2):
        accum, weights = mosaic_add(
            accum, weights, c._get_filled_data(fill=np.nan), c.wcs, target,
            spectral_values_in=np.asarray(c.spectral_axis.value))
    w = np.asarray(weights)
    assert w.max() >= 1
    mosaic = np.where(w > 0, np.asarray(accum) / np.maximum(w, 1), np.nan)
    assert np.isfinite(mosaic).sum() > d1[0].size  # covers more than one cube


def test_spectral_interpolate_descending_grid(cube_adv):
    """Interpolation onto a reversed (descending) output grid (SURVEY hard
    part (e): reversed/non-monotonic grids)."""
    cube, data = cube_adv
    sv = np.asarray(cube.spectral_axis.value)
    rev = Quantity(sv[::-1].copy(), "km / s")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = cube.spectral_interpolate(rev)
    np.testing.assert_allclose(np.asarray(out.spectral_axis.value),
                               sv[::-1], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value),
                               data[::-1], rtol=1e-6, equal_nan=True)


def test_spectral_interpolate_from_descending_axis(cube_adv):
    """Input axis descending (e.g. frequency axes): weights flip."""
    cube, data = cube_adv
    rev_cube = cube[::-1]
    sv = np.asarray(rev_cube.spectral_axis.value)
    assert sv[0] > sv[-1]
    mid = Quantity((sv[:-1] + sv[1:]) / 2.0, "km / s")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = rev_cube.spectral_interpolate(mid)
    expected = (data[::-1][:-1] + data[::-1][1:]) / 2
    got = np.asarray(out.unmasked_data[:].value)
    mask = np.isfinite(expected)
    np.testing.assert_allclose(got[mask], expected[mask], rtol=1e-6)


def test_matmul_interp_matches_gather(monkeypatch):
    """The TPU banded-matmul spectral interp path agrees with the gather
    path incl. NaN propagation and mask interpolation (forced on CPU)."""
    from spectral_cube_tpu.ops import interpolate as it
    rng = np.random.RandomState(7)
    data = rng.rand(32, 6, 5).astype("f4")
    data[10, 2, 2] = np.nan
    inaxis = np.linspace(0.0, 31.0, 32)
    outaxis = np.linspace(-1.0, 33.0, 23)   # incl. out-of-range clamps
    include = np.ones(data.shape, dtype=bool)
    include[20] = False
    ref, ref_inc = it.interp_cube_spectral(data, inaxis, outaxis,
                                           include=include)
    monkeypatch.setattr(it, "_use_matmul_interp", lambda a, b: True)
    got, got_inc = it.interp_cube_spectral(data, inaxis, outaxis,
                                           include=include)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6, equal_nan=True)
    np.testing.assert_array_equal(np.asarray(got_inc), np.asarray(ref_inc))
    # descending input axis too
    ref2, _ = it.interp_cube_spectral(data, inaxis[::-1], outaxis)
    monkeypatch.setattr(it, "_use_matmul_interp", lambda a, b: True)
    got2, _ = it.interp_cube_spectral(data, inaxis[::-1], outaxis)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6, equal_nan=True)


def test_matmul_separable_resample_matches_gather(monkeypatch):
    """The axis-aligned MXU resample path agrees with the 4-take gather
    path (forced on CPU), incl. NaN poisoning and footprint NaNs."""
    from spectral_cube_tpu.ops import regrid as rg
    rng = np.random.RandomState(8)
    data = rng.rand(5, 16, 14).astype("f4")
    data[1, 4, 6] = np.nan
    zs = np.arange(5, dtype=np.float64)
    ys = np.broadcast_to(
        np.linspace(-0.5, 15.2, 12)[:, None], (12, 10)).copy()
    xs = np.broadcast_to(
        np.linspace(0.3, 13.8, 10)[None, :], (12, 10)).copy()
    ref = np.asarray(rg._bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    monkeypatch.setattr(rg, "_use_matmul_resample", lambda: True)
    got = np.asarray(rg._bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                               equal_nan=True)
    # a rotated (non-separable) mapping silently keeps the gather path
    ys_rot = ys + 0.01 * np.arange(10)[None, :]
    ref_rot = np.asarray(rg._bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys_rot, xs, 1))
    got_rot = np.asarray(rg._bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys_rot, xs, 1))
    np.testing.assert_allclose(got_rot, ref_rot, equal_nan=True)


def test_smooth_interp_fused_matches_chain(monkeypatch):
    """smooth_interp_cube (composed single-matmul operator) must match the
    sequential smooth -> interp chain: exactly on all-finite data (the
    fused branch), and through the lax.cond fallback when NaNs are
    present."""
    from spectral_cube_tpu.ops import interpolate as itp
    from spectral_cube_tpu.ops.smoothing import (spectral_smooth_cube,
                                                 gaussian_kernel1d)
    monkeypatch.setattr(itp, "_use_matmul_interp", lambda nin, nout: True)
    rng = np.random.RandomState(11)
    kern = gaussian_kernel1d(1.5)
    inaxis = np.arange(32, dtype=np.float64)
    outaxis = inaxis[::2] + 0.25
    for poke_nan in (False, True):
        data = rng.rand(32, 6, 5).astype("f4")
        if poke_nan:
            data[3, 2, 1] = np.nan
            data[10:14, 0, 0] = np.nan
        ref_sm = spectral_smooth_cube(jnp.asarray(data), kern)
        ref, _ = itp.interp_cube_spectral(ref_sm, inaxis, outaxis)
        got, _ = itp.smooth_interp_cube(jnp.asarray(data), kern,
                                        inaxis, outaxis)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6, equal_nan=True)
    # include-mask transform matches the interp operator's
    include = np.ones((32, 6, 5), bool)
    include[5] = False
    _, inc_ref = itp.interp_cube_spectral(
        jnp.asarray(rng.rand(32, 6, 5).astype("f4")), inaxis, outaxis,
        include=jnp.asarray(include))
    _, inc_got = itp.smooth_interp_cube(
        jnp.asarray(rng.rand(32, 6, 5).astype("f4")), kern, inaxis,
        outaxis, include=jnp.asarray(include))
    np.testing.assert_array_equal(np.asarray(inc_got), np.asarray(inc_ref))


def test_cube_spectral_interpolate_smooth_kernel(cube_adv):
    """cube.spectral_interpolate(grid, smooth_kernel=k) equals the chained
    spectral_smooth(k).spectral_interpolate(grid) API calls."""
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d
    cube, _ = cube_adv
    kern = gaussian_kernel1d(1.0)
    inaxis = cube.spectral_axis.value
    mid = Quantity((inaxis[:-1] + inaxis[1:]) / 2.0, cube.spectral_unit)
    ref = cube.spectral_smooth(kern).spectral_interpolate(
        mid, suppress_smooth_warning=True)
    got = cube.spectral_interpolate(mid, smooth_kernel=kern)
    np.testing.assert_allclose(np.asarray(got.filled_data[:].value),
                               np.asarray(ref.filled_data[:].value),
                               rtol=2e-5, atol=1e-6, equal_nan=True)
    assert got.shape == ref.shape


def test_convolve_reproject_fused_matches_chain(monkeypatch):
    """convolve_reproject_separable (host-composed G = R @ M operators)
    matches the sequential convolve -> resample chain on all-finite data,
    and falls back to the exact chain through lax.cond on NaN data."""
    from spectral_cube_tpu.ops import regrid as rg
    from spectral_cube_tpu.ops.convolve import convolve2d_separable
    monkeypatch.setattr(rg, "_use_matmul_resample", lambda: True)
    rng = np.random.RandomState(13)
    x1 = np.arange(9) - 4
    kern = np.exp(-0.5 * np.add.outer(x1 ** 2, x1 ** 2) / 1.5 ** 2)
    ny_in, nx_in = 20, 18
    ys = np.broadcast_to(
        np.linspace(-0.4, ny_in - 0.7, 16)[:, None], (16, 14)).copy()
    xs = np.broadcast_to(
        np.linspace(0.3, nx_in - 0.2, 14)[None, :], (16, 14)).copy()
    zs = np.arange(4, dtype=np.float64)
    for poke_nan in (False, True):
        data = rng.rand(4, ny_in, nx_in).astype("f4")
        if poke_nan:
            data[0, 3, 3] = np.nan
            data[2, 10:12, 5] = np.nan
        conv = convolve2d_separable(jnp.asarray(data), kern / kern.sum())
        ref = np.asarray(rg._bilinear_spatial_then_linear_z(
            conv, zs, ys, xs, 1))
        got = rg.convolve_reproject_separable(jnp.asarray(data), kern,
                                              ys, xs)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5,
                                   atol=1e-6, equal_nan=True)
    # a rotated mapping is not separable: the fused op declines
    ys_rot = ys + 0.01 * np.arange(14)[None, :]
    assert rg.convolve_reproject_separable(
        jnp.asarray(rng.rand(4, ny_in, nx_in).astype("f4")), kern,
        ys_rot, xs) is None


def test_block_tap_interp_long_axis(monkeypatch):
    """Long spectral axes take the block-windowed tap matmul; results
    match the gather/lerp oracle incl. NaN poisoning and the include
    transform."""
    from spectral_cube_tpu.ops import interpolate as itp
    rng = np.random.RandomState(19)
    nin = 600  # > the 512 block threshold
    data = rng.rand(nin, 5, 4).astype("f4")
    data[100, 2, 2] = np.nan
    inax = np.arange(nin, dtype=np.float64)
    outax = np.linspace(0, nin - 1, 217)
    include = np.ones((nin, 5, 4), bool)
    include[50:60] = False
    # oracle: the gather path (matmul gated off)
    monkeypatch.setattr(itp, "_use_matmul_interp", lambda a, b: False)
    ref, inc_ref = itp.interp_cube_spectral(jnp.asarray(data), inax, outax,
                                            include=jnp.asarray(include))
    monkeypatch.setattr(itp, "_use_matmul_interp", lambda a, b: True)
    got, inc_got = itp.interp_cube_spectral(jnp.asarray(data), inax, outax,
                                            include=jnp.asarray(include))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6, equal_nan=True)
    np.testing.assert_array_equal(np.asarray(inc_got), np.asarray(inc_ref))


def test_smooth_interp_fused_long_axis(monkeypatch):
    """The composed operator's block-windowed form (long axes) matches the
    sequential chain."""
    from spectral_cube_tpu.ops import interpolate as itp
    from spectral_cube_tpu.ops.smoothing import (spectral_smooth_cube,
                                                 gaussian_kernel1d)
    monkeypatch.setattr(itp, "_use_matmul_interp", lambda nin, nout: True)
    rng = np.random.RandomState(23)
    kern = gaussian_kernel1d(2.0)
    nin = 700  # > the 512 block threshold
    inaxis = np.arange(nin, dtype=np.float64)
    outaxis = inaxis[::2] + 0.25
    data = rng.rand(nin, 4, 3).astype("f4")
    ref_sm = spectral_smooth_cube(jnp.asarray(data), kern)
    ref, _ = itp.interp_cube_spectral(ref_sm, inaxis, outaxis)
    got, _ = itp.smooth_interp_cube(jnp.asarray(data), kern, inaxis,
                                    outaxis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)
    include = np.ones((nin, 4, 3), bool)
    include[100:150] = False
    _, inc_ref = itp.interp_cube_spectral(
        jnp.asarray(data), inaxis, outaxis, include=jnp.asarray(include))
    _, inc_got = itp.smooth_interp_cube(
        jnp.asarray(data), kern, inaxis, outaxis,
        include=jnp.asarray(include))
    np.testing.assert_array_equal(np.asarray(inc_got), np.asarray(inc_ref))


def test_downsample_reference_values(tmp_path):
    """Exact block-mean values, ragged-tail vs truncate semantics, and
    the WCS half-pixel anchors of the reference's test_downsample /
    test_downsample_wcs (tests/test_regrid.py:445-509)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube

    p, _ = make_cube_file(tmp_path, name="d255.fits", shape=(2, 5, 5),
                          seed=0)
    cube = SpectralCube.read(str(p))
    data = np.asarray(cube.unmasked_data[:])

    ds = cube.downsample_axis(2, axis=0)
    np.testing.assert_allclose(np.asarray(ds.filled_data[:]),
                               np.nanmean(data, axis=0)[None], rtol=1e-6)

    ds1 = cube.downsample_axis(2, axis=1)
    exp = np.array([np.nanmean(data[:, :2], axis=1),
                    np.nanmean(data[:, 2:4], axis=1),
                    np.nanmean(data[:, 4:], axis=1)]).swapaxes(0, 1)
    np.testing.assert_allclose(np.asarray(ds1.filled_data[:]), exp,
                               rtol=1e-6)

    dst = cube.downsample_axis(2, axis=1, truncate=True)
    np.testing.assert_allclose(np.asarray(dst.filled_data[:]), exp[:, :2],
                               rtol=1e-6)

    # pixel [0,0] downsampled 2x2 sits at [0.5, 0.5] of the original
    ds2 = cube.downsample_axis(2, axis=1).downsample_axis(2, axis=2)
    lon, lat = ds2.wcs.celestial.pix2world(np.array([0.0]), np.array([0.0]))
    old = np.asarray(cube.wcs.celestial.world2pix(np.asarray(lon),
                                                  np.asarray(lat)))
    np.testing.assert_allclose(old.ravel(), (0.5, 0.5), atol=1e-6)


def test_reproject_new_projection_codes(tmp_path):
    """End-to-end reproject onto SZP/AIR/HPX/TSC target grids and back:
    a smooth blob survives the roundtrip to bilinear-resampling accuracy
    (a few % of peak through strongly skewed pixelizations)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube

    p, _ = make_cube_file(tmp_path, name="blob.fits", shape=(3, 24, 24))
    base = SpectralCube.read(str(p))
    yy, xx = np.mgrid[0:24, 0:24]
    blob = np.exp(-((yy - 12) ** 2 + (xx - 12) ** 2) / 40.0)
    data = np.broadcast_to(blob.astype(np.float32), (3, 24, 24)).copy()
    cube = base._new_cube_with(data=data, mask=None)
    for code, pv in [("HPX", {}), ("TSC", {}), ("QSC", {}),
                     ("AIR", {"PV2_1": 60.0}),
                     ("SZP", {"PV2_1": 2.0, "PV2_2": 10.0,
                              "PV2_3": 60.0})]:
        hdr = cube.header.copy()
        hdr["CTYPE1"] = f"RA---{code}"
        hdr["CTYPE2"] = f"DEC--{code}"
        for k in list(hdr.keys()):
            if str(k).startswith("PV2_"):
                del hdr[k]
        for k, v in pv.items():
            hdr[k] = v
        back = cube.reproject(hdr).reproject(cube.header)
        b = np.asarray(back.unmasked_data[:])
        sel = np.isfinite(b)
        sel[:, :6] = sel[:, -6:] = False
        sel[:, :, :6] = sel[:, :, -6:] = False
        assert sel.any(), code
        err = np.max(np.abs(b[sel] - data[sel]))
        assert err < 0.05, (code, err)


def test_onedspectrum_interp_exact_hits_ignore_nan_neighbor(cube_adv):
    """np.interp semantics on the 1-D path: exact grid hits and edge
    clamps return the sample even when the zero-weight neighbor is NaN."""
    from spectral_cube_tpu.ops.interpolate import interp_spectrum
    from spectral_cube_tpu.wcs import WCS
    from spectral_cube_tpu.units import Unit

    w = WCS(naxis=1)
    w.ctype[0] = "FREQ"
    w.crval[0] = 0.0
    w.cdelt[0] = 1.0
    w.crpix[0] = 1.0
    w.cunit[0] = Unit.parse("Hz")
    val = np.array([10.0, 20.0, np.nan, 40.0])
    ax = np.array([0.0, 1.0, 2.0, 3.0])
    out, _, _ = interp_spectrum(val, ax, np.array([1.0, 3.5, -2.0]), w,
                                suppress_smooth_warning=True)
    np.testing.assert_array_equal(out, [20.0, 40.0, 10.0])
    import pytest
    from spectral_cube_tpu.ops.interpolate import interp_weights
    with pytest.raises(ValueError, match="at least 2"):
        interp_weights(np.array([5.0]), np.array([5.0, 6.0]))


def test_reproject_cross_type_spectral_axis(tmp_path):
    """Reprojecting onto a template whose spectral axis is a different
    physical type (VRAD cube -> FREQ template, and FREQ -> WAVE) routes
    through the spectral conversion engine instead of raising
    UnitConversionError.  VRAD->FREQ is exactly linear (f = f0 (1 - v/c))
    so the channel mapping must be the identity to float precision."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube

    p, data = make_cube_file(tmp_path, name="xtype.fits",
                             shape=(6, 8, 8), with_nan=False)
    cube = SpectralCube.read(str(p))          # VRAD [km/s] + RESTFRQ
    freq_hdr = cube.with_spectral_unit("Hz").header
    assert freq_hdr["CTYPE3"].startswith("FREQ")
    out = cube.reproject(freq_hdr)
    b = np.asarray(out.unmasked_data[:].value)
    np.testing.assert_allclose(b, data, rtol=1e-5, equal_nan=True)
    # FREQ cube onto a WAVE template (nonlinear map, narrow band):
    fcube = cube.with_spectral_unit("Hz")
    wave_hdr = fcube.with_spectral_unit("m").header
    assert wave_hdr["CTYPE3"].startswith("WAVE")
    out2 = fcube.reproject(wave_hdr)
    b2 = np.asarray(out2.unmasked_data[:].value)
    sel = np.isfinite(b2)
    assert sel[1:-1].all()
    np.testing.assert_allclose(b2[sel], data[sel], rtol=1e-3)


def test_spectral_interp_2d_include_gather_path():
    """interp_cube_spectral's gather fallback must broadcast a 2-D
    (ny, nx) include to the cube shape before gathering along the
    spectral axis (the TPU matmul path already does)."""
    from spectral_cube_tpu.ops.interpolate import interp_cube_spectral

    rng = np.random.RandomState(1)
    data = rng.rand(8, 3, 4).astype(np.float32)
    inax = np.arange(8, dtype=np.float64)
    outax = np.linspace(0.5, 6.5, 5)
    inc2d = np.zeros((3, 4), dtype=bool)
    inc2d[1, 2] = True
    out, new_inc = interp_cube_spectral(data, inax, outax, include=inc2d)
    assert out.shape == (5, 3, 4)
    assert new_inc.shape == (5, 3, 4)
    ni = np.array(new_inc)
    assert ni[:, 1, 2].all()
    ni[:, 1, 2] = False
    assert not ni.any()


def test_mosaic_identity_and_signature(tmp_path):
    """Mosaicking two overlapping slices of a cube reassembles the exact
    original grid — shape, alignment, and values (reference
    test_regrid.test_mosaic_cubes); a previous footprint computation grew
    the grid by 2 px/axis and dropped edge rows to a too-strict bounds
    test."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube
    from spectral_cube_tpu.cube_utils import mosaic_cubes, combine_headers
    path, data = make_cube_file(tmp_path, shape=(2, 5, 5), with_nan=False)
    cube = SpectralCube.read(path)
    part1 = cube[:, :4, :]
    part2 = cube[:, 2:, :]
    hdr = combine_headers(part1.header, part2.header)
    assert (hdr["NAXIS1"], hdr["NAXIS2"]) == (5, 5)
    for order in ("nearest-neighbor", "bilinear"):
        res = mosaic_cubes([part1, part2], order=order)
        assert res.shape == cube.shape
        np.testing.assert_almost_equal(
            np.asarray(res.filled_data[:].value),
            np.asarray(cube.filled_data[:].value), decimal=3)
    # disjoint parts: union footprint with a NaN gap row
    res2 = mosaic_cubes([cube[:, :2, :], cube[:, 3:, :]],
                        order="nearest-neighbor")
    v = np.asarray(res2.filled_data[:].value)
    assert res2.shape == cube.shape
    np.testing.assert_almost_equal(v[:, :2, :], data[:, :2, :], decimal=3)
    np.testing.assert_almost_equal(v[:, 3:, :], data[:, 3:, :], decimal=3)
    assert np.isnan(v[:, 2, :]).all()


def test_wcs_pix2world_per_axis_signature(cube_adv):
    """astropy's per-axis calling convention (x, y, origin) works on the
    celestial WCS, scalars in -> scalars out, arrays in -> arrays out
    (used throughout the reference tests, e.g. test_regrid.py:497-508)."""
    cube, _ = cube_adv
    cel = cube.wcs.celestial
    lon, lat = cel.wcs_pix2world(0, 0, 0)
    assert np.ndim(lon) == 0 and np.ndim(lat) == 0
    x, y = cel.wcs_world2pix(lon, lat, 0)
    np.testing.assert_allclose([x, y], [0.0, 0.0], atol=1e-6)
    lon1, lat1 = cel.wcs_pix2world(1, 1, 1)
    x1, y1 = cel.wcs_world2pix(lon1, lat1, 1)
    np.testing.assert_allclose([x1, y1], [1.0, 1.0], atol=1e-6)
    lons, lats = cel.wcs_pix2world(np.array([0.0, 1.0]), np.array([0.0, 0.0]), 0)
    assert lons.shape == (2,)
    stacked = cel.wcs_pix2world(np.array([[0.0, 0.0], [1.0, 0.0]]), 0)
    assert stacked.shape == (2, 2)
    np.testing.assert_allclose(stacked[:, 0], lons, atol=1e-9)


# ---------------------------------------------------------------------------
# reference test_regrid.py scenario battery (names mirror the reference's)
# ---------------------------------------------------------------------------

def _delta_cube_path(tmp_path, shape, name="delta.fits", beams=None,
                     flip_spectral=False, delta=None):
    """Zero cube with a delta; jybeam-style header like the reference's
    prepare_255_header (conftest.py:411-418)."""
    from ref_fixtures import jybeam_header
    from spectral_cube_tpu.io.fits_low import BinTableHDU
    nchan, ny, nx = shape
    h = jybeam_header()
    h["BUNIT"] = "K"
    h["NAXIS"] = 3
    h["NAXIS1"], h["NAXIS2"], h["NAXIS3"] = nx, ny, nchan
    for k in ("CDELT4", "CRPIX4", "CRVAL4", "CTYPE4", "CUNIT4", "NAXIS4"):
        try:
            del h[k]
        except Exception:
            pass
    if flip_spectral:
        h["CDELT3"] = -h["CDELT3"]
    d = np.zeros(shape)
    if delta is None:
        d[nchan // 2] = 1.0
    else:
        d[delta] = 1.0
    hdus = [HDU(data=d, header=h)]
    if beams is not None:
        h["CASAMBM"] = True
        hdus.append(beams)
    p = str(tmp_path / name)
    write_fits(p, hdus)
    return p, d


def _beams_table_522():
    """prepare_5_beams (reference conftest.py:482-499) with channel 0
    faked to the 1" target beam for the equal-beam test."""
    from collections import OrderedDict
    from spectral_cube_tpu.io.fits_low import BinTableHDU
    bt = BinTableHDU(columns=OrderedDict(
        BMAJ=np.array([1.0, 0.4, 0.3, 0.4, 0.5], "f4"),
        BMIN=np.array([1.0, 0.2, 0.3, 0.2, 0.1], "f4"),
        BPA=np.array([0, 45, 60, 30, 0], "f4"),
        CHAN=np.arange(5, dtype="i4"),
        POL=np.zeros(5, dtype="i4")), name="BEAMS",
        units={"BMAJ": "arcsec", "BMIN": "arcsec", "BPA": "deg"})
    bt.header["NCHAN"] = 5
    bt.header["NPOL"] = 1
    return bt


def test_beams_convolution_equal(tmp_path):
    """reference test_regrid.py:82-97: a channel already at the target
    beam must pass through unconvolved."""
    p, d = _delta_cube_path(tmp_path, (5, 2, 2), beams=_beams_table_522())
    cube = SpectralCube.read(p)
    target = Beam(Quantity(1.0, "arcsec"), Quantity(1.0, "arcsec"),
                  Quantity(0, "deg"))
    conv = cube.convolve_to(target)
    np.testing.assert_almost_equal(np.asarray(cube.filled_data[0].value),
                                   np.asarray(conv.filled_data[0].value))


def test_catch_kernel_with_units(tmp_path):
    """reference test_regrid.py:174-183: a kernel defined with a unit-ful
    width raises."""
    from spectral_cube_tpu import Gaussian1DKernel
    p, d = _delta_cube_path(tmp_path, (5, 2, 2))
    cube = SpectralCube.read(p)
    with pytest.raises(Exception, match="[Uu]nit"):
        cube.spectral_smooth(kernel=Gaussian1DKernel(Quantity(1.0, "km/s")),
                             use_memmap=False)


def test_spectral_smooth_4cores(tmp_path):
    """reference test_regrid.py:186-220: smoothing a spectral delta
    reproduces the kernel; num_cores=4 with parallel=False raises."""
    from spectral_cube_tpu import Gaussian1DKernel
    p, d = _delta_cube_path(tmp_path, (5, 2, 2))
    cube = SpectralCube.read(p)
    kernel = Gaussian1DKernel(1.0)
    karr = np.asarray(kernel.array)
    assert karr.size == 9
    for use_memmap in (True, False):
        result = cube.spectral_smooth(kernel=kernel, num_cores=4,
                                      use_memmap=use_memmap)
        np.testing.assert_almost_equal(np.asarray(result[:, 0, 0].value),
                                       karr[2:-2], 4)
    with pytest.raises(ValueError):
        cube.spectral_smooth(kernel=kernel, num_cores=4, parallel=False)


def test_spectral_smooth_fail(tmp_path):
    """reference test_regrid.py:222-231: VRSC can't be spectrally
    smoothed."""
    from spectral_cube_tpu import Gaussian1DKernel
    p, d = _delta_cube_path(tmp_path, (5, 2, 2), beams=_beams_table_522())
    cube = SpectralCube.read(p)
    with pytest.raises(AttributeError, match="convolve_to"):
        cube.spectral_smooth(kernel=Gaussian1DKernel(1.0))


def test_spectral_interpolate_with_fillvalue(tmp_path):
    """reference test_regrid.py:292-303: out-of-range samples take
    fill_value."""
    p, d = _delta_cube_path(tmp_path, (5, 2, 2))
    cube = SpectralCube.read(p)
    sa = cube.spectral_axis
    sg = sa[0] - (sa[1] - sa[0]) * Quantity(np.linspace(1, 4, 4), "")
    result = cube.spectral_interpolate(spectral_grid=sg, fill_value=42)
    np.testing.assert_almost_equal(np.asarray(result[:, 0, 0].value),
                                   np.ones(4) * 42)


def test_spectral_interpolate_fail(tmp_path):
    """reference test_regrid.py:306-315: VRSC can't be spectrally
    interpolated."""
    p, d = _delta_cube_path(tmp_path, (5, 2, 2), beams=_beams_table_522())
    cube = SpectralCube.read(p)
    with pytest.raises(AttributeError, match="convolve_to"):
        cube.spectral_interpolate(5)


def test_spectral_interpolate_with_mask(tmp_path):
    """reference test_regrid.py:318-347: reversed-axis interpolation of a
    masked cube — the two masked channels NaN out the midpoints they
    touch, giving exactly [0, 0.5, nan, nan] after the axis flip."""
    p, d = _delta_cube_path(tmp_path, (5, 2, 2), flip_spectral=True)
    cube = SpectralCube.read(p)
    mask = np.ones(cube.shape, dtype=bool)
    mask[:2] = False
    mcube = cube.with_mask(mask)
    sa = cube.spectral_axis
    sg = (sa[1:] + sa[:-1]) / 2.0
    result = mcube.spectral_interpolate(spectral_grid=sg[::-1])
    np.testing.assert_almost_equal(np.asarray(result[:, 0, 0].value),
                                   [0.0, 0.5, np.nan, np.nan])


def test_spectral_interpolate_reversed(tmp_path):
    """reference test_regrid.py:350-361: a reversed target grid round
    trips through the output spectral axis."""
    p, d = _delta_cube_path(tmp_path, (5, 2, 2))
    cube = SpectralCube.read(p)
    sg = cube.spectral_axis[::-1]
    result = cube.spectral_interpolate(spectral_grid=sg)
    np.testing.assert_almost_equal(np.asarray(sg.value),
                                   np.asarray(result.spectral_axis.value))


def test_convolution_2D(tmp_path):
    """reference test_regrid.py:364-386: convolving a delta Projection to
    1.803" reproduces the normalized 1.5" Gaussian kernel (1" deconvolved
    from the target); kwargs pass through."""
    p, d = _delta_cube_path(tmp_path, (1, 5, 5), delta=(0, 2, 2))
    proj = SpectralCube.read(p)[0]
    target = Beam(Quantity(1.802775637731995, "arcsec"),
                  Quantity(1.802775637731995, "arcsec"), Quantity(0, "deg"))
    conv = proj.convolve_to(target)
    sigma_pix = (1.5 / 3600) / (2 * np.sqrt(2 * np.log(2))) \
        / 5.55555561268e-4
    yy, xx = np.mgrid[-2:3, -2:3]
    g = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma_pix ** 2))
    g /= g.sum()
    np.testing.assert_almost_equal(np.asarray(conv.value), g)
    assert conv.beam == target
    proj.convolve_to(target, nan_treatment="fill")  # kwargs accepted


def test_nocelestial_convolution_2D_fail(tmp_path):
    """reference test_regrid.py:389-399."""
    from spectral_cube_tpu.wcs import WCSCelestialError
    p, d = _delta_cube_path(tmp_path, (2, 5, 5), delta=(0, 2, 2))
    cube = SpectralCube.read(p)
    proj = cube.moment0(axis=1)
    with pytest.raises(WCSCelestialError):
        proj.convolve_to(Beam(Quantity(1.0, "arcsec")))


def test_reproject_2D(tmp_path):
    """reference test_regrid.py:402-428: Projection.reproject onto a
    galactic SIN header keeps the beam and adopts the target WCS."""
    p, d = _delta_cube_path(tmp_path, (1, 5, 5), delta=(0, 2, 2))
    proj = SpectralCube.read(p)[0]
    hdr_out = proj.header
    hdr_out["NAXIS1"] = 4
    hdr_out["NAXIS2"] = 5
    hdr_out["CTYPE1"] = "GLON-SIN"
    hdr_out["CTYPE2"] = "GLAT-SIN"
    hdr_out["CRVAL1"] = 134.37608
    hdr_out["CRVAL2"] = -31.939241
    hdr_out["CRPIX1"] = 2.0
    hdr_out["CRPIX2"] = 2.0
    result = proj.reproject(hdr_out)
    assert result.shape == (5, 4)
    assert result.beam == proj.beam
    assert result.wcs.ctype[0] == "GLON-SIN"


def test_nocelestial_reproject_2D_fail(tmp_path):
    """reference test_regrid.py:431-441."""
    from spectral_cube_tpu.wcs import WCSCelestialError
    p, d = _delta_cube_path(tmp_path, (2, 5, 5), delta=(0, 2, 2))
    cube = SpectralCube.read(p)
    proj = cube.moment0(axis=1)
    with pytest.raises(WCSCelestialError):
        proj.reproject(cube.header)


def test_smooth_interp_fused_path_for_finiteness_masks(cube_adv,
                                                       monkeypatch):
    """The default isfinite LazyMask keeps the single-matmul fused
    smooth+interp path (include=None into smooth_interp_cube) and the
    result carries a re-bound finiteness mask of the NEW shape — falling
    into the two-pass chain here silently halved bench config2."""
    from spectral_cube_tpu.ops import interpolate as itp
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d
    from spectral_cube_tpu.masks import LazyMask
    cube, _ = cube_adv
    assert isinstance(cube.mask, LazyMask)
    calls = []
    real = itp.smooth_interp_cube

    def spy(data, kernel, inaxis, outaxis, include=None):
        calls.append(include)
        return real(data, kernel, inaxis, outaxis, include=include)

    monkeypatch.setattr(itp, "smooth_interp_cube", spy)
    import spectral_cube_tpu.cube as cube_mod
    monkeypatch.setattr(cube_mod._interp, "smooth_interp_cube", spy)
    sa = cube.spectral_axis
    mid = Quantity((np.asarray(sa.value)[:-1]
                    + np.asarray(sa.value)[1:]) / 2.0, sa.unit)
    out = cube.spectral_interpolate(mid, smooth_kernel=gaussian_kernel1d(1.0))
    assert calls == [None]
    assert isinstance(out.mask, LazyMask)
    assert np.asarray(out.mask.include()).shape == out.shape


@pytest.mark.parametrize("seed", range(4))
def test_interp_include_matches_bruteforce(seed, monkeypatch):
    """Property test for the strict interp mask: an output sample is
    included iff EVERY nonzero-weight input tap is included (with the
    exact-hit rescue), on both the gather and matmul paths."""
    from spectral_cube_tpu.ops import interpolate as itp
    rng = np.random.RandomState(seed)
    nin = int(rng.randint(6, 16))
    nout = int(rng.randint(4, 14))
    inax = np.sort(rng.rand(nin)) * 10
    outax = np.sort(rng.rand(nout)) * 12 - 1  # some out-of-range
    data = rng.rand(nin, 3, 2).astype("f4")
    include = rng.rand(nin, 3, 2) > 0.4

    idx, frac = itp.interp_weights(inax, outax)
    expected = np.empty((nout, 3, 2), dtype=bool)
    for k in range(nout):
        i, f = int(idx[k]), float(frac[k])
        if f == 0:
            expected[k] = include[i]
        elif f == 1:
            expected[k] = include[i + 1]
        else:
            expected[k] = include[i] & include[i + 1]

    for matmul in (False, True):
        monkeypatch.setattr(itp, "_use_matmul_interp",
                            lambda a, b, m=matmul: m)
        _, got = itp.interp_cube_spectral(jnp.asarray(data), inax, outax,
                                          include=jnp.asarray(include))
        np.testing.assert_array_equal(np.asarray(got), expected,
                                      err_msg=f"matmul={matmul}")


# ----------------------------------------------------------- orders 2/3
# The reference exposes reproject_interp's four interpolation orders
# (reference spectral_cube.py:2671-2678); orders 2/3 bottom out in scipy
# map_coordinates spline resampling, which is the float64 oracle here.


def _scipy_spline_oracle(data, zs, ys, xs, order):
    import scipy.ndimage as ndi
    nz, ny, nx = len(zs), *ys.shape
    zz = np.broadcast_to(np.asarray(zs)[:, None, None], (nz, ny, nx))
    yy = np.broadcast_to(ys[None], (nz, ny, nx))
    xx = np.broadcast_to(xs[None], (nz, ny, nx))
    return ndi.map_coordinates(data.astype(np.float64), [zz, yy, xx],
                               order=order, mode="constant", cval=np.nan)


@pytest.mark.parametrize("order", [2, 3])
def test_spline_reproject_offset_matches_scipy(order):
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    rng = np.random.RandomState(11)
    data = rng.rand(6, 24, 28).astype(np.float32)
    zs = np.arange(6, dtype=np.float64)
    ys = np.broadcast_to(np.arange(24, dtype=np.float64)[:, None] + 0.37,
                         (24, 28)).copy()
    xs = np.broadcast_to(np.arange(28, dtype=np.float64)[None, :] + 0.61,
                         (24, 28)).copy()
    got = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, order))
    exp = _scipy_spline_oracle(data, zs, ys, xs, order)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    fin = np.isfinite(exp)
    np.testing.assert_allclose(got[fin], exp[fin], rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("order", [2, 3])
def test_spline_reproject_rotated_matches_scipy(order):
    # rotation makes the mapping non-separable: prefilter + tap gather
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    rng = np.random.RandomState(12)
    data = rng.rand(3, 32, 32).astype(np.float32)
    zs = np.arange(3, dtype=np.float64)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    th = 0.15
    cy = cx = 15.5
    ys = cy + np.cos(th) * (yy - cy) + np.sin(th) * (xx - cx)
    xs = cx - np.sin(th) * (yy - cy) + np.cos(th) * (xx - cx)
    got = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, order))
    exp = _scipy_spline_oracle(data, zs, ys, xs, order)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    fin = np.isfinite(exp)
    np.testing.assert_allclose(got[fin], exp[fin], rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("order", [2, 3])
def test_spline_reproject_spectral_axis_matches_scipy(order):
    # non-identity z mapping exercises the spectral spline matmul
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    rng = np.random.RandomState(13)
    data = rng.rand(16, 12, 12).astype(np.float32)
    zs = np.linspace(0.2, 14.7, 9)
    ys = np.broadcast_to(np.arange(12, dtype=np.float64)[:, None] + 0.25,
                         (12, 12)).copy()
    xs = np.broadcast_to(np.arange(12, dtype=np.float64)[None, :] + 0.75,
                         (12, 12)).copy()
    got = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, order))
    exp = _scipy_spline_oracle(data, zs, ys, xs, order)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    fin = np.isfinite(exp)
    np.testing.assert_allclose(got[fin], exp[fin], rtol=5e-5, atol=5e-6)


def test_spline_separable_matmul_path_matches_gather(monkeypatch):
    # force the TPU matmul gate so the separable spline path runs on CPU
    from spectral_cube_tpu.ops import regrid
    monkeypatch.setattr(regrid, "_use_matmul_resample", lambda: True)
    rng = np.random.RandomState(14)
    data = rng.rand(4, 40, 36).astype(np.float32)
    zs = np.arange(4, dtype=np.float64)
    ys = np.broadcast_to(np.arange(40, dtype=np.float64)[:, None] * 0.8
                         + 1.3, (40, 36)).copy()
    xs = np.broadcast_to(np.arange(36, dtype=np.float64)[None, :] * 1.1
                         + 0.2, (40, 36)).copy()
    for order in (2, 3):
        got = np.asarray(regrid._bilinear_spatial_then_linear_z(
            jnp.asarray(data), zs, ys, xs, order))
        exp = _scipy_spline_oracle(data, zs, ys, xs, order)
        assert np.array_equal(np.isnan(got), np.isnan(exp))
        fin = np.isfinite(exp)
        np.testing.assert_allclose(got[fin], exp[fin], rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("order", [2, 3])
def test_spline_reproject_nan_poisoning_localized(order):
    # NaN handling diverges from scipy BY DESIGN: scipy's IIR prefilter
    # smears one NaN along the whole line, here poisoning is localized to
    # taps with |T|-weight > 1e-6.  Check (a) a neighborhood around the
    # NaN is NaN, (b) far-away samples match the finite-data oracle.
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    rng = np.random.RandomState(15)
    data = rng.rand(2, 48, 48).astype(np.float32)
    data[1, 24, 24] = np.nan
    zs = np.arange(2, dtype=np.float64)
    ys = np.broadcast_to(np.arange(48, dtype=np.float64)[:, None] + 0.4,
                         (48, 48)).copy()
    xs = np.broadcast_to(np.arange(48, dtype=np.float64)[None, :] + 0.6,
                         (48, 48)).copy()
    got = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, order))
    # the directly-affected taps are NaN
    assert np.isnan(got[1, 22:25, 22:25]).all()
    # plane 0 (finite) is untouched by plane 1's NaN
    filled = np.where(np.isfinite(data), data, 0.0)
    exp = _scipy_spline_oracle(filled, zs, ys, xs, order)
    fin = np.isfinite(exp[0])
    np.testing.assert_allclose(got[0][fin], exp[0][fin], rtol=5e-5,
                               atol=5e-6)
    # far corner of plane 1 (>= 15 px from the NaN) matches the
    # filled-data oracle (localized poisoning)
    corner = got[1, :6, :6]
    np.testing.assert_allclose(corner, exp[1, :6, :6], rtol=5e-5,
                               atol=5e-6)


def test_reproject_order_names_and_errors(cube_adv):
    cube_adv = cube_adv[0]
    from spectral_cube_tpu.ops.regrid import _order_int
    assert _order_int("bicubic") == 3
    assert _order_int("biquadratic") == 2
    assert _order_int(2) == 2
    with pytest.raises(ValueError, match="unknown interpolation order"):
        _order_int("cubic-spline")
    with pytest.raises(ValueError, match="order must be"):
        _order_int(7)
    # end-to-end through the cube API with the reference's order names
    hdr = cube_adv.header.copy()
    out = cube_adv.reproject(hdr, order="bicubic")
    got = np.asarray(out.filled_data[:])
    exp = np.asarray(cube_adv.filled_data[:])
    # identity mapping: spline interpolation is exact at the knots, but
    # input NaNs legitimately poison their spline-support neighborhood
    assert np.isnan(got)[np.isnan(exp)].all()
    fin = np.isfinite(got) & np.isfinite(exp)
    assert fin.any()
    np.testing.assert_allclose(got[fin], exp[fin], rtol=1e-5, atol=1e-6)


def test_rotated_bilinear_nan_poisoning_matches_staged_oracle():
    """The nonseparable (rotated) bilinear path gates its NaN-weight
    gathers behind lax.cond (ops/regrid._bilinear_spatial_then_linear_z);
    this drives the poison branch against an independent float64
    corner-gather replicate.  Reference semantics: reproject's
    map_coordinates NaN handling, spectral_cube.py:2726-2732."""
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    rng = np.random.RandomState(21)
    n = 32
    data = rng.rand(3, n, n).astype(np.float32)
    data[1, 10:13, 20] = np.nan
    data[2] = np.nan                       # all-NaN channel
    zs = np.arange(3, dtype=np.float64)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    th = 0.1
    c0 = (n - 1) / 2.0
    ys = c0 + np.cos(th) * (yy - c0) + np.sin(th) * (xx - c0)
    xs = c0 - np.sin(th) * (yy - c0) + np.cos(th) * (xx - c0)
    got = np.asarray(jax.jit(
        lambda d: _bilinear_spatial_then_linear_z(d, zs, ys, xs, 1))(
            jnp.asarray(data)))

    # independent float64 staged replicate
    yv = (ys >= -1e-3) & (ys <= n - 1 + 1e-3)
    xv = (xs >= -1e-3) & (xs <= n - 1 + 1e-3)
    ycl = np.clip(np.nan_to_num(ys), 0, n - 1)
    xcl = np.clip(np.nan_to_num(xs), 0, n - 1)
    y0 = np.clip(ycl.astype(np.int64), 0, n - 2)
    x0 = np.clip(xcl.astype(np.int64), 0, n - 2)
    wy = ycl - y0
    wx = xcl - x0
    filled = np.nan_to_num(data).astype(np.float64)
    mask = np.isnan(data).astype(np.float64)
    out = np.zeros((3, n, n))
    wn = np.zeros((3, n, n))
    for yy2, xx2, w in ((y0, x0, (1 - wy) * (1 - wx)),
                        (y0, x0 + 1, (1 - wy) * wx),
                        (y0 + 1, x0, wy * (1 - wx)),
                        (y0 + 1, x0 + 1, wy * wx)):
        out += filled[:, yy2, xx2] * w
        wn += mask[:, yy2, xx2] * w
    exp = np.where(wn > 1e-6, np.nan, out)
    exp = np.where((yv & xv)[None], exp, np.nan)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    fin = np.isfinite(exp)
    np.testing.assert_allclose(got[fin], exp[fin], rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("order", [2, 3])
def test_rotated_spline_nan_poisoning(order):
    """The spline nonseparable path's cond-gated NaN branch: NaN inputs
    poison (at least) their spline support; pixels far from any hole are
    bit-identical to the all-finite run (the clean branch)."""
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    rng = np.random.RandomState(22)
    n = 32
    clean = rng.rand(3, n, n).astype(np.float32)
    dirty = clean.copy()
    dirty[1, 14:16, 15] = np.nan
    zs = np.arange(3, dtype=np.float64)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    th = 0.12
    c0 = (n - 1) / 2.0
    ys = c0 + np.cos(th) * (yy - c0) + np.sin(th) * (xx - c0)
    xs = c0 - np.sin(th) * (yy - c0) + np.cos(th) * (xx - c0)
    f = jax.jit(lambda d: _bilinear_spatial_then_linear_z(
        d, zs, ys, xs, order))
    got_clean = np.asarray(f(jnp.asarray(clean)))
    got_dirty = np.asarray(f(jnp.asarray(dirty)))
    # channels 0/2 never touch the hole: identical through either branch
    np.testing.assert_array_equal(got_dirty[0], got_clean[0])
    np.testing.assert_array_equal(got_dirty[2], got_clean[2])
    new_nan = np.isnan(got_dirty[1]) & ~np.isnan(got_clean[1])
    assert new_nan.any()
    # every output whose (order+1)^2 tap window touches the hole is NaN
    base = np.round if order == 2 else np.floor
    yb = base(np.clip(ys, 0, n - 1)).astype(int)
    xb = base(np.clip(xs, 0, n - 1)).astype(int)
    touches = np.zeros((n, n), bool)
    offs = (-1, 0, 1) if order == 2 else (-1, 0, 1, 2)
    for dy in offs:
        for dx in offs:
            iy = np.clip(yb + dy, 0, n - 1)
            ix = np.clip(xb + dx, 0, n - 1)
            touches |= (iy >= 14) & (iy <= 15) & (ix == 15)
    valid1 = np.isfinite(got_clean[1])
    assert np.isnan(got_dirty[1])[touches & valid1].all()
