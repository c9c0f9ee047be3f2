import warnings

import numpy as np
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, Quantity
from spectral_cube_tpu.masks import LazyComparisonMask
from spectral_cube_tpu.ops.moments import (moments_012, moments_012_pallas,
                                           moment_generic, SIGMA2FWHM)

from conftest import make_cube_file, gaussian_line_cube


def np_moments(d, x, dx, thresh=None):
    """Reference-semantics numpy oracle (_moments.py:170-193)."""
    m = np.isfinite(d)
    if thresh is not None:
        m &= d > thresh
    w = np.where(m, d, 0.0).astype("f8") * dx
    cnt = m.sum(0)
    s0 = w.sum(0)
    x3 = x[:, None, None]
    with np.errstate(all="ignore"):
        mom0 = np.where(cnt > 0, s0, np.nan)
        mom1 = np.where(cnt > 0, (w * x3).sum(0) / s0, np.nan)
        mom2 = np.where(cnt > 0,
                        (w * (x3 - mom1[None]) ** 2).sum(0) / s0, np.nan)
    return mom0, mom1, mom2


@pytest.fixture
def random_cube():
    rng = np.random.RandomState(42)
    nchan, ny, nx = 32, 17, 21
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[3, 4, 5] = np.nan
    data[:, 0, 0] = np.nan
    coords = np.arange(nchan) * 0.5
    return data, coords, 0.5


def test_moments_vs_oracle(random_cube):
    data, coords, dx = random_cube
    e0, e1, e2 = np_moments(data, coords, dx)
    m0, m1, m2 = (np.asarray(m) for m in
                  moments_012(jnp.asarray(data), coords, dx))
    assert np.allclose(m0, e0, rtol=2e-6, equal_nan=True)
    assert np.allclose(m1, e1, rtol=2e-6, equal_nan=True)
    assert np.allclose(m2, e2, rtol=2e-5, atol=1e-7, equal_nan=True)


def test_pallas_interpret_matches_jnp(random_cube):
    """Strategy-consistency invariant (reference test_moments.py:82-106
    checks all how= strategies agree); here jnp vs Pallas."""
    data, coords, dx = random_cube
    mask = LazyComparisonMask(jnp.greater, 0.3, shape=data.shape)
    e0, e1, e2 = np_moments(data, coords, dx, thresh=0.3)
    p0, p1, p2 = (np.asarray(m) for m in moments_012_pallas(
        jnp.asarray(data), coords, dx, mask_expr=mask, interpret=True))
    assert np.allclose(p0, e0, rtol=2e-6, equal_nan=True)
    assert np.allclose(p1, e1, rtol=2e-6, equal_nan=True)
    assert np.allclose(p2, e2, rtol=2e-5, atol=1e-7, equal_nan=True)


def test_pallas_explicit_mask_input(random_cube):
    data, coords, dx = random_cube
    include = jnp.asarray(data > 0.3)
    e0, e1, e2 = np_moments(data, coords, dx, thresh=0.3)
    p0, p1, p2 = (np.asarray(m) for m in moments_012_pallas(
        jnp.asarray(data), coords, dx, include=include, interpret=True))
    assert np.allclose(p0, e0, rtol=2e-6, equal_nan=True)


def test_moment_generic_higher_order(random_cube):
    data, coords, dx = random_cube
    g3 = np.asarray(moment_generic(jnp.asarray(data), coords, dx, 3))
    m = np.isfinite(data)
    w = np.where(m, data, 0.0) * dx
    x3 = coords[:, None, None]
    with np.errstate(all="ignore"):
        m1 = (w * x3).sum(0) / w.sum(0)
        e3 = np.where(m.sum(0) > 0,
                      (w * (x3 - m1[None]) ** 3).sum(0) / w.sum(0), np.nan)
    # float32 accumulation on a cancellation-heavy cubic: tolerance ~1e-4
    assert np.allclose(g3, e3, rtol=1e-3, atol=1e-4, equal_nan=True)


def test_gaussian_cube_recovers_parameters(tmp_path):
    """Moments of a Gaussian line recover its parameters (the reference's
    analytic-value tests via tests/utilities.py gaussian cubes)."""
    from spectral_cube_tpu.io.fits_low import HDU, write_fits
    from conftest import base_header
    data, v = gaussian_line_cube(shape=(100, 4, 5), v0=0.0, sigma=8.0)
    h = base_header(nx=5, ny=4, nchan=100, ctype3="VRAD", cunit3="km/s",
                    crval3=float(v[0]), cdelt3=1.0)
    path = str(tmp_path / "gauss.fits")
    write_fits(path, [HDU(data=data, header=h)])
    cube = SpectralCube.read(path)
    m1 = cube.moment1()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lw = cube.linewidth_sigma()
        fwhm = cube.linewidth_fwhm()
    assert np.allclose(np.asarray(m1.value), 0.0, atol=0.05)
    # discrete second moment of a truncated gaussian: close to sigma
    assert np.allclose(np.asarray(lw.value), 8.0, rtol=0.05)
    assert np.allclose(np.asarray(fwhm.value),
                       np.asarray(lw.value) * SIGMA2FWHM, rtol=1e-6)


def test_cube_moment_units_and_wcs(cube_adv):
    cube, data = cube_adv
    m0 = cube.moment0()
    assert m0.wcs.naxis == 2
    assert m0.unit.dims == (u.Jy / u.beam * u.km_s).dims
    m1 = cube.moment1()
    assert m1.unit.dims == u.km_s.dims
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m2 = cube.moment2()
    assert m2.unit.dims == (u.km_s ** 2).dims


def test_moment1_is_absolute(cube_adv):
    """mom1 along the spectral axis includes the world offset
    (reference spectral_cube.py:1709-1710)."""
    cube, data = cube_adv
    m1 = np.asarray(cube.moment1().value)
    sv = np.asarray(cube.spectral_axis.value)
    assert np.nanmin(m1) >= sv.min() - 1e-6
    assert np.nanmax(m1) <= sv.max() + 1e-6


def test_moment2_variance_warning(cube_adv):
    cube, _ = cube_adv
    from spectral_cube_tpu.utils import VarianceWarning
    with pytest.warns(VarianceWarning):
        cube.moment2()


def test_masked_moment_matches_oracle(cube_adv):
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.3 * u.Jy / u.beam)
    m0 = np.asarray(masked.moment0().value)
    sv = np.asarray(cube.spectral_axis.value)
    e0, _, _ = np_moments(data, sv - sv[0], abs(sv[1] - sv[0]), thresh=0.3)
    assert np.allclose(m0, e0, rtol=2e-6, equal_nan=True)


def test_moment_spatial_axis(cube_adv):
    cube, data = cube_adv
    m0y = cube.moment0(axis=1)
    assert m0y.shape == (cube.shape[0], cube.shape[2])


def test_moment_along_lon_axis(cube_adv):
    cube, data = cube_adv
    m0x = cube.moment0(axis=2)
    assert m0x.shape == (cube.shape[0], cube.shape[1])
    # dx along lon is the celestial pixel scale in degrees
    from spectral_cube_tpu.units import Quantity
    dx = abs(cube.wcs.proj_plane_pixel_scales()[0])
    expected = np.nansum(data, axis=2) * dx
    allnan = np.all(~np.isfinite(data), axis=2)
    expected = np.where(allnan, np.nan, expected)
    np.testing.assert_allclose(np.asarray(m0x.value), expected, rtol=1e-5,
                               equal_nan=True)
