import warnings

import numpy as np
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import (SpectralCube, Quantity,
                               BooleanArrayMask)
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
    # INDEPENDENT constant 2*sqrt(2 ln 2) — comparing against the
    # implementation's own SIGMA2FWHM would pass for any wrong value
    assert np.allclose(np.asarray(fwhm.value),
                       np.asarray(lw.value) * 2.3548200450309493,
                       rtol=1e-6)


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
    # value check with the literal header pixel scale (deg): the y-offset
    # branch of _moment_coords was previously shape-checked only
    dy = 5.55555561268e-4
    expected = np.nansum(data, axis=1) * dy
    allnan = np.all(~np.isfinite(data), axis=1)
    expected = np.where(allnan, np.nan, expected)
    np.testing.assert_allclose(np.asarray(m0y.value), expected, rtol=1e-5,
                               equal_nan=True)


def test_moment_along_lon_axis(cube_adv):
    cube, data = cube_adv
    m0x = cube.moment0(axis=2)
    assert m0x.shape == (cube.shape[0], cube.shape[1])
    # dx along lon: the LITERAL header value (5.55555561268e-4 deg) —
    # calling proj_plane_pixel_scales() here would be circular with the
    # implementation (cube.py _moment_coords)
    dx = 5.55555561268e-4
    expected = np.nansum(data, axis=2) * dx
    allnan = np.all(~np.isfinite(data), axis=2)
    expected = np.where(allnan, np.nan, expected)
    np.testing.assert_allclose(np.asarray(m0x.value), expected, rtol=1e-5,
                               equal_nan=True)


def test_masked_moment12_nondatalocal_mask_oracle(cube_adv):
    """Masked moment1/2 through the cube plumbing with a
    BooleanArrayMask (NOT a data-local comparison): values against the
    independent float64 oracle, absolute spectral offset included."""
    cube, data = cube_adv
    rng = np.random.RandomState(3)
    inc = rng.rand(*cube.shape) > 0.3
    masked = cube.with_mask(BooleanArrayMask(inc, wcs=cube.wcs,
                                             shape=cube.shape))
    sv = np.asarray(cube.spectral_axis.value)
    w = np.where(np.isfinite(data) & inc, data, np.nan)
    dx = abs(sv[1] - sv[0])
    e0 = np.nansum(w, axis=0) * dx
    allnan = np.all(~np.isfinite(w), axis=0)
    e0 = np.where(allnan, np.nan, e0)
    with np.errstate(invalid="ignore", divide="ignore"):
        e1 = np.nansum(w * sv[:, None, None], axis=0) / np.nansum(w, axis=0)
        e2 = np.nansum(w * (sv[:, None, None] - e1) ** 2, axis=0) \
            / np.nansum(w, axis=0)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        m0 = np.asarray(masked.moment0().value)
        m1 = np.asarray(masked.moment1().value)
        m2 = np.asarray(masked.moment2().value)
    np.testing.assert_allclose(m0, e0, rtol=2e-5, equal_nan=True)
    sel = np.isfinite(e1) & np.isfinite(m1)
    np.testing.assert_allclose(m1[sel], e1[sel], rtol=2e-4)
    sel2 = np.isfinite(e2) & np.isfinite(m2) & (e2 > 1e-3)
    np.testing.assert_allclose(m2[sel2], e2[sel2], rtol=1e-3)


def test_spatial_moment_rotated_wcs_unequal_scales(tmp_path):
    """Spatial moments under a ROTATED PC matrix with unequal pixel
    scales, against an independent spherical-separation oracle (every
    other fixture is axis-aligned with |CDELT1| == |CDELT2|, so a
    transposed pixel_scale_matrix or wrong-axis index was invisible)."""
    import spectral_cube_tpu.io.fits_low as fl
    from conftest import base_header

    rng = np.random.RandomState(7)
    nchan, ny, nx = 3, 10, 12
    data = rng.rand(nchan, ny, nx)
    h = base_header(nx=nx, ny=ny, nchan=nchan)
    h["CDELT1"] = -2.0e-4
    h["CDELT2"] = 3.0e-4
    r = np.radians(25.0)
    h["PC1_1"] = np.cos(r)
    h["PC1_2"] = -np.sin(r)
    h["PC2_1"] = np.sin(r)
    h["PC2_2"] = np.cos(r)
    p = str(tmp_path / "rot.fits")
    fl.write_fits(p, [fl.HDU(data=data, header=h)])
    cube = SpectralCube.read(p)

    def sep(lon1, lat1, lon2, lat2):
        """Great-circle separation [deg] (haversine, independent of the
        WCS pixel-scale machinery)."""
        p1, p2 = np.radians(lat1), np.radians(lat2)
        dl = np.radians(lon2 - lon1)
        dp = p2 - p1
        a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) \
            * np.sin(dl / 2) ** 2
        return np.degrees(2 * np.arcsin(np.sqrt(np.clip(a, 0, 1))))

    _, lat, lon = (np.asarray(q.value) for q in cube.world[0, :, :])
    # pixel scale along x from adjacent-pixel separations
    dx_har = sep(lon[:, :-1], lat[:, :-1], lon[:, 1:], lat[:, 1:])
    dx = float(dx_har.mean())
    assert dx_har.std() / dx < 1e-3  # flat field: separations uniform
    # the WCS's own pixel scale agrees with the independent construction
    np.testing.assert_allclose(
        abs(cube.wcs.proj_plane_pixel_scales()[0]), dx, rtol=1e-6)
    m0x = np.asarray(cube.moment0(axis=2).value)
    e0 = np.nansum(data, axis=2) * dx
    np.testing.assert_allclose(m0x, e0, rtol=1e-4)
    # moment1 along x: intensity-weighted mean of the CUMULATIVE
    # separations from column 0 (the reference _pix_cen definition)
    x_off = np.concatenate([np.zeros((ny, 1)),
                            np.cumsum(dx_har, axis=1)], axis=1)
    e1 = (np.nansum(data * x_off[None], axis=2)
          / np.nansum(data, axis=2))
    m1x = np.asarray(cube.moment1(axis=2).value)
    np.testing.assert_allclose(m1x, e1, rtol=1e-4)


def test_pallas_vmem_fallback_long_spectral_axis():
    """nchan too long for the in-VMEM two-pass kernel: moments_012_pallas
    falls back to the fused XLA expression, merging mask_expr + include
    exactly like the in-kernel path would."""
    from spectral_cube_tpu.ops.moments import moments_012, moments_012_pallas
    from spectral_cube_tpu.masks import LazyComparisonMask
    rng = np.random.RandomState(2)
    nchan = 4096
    data = rng.rand(nchan, 8, 16).astype("f4")
    data[5, 1, 1] = np.nan
    coords = np.linspace(-1.0, 1.0, nchan)
    dx = coords[1] - coords[0]
    include = jnp.asarray(rng.rand(nchan, 8, 16) > 0.1)
    mask = LazyComparisonMask(jnp.greater, 0.2, shape=data.shape)
    got = moments_012_pallas(jnp.asarray(data), coords, dx,
                             mask_expr=mask, include=include)
    exp = moments_012(jnp.asarray(data), coords, dx,
                      include=jnp.logical_and(include,
                                              jnp.asarray(data) > 0.2))
    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=1e-5, atol=1e-7, equal_nan=True)


def test_pallas_rejects_non_data_local_mask_expr():
    from spectral_cube_tpu.ops.moments import moments_012_pallas
    from spectral_cube_tpu.masks import BooleanArrayMask
    data = jnp.ones((8, 8, 8), jnp.float32)
    mask = BooleanArrayMask(np.ones((8, 8, 8), bool), shape=(8, 8, 8))
    with pytest.raises(ValueError, match="data-local"):
        moments_012_pallas(data, np.arange(8.0), 1.0, mask_expr=mask,
                           interpret=True)


def test_pallas_with_stats_matches_float64_oracle():
    """moments_012_pallas(with_stats=True): the same-pass global
    statistics match a float64 numpy oracle — including the DC-offset
    regime where a plain f32 global sum corrupts sigma (the shifted
    plane recombination keeps it at ~1e-4) — and match
    masked_statistics on mild data at 2e-5."""
    from spectral_cube_tpu.ops import reductions as red
    rng = np.random.RandomState(3)
    data = (1000.0 + 0.01 * rng.randn(64, 16, 256)).astype(np.float32)
    data[3, 2, 5] = np.nan
    include = data > 999.995
    m0, m1, m2, st = moments_012_pallas(
        jnp.asarray(data), np.arange(64.0), 1.0,
        include=jnp.asarray(include), interpret=True, with_stats=True)
    v = include & np.isfinite(data)
    x = data[v].astype(np.float64)
    assert int(st["npts"]) == x.size
    np.testing.assert_allclose(float(st["mean"]), x.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(st["sigma"]), x.std(ddof=1),
                               rtol=5e-4)
    np.testing.assert_allclose(float(st["min"]), x.min(), rtol=0)
    np.testing.assert_allclose(float(st["max"]), x.max(), rtol=0)
    np.testing.assert_allclose(float(st["rms"]),
                               np.sqrt((x * x).mean()), rtol=1e-6)

    data2 = rng.randn(48, 16, 256).astype(np.float32)
    inc2 = data2 > -0.5
    *_, st2 = moments_012_pallas(
        jnp.asarray(data2), np.arange(48.0), 1.0,
        include=jnp.asarray(inc2), interpret=True, with_stats=True)
    ref2 = red.masked_statistics(
        jnp.asarray(data2),
        red.valid_mask(jnp.asarray(data2), jnp.asarray(inc2)))
    for key in ("npts", "min", "max", "sum", "mean", "sigma", "rms",
                "sumsq"):
        rel = abs(float(st2[key]) - float(ref2[key])) \
            / max(abs(float(ref2[key])), 1e-30)
        assert rel < 2e-5, (key, rel)


def test_pallas_with_stats_stays_on_kernel_at_bench_shape(monkeypatch):
    """with_stats=True must shrink the tile height to fit its extra VMEM
    temporaries, NOT fall back to the XLA path: at the 256-channel
    BASELINE tile shape the old factor-8 estimate (16.8 MB at ty=16)
    silently tipped the whole fused moments+statistics pipeline onto the
    ~3x-slower fallback (measured 0.227 vs 0.080 ms on 256^3)."""
    from spectral_cube_tpu.ops import moments as M

    def boom(*a, **k):
        raise AssertionError("with_stats fell back to the XLA path")

    monkeypatch.setattr(M, "moments_012", boom)
    from spectral_cube_tpu.masks import LazyComparisonMask
    rng = np.random.RandomState(7)
    data = rng.randn(256, 32, 128).astype(np.float32)
    data[10, 3, 7] = np.nan
    include = data > -0.5
    mask = LazyComparisonMask(jnp.greater, -0.5, shape=data.shape)
    m0, m1, m2, st = M.moments_012_pallas(
        jnp.asarray(data), np.arange(256.0), 1.0,
        mask_expr=mask, interpret=True, with_stats=True)
    v = include & np.isfinite(data)
    x = data[v].astype(np.float64)
    assert int(st["npts"]) == x.size
    np.testing.assert_allclose(float(st["mean"]), x.mean(), atol=2e-6)
    np.testing.assert_allclose(float(st["sigma"]), x.std(ddof=1),
                               rtol=1e-5)
    np.testing.assert_allclose(float(st["rms"]),
                               np.sqrt((x * x).mean()), rtol=1e-5)


def test_pallas_with_stats_all_masked():
    *_, st = moments_012_pallas(
        jnp.asarray(np.ones((8, 8, 128), np.float32)), np.arange(8.0),
        1.0, include=jnp.zeros((8, 8, 128), bool), interpret=True,
        with_stats=True)
    assert int(st["npts"]) == 0
    assert np.isnan(float(st["mean"])) and np.isnan(float(st["sigma"]))
    assert np.isnan(float(st["min"])) and np.isnan(float(st["max"]))


def test_chunked_pallas_long_axis_matches_oracle():
    """Channel-chunked kernel (spectral axis too long for one VMEM
    block): masked moments at 1024 channels match the float64 oracle at
    the single-block kernel's tolerances."""
    from spectral_cube_tpu.ops.moments import (_moments_pallas_chunked,
                                               _center)
    rng = np.random.RandomState(11)
    nchan, ny, nx = 1024, 16, 128
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[5, 1, 1] = np.nan
    data[:, 0, 3] = np.nan          # all-NaN spaxel
    coords = np.arange(nchan) * 0.5
    dx = 0.5
    mask = LazyComparisonMask(jnp.greater, 0.3, shape=data.shape)
    # the dispatcher itself must route to the chunked kernel at 1024
    got = moments_012_pallas(jnp.asarray(data), coords, dx,
                             mask_expr=mask, interpret=True)
    e0, e1, e2 = np_moments(data, coords, dx, thresh=0.3)
    p0, p1, p2 = (np.asarray(m) for m in got)
    assert np.allclose(p0, e0, rtol=2e-6, equal_nan=True)
    assert np.allclose(p1, e1, rtol=2e-6, equal_nan=True)
    assert np.allclose(p2, e2, rtol=2e-5, atol=1e-7, equal_nan=True)
    # direct chunked call agrees too (cc genuinely < nchan)
    coords_c, xbar = _center(coords)
    got2 = _moments_pallas_chunked(jnp.asarray(data), coords_c, xbar, dx,
                                   mask, None, True, False)
    assert got2 is not None
    for a, b in zip(got2, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, equal_nan=True)


def test_chunked_pallas_adversarial_narrow_line():
    """The pair-accumulation scheme must survive a narrow line far from
    the coordinate center (the mom2 cancellation the two-pass form
    exists for): 1e-6 vs the float64 oracle."""
    from spectral_cube_tpu.ops.moments import _moments_pallas_chunked, _center
    nchan, ny, nx = 512, 8, 128
    rng = np.random.RandomState(12)
    coords = np.arange(nchan) * 1.0
    v = coords - 500.0              # line centered at channel 500
    line = np.exp(-0.5 * (v / 3.0) ** 2).astype("f4")
    data = (line[:, None, None]
            * (0.5 + rng.rand(1, ny, nx)).astype("f4")).astype("f4")
    coords_c, xbar = _center(coords)
    got = _moments_pallas_chunked(jnp.asarray(data), coords_c, xbar, 1.0,
                                  None, None, True, False)
    assert got is not None
    e0, e1, e2 = np_moments(data, coords, 1.0)
    np.testing.assert_allclose(np.asarray(got[0]), e0, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(got[1]), e1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[2]), e2, rtol=1e-5,
                               atol=1e-6)


def test_chunked_pallas_with_stats_matches_float64():
    """Chunked with_stats: statistics recombine across chunks (pair Q)
    including the DC-offset regime."""
    from spectral_cube_tpu.ops.moments import _moments_pallas_chunked, _center
    rng = np.random.RandomState(13)
    nchan, ny, nx = 512, 8, 128
    data = (1000.0 + 0.01 * rng.randn(nchan, ny, nx)).astype("f4")
    data[3, 2, 5] = np.nan
    include = data > 999.995
    coords = np.arange(float(nchan))
    coords_c, xbar = _center(coords)
    got = _moments_pallas_chunked(jnp.asarray(data), coords_c, xbar, 1.0,
                                  None, jnp.asarray(include), True, True)
    assert got is not None
    st = got[3]
    v = include & np.isfinite(data)
    x = data[v].astype(np.float64)
    assert int(st["npts"]) == x.size
    np.testing.assert_allclose(float(st["mean"]), x.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(st["sigma"]), x.std(ddof=1),
                               rtol=5e-4)
    np.testing.assert_allclose(float(st["min"]), x.min(), rtol=0)
    np.testing.assert_allclose(float(st["max"]), x.max(), rtol=0)
    np.testing.assert_allclose(float(st["rms"]),
                               np.sqrt((x * x).mean()), rtol=1e-6)


def test_chunked_pallas_selected_at_1024_channels(monkeypatch):
    """The 1024-channel bench-config-8 shape must take the chunked
    Pallas kernel, NOT the XLA fallback (the silent fallback was
    round 4's 2x HBM-scale falloff)."""
    from spectral_cube_tpu.ops import moments as M

    def boom(*a, **k):
        raise AssertionError("1024-channel moments fell back to XLA")

    monkeypatch.setattr(M, "moments_012", boom)
    rng = np.random.RandomState(17)
    data = rng.rand(1024, 8, 128).astype("f4")
    mask = LazyComparisonMask(jnp.greater, 0.25, shape=data.shape)
    m0, m1, m2 = M.moments_012_pallas(jnp.asarray(data),
                                      np.arange(1024.0), 1.0,
                                      mask_expr=mask, interpret=True)
    assert np.asarray(m0).shape == (8, 128)


def test_statistics_pallas_matches_masked_statistics():
    """The one-HBM-pass statistics route (cube.statistics' TPU path)
    matches the two-pass masked_statistics on masked NaN data."""
    from spectral_cube_tpu.ops import reductions as red
    from spectral_cube_tpu.ops.moments import statistics_pallas
    rng = np.random.RandomState(19)
    data = rng.randn(48, 16, 256).astype("f4")
    data[3, 2, 5] = np.nan
    inc = data > -0.5
    st = statistics_pallas(jnp.asarray(data), include=jnp.asarray(inc),
                           interpret=True)
    ref = red.masked_statistics(
        jnp.asarray(data), red.valid_mask(jnp.asarray(data),
                                          jnp.asarray(inc)))
    for key in ("npts", "min", "max", "sum", "mean", "sigma", "rms",
                "sumsq"):
        rel = abs(float(st[key]) - float(ref[key])) \
            / max(abs(float(ref[key])), 1e-30)
        assert rel < 2e-5, (key, rel)
    # data-local mask form agrees with the include form
    mask = LazyComparisonMask(jnp.greater, -0.5, shape=data.shape)
    st2 = statistics_pallas(jnp.asarray(data), mask_expr=mask,
                            interpret=True)
    assert int(st2["npts"]) == int(st["npts"])
    np.testing.assert_allclose(float(st2["sigma"]), float(st["sigma"]),
                               rtol=1e-6)
