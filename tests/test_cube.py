import warnings

import numpy as np
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import (SpectralCube, Quantity, Slice, OneDSpectrum,
                               BooleanArrayMask)
from spectral_cube_tpu.units import UnitConversionError

from conftest import make_cube_file


def test_read_basics(cube_adv):
    cube, data = cube_adv
    assert cube.shape == (4, 3, 2)
    assert cube.unit == u.Jy / u.beam
    assert cube.beam is not None
    assert cube.wcs.spec == 2
    sv = np.asarray(cube.spectral_axis.value)
    assert sv[0] == pytest.approx(-321.2)
    assert np.allclose(np.diff(sv), 1.28)


def test_statistics_exact(tmp_path):
    """Analog of the reference's exact-value anchor
    (tests/test_dask.py:97-107): statistics on a known cube."""
    path, data = make_cube_file(tmp_path, with_nan=False)
    cube = SpectralCube.read(path)
    st = cube.statistics()
    flat = data.ravel()
    assert st["npts"] == flat.size
    assert float(st["mean"].value) == pytest.approx(flat.mean(), rel=1e-6)
    assert float(st["sum"].value) == pytest.approx(flat.sum(), rel=1e-6)
    assert float(st["sigma"].value) == pytest.approx(flat.std(ddof=1),
                                                     rel=1e-5)
    assert float(st["rms"].value) == pytest.approx(
        np.sqrt((flat.astype("f8") ** 2).mean()), rel=1e-6)
    assert float(st["min"].value) == pytest.approx(flat.min(), rel=1e-6)
    assert float(st["max"].value) == pytest.approx(flat.max(), rel=1e-6)


@pytest.mark.parametrize("method,npfunc", [
    ("sum", np.nansum), ("mean", np.nanmean), ("std", np.nanstd),
    ("max", np.nanmax), ("min", np.nanmin), ("median", np.nanmedian),
])
def test_reductions_vs_numpy(cube_adv, method, npfunc):
    cube, data = cube_adv
    for axis in (None, 0, 1, 2):
        out = getattr(cube, method)(axis=axis)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            expected = npfunc(data, axis=axis)
        got = np.asarray(out.value)
        if method == "sum" and axis is not None:
            # allbadtonan semantics: all-NaN positions are NaN
            allnan = np.all(~np.isfinite(data), axis=axis)
            expected = np.where(allnan, np.nan, expected)
        assert np.allclose(got, expected, rtol=2e-6, atol=1e-7,
                           equal_nan=True), (method, axis)


def test_percentile(cube_adv):
    cube, data = cube_adv
    out = cube.percentile(25, axis=0)
    expected = np.nanpercentile(data, 25, axis=0)
    assert np.allclose(np.asarray(out.value), expected, rtol=1e-5,
                       equal_nan=True)


def test_mad_std(cube_adv):
    cube, data = cube_adv
    out = float(cube.mad_std().value)
    med = np.nanmedian(data)
    expected = 1.482602218505602 * np.nanmedian(np.abs(data - med))
    assert out == pytest.approx(expected, rel=1e-5)


def test_argmax_argmin(cube_adv):
    cube, data = cube_adv
    am = cube.argmax(axis=0)
    filled = np.where(np.isfinite(data), data, -np.inf)
    np.testing.assert_array_equal(am, filled.argmax(axis=0))
    flat_idx = cube.argmax()
    assert data[flat_idx] == np.nanmax(data)


def test_argmax_world(cube_adv):
    cube, data = cube_adv
    aw = cube.argmax_world(axis=0)
    sv = np.asarray(cube.spectral_axis.value)
    filled = np.where(np.isfinite(data), data, -np.inf)
    np.testing.assert_allclose(np.asarray(aw.value),
                               sv[filled.argmax(axis=0)])
    assert aw.unit.dims == u.km_s.dims


def test_getitem_variants(cube_adv):
    cube, data = cube_adv
    sub = cube[1:3, 0:2, :]
    assert sub.shape == (2, 2, 2)
    assert np.asarray(sub.spectral_axis.value)[0] == pytest.approx(
        np.asarray(cube.spectral_axis.value)[1])
    sl = cube[0]
    assert isinstance(sl, Slice) and sl.shape == (3, 2)
    spec = cube[:, 1, 1]
    assert isinstance(spec, OneDSpectrum)
    np.testing.assert_allclose(np.asarray(spec.spectral_axis.value),
                               np.asarray(cube.spectral_axis.value))
    scalar = cube[0, 0, 0]
    assert isinstance(scalar, Quantity)
    assert float(scalar.value) == pytest.approx(data[0, 0, 0])


def test_getitem_applies_mask(cube_adv):
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.5 * u.Jy / u.beam)
    sl = masked[1]
    vals = np.asarray(sl.value)
    expected = np.where(np.isfinite(data[1]) & (data[1] > 0.5), data[1],
                        np.nan)
    assert np.allclose(vals, expected, equal_nan=True)


def test_reversed_slice_wcs(cube_adv):
    cube, data = cube_adv
    rev = cube[::-1]
    np.testing.assert_allclose(np.asarray(rev.spectral_axis.value),
                               np.asarray(cube.spectral_axis.value)[::-1],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(rev.unmasked_data[:].value),
                               data[::-1], equal_nan=True)


def test_spectral_slab(cube_adv):
    cube, _ = cube_adv
    slab = cube.spectral_slab(Quantity(-321.2, "km / s"),
                              Quantity(-318.7, "km / s"))
    assert slab.shape[0] == 3
    # pin WHICH channels (an off-by-one applied to both bounds keeps
    # the shape and fwd==rev symmetry)
    sv = np.asarray(cube.spectral_axis.value)
    np.testing.assert_allclose(np.asarray(slab.spectral_axis.value),
                               sv[:3], rtol=1e-10)


def test_subcube_world_bounds(cube_adv):
    cube, data = cube_adv
    _, lat, lon = cube.world[0, :, :]
    lonv = np.asarray(lon.value)
    sc = cube.subcube(xlo=Quantity(lonv.max(), "deg"),
                      xhi=Quantity(lonv.min(), "deg"))
    assert sc.shape[2] == cube.shape[2]
    # a PARTIAL world bound must actually crop to the right column(s):
    # keep only the column whose lon equals the max (RA grows leftward,
    # CDELT1 < 0, so that is pixel column 0)
    col_lons = lonv[0, :]
    target = Quantity(col_lons.max(), "deg")
    sc2 = cube.subcube(xlo=target, xhi=target)
    assert sc2.shape == (cube.shape[0], cube.shape[1], 1)
    np.testing.assert_allclose(
        np.asarray(sc2.unmasked_data[:, :, 0].value),
        data[:, :, int(np.argmax(col_lons))], equal_nan=True, rtol=1e-7)


def test_minimal_subcube(cube_adv):
    cube, data = cube_adv
    arr = np.zeros(cube.shape, dtype=bool)
    arr[1:3, 1:2, 0:2] = True
    sub = cube.with_mask(BooleanArrayMask(arr)).minimal_subcube()
    assert sub.shape == (2, 1, 2)


def test_world_coordinates(cube_adv):
    cube, _ = cube_adv
    spec, lat, lon = cube.world[:, :, :]
    assert spec.shape == cube.shape
    assert np.allclose(np.asarray(spec.value)[:, 0, 0],
                       np.asarray(cube.spectral_axis.value))
    # lon decreases with x (CDELT1 < 0)
    lonv = np.asarray(lon.value)
    assert lonv[0, 0, 0] > lonv[0, 0, 1]


def test_world_extrema(cube_adv):
    cube, _ = cube_adv
    ext = cube.world_extrema
    assert ext.shape == (2, 2)


def test_comparison_requires_quantity(cube_adv):
    cube, _ = cube_adv
    with pytest.raises(ValueError):
        cube > 0.5  # bare float on a Jy/beam cube


def test_unit_conversion_jybm_k_roundtrip(cube_adv):
    cube, data = cube_adv
    kcube = cube.to("K")
    assert kcube.unit == u.K
    back = kcube.to("Jy / beam")
    np.testing.assert_allclose(np.asarray(back.unmasked_data[:].value),
                               data, rtol=1e-5)


def test_unit_conversion_scaling(cube_adv):
    cube, data = cube_adv
    mjy = cube.to("mJy / beam")
    np.testing.assert_allclose(np.asarray(mjy.unmasked_data[:].value),
                               data * 1000, rtol=1e-5)


def test_arithmetic(cube_adv):
    cube, data = cube_adv
    np.testing.assert_allclose(
        np.asarray((cube * 2).unmasked_data[:].value), data * 2,
        equal_nan=True)
    np.testing.assert_allclose(
        np.asarray((cube + Quantity(1.0, "Jy / beam")).unmasked_data[:]
                   .value), data + 1, equal_nan=True)
    np.testing.assert_allclose(
        np.asarray((cube - cube).unmasked_data[:].value),
        np.zeros_like(data) * np.where(np.isfinite(data), 1, np.nan),
        equal_nan=True)
    sq = cube ** 2
    assert sq.unit.dims == ((u.Jy / u.beam) ** 2).dims
    with pytest.raises(NotImplementedError):
        cube // 2


def test_apply_everywhere(cube_adv):
    cube, data = cube_adv
    out = cube.apply_everywhere(lambda q: q * 2)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value),
                               data * 2, equal_nan=True)


def test_with_fill_value(cube_adv):
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.5 * u.Jy / u.beam).with_fill_value(0.0)
    filled = np.asarray(masked.filled_data[:].value)
    excluded = ~(np.nan_to_num(data) > 0.5)
    assert excluded.any() and not excluded.all()
    assert (filled[excluded] == 0).all()
    # and included pixels keep their DATA (an all-zeros output would
    # otherwise pass)
    np.testing.assert_allclose(filled[~excluded], data[~excluded],
                               rtol=1e-7)


def test_mask_channels(cube_adv):
    cube, data = cube_adv
    good = np.array([True, False, True, True])
    mc = cube.mask_channels(good)
    filled = np.asarray(mc.filled_data[:].value)
    assert np.all(np.isnan(filled[1]))
    with pytest.raises(ValueError):
        cube.mask_channels(np.array([True, False]))


def test_flattened(cube_adv):
    cube, data = cube_adv
    flat = cube.flattened()
    assert flat.size == np.isfinite(data).sum()


def test_apply_function_masked_flattened_rays(cube_adv):
    """apply_function sees only each ray's *valid* values (reference
    spectral_cube.py:1049-1092: function need not be nan-aware; data
    arrives mask-flattened per line of sight)."""
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.3 * u.Jy / u.beam)
    out = masked.apply_function(np.mean, axis=0)
    assert isinstance(out, np.ndarray) and out.shape == data.shape[1:]
    inc = np.isfinite(data) & (data > 0.3)
    for j in range(data.shape[1]):
        for i in range(data.shape[2]):
            vals = data[:, j, i][inc[:, j, i]]
            exp = vals.mean() if len(vals) else np.nan
            np.testing.assert_allclose(out[j, i], exp, rtol=1e-6,
                                       equal_nan=True)


def test_apply_function_axis_none_weights_projection(cube_adv):
    """axis=None flattens the whole cube; weights multiply the flattened
    values; projection=True wraps a Projection with collapse_axis meta
    (reference spectral_cube.py:1049-1105)."""
    cube, data = cube_adv
    total = cube.apply_function(np.sum, axis=None, unit=cube.unit)
    np.testing.assert_allclose(float(total.value), np.nansum(data),
                               rtol=1e-6)
    w = np.full(data.shape, 2.0)
    doubled = cube.apply_function(np.sum, axis=0, weights=w)
    base = cube.apply_function(np.sum, axis=0)
    np.testing.assert_allclose(doubled, 2 * base, rtol=1e-6,
                               equal_nan=True)
    proj = cube.apply_function(np.max, axis=0, projection=True,
                               unit=cube.unit)
    from spectral_cube_tpu.lower_dimensional_structures import Projection
    assert isinstance(proj, Projection)
    assert proj.meta["collapse_axis"] == 0
    # integer-valued functions get a zero-initialized integer output
    # (reference dtype probe, spectral_cube.py:1066-1071)
    am = cube.apply_function(np.argmax, axis=0)
    assert "int" in str(am.dtype)
    # empty rays stay NaN, and multi-axis application is refused
    allout = cube.with_mask(
        np.zeros(data.shape, bool)).apply_function(np.mean, axis=0)
    assert np.isnan(allout).all()
    with pytest.raises(NotImplementedError):
        cube.apply_function(np.mean, axis=(0, 1))


def test_apply_function_keep_shape_and_spatial_axis(cube_adv):
    """keep_shape returns the raw [n_axis, rem0, rem1] array with the
    applied axis FIRST (reference allocates out[nz, nx, ny] and never
    transposes back, spectral_cube.py:1063-1097)."""
    cube, data = cube_adv
    nz = data.shape[1]
    kept = cube.apply_function(
        lambda v: np.full(nz, np.mean(np.asarray(v))),
        axis=1, keep_shape=True)
    assert kept.shape == (data.shape[1], data.shape[0], data.shape[2])
    exp = np.nanmean(data, axis=1)
    for z in range(data.shape[0]):
        for i in range(data.shape[2]):
            np.testing.assert_allclose(kept[:, z, i],
                                       np.full(nz, exp[z, i]), rtol=1e-5)


def test_apply_function_parallel_spectral(cube_adv):
    cube, data = cube_adv
    out = cube.apply_function_parallel_spectral(lambda s: s * 2)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value),
                               data * 2, rtol=1e-6, equal_nan=True)


def test_apply_function_parallel_spatial(cube_adv):
    cube, data = cube_adv
    out = cube.apply_function_parallel_spatial(lambda img: img + 1)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value),
                               data + 1, rtol=1e-6, equal_nan=True)


def test_with_spectral_unit_roundtrip(cube_adv):
    cube, _ = cube_adv
    f = cube.with_spectral_unit(u.Hz)
    assert f.spectral_axis.unit == u.Hz
    back = f.with_spectral_unit(u.km_s, velocity_convention="radio")
    np.testing.assert_allclose(np.asarray(back.spectral_axis.value),
                               np.asarray(cube.spectral_axis.value),
                               rtol=1e-10)


def test_huge_operation_guard(cube_adv):
    """A fake-huge cube refuses whole-cube materialization until
    allow_huge_operations is set (the real guard; the old version of
    this test asserted nothing)."""
    cube, _ = cube_adv
    # _is_huge is size-derived; shadow the base-class property on the
    # concrete class for this test only, then remove the shadow
    cls = type(cube)
    cls._is_huge = property(lambda self: True)
    try:
        with pytest.raises(ValueError):
            cube.filled()
        cube.allow_huge_operations = True
        cube.filled()
    finally:
        del cls._is_huge   # un-shadow the inherited property


def test_repr(cube_adv):
    cube, _ = cube_adv
    r = repr(cube)
    assert "SpectralCube" in r and "VRAD" in r


def test_spectral_extrema_and_unmasked_copy(cube_adv):
    cube, data = cube_adv
    ext = cube.spectral_extrema
    sv = np.asarray(cube.spectral_axis.value)
    np.testing.assert_allclose(np.asarray(ext.value), [sv.min(), sv.max()])
    masked = cube.with_mask(cube > 0.5 * u.Jy / u.beam)
    um = masked.unmasked_copy()
    assert um.mask is None
    np.testing.assert_allclose(np.asarray(um.filled_data[:].value), data,
                               equal_nan=True)
    with pytest.raises(NotImplementedError):
        cube.chunked()


def test_ldo_array_read_roundtrip(tmp_path, cube_adv):
    from spectral_cube_tpu import Projection
    cube, data = cube_adv
    m0 = cube.moment0()
    assert isinstance(m0.array, np.ndarray)
    path = str(tmp_path / "proj.fits")
    m0.write(path)
    back = Projection.read(path)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(m0.value), rtol=1e-7,
                               equal_nan=True)
    assert back.wcs.check_equality(m0.wcs, wcs_tolerance=1e-9)


def test_mask_survives_downsample(cube_adv):
    """Shape-changing ops must carry a correctly-shaped mask (regression:
    BooleanArrayMask-masked cube -> downsample_axis -> filled_data raised
    an incompatible-shapes TypeError)."""
    cube, data = cube_adv
    arr = np.ones(cube.shape, dtype=bool)
    arr[0] = False
    masked = cube.with_mask(arr)
    ds = masked.downsample_axis(2, axis=0)
    assert ds.shape[0] == cube.shape[0] // 2
    filled = np.asarray(ds.filled_data[:].value)
    assert filled.shape == ds.shape
    # block-any: the first output channel still has channel 1 included,
    # except where the fixture NaN (at [1,1,1]) kills the whole block
    inc = np.asarray(ds.mask.include())
    assert inc.shape == ds.shape
    expected = np.ones(ds.shape, dtype=bool)
    expected[0, 1, 1] = False  # ch0 excluded by arr, ch1 NaN
    assert (inc == expected).all()
    # fully-excluded blocks stay excluded
    arr2 = np.zeros(cube.shape, dtype=bool)
    arr2[3] = True
    ds2 = cube.with_mask(arr2).downsample_axis(2, axis=0)
    inc2 = np.asarray(ds2.mask.include())
    assert not inc2[0].any() and inc2[1].all()


def test_mask_survives_spectral_interpolate(cube_adv):
    cube, data = cube_adv
    arr = np.ones(cube.shape, dtype=bool)
    arr[2] = False
    masked = cube.with_mask(arr)
    sv = np.asarray(masked.spectral_axis.value)
    grid = np.linspace(sv.min(), sv.max(), 7)
    out = masked.spectral_interpolate(grid * masked.spectral_axis.unit
                                      if hasattr(masked.spectral_axis,
                                                 "unit") else grid)
    filled = np.asarray(out.filled_data[:].value)
    assert filled.shape == out.shape == (7,) + cube.shape[1:]
    assert out.mask is not None
    assert np.asarray(out.mask.include()).shape == out.shape


def test_new_cube_with_mask_clearing(cube_adv):
    cube, data = cube_adv
    arr = np.zeros(cube.shape, dtype=bool)
    masked = cube.with_mask(arr)
    assert masked.mask is not None
    cleared = masked._new_cube_with(mask=None)
    assert cleared.mask is None
    inherited = masked._new_cube_with()
    assert inherited.mask is masked.mask
    assert masked.unmasked_copy().mask is None


def test_scalar_add_requires_units(cube_adv):
    cube, data = cube_adv
    with pytest.raises(ValueError):
        cube + 5
    with pytest.raises(ValueError):
        cube - 1.5
    # mul/div by plain scalars stays fine
    assert (cube * 2).unit == cube.unit
    # dimensionless cubes accept plain scalars
    assert np.isfinite(np.asarray(
        (cube.unitless + 5).filled_data[:].value)).any()


def test_statistics_all_masked(cube_adv):
    cube, data = cube_adv
    masked = cube.with_mask(np.zeros(cube.shape, dtype=bool))
    stats = masked.statistics()
    assert stats["npts"] == 0
    assert np.isnan(stats["mean"].value)
    assert np.isnan(stats["sigma"].value)


def test_argmax_world_spatial_gate(cube_adv):
    """Spatial axes raise WCSCelestialError on celestial projections (the
    axis-correlation gate; parity with reference
    test_spectral_cube.py:768-792)."""
    from spectral_cube_tpu.utils import WCSCelestialError
    cube, data = cube_adv
    for axis in (1, 2):
        with pytest.raises(WCSCelestialError):
            cube.argmax_world(axis=axis)
        with pytest.raises(WCSCelestialError):
            cube.argmin_world(axis=axis)


def test_argmax_world_spectral(cube_adv):
    cube, data = cube_adv
    out = cube.argmax_world(axis=0)
    sv = np.asarray(cube.spectral_axis.value)
    idx = np.nanargmax(np.where(np.isfinite(data), data, -np.inf), axis=0)
    np.testing.assert_allclose(np.asarray(out.value), sv[idx], rtol=1e-10)
    # all-masked spaxels are NaN
    arr = np.ones(cube.shape, dtype=bool)
    arr[:, 0, 0] = False
    masked = cube.with_mask(arr)
    out2 = masked.argmax_world(axis=0)
    assert np.isnan(np.asarray(out2.value)[0, 0])


def test_argmax_world_spatial_car(tmp_path):
    """A CAR (plate carree) projection with diagonal PC is separable, so
    spatial argmax_world works; validates the world lookup itself."""
    path, data = make_cube_file(tmp_path, shape=(4, 5, 6))
    from spectral_cube_tpu.io.fits_low import read_fits, write_fits, HDU
    hdus = read_fits(path)
    h = hdus[0].header
    h["CTYPE1"] = "RA---CAR"
    h["CTYPE2"] = "DEC--CAR"
    h["CRVAL2"] = 0.0  # CAR is linear only along the equator
    path2 = str(tmp_path / "car.fits")
    write_fits(path2, [HDU(data=hdus[0].data, header=h)])
    cube = SpectralCube.read(path2)
    out = cube.argmax_world(axis=1)
    assert np.asarray(out.value).shape == (4, 6)
    # spot check one spaxel against the world spine
    _, lat, _ = cube.world[0, :, 0]
    spine = np.asarray(lat.value)
    d = np.where(np.isfinite(data), data, -np.inf)
    idx = np.argmax(d[2, :, 3])
    np.testing.assert_allclose(np.asarray(out.value)[2, 3], spine[idx],
                               rtol=1e-10)


def test_world_spines(tmp_path):
    from spectral_cube_tpu.utils import WCSCelestialError
    path, data = make_cube_file(tmp_path, shape=(4, 5, 6))
    cube = SpectralCube.read(path)
    with pytest.raises(WCSCelestialError):
        cube.world_spines()  # SIN projection couples lon/lat
    from spectral_cube_tpu.io.fits_low import read_fits, write_fits, HDU
    hdus = read_fits(path)
    h = hdus[0].header
    h["CTYPE1"] = "RA---CAR"
    h["CTYPE2"] = "DEC--CAR"
    h["CRVAL2"] = 0.0
    path2 = str(tmp_path / "car2.fits")
    write_fits(path2, [HDU(data=hdus[0].data, header=h)])
    car = SpectralCube.read(path2)
    spec, lat, lon = car.world_spines()
    assert np.asarray(spec.value).shape == (4,)
    assert np.asarray(lat.value).shape == (5,)
    assert np.asarray(lon.value).shape == (6,)
    np.testing.assert_allclose(np.asarray(spec.value),
                               np.asarray(car.spectral_axis.value))


def test_huge_op_guards(cube_adv, monkeypatch):
    """Every host/HBM-materializing path honors allow_huge_operations
    (reference utils.py:41-75; previously only reproject was guarded)."""
    import spectral_cube_tpu.utils as sutils
    cube, data = cube_adv
    monkeypatch.setattr(sutils, "MEMORY_THRESHOLD", 10)
    monkeypatch.setattr("spectral_cube_tpu.cube_utils.MEMORY_THRESHOLD", 10)
    assert cube._is_huge
    for call in (lambda: cube.filled(),
                 lambda: cube.flattened(),
                 lambda: cube.flattened_world(),
                 lambda: cube.to("K"),
                 lambda: cube.apply_numpy_function(np.nansum)):
        with pytest.raises(ValueError, match="huge"):
            call()
    # .hdu is deliberately NOT guarded (matching the reference,
    # spectral_cube.py:2563-2574): write() of big cubes must work
    assert cube.hdu is not None
    cube.allow_huge_operations = True
    assert cube.filled().shape == cube.shape
    assert cube.to("K").unit == u.K


def test_flattened_keeps_included_values(cube_adv):
    """flattened() boolean-indexes by the include mask: included NaNs
    survive, and weights multiply the matching values (reference
    masks.py:165-195)."""
    cube, data = cube_adv
    arr = np.ones(cube.shape, dtype=bool)
    arr[0, 0, 0] = False
    masked = cube.unmasked_copy().with_mask(arr)
    flat = np.asarray(masked.flattened().value)
    assert flat.size == cube.size - 1
    # the fixture NaN at [1,1,1] is included -> survives as NaN
    assert np.isnan(flat).sum() == 1
    w = np.full(cube.shape, 2.0)
    flat_w = np.asarray(masked.flattened(weights=w).value)
    np.testing.assert_allclose(flat_w, flat * 2.0, equal_nan=True)


def test_parallel_spectral_escape_hatches(cube_adv):
    cube, data = cube_adv

    def with_info(block, block_info=None):
        assert block_info is not None
        assert block_info[0]["shape"] == cube.shape
        assert block_info[0]["array-location"][0] == (0, cube.shape[0])
        return block * 2

    out = cube.apply_function_parallel_spectral(with_info,
                                                accepts_chunks=True)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:].value),
                               np.where(np.isfinite(data), data * 2,
                                        np.nan), equal_nan=True)

    # return_new_cube=False: raw output, e.g. a per-spaxel fit result
    raw = cube.apply_function_parallel_spectral(
        lambda block, **k: jnp.sum(block, axis=0), accepts_chunks=True,
        return_new_cube=False)
    assert np.asarray(raw).shape == cube.shape[1:]


def test_nonnative_endian_ctor(cube_adv):
    """Big-endian arrays (raw FITS payloads) are normalized at
    construction (reference fixes endianness in _get_filled_data)."""
    cube, data = cube_adv
    be = data.astype(">f8")
    c = SpectralCube(be, cube.wcs, unit="K")
    np.testing.assert_allclose(np.asarray(c.unmasked_data[:].value), data,
                               equal_nan=True)
    assert float(c.sum().value) == pytest.approx(np.nansum(data), rel=1e-7)


def test_tuple_axis_collapse(cube_adv):
    """Reducing over both sky axes yields a OneDSpectrum; over a mixed
    pair, a 1-D LDO (reference test_oned_collapse)."""
    cube, data = cube_adv
    sp = cube.mean(axis=(1, 2))
    assert isinstance(sp, OneDSpectrum)
    np.testing.assert_allclose(np.asarray(sp.value),
                               np.nanmean(data, axis=(1, 2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.spectral_axis.value),
                               np.asarray(cube.spectral_axis.value))
    prof = cube.max(axis=(0, 1))
    assert np.asarray(prof.value).shape == (cube.shape[2],)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expected = np.nanmax(data, axis=(0, 1))
    np.testing.assert_allclose(np.asarray(prof.value), expected, rtol=1e-6)


def test_tuple_axis_edge_cases(cube_adv):
    cube, data = cube_adv
    # all three axes == global reduction
    s_all = cube.sum(axis=(0, 1, 2))
    assert float(s_all.value) == pytest.approx(np.nansum(data), rel=1e-6)
    # negative axes normalize
    sp = cube.mean(axis=(-2, -1))
    assert isinstance(sp, OneDSpectrum)
    np.testing.assert_allclose(np.asarray(sp.value),
                               np.nanmean(data, axis=(1, 2)), rtol=1e-6)


def test_header_preserves_meta_values(cube_adv):
    """meta entries land in the regenerated header: short keys as cards,
    long keys as COMMENTs; WCS cards win on collision (reference
    test_preserves_header_meta_values, base_class.py:83-93)."""
    cube, _ = cube_adv
    c2 = cube._new_cube_with(meta={"OBJECT": "W51",
                                   "very_long_meta_key": "kept",
                                   "CRVAL1": "not-a-wcs-override"})
    h = c2.header
    assert h["OBJECT"] == "W51"
    # the WCS value wins over the meta impostor
    assert h["CRVAL1"] == cube.wcs.crval[0]
    assert any("very_long_meta_key" in c for c in h.comments_log)


def test_closest_spectral_channel_and_reversed_slab(cube_adv):
    """closest_spectral_channel picks the nearest channel in any unit and
    spectral_slab accepts reversed limits (reference
    test_closest_spectral_channel/:slab_reverse_limits)."""
    cube, _ = cube_adv
    sv = cube.spectral_axis
    idx = cube.closest_spectral_channel(sv[2])
    assert idx == 2
    # unit conversion in the lookup
    idx_m = cube.closest_spectral_channel(sv[2].to("m / s"))
    assert idx_m == 2
    slab_fwd = cube.spectral_slab(sv[0], sv[2])
    slab_rev = cube.spectral_slab(sv[2], sv[0])
    assert slab_fwd.shape == slab_rev.shape
    np.testing.assert_allclose(
        np.asarray(slab_fwd.unmasked_data[:].value),
        np.asarray(slab_rev.unmasked_data[:].value), equal_nan=True)


def test_cube_pow_units(cube_adv):
    cube, data = cube_adv
    sq = cube ** 2
    np.testing.assert_allclose(np.asarray(sq.unmasked_data[:].value),
                               np.asarray(cube.unmasked_data[:].value) ** 2,
                               equal_nan=True, rtol=1e-6)
    assert sq.unit == cube.unit ** 2


def test_bunit_case_and_whitespace_forgiveness(tmp_path):
    """CASA/AIPS-style BUNIT spellings parse (reference
    test_jybeam_upper/lower/whitespace)."""
    from spectral_cube_tpu.io.fits_low import Header, HDU, write_fits
    from conftest import base_header
    import spectral_cube_tpu.units as u
    for bunit in ("JY/BEAM", "Jy/beam", " Jy / beam ", "jy/beam"):
        h = base_header(nx=2, ny=3, nchan=4)
        h["BUNIT"] = bunit
        path = str(tmp_path / f"b{abs(hash(bunit))}.fits")
        write_fits(path, [HDU(data=np.ones((4, 3, 2), "f4"), header=h)])
        cube = SpectralCube.read(path)
        assert cube.unit == u.Jy / u.beam, bunit


def test_initialization_from_quantity(cube_adv):
    """Quantity data carries its unit into the cube (reference
    test_initialization_from_units)."""
    cube, data = cube_adv
    import spectral_cube_tpu.units as u
    c2 = SpectralCube(data=Quantity(data, "K"), wcs=cube.wcs)
    assert c2.unit == u.K
    np.testing.assert_allclose(np.asarray(c2.unmasked_data[:].value), data,
                               equal_nan=True)
    # explicit unit= wins over the Quantity's
    c3 = SpectralCube(data=Quantity(data, "K"), wcs=cube.wcs, unit="Jy")
    assert c3.unit == u.Jy


def test_spatial_smooth_kernel_object_and_jybm_guard(tmp_path):
    """Kernel objects with .array work; the Jy/beam beam-change guard
    fires first and can be overridden (reference test_spatial_smooth_g2d,
    test_spatial_smooth_jybm_error)."""
    from conftest import make_cube_file
    from spectral_cube_tpu.beams import BeamError
    path, data = make_cube_file(tmp_path, shape=(3, 6, 5), with_nan=False)
    cube = SpectralCube.read(path)

    class FakeKernel:
        def __init__(self, a):
            self.array = a

    k = FakeKernel(np.ones((3, 3)) / 9.0)
    with pytest.raises(BeamError):
        cube.spatial_smooth(k)
    out = cube.spatial_smooth(k, raise_error_jybm=False)
    assert out.shape == cube.shape
    # interior pixel equals the box average
    got = np.asarray(out.unmasked_data[1].value)[2, 2]
    assert got == pytest.approx(data[1, 1:4, 1:4].mean(), rel=1e-5)


def test_mad_std_axis_and_median_2axis(cube_adv):
    cube, data = cube_adv
    ms = cube.mad_std(axis=0)
    assert ms.shape == cube.shape[1:]
    med = cube.median(axis=(1, 2))
    assert med.shape == (cube.shape[0],)
    finite = np.isfinite(data)
    expect = np.nanmedian(np.where(finite, data, np.nan), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(med.value), expect, rtol=1e-6)


def test_statistics_reference_anchor(tmp_path):
    """Exact cross-implementation anchor: the reference's published
    statistics() values for np.random.seed(96); random((4,3,2))
    (tests/test_dask.py:97-107, also quoted in BASELINE.md).  Agreement
    at 1e-6 rtol (our device path computes in float32; the residuals
    measure ~1e-7)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube

    np.random.seed(96)
    d = np.random.random((4, 3, 2))
    p, _ = make_cube_file(tmp_path, name="anchor.fits", shape=(4, 3, 2))
    cube = SpectralCube.read(str(p))._new_cube_with(data=d, mask=None)
    st = cube.statistics()
    expected = {"npts": 24, "mean": 0.4941651776136591,
                "sigma": 0.3021908870982011, "sum": 11.85996426272782,
                "sumsq": 7.961125988022091, "min": 0.0363300285196364,
                "max": 0.9662900439556562, "rms": 0.5759458158839716}
    for key, val in expected.items():
        np.testing.assert_allclose(float(st[key]), val, rtol=1e-6)

    # all-NaN leading channels: stats skip them and match the reductions
    # (reference test_statistics_withnans, tests/test_dask.py:110-118)
    d2 = d.copy()
    d2[:2] = np.nan
    cube2 = cube._new_cube_with(data=d2, mask=None)
    st2 = cube2.statistics()
    np.testing.assert_allclose(float(st2["min"]),
                               float(np.asarray(cube2.min())), rtol=1e-6)
    np.testing.assert_allclose(float(st2["max"]),
                               float(np.asarray(cube2.max())), rtol=1e-6)
    np.testing.assert_allclose(float(st2["sum"]),
                               float(np.asarray(cube2.sum())), rtol=1e-6)
    assert st2["npts"] == 12


def test_statistics_dc_offset_sigma(tmp_path):
    """sigma survives a large DC offset in float32 (the naive
    (sumsq - sum^2/n) form cancels to rounding noise; both the fused and
    the sharded kernels use a mean-centered second pass)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube

    rng = np.random.RandomState(0)
    data = (1000.0 + 0.01 * rng.randn(8, 8, 8)).astype(np.float32)
    p, _ = make_cube_file(tmp_path, name="dc.fits", shape=(8, 8, 8))
    cube = SpectralCube.read(str(p))._new_cube_with(data=data, mask=None)
    exact = np.std(data.astype(np.float64), ddof=1)
    np.testing.assert_allclose(float(cube.statistics()["sigma"]), exact,
                               rtol=1e-3)


def test_moments_cache_distinct_lambda_masks(tmp_path):
    """Two different lambda masks on same-shaped cubes must not share a
    compiled-moments cache entry (mask functions were keyed by __name__,
    so every lambda collided and the second cube got the first's mask)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, LazyMask

    p, _ = make_cube_file(tmp_path, name="lm.fits", shape=(6, 5, 5),
                          seed=1)
    c1 = SpectralCube.read(str(p))
    c2 = SpectralCube.read(str(p))
    m1 = c1.with_mask(LazyMask(lambda d: d > 0.5, cube=c1))
    m2 = c2.with_mask(LazyMask(lambda d: d < 0.5, cube=c2))
    a = np.asarray(m1.moment0())
    b = np.asarray(m2.moment0())
    assert not np.allclose(a, b, equal_nan=True)
    d = np.asarray(c1.unmasked_data[:])
    sv = np.asarray(c1.spectral_axis.value)
    dx = abs(sv[1] - sv[0])
    for got, pred in ((a, d > 0.5), (b, d < 0.5)):
        sel = np.isfinite(d) & pred
        exp = np.where(np.any(sel, axis=0),
                       np.nansum(np.where(sel, d, 0), axis=0) * dx, np.nan)
        np.testing.assert_allclose(got, exp, rtol=1e-5, equal_nan=True)


def test_negative_slice_wcs(cube_adv):
    """Numpy-idiomatic negative slice bounds keep world coordinates
    (WCS.slice treats start as a raw pixel offset, so cube[-2:] used to
    shift crpix the wrong way)."""
    cube, _ = cube_adv
    sa = np.asarray(cube.spectral_axis.value)
    for sl in (np.s_[-2:], np.s_[1:-1], np.s_[-3:-1], np.s_[::-1]):
        sub = cube[sl, :, :]
        np.testing.assert_allclose(np.asarray(sub.spectral_axis.value),
                                   sa[sl], rtol=1e-10)


def test_sigma_clip_two_tailed(cube_adv):
    """sigma_clip masks BOTH tails about the median (a one-sided < let
    negative spikes survive)."""
    cube, data = cube_adv
    d = data.copy()
    d[0, 0, 0] = 100.0
    d[1, 1, 1] = -100.0
    c2 = cube._new_cube_with(data=d, mask=None)
    inc = np.asarray(c2.sigma_clip(3.0).get_mask_array())
    assert not inc[0, 0, 0] and not inc[1, 1, 1]
    assert inc.sum() >= inc.size - 4


def test_negative_reduction_axis(cube_adv):
    """Scalar negative axes normalize (axis=-1 used to keep the 3-axis
    WCS on a 2-D result; moment(axis=-3) crashed)."""
    cube, _ = cube_adv
    r = cube.sum(axis=-1)
    assert r.wcs.naxis == 2 and r.shape == cube.shape[:2]
    np.testing.assert_allclose(np.asarray(cube.moment(order=0, axis=-3)),
                               np.asarray(cube.moment(order=0, axis=0)),
                               equal_nan=True)


def test_apply_everywhere_plain_return(cube_adv):
    """apply_everywhere tolerates functions that strip the unit."""
    cube, data = cube_adv
    out = cube.apply_everywhere(lambda q: np.asarray(q.value) * 2.0)
    np.testing.assert_allclose(np.asarray(out.unmasked_data[:]),
                               np.asarray(cube.unmasked_data[:]) * 2,
                               equal_nan=True, rtol=1e-6)


def test_vrsc_negative_slice_wcs_and_tolerance(tmp_path):
    """vrsc[-4:] canonicalizes the slice before WCS bookkeeping (same rule
    as the base class), and _new_cube_with treats wcs_tolerance=None as
    inherit instead of poisoning derived cubes."""
    import warnings
    from conftest import make_vr_cube_file

    pv, vdata = make_vr_cube_file(tmp_path, shape=(5, 8, 8))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vr = SpectralCube.read(str(pv))
    np.testing.assert_allclose(np.asarray(vr[-4:].spectral_axis.value),
                               np.asarray(vr[1:5].spectral_axis.value),
                               rtol=1e-12)
    derived = vr.with_mask(np.isfinite(vdata))
    assert derived._wcs_tolerance is not None
    # a second mask attach exercises check_equality with the tolerance
    derived.with_mask(np.isfinite(vdata))


def test_vrsc_negative_axis_beam_guard(tmp_path):
    """Beam-homogeneity guards normalize negative axes: sum(axis=-3) must
    hit the same check as sum(axis=0)."""
    import warnings
    from conftest import make_vr_cube_file
    from spectral_cube_tpu import Beams
    from spectral_cube_tpu.units import Quantity

    pv, _ = make_vr_cube_file(tmp_path, shape=(5, 8, 8))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vr = SpectralCube.read(str(pv))
    majs = np.asarray(vr.unmasked_beams.major.to("arcsec").value).copy()
    majs[0] *= 10
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bad = vr.with_beams(Beams(major=Quantity(majs, "arcsec")), raise_error_jybm=False)
    with pytest.raises(ValueError):
        bad.sum(axis=-3)


def test_spatial_moment_units_match_values_arcsec_header(tmp_path, cube_adv):
    """Spatial moments compute offsets in degrees; the Projection's unit
    must say so even when the header CUNIT is arcsec (regression: values
    in deg labeled arcsec — off by 3600x)."""
    import spectral_cube_tpu.io.fits_low as fl
    cube, data = cube_adv
    h = cube.header.copy()
    h["CUNIT1"] = "arcsec"
    h["CDELT1"] = -2.0
    h["CUNIT2"] = "arcsec"
    h["CDELT2"] = 2.0
    p2 = str(tmp_path / "arcsec.fits")
    fl.write_fits(p2, [fl.HDU(data=data, header=h)])
    c = SpectralCube.read(p2)
    m1 = c.moment(order=1, axis=2)
    vals = np.asarray(m1.to("arcsec").value)
    # intensity-weighted mean offset along x: within [0, nx * 2 arcsec]
    assert np.nanmax(vals) > 1.0 and np.nanmax(vals) < 2.0 * c.shape[2]


def test_array_valued_comparison_mask_moment(cube_adv):
    """Per-channel threshold masks (cube > array-Quantity) work through
    the cached moment path (regression: expr_key called float() on the
    array)."""
    from spectral_cube_tpu.units import Quantity
    cube, data = cube_adv
    thr = np.linspace(0.1, 0.5, cube.shape[0])[:, None, None]
    mm = cube.with_mask(cube > Quantity(thr, cube.unit)).moment(order=0)
    dx = abs(float(cube.header["CDELT3"]))
    sel = np.isfinite(data) & (data > thr)
    ref = np.where(sel.any(axis=0),
                   np.nansum(np.where(sel, data, 0), axis=0), np.nan)
    got = np.asarray(mm.value) / dx
    np.testing.assert_allclose(np.where(np.isfinite(got), got, np.nan),
                               ref, rtol=1e-5, equal_nan=True)


def test_meta_to_header_propagation(cube_adv):
    """Meta entries become header cards (<=8 chars) or key=value COMMENT
    lines (>8 chars), and propagate into projection/spectrum headers
    (reference base_class.py:75-96, test_preserves_header_meta_values)."""
    cube, _ = cube_adv
    cube.meta["foo"] = "bar"
    cube.meta["too_long_keyword"] = "too_long_information"
    cube._header["OBJECT"] = "TestName"
    assert cube.header["FOO"] == "bar"
    assert "too_long_keyword=too_long_information" in str(
        cube.header["COMMENT"])
    proj = cube.sum(axis=0)
    assert proj.header["FOO"] == "bar"
    assert proj.hdu.header["FOO"] == "bar"
    assert proj.header["OBJECT"] == "TestName"
    spec = cube[:, 0, 0]
    assert spec.header["FOO"] == "bar"
    assert "too_long_keyword=too_long_information" in str(
        spec.header["COMMENT"])
    # meta mutation on the LDO itself is visible in its header too
    spec.meta["bar"] = "foo"
    assert spec.header["BAR"] == "foo"


def test_invalid_rest_value_raises(cube_adv):
    """Bare numbers and non-spectral Quantities are refused as rest
    values (reference spectral_cube.py:1410-1413, test_invalid_rest)."""
    from spectral_cube_tpu.units import Quantity, Unit
    cube, _ = cube_adv
    for rest in (50, Quantity(50, "K")):
        with pytest.raises(ValueError,
                           match="spectral equivalence"):
            cube.with_spectral_unit(Unit.parse("km/s"),
                                    velocity_convention="radio",
                                    rest_value=rest)


def test_spectral_unit_convention_zero_at_rest(tmp_path):
    """With rest_value = first channel, all three velocity conventions
    give exactly 0 km/s there and differ at the next channel (reference
    test_spectral_unit_conventions)."""
    from spectral_cube_tpu import SpectralCube
    from spectral_cube_tpu.units import Unit
    path, _ = make_cube_file(tmp_path, ctype3="FREQ", cunit3="Hz",
                             crval3=1.4e9, cdelt3=1e6)
    cube = SpectralCube.read(path)
    rest = cube.spectral_axis[0]
    firsts, seconds = [], []
    for conv in ("optical", "radio", "relativistic"):
        cc = cube.with_spectral_unit(Unit.parse("km/s"), rest_value=rest,
                                     velocity_convention=conv)
        sv = np.asarray(cc.spectral_axis.value)
        firsts.append(sv[0])
        seconds.append(sv[1])
    np.testing.assert_allclose(firsts, 0, atol=1e-7)
    assert len({round(v, 9) for v in seconds}) == 3


def test_repr_with_unit_and_ranges(tmp_path):
    """repr shows per-axis type/unit/world range (reference
    base_class.py:325-348; the expected numbers are the reference's own
    commented worked example, test_spectral_cube.py:872-879)."""
    from ref_fixtures import cube_and_raw
    cube, _ = cube_and_raw(tmp_path)
    r = repr(cube)
    assert "unit=K" in r
    assert "unit_x: deg" in r and "unit_s: km / s" in r
    assert "24.062698" in r and "29.934094" in r
    assert "-321.215" in r and "-317.350" in r


def test_mixed_axis_collapse_warns(tmp_path):
    """Collapsing a spatial + the spectral axis warns (reference
    spectral_cube.py:483, test_twod_numpy_twoaxes)."""
    import warnings as _w
    import numpy as np
    from ref_fixtures import cube_and_raw
    cube, d = cube_and_raw(tmp_path)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = cube.mean(axis=(0, 1))
    assert any("Averaging over a spatial and a spectral" in str(x.message)
               for x in rec)
    np.testing.assert_allclose(np.asarray(out.value), d.mean(axis=(0, 1)),
                               rtol=1e-6)
    # (1, 2) stays a clean OneDSpectrum with no such warning
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        spec = cube.mean(axis=(1, 2))
    assert not any("Averaging over" in str(x.message) for x in rec)
    from spectral_cube_tpu import OneDSpectrum
    assert isinstance(spec, OneDSpectrum)


def test_save_to_tmp_dir_option(tmp_path):
    """Every cube-returning op accepts save_to_tmp_dir=True and returns a
    spilled/reloaded cube with identical values (reference
    dask_spectral_cube.py:85-116, test_dask.py:79-85)."""
    import numpy as np
    from ref_fixtures import cube_and_raw
    cube, _ = cube_and_raw(tmp_path)
    for op in (lambda c: c.sigma_clip_spectrally(3, save_to_tmp_dir=True),
               lambda c: c.spectral_smooth_median(3, save_to_tmp_dir=True),
               lambda c: c.downsample_axis(2, axis=0, save_to_tmp_dir=True)):
        assert op(cube) is not None
    a = cube.spectral_smooth_median(3, save_to_tmp_dir=True)
    b = cube.spectral_smooth_median(3)
    np.testing.assert_allclose(np.asarray(a.unmasked_data[:].value),
                               np.asarray(b.unmasked_data[:].value))


def test_subcube_world_bounds_inclusive_and_cutout_safe(cube_adv):
    """World-quantity subcube bounds at the exact min/max pixel-center
    coordinates must keep every pixel, including on the RA axis (which
    decreases with pixel index), and must stay correct when crpix lies
    far outside the cube (the fixture header is a cutout of a large map
    with crpix ~1150 pixels away, where projection curvature shifts the
    old crpix-spine by whole pixels)."""
    from spectral_cube_tpu import units as u
    cube, _ = cube_adv
    w = cube.world[:, :, :]
    lon = np.asarray(w[2].value)
    lat = np.asarray(w[1].value)
    lon_u = u.Unit(str(w[2].unit))
    lat_u = u.Unit(str(w[1].unit))
    sub = cube.subcube(xlo=lon.min() * lon_u, xhi=lon.max() * lon_u)
    assert sub.shape == cube.shape
    sub = cube.subcube(ylo=lat.min() * lat_u, yhi=lat.max() * lat_u)
    assert sub.shape == cube.shape
    # a single-pixel-wide world window selects exactly that pixel
    sub = cube.subcube(xlo=lon[0, 0, 1] * lon_u, xhi=lon[0, 0, 1] * lon_u)
    assert sub.shape[2] == 1
    np.testing.assert_allclose(
        np.asarray(sub.world[:, :, :][2].value)[..., 0], lon[..., 1])
