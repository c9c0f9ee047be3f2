import numpy as np
import jax.numpy as jnp
import pytest

from spectral_cube_tpu.masks import (BooleanArrayMask, LazyMask,
                                     LazyComparisonMask, CompositeMask,
                                     InvertedMask, FunctionMask,
                                     is_broadcastable_and_smaller,
                                     is_data_local, dims_to_skip,
                                     view_of_subset)


@pytest.fixture
def data():
    d = np.arange(24.0).reshape(4, 3, 2)
    d[1, 1, 1] = np.nan
    return d


def test_lazy_mask(data):
    m = LazyMask(jnp.isfinite, data=data)
    inc = np.asarray(m.include(data=data))
    assert inc.sum() == 23
    assert not inc[1, 1, 1]


def test_comparison_mask(data):
    m = LazyComparisonMask(jnp.greater, 10.0, data=data)
    inc = np.asarray(m.include(data=data))
    np.testing.assert_array_equal(inc, data > 10)


def test_composite_and_invert(data):
    m1 = LazyMask(jnp.isfinite, data=data)
    m2 = LazyComparisonMask(jnp.greater, 10.0, data=data)
    m = m1 & m2
    inc = np.asarray(m.include(data=data))
    expected = np.isfinite(data) & (data > 10)
    np.testing.assert_array_equal(inc, expected)
    m_or = m1 | m2
    np.testing.assert_array_equal(np.asarray(m_or.include(data=data)),
                                  np.isfinite(data) | (data > 10))
    m_xor = m1 ^ m2
    np.testing.assert_array_equal(np.asarray(m_xor.include(data=data)),
                                  np.isfinite(data) ^ (data > 10))
    m_not = ~m2
    np.testing.assert_array_equal(np.asarray(m_not.include(data=data)),
                                  ~(data > 10))


def test_exclude_is_complement(data):
    m = LazyComparisonMask(jnp.greater, 10.0, data=data)
    inc = np.asarray(m.include(data=data))
    exc = np.asarray(m.exclude(data=data))
    np.testing.assert_array_equal(inc, ~exc)


def test_filled_and_flattened(data):
    m = LazyComparisonMask(jnp.greater, 10.0, data=data)
    filled = np.asarray(m._filled(jnp.asarray(data), fill=np.nan))
    assert np.isnan(filled[0, 0, 0])
    assert filled[3, 2, 1] == 23.0
    flat = m._flattened(data)
    valid = data[np.isfinite(data) & (data > 10)]
    np.testing.assert_array_equal(np.sort(flat[np.isfinite(flat)]),
                                  np.sort(valid))


def test_boolean_array_mask_full(data):
    arr = data > 5
    m = BooleanArrayMask(arr)
    np.testing.assert_array_equal(np.asarray(m.include(data=data)), arr)
    # slicing a full-shape mask keeps the view
    sub = m[1:3]
    np.testing.assert_array_equal(np.asarray(sub.include()), arr[1:3])


def test_boolean_array_mask_spectral_broadcast(data):
    m = BooleanArrayMask(np.array([True, False, True, True]),
                         shape=data.shape)
    inc = np.asarray(m.include(data=data))
    assert inc.shape == data.shape
    assert not inc[1].any() and inc[0].all()
    # view restricted to a channel range
    sub = np.asarray(m.include(data=data, view=(slice(1, 3),)))
    assert sub.shape == (2, 3, 2)
    assert not sub[0].any() and sub[1].all()


def test_boolean_array_mask_spatial_broadcast(data):
    spatial = np.zeros((3, 2), dtype=bool)
    spatial[1, 0] = True
    m = BooleanArrayMask(spatial, shape=data.shape)
    inc = np.asarray(m.include(data=data))
    assert inc.shape == data.shape
    assert inc[:, 1, 0].all() and not inc[:, 0, 0].any()


def test_boolean_mask_include_false_flips():
    arr = np.array([[[True]]])
    m = BooleanArrayMask(arr, include=False)
    assert not np.asarray(m.include())[0, 0, 0]


def test_function_mask_shape_check(data):
    m = FunctionMask(lambda d, w, view: np.ones((2, 2), dtype=bool))
    with pytest.raises(ValueError):
        m.include(data=data)
    good = FunctionMask(lambda d, w, view: np.isfinite(
        d[view] if view not in ((), None) else d))
    assert np.asarray(good.include(data=data)).sum() == 23


def test_composite_shape_validation(data):
    m1 = BooleanArrayMask(np.ones((4, 3, 2), dtype=bool))
    m2 = BooleanArrayMask(np.ones((5, 3, 2), dtype=bool))
    with pytest.raises(ValueError):
        CompositeMask(m1, m2)


def test_broadcast_helpers():
    assert is_broadcastable_and_smaller((4,), (4, 3, 2)) is False
    assert is_broadcastable_and_smaller((4, 1, 1), (4, 3, 2))
    assert is_broadcastable_and_smaller((3, 2), (4, 3, 2))
    assert dims_to_skip((3, 2), (4, 3, 2)) == [0]
    assert dims_to_skip((4, 1, 1), (4, 3, 2)) == [1, 2]
    assert view_of_subset((slice(1, 3), slice(None), slice(None)),
                          (4, 3, 2), (3, 2)) == (slice(None), slice(None))


def test_is_data_local(data):
    m1 = LazyMask(jnp.isfinite, data=data)
    m2 = LazyComparisonMask(jnp.greater, 1.0, data=data)
    assert is_data_local(m1 & m2)
    assert is_data_local(~m1)
    arr = BooleanArrayMask(np.ones((4, 3, 2), dtype=bool))
    assert not is_data_local(arr)
    assert not is_data_local(m1 & arr)


def test_masks_work_inside_jit(data):
    import jax
    m = LazyComparisonMask(jnp.greater, 10.0, shape=data.shape)

    @jax.jit
    def masked_sum(d):
        inc = m.include(data=d)
        return jnp.sum(jnp.where(inc & jnp.isfinite(d), d, 0))

    out = float(masked_sum(jnp.asarray(data)))
    expected = data[np.isfinite(data) & (data > 10)].sum()
    assert out == pytest.approx(expected, rel=1e-6)


def test_boolean_mask_subdim_integer_views():
    """Sub-dimensional stored masks must survive views with integer
    indices (regression: 1-D spectral mask + cube[:, 2, :] raised)."""
    shape = (4, 3, 2)
    good = np.array([True, False, True, True])
    m = BooleanArrayMask(good, shape=shape)
    # integer index on a broadcast (spatial) axis
    inc = np.asarray(m.include(view=(slice(None), 2, slice(None))))
    assert inc.shape == (4, 2)
    assert (inc == good[:, None]).all()
    # integer index on the mask's own axis
    inc2 = np.asarray(m.include(view=(1, slice(None), slice(None))))
    assert inc2.shape == (3, 2)
    assert not inc2.any()
    # 2-D spatial mask, extract a single channel
    spat = np.zeros((3, 2), dtype=bool)
    spat[1, 1] = True
    m2 = BooleanArrayMask(spat, shape=shape)
    inc3 = np.asarray(m2.include(view=(3,)))
    assert inc3.shape == (3, 2)
    assert inc3[1, 1] and inc3.sum() == 1
    # __getitem__ composes the same way
    sub = m2[(3, slice(None), slice(None))]
    assert np.asarray(sub.include()).shape == (3, 2)


def test_masks_and_cubes_pickle(tmp_path):
    """Masks (incl. jnp-ufunc-backed lazy masks) and whole cubes pickle
    and evaluate identically after a round trip (reference
    test_masks.py pickle tests)."""
    import pickle
    import jax.numpy as jnp
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, BooleanArrayMask
    import spectral_cube_tpu.units as u
    path, data = make_cube_file(tmp_path, shape=(4, 5, 6))
    cube = SpectralCube.read(path)
    masked = cube.with_mask(cube > 0.4 * u.Jy / u.beam)
    # composite of LazyMask(isfinite) & LazyComparisonMask(greater)
    m2 = pickle.loads(pickle.dumps(masked.mask))
    np.testing.assert_array_equal(
        np.asarray(m2.include(data=jnp.asarray(data))),
        np.asarray(masked.mask.include(data=masked._device_data)))
    # BooleanArrayMask with sub-dimensional storage
    b = BooleanArrayMask(np.array([True, False, True, True]),
                         shape=(4, 5, 6))
    b2 = pickle.loads(pickle.dumps(b))
    np.testing.assert_array_equal(np.asarray(b2.include()),
                                  np.asarray(b.include()))
    # the whole cube
    c2 = pickle.loads(pickle.dumps(masked))
    np.testing.assert_allclose(np.asarray(c2.filled_data[:].value),
                               np.asarray(masked.filled_data[:].value),
                               equal_nan=True)
    assert c2.unit == masked.unit


def test_mask_logic_chains(data):
    """Compound boolean algebra matches numpy (reference
    test_masks.py:183-236)."""
    from spectral_cube_tpu.masks import LazyComparisonMask
    import operator
    arr = np.asarray(data)
    m1 = LazyComparisonMask(jnp.greater, 0.2, shape=arr.shape)
    m2 = LazyComparisonMask(jnp.less, 0.8, shape=arr.shape)
    m3 = LazyComparisonMask(jnp.greater, 0.5, shape=arr.shape)
    d = jnp.asarray(arr)
    for mask, expect in [
            ((m1 & m2) | ~m3, ((arr > 0.2) & (arr < 0.8)) | ~(arr > 0.5)),
            (m1 ^ m2, (arr > 0.2) ^ (arr < 0.8)),
            (~(m1 | m3) & m2, ~((arr > 0.2) | (arr > 0.5)) & (arr < 0.8)),
            ((m1 & ~m2) ^ (m3 | m1),
             ((arr > 0.2) & ~(arr < 0.8)) ^ ((arr > 0.5) | (arr > 0.2)))]:
        got = np.asarray(mask.include(data=d))
        np.testing.assert_array_equal(got, expect)


def test_mask_wcs_mismatch_raises(tmp_path):
    """A mask carrying a different sky WCS raises on attach instead of
    binding silently, matching the reference's ValueError("WCS does not
    match mask WCS") (masks.py:526-553, test_masks.py:263-295); a
    wcs_tolerance big enough to cover the offset accepts it."""
    import warnings as _w
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, BooleanArrayMask
    from spectral_cube_tpu.utils import WCSMismatchWarning
    path, d = make_cube_file(tmp_path, shape=(4, 3, 2))
    cube = SpectralCube.read(path)
    other = cube.wcs.copy()
    other.crval[0] += 1e-5  # a slightly different sky position
    bad = BooleanArrayMask(np.ones(cube.shape, bool), wcs=other,
                           shape=cube.shape)
    with pytest.raises(ValueError, match="WCS does not match mask WCS"):
        cube.with_mask(bad)
    # an explicit tolerance covering the offset accepts the mask and is
    # recorded on the new cube (reference test_wcs_validity_check_failure)
    c2 = cube.with_mask(bad, wcs_tolerance=1e-4)
    assert c2._wcs_tolerance == 1e-4
    # same-WCS masks attach silently, and the whitelist cache keeps
    # repeated attaches cheap
    good = BooleanArrayMask(np.ones(cube.shape, bool), wcs=cube.wcs.copy(),
                            shape=cube.shape)
    with _w.catch_warnings():
        _w.simplefilter("error", WCSMismatchWarning)
        cube.with_mask(good)
        cube.with_mask(good)


def test_flattened_sums_with_mask(tmp_path):
    """flattened() returns exactly the included values (reference
    test_flat_mask :376)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, Quantity
    path, d = make_cube_file(tmp_path, shape=(4, 3, 2), with_nan=False)
    cube = SpectralCube.read(path)
    m = cube.with_mask(cube > Quantity(0.5, "Jy/beam"))
    flat = np.asarray(m.flattened().value)
    expect = d[d > 0.5]
    assert flat.size == expect.size
    np.testing.assert_allclose(np.sort(flat), np.sort(expect), rtol=1e-6)


def test_mask_survives_spectral_unit_change(tmp_path):
    """with_spectral_unit keeps the mask working (reference
    test_mask_spectral_unit :237)."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, Quantity
    path, d = make_cube_file(tmp_path, shape=(4, 3, 2), with_nan=False)
    cube = SpectralCube.read(path).with_mask(
        SpectralCube.read(path) > Quantity(0.5, "Jy/beam"))
    conv = cube.with_spectral_unit("m / s")
    inc1 = np.asarray(cube.get_mask_array())
    inc2 = np.asarray(conv.get_mask_array())
    np.testing.assert_array_equal(inc1, inc2)
    assert str(conv.spectral_axis.unit) == "m / s"


def test_mask_algebra_boolean_laws(data):
    """Randomized check of the Boolean-algebra laws on the mask
    expression tree: De Morgan, double negation, absorption,
    distributivity, xor expansion — evaluated through ``include()`` on
    random predicates and views (the reference relies on these
    identities holding through its lazy composites)."""
    rng = np.random.RandomState(7)
    from spectral_cube_tpu.masks import BooleanArrayMask

    shape = data.shape
    for trial in range(5):
        a = BooleanArrayMask(rng.rand(*shape) > 0.5, wcs=None, shape=shape)
        b = BooleanArrayMask(rng.rand(*shape) > 0.3, wcs=None, shape=shape)
        c = BooleanArrayMask(rng.rand(*shape) > 0.7, wcs=None, shape=shape)
        view = [(), np.s_[1:, :, :], np.s_[:, 0, :]][trial % 3]

        def inc(m):
            return np.asarray(m.include(data=data, view=view))

        np.testing.assert_array_equal(inc(~(a & b)), inc(~a | ~b))
        np.testing.assert_array_equal(inc(~(a | b)), inc(~a & ~b))
        np.testing.assert_array_equal(inc(~~a), inc(a))
        np.testing.assert_array_equal(inc(a & (a | b)), inc(a))
        np.testing.assert_array_equal(inc(a | (a & b)), inc(a))
        np.testing.assert_array_equal(inc(a & (b | c)),
                                      inc((a & b) | (a & c)))
        np.testing.assert_array_equal(inc(a ^ b), inc((a | b) & ~(a & b)))
        # exclude is the pointwise complement through any composite
        m = (a & b) ^ ~c
        np.testing.assert_array_equal(
            np.asarray(m.exclude(data=data, view=view)), ~inc(m))


def test_composite_mask_broadcast_shape(data):
    """CompositeMask.shape is the broadcast of its operands, independent
    of operand order (max-by-ndim returned whichever came first)."""
    from spectral_cube_tpu.masks import BooleanArrayMask, LazyMask
    bam = BooleanArrayMask(np.ones((1,) + data.shape[1:], bool), wcs=None,
                           shape=(1,) + data.shape[1:])
    lm = LazyMask(np.isfinite, data=data)
    assert (bam & lm).shape == data.shape
    assert (lm & bam).shape == data.shape


def test_mask_fancy_views(data):
    """_filled/_flattened/include accept index-array views."""
    from spectral_cube_tpu.masks import LazyMask
    m = LazyMask(lambda d: np.asarray(d) > 0.3, data=data)
    idx = np.array([0, 2])
    filled = np.asarray(m._filled(data, view=idx, xp=np))
    assert filled.shape == (2,) + data.shape[1:]
    flat = m._flattened(data, view=idx)
    assert flat.ndim == 1


def test_function_mask_receives_call_time_wcs(tmp_path):
    """FunctionMask's predicate gets the cube's WCS at evaluation time
    (reference masks.py:788-792), including through composites."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, FunctionMask
    from spectral_cube_tpu.masks import trivial_view

    p, _ = make_cube_file(tmp_path, name="fw.fits", shape=(4, 4, 4))
    cube = SpectralCube.read(str(p))
    seen = {}

    def fn(d, wcs, view):
        seen["wcs"] = wcs
        return np.asarray(d if trivial_view(view) else d[view]) > 0

    masked = cube.with_mask(FunctionMask(fn))   # AND-composite with the
    np.asarray(masked.filled_data[:])           # reader's finite mask
    assert seen["wcs"] is cube.wcs


def test_function_mask_survives_cube_slicing(cube_adv):
    """A FunctionMask-backed cube slices in lockstep with its data: the
    _ViewMask wrapper must not re-apply the stored view to the already-
    sliced data (regression: ValueError 'Function did not return mask
    with correct shape' and wrong masks on in-range views)."""
    from spectral_cube_tpu.masks import FunctionMask
    cube, data = cube_adv
    fm = FunctionMask(lambda d, wcs=None, view=():
                      np.asarray(d) > 0.5)
    sub = cube.with_mask(fm)[2:4]
    got = np.asarray(sub.filled_data[:].value)
    assert got.shape == data[2:4].shape
    expected = np.where(np.isfinite(data[2:4]) & (data[2:4] > 0.5),
                        data[2:4], np.nan)
    np.testing.assert_allclose(got, expected, equal_nan=True, rtol=1e-6)


def test_exclude_routes_wcs_like_include(cube_adv):
    """include/exclude are complements for wcs-dependent FunctionMasks
    (regression: exclude dropped the wcs argument)."""
    from spectral_cube_tpu.masks import FunctionMask
    cube, data = cube_adv

    def f(d, wcs=None, view=()):
        assert wcs is not None
        return np.asarray(d) > 0.4

    fm = FunctionMask(f)
    inc = np.asarray(fm.include(data=data, wcs=cube.wcs))
    exc = np.asarray(fm.exclude(data=data, wcs=cube.wcs))
    np.testing.assert_array_equal(exc, ~inc)


def test_array_threshold_mask_slices_with_view(cube_adv):
    """Array-valued comparison thresholds (per-channel cuts) are
    positional: slicing the cube must slice the threshold in lockstep
    (regression: the full-shape threshold broadcast against the sliced
    data and crashed, or silently compared the wrong channels)."""
    from spectral_cube_tpu.units import Quantity
    cube, data = cube_adv
    thr = np.array([0.1, 0.3, 0.5, 0.7])[:, None, None]
    masked = cube.with_mask(cube > Quantity(thr, cube.unit))
    sub = masked[1:3]
    got = np.asarray(sub.filled_data[:].value)
    expected = np.where(np.isfinite(data[1:3]) & (data[1:3] > thr[1:3]),
                        data[1:3], np.nan)
    np.testing.assert_allclose(got, expected, equal_nan=True, rtol=1e-6)
    # filled_data with a non-trivial view on the UNSLICED cube too
    got2 = np.asarray(masked.filled_data[2:4, :, :].value)
    expected2 = np.where(np.isfinite(data[2:4]) & (data[2:4] > thr[2:4]),
                         data[2:4], np.nan)
    np.testing.assert_allclose(got2, expected2, equal_nan=True, rtol=1e-6)


# ---------------------------------------------------------------------------
# reference test_masks.py scenario battery (names mirror the reference's)
# ---------------------------------------------------------------------------

def test_spectral_cube_mask():
    """reference tests/test_masks.py:16-34: BooleanArrayMask include/
    exclude/_filled/_flattened with trivial and integer-index views."""
    mask = np.array([[[False, True, True, False, True]]])
    m = BooleanArrayMask(mask, None)
    d = np.arange(5.0).reshape((1, 1, 5))
    np.testing.assert_allclose(np.asarray(m.include(d, None)),
                               [[[0, 1, 1, 0, 1]]])
    np.testing.assert_allclose(np.asarray(m.exclude(d, None)),
                               [[[1, 0, 0, 1, 0]]])
    np.testing.assert_allclose(np.asarray(m._filled(d, None)),
                               [[[np.nan, 1, 2, np.nan, 4]]])
    np.testing.assert_allclose(np.asarray(m._flattened(d, None)), [1, 2, 4])
    view = (0, 0, slice(1, 4))
    np.testing.assert_allclose(np.asarray(m.include(d, None, view=view)),
                               [1, 1, 0])
    np.testing.assert_allclose(np.asarray(m.exclude(d, None, view=view)),
                               [0, 0, 1])
    np.testing.assert_allclose(np.asarray(m._filled(d, None, view=view)),
                               [1, 2, np.nan])
    np.testing.assert_allclose(np.asarray(m._flattened(d, None, view=view)),
                               [1, 2])


def test_lazy_comparison_mask():
    """reference tests/test_masks.py:70-101: the comparison value stays
    bound to the mask; include() does not change when new data flows in."""
    import operator
    d = np.arange(5.0).reshape((1, 1, 5))
    m = LazyComparisonMask(operator.gt, 2, data=d)
    np.testing.assert_allclose(np.asarray(m.include(d, None)),
                               [[[0, 0, 0, 1, 1]]])
    np.testing.assert_allclose(np.asarray(m._flattened(d, None)), [3, 4])
    view = (0, 0, slice(1, 4))
    np.testing.assert_allclose(np.asarray(m.include(d, None, view=view)),
                               [0, 0, 1])
    np.testing.assert_allclose(np.asarray(m._filled(d, None, view=view)),
                               [np.nan, np.nan, 3])


def test_function_mask_incorrect_shape():
    """reference tests/test_masks.py:103-119: a FunctionMask whose function
    ignores the view must raise, not silently mis-shape."""
    m = FunctionMask(lambda data, wcs, view=(): data > 2)
    d = np.arange(5).reshape((1, 1, 5))
    with pytest.raises(ValueError):
        m.include(d, None, view=(0, 0, slice(1, 4)))


def test_mask_spectral_unit_functions(tmp_path):
    """reference tests/test_masks.py:296-324: mask.with_spectral_unit —
    FunctionMask no-op, LazyMask rewrites the WCS (VOPT km/s -> FREQ-W2F
    with the crval converted through the optical convention), and
    CompositeMask converts recursively."""
    from ref_fixtures import cube_and_raw
    from spectral_cube_tpu import units as u
    cube, data = cube_and_raw(tmp_path)

    mask1 = FunctionMask(lambda x, w, v: np.asarray(x) > 0)
    mask_freq1 = mask1.with_spectral_unit(u.Unit("Hz"))

    mask2 = LazyMask(lambda x: x > 0, cube=cube)
    mask_freq2 = mask2.with_spectral_unit(u.Unit("Hz"))
    assert mask_freq2._wcs.ctype[mask_freq2._wcs.spec] == "FREQ-W2F"

    # header values: rest 1.42040571841e9 Hz, crval -3.21214698632e5 m/s;
    # optical convention: lam = lam0 (1 + v/c), f = c / lam
    c = 299792458.0
    rest = 1.42040571841e9
    lam = (c / rest) * (1 + -3.21214698632e5 / c)
    np.testing.assert_allclose(mask_freq2._wcs.crval[mask_freq2._wcs.spec],
                               c / lam, rtol=1e-12)

    mask3 = CompositeMask(mask1, mask2)
    mask_freq3 = mask3.with_spectral_unit(u.Unit("Hz"))
    mask_freq_freq3 = CompositeMask(mask_freq1, mask_freq2) \
        .with_spectral_unit(u.Unit("Hz"))


def test_flat_mask_spectral(cube_adv):
    """reference tests/test_masks.py:391-404: a 2-D spatial mask broadcasts
    up the spectral axis for per-channel sums."""
    cube, data = cube_adv
    mask_array = np.array([[True, False], [False, False], [True, True]])
    bm = BooleanArrayMask(mask=mask_array, wcs=cube._wcs, shape=cube.shape)
    mcube = cube.with_mask(bm)
    cubemask = np.ones(4, dtype=bool)[:, None, None] & mask_array[None]
    expected = np.nansum(np.where(cubemask, data, np.nan), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(mcube.sum(axis=(1, 2)).value),
                               expected, rtol=1e-6)


def test_1d_mask(cube_adv):
    """reference tests/test_masks.py:416-427 (issue #183 regression)."""
    cube, data = cube_adv
    mask = np.array([True, False, True, False])
    sum0 = cube.with_mask(mask[:, None, None]).sum(axis=0)
    sum0d = np.nansum(data[mask], axis=0)
    np.testing.assert_allclose(np.asarray(sum0.value), sum0d, rtol=1e-6)


def test_1d_mask_amp(cube_adv):
    """reference tests/test_masks.py:430-441: ANDing the cube's own mask
    with a 1-D BooleanArrayMask evaluates cleanly."""
    cube, data = cube_adv
    mask = np.array([True, False, True, False])
    M = BooleanArrayMask(mask[:, None, None], wcs=cube._wcs,
                         shape=cube.shape)
    ampd = cube.mask & M
    inc = np.asarray(ampd.include())
    assert inc.shape == cube.shape
    assert not inc[1].any() and not inc[3].any()


def test_2dcomparison_mask_1d_index(cube_adv):
    """reference tests/test_masks.py:444-476: a cube>Projection comparison
    mask indexes down to 1-D spectra, mask views slice in lockstep, and
    scalar indexing yields Quantities."""
    cube, data = cube_adv
    med = cube.median(axis=0)
    mask = cube > med
    mcube = cube.with_mask(mask)
    assert np.all(np.asarray(mask[:, 1, 1].include())
                  == np.asarray(mask.include())[:, 1, 1])
    spec = mcube[:, 1, 1]
    assert spec.ndim == 1
    assert np.all(np.asarray(spec.mask.include())
                  == np.asarray(mask.include())[:, 1, 1])
    assert spec[:-1].mask.include().shape == (3,)
    assert np.all(np.asarray(spec[:-1].mask.include())
                  == np.asarray(mask.include())[:-1, 1, 1])
    assert hasattr(spec[0], "unit")
    spec = mcube[:-1, 1, 1]
    assert spec.ndim == 1
    assert hasattr(spec, "_fill_value")
    assert np.all(np.asarray(spec.mask.include())
                  == np.asarray(mask.include())[:-1, 1, 1])
    assert spec[:-1].mask.include().shape == (2,)


def test_1dcomparison_mask_1d_index(cube_adv):
    """reference tests/test_masks.py:479-499: scalar-threshold comparison
    mask sliced to a 1-D spectrum."""
    cube, data = cube_adv
    med = cube.median()
    mask = cube > med
    mcube = cube.with_mask(mask)
    assert np.all(np.asarray(mask[:, 1, 1].include())
                  == np.asarray(mask.include())[:, 1, 1])
    spec = mcube[:, 1, 1]
    assert spec.ndim == 1
    assert spec[:-1].mask.include().shape == (3,)
    assert hasattr(spec[0], "unit")


def test_1dmask_indexing(cube_adv):
    """reference tests/test_masks.py:502-518: boolean indexing of a masked
    1-D spectrum fills excluded samples with NaN."""
    cube, data = cube_adv
    med = cube.median()
    mcube = cube.with_mask(cube > med)
    spec = mcube[:, 1, 1]
    inc = np.asarray(spec.mask.include())
    assert np.all(np.isnan(np.asarray(spec[~inc])))
    assert not np.any(np.isnan(np.asarray(spec[inc])))


def test_numpy_ma_tools_2d(cube_adv):
    """reference tests/test_masks.py:521-549: np.ma.core.is_masked/getmask
    work on the cube and on 1-D/2-D slices of it."""
    cube, data = cube_adv
    mcube = cube.with_mask(cube > cube.median())
    assert np.ma.core.is_masked(mcube)
    assert np.ma.core.getmask(mcube) is not None
    assert np.ma.core.is_masked(mcube[:, 0, 0])
    assert np.ma.core.getmask(mcube[:, 0, 0]) is not None
    assert np.ma.core.is_masked(mcube[0, :, :])
    assert np.ma.core.getmask(mcube[0, :, :]) is not None


def test_expr_key_structure_and_collisions():
    """expr_key drives the compiled-kernel cache: equal structures must
    share keys, different thresholds/functions must never collide (a
    past defect: distinct lambda masks collided)."""
    import jax.numpy as jnp
    from spectral_cube_tpu.masks import (expr_key, LazyComparisonMask,
                                         LazyMask, InvertedMask,
                                         CompositeMask)
    shp = (4, 3, 2)
    a = LazyComparisonMask(jnp.greater, 0.5, shape=shp)
    b = LazyComparisonMask(jnp.greater, 0.5, shape=shp)
    c = LazyComparisonMask(jnp.greater, 0.7, shape=shp)
    d = LazyComparisonMask(jnp.less, 0.5, shape=shp)
    assert expr_key(a) == expr_key(b)
    assert expr_key(a) != expr_key(c)
    assert expr_key(a) != expr_key(d)
    # array-valued thresholds: equal bytes share, different don't
    t1 = np.array([0.1, 0.2, 0.3, 0.4])[:, None, None]
    t2 = t1.copy()
    t3 = t1 + 1e-3
    k1 = expr_key(LazyComparisonMask(jnp.greater, t1, shape=shp))
    k2 = expr_key(LazyComparisonMask(jnp.greater, t2, shape=shp))
    k3 = expr_key(LazyComparisonMask(jnp.greater, t3, shape=shp))
    assert k1 == k2 and k1 != k3
    # shared singletons (isfinite) share; distinct lambdas never collide
    l1 = LazyMask(np.isfinite, shape=shp)
    l2 = LazyMask(np.isfinite, shape=shp)
    assert expr_key(l1) == expr_key(l2)
    f1 = LazyMask(lambda x: x > 0, shape=shp)
    f2 = LazyMask(lambda x: x > 0, shape=shp)
    assert expr_key(f1) != expr_key(f2)
    # structural keys for inverted/composite trees
    assert expr_key(InvertedMask(a)) == expr_key(InvertedMask(b))
    assert expr_key(InvertedMask(a)) != expr_key(a)
    comp_ab = CompositeMask(a, c, operation="and")
    comp_ab2 = CompositeMask(b, c, operation="and")
    comp_or = CompositeMask(a, c, operation="or")
    assert expr_key(comp_ab) == expr_key(comp_ab2)
    assert expr_key(comp_ab) != expr_key(comp_or)
    assert expr_key(None) is None
