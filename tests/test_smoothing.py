import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from spectral_cube_tpu.ops.smoothing import (
    convolve1d_nan, spectral_smooth_cube, spatial_smooth_cube,
    spectral_median_filter_cube, spatial_median_filter_cube,
    sigma_clip_spectrally, gaussian_kernel1d)


def test_gaussian_kernel1d():
    k = gaussian_kernel1d(2.0)
    assert k.sum() == pytest.approx(1.0, abs=1e-12)
    assert k.size % 2 == 1
    assert k[k.size // 2] == k.max()


def test_convolve1d_matches_numpy():
    rng = np.random.RandomState(0)
    data = rng.rand(32, 3, 4)
    k = gaussian_kernel1d(1.5)
    out = np.asarray(spectral_smooth_cube(jnp.asarray(data), k))
    # oracle: zero-padded correlation per spaxel
    expected = np.empty_like(data)
    for j in range(3):
        for i in range(4):
            expected[:, j, i] = np.convolve(data[:, j, i], k, mode="same")
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-7)


def test_convolve1d_nan_interpolation():
    data = np.ones((16, 1, 1))
    data[8] = np.nan
    k = gaussian_kernel1d(1.0)
    out = np.asarray(spectral_smooth_cube(jnp.asarray(data), k))
    # NaN interpolated from neighbors (all ones)
    assert out[8, 0, 0] == pytest.approx(1.0, rel=1e-6)
    # other positions unchanged
    assert out[4, 0, 0] == pytest.approx(1.0, rel=1e-6)


def test_convolve1d_all_nan_column_stays_nan():
    data = np.full((8, 1, 1), np.nan)
    out = np.asarray(spectral_smooth_cube(jnp.asarray(data),
                                          gaussian_kernel1d(1.0)))
    assert np.isnan(out).all()


def test_spatial_smooth_matches_scipy():
    rng = np.random.RandomState(1)
    data = rng.rand(2, 16, 17)
    k = np.outer([0.25, 0.5, 0.25], [0.25, 0.5, 0.25])
    out = np.asarray(spatial_smooth_cube(jnp.asarray(data), k))
    for c in range(2):
        expected = ndimage.correlate(data[c], k, mode="constant", cval=0.0)
        np.testing.assert_allclose(out[c], expected, rtol=1e-5, atol=1e-7)


def test_spectral_median_filter_matches_scipy():
    rng = np.random.RandomState(2)
    data = rng.rand(16, 3, 4)
    out = np.asarray(spectral_median_filter_cube(jnp.asarray(data), 3))
    expected = ndimage.median_filter(data, size=(3, 1, 1))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_spatial_median_filter_matches_scipy():
    rng = np.random.RandomState(3)
    data = rng.rand(2, 12, 13)
    out = np.asarray(spatial_median_filter_cube(jnp.asarray(data), 3))
    expected = ndimage.median_filter(data, size=(1, 3, 3))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_sigma_clip_removes_outliers():
    rng = np.random.RandomState(4)
    data = rng.randn(64, 4, 4).astype("f4") * 0.1
    data[10, 1, 1] = 50.0  # gross outlier
    out = np.asarray(sigma_clip_spectrally(jnp.asarray(data), sigma=3.0))
    assert np.isnan(out[10, 1, 1])
    # inliers survive
    assert np.isfinite(out[:, 0, 0]).sum() > 55


def test_sigma_clip_matches_iterative_numpy():
    rng = np.random.RandomState(5)
    data = rng.randn(64).astype("f4")
    data[5] = 30.0

    def np_clip(v, sigma, iters):
        v = v.copy()
        for _ in range(iters):
            med = np.nanmedian(v)
            std = np.sqrt(np.nanmean((v - med) ** 2)
                          ) if False else np.nanstd(v)
            v[np.abs(v - med) > sigma * std] = np.nan
        return v

    out = np.asarray(sigma_clip_spectrally(
        jnp.asarray(data[:, None, None]), sigma=3.0, maxiters=5))[:, 0, 0]
    expected = np_clip(data, 3.0, 5)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6,
                               equal_nan=True)


def test_cube_smoothing_api(cube_adv):
    cube, data = cube_adv
    kcube = cube.to("K")  # Jy/beam spatial smoothing is guarded
    sm = kcube.spatial_smooth(np.ones((3, 3)) / 9.0)
    assert sm.shape == cube.shape
    sm2 = kcube.spatial_smooth_median(3)
    assert sm2.shape == cube.shape
    sp = cube.spectral_smooth(gaussian_kernel1d(1.0))
    assert sp.shape == cube.shape
    # spectral median smoothing is also guarded on Jy/beam cubes
    # (reference base_class.py:116-140)
    spm = kcube.spectral_smooth_median(3)
    assert spm.shape == cube.shape


def test_jybeam_spatial_smooth_guard(cube_adv):
    from spectral_cube_tpu.beams import BeamError
    cube, _ = cube_adv
    with pytest.raises(BeamError):
        cube.spatial_smooth(np.ones((3, 3)) / 9.0)
    # override works
    out = cube.spatial_smooth(np.ones((3, 3)) / 9.0,
                              raise_error_jybm=False)
    assert out.shape == cube.shape


def test_dft_matmul_convolution_matches_fft():
    """The TPU DFT-as-matmul spectral-convolution path is numerically
    interchangeable with the rfft2 path (forced here on CPU)."""
    import jax.numpy as jnp
    from spectral_cube_tpu.ops import convolve as cv

    rng = np.random.RandomState(1)
    nchan, ny, nx = 6, 20, 24
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[2, 3, 4] = np.nan
    k1 = np.outer(np.hanning(7), np.hanning(9)); k1 /= k1.sum()
    k2 = np.outer(np.hanning(5), np.hanning(5)); k2 /= k2.sum()
    fy, fx = cv._padded_shape((ny, nx), k1.shape)
    assert fx % 2 == 0
    transfers = np.stack([cv._kernel_transfer(k1, fy, fx),
                          cv._kernel_transfer(k2, fy, fx)]).astype("c8")
    gidx = (np.arange(nchan) % 2).astype(np.int32)

    # FFT path (the CPU default)
    ref = np.asarray(cv._convolve_planes(jnp.asarray(data),
                                         cv.device_complex(transfers),
                                         gidx))
    # DFT-matmul internals, forced
    valid = np.isfinite(data)
    filled = np.where(valid, data, 0).astype("f4")
    invalid = (~valid).astype("f4")
    pads = ((0, 0), (0, fy - ny), (0, fx - nx))
    t_full = cv._full_transfer(cv.device_complex(transfers), fy, fx)[
        jnp.asarray(gidx)]
    both = jnp.concatenate([jnp.asarray(np.pad(filled, pads)),
                            jnp.asarray(np.pad(invalid, pads))], axis=0)
    t2 = jnp.concatenate([t_full, t_full], axis=0)
    conv = np.asarray(cv._spectral_apply_dft(both, t2, fy, fx,
                                             jnp.complex64))[:, :ny, :nx]
    num, den = conv[:nchan], 1.0 - conv[nchan:]
    out = np.where(den > 1e-8, num / np.where(den > 1e-8, den, 1), np.nan)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_block_banded_conv_matches_dense():
    """The long-axis block-banded decomposition is the exact same operator
    as the dense banded matrix (and np.convolve 'same')."""
    import jax.numpy as jnp
    from spectral_cube_tpu.ops import smoothing as sm
    rng = np.random.RandomState(11)
    for n, klen in [(300, 17), (512, 9), (260, 33), (300, 4)]:
        data = rng.rand(n, 3, 2).astype("f4")
        k = rng.rand(klen).astype("f8")
        block = max(128, -(-(((klen - 1) // 2) + 1) // 8) * 8)
        out = np.asarray(sm._block_banded_conv(jnp.asarray(data), k,
                                               block))
        expected = np.empty_like(data)
        for j in range(3):
            for i in range(2):
                expected[:, j, i] = np.convolve(data[:, j, i].astype("f8"),
                                                k, mode="same")
        np.testing.assert_allclose(out, expected, rtol=2e-5, atol=1e-6)


def test_per_channel_separable_matches_fft():
    """The batched group-indexed separable path agrees with the spectral
    (FFT) path for per-channel Gaussian kernels."""
    import jax.numpy as jnp
    from spectral_cube_tpu.ops import convolve as cv
    rng = np.random.RandomState(13)
    nchan, ny, nx = 9, 24, 20
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[3, 5, 5] = np.nan
    kernels = []
    for g in range(3):
        x = np.arange(9) - 4
        k = np.exp(-0.5 * (np.add.outer(x ** 2, (0.7 + 0.2 * g) * x ** 2))
                   / (1.5 + 0.3 * g) ** 2)
        kernels.append(k / k.sum())
    kernels.append(None)  # identity group
    gidx = (np.arange(nchan) % 4).astype(np.int32)
    out = cv.convolve_per_channel_separable(jnp.asarray(data), kernels,
                                            gidx)
    assert out is not None
    fy, fx = cv._padded_shape((ny, nx), (9, 9))
    transfers = np.stack([np.ones((fy, fx // 2 + 1), dtype="c16")
                          if k is None else cv._kernel_transfer(k, fy, fx)
                          for k in kernels])
    ref = cv._convolve_planes(jnp.asarray(data),
                              cv.device_complex(transfers), gidx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6, equal_nan=True)


def test_long_axis_conv_gate():
    """Axes beyond the dense-matmul cap route through the block-banded
    path end-to-end (spectral_smooth_cube on 5000 channels)."""
    import jax.numpy as jnp
    from spectral_cube_tpu.ops import smoothing as sm
    rng = np.random.RandomState(12)
    n = sm._MATMUL_CONV_MAX_N + 100
    data = rng.rand(n, 2, 2).astype("f4")
    k = sm.gaussian_kernel1d(2.0)
    out = np.asarray(sm.spectral_smooth_cube(jnp.asarray(data), k))
    expected = np.empty_like(data)
    for j in range(2):
        for i in range(2):
            expected[:, j, i] = np.convolve(data[:, j, i].astype("f8"), k,
                                            mode="same")
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=1e-6)


def test_dft_mats_reusable_across_traces():
    """_dft_mats must be safe to call from two different jit programs: it
    used to cache the combined complex matrix, which inside a trace is a
    tracer — the second program then crashed with UnexpectedTracerError."""
    import jax
    from spectral_cube_tpu.ops.convolve import _dft_mats, _DFT_MAT_CACHE
    _DFT_MAT_CACHE.clear()

    @jax.jit
    def prog_a(x):
        f, i = _dft_mats(8, jnp.complex64)
        return jnp.real(f @ x.astype(jnp.complex64))

    @jax.jit
    def prog_b(x):
        f, i = _dft_mats(8, jnp.complex64)
        return jnp.real(i @ x.astype(jnp.complex64))

    x = jnp.ones(8, jnp.float32)
    a = np.asarray(prog_a(x))
    b = np.asarray(prog_b(x))   # crashed before the fix
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_rdft_matmul_convolution_matches_fft():
    """The TPU rDFT real-matmul path (_spectral_apply_rdft — 12
    half-width real matmuls, the production branch of _convolve_planes
    on TPU) matches the rfft2 reference path, including NaN-hole
    normalization, kernel groups, and odd padded widths."""
    import jax
    import jax.numpy as jnp
    from spectral_cube_tpu.ops import convolve as cv

    rng = np.random.RandomState(1)
    nchan, ny, nx = 6, 20, 24
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[2, 3, 4] = np.nan
    k1 = np.outer(np.hanning(7), np.hanning(9)); k1 /= k1.sum()
    k2 = np.outer(np.hanning(5), np.hanning(5)); k2 /= k2.sum()
    # padded sizes from fft_shape are always even (the rfft2-format
    # transfer is ambiguous between fx = 2k and 2k+1, so _convolve_planes
    # reconstructs fx = 2(half-1))
    for fy, fx in [cv._padded_shape((ny, nx), k1.shape), (30, 34)]:
        transfers = np.stack([cv._kernel_transfer(k1, fy, fx),
                              cv._kernel_transfer(k2, fy, fx)]).astype("c8")
        gidx = (np.arange(nchan) % 2).astype(np.int32)
        ref = np.asarray(cv._convolve_planes(jnp.asarray(data),
                                             cv.device_complex(transfers),
                                             gidx))
        valid = np.isfinite(data)
        filled = np.where(valid, data, 0).astype("f4")
        invalid = (~valid).astype("f4")
        pads = ((0, 0), (0, fy - ny), (0, fx - nx))
        tr = transfers.real.astype("f4")[gidx]
        ti = transfers.imag.astype("f4")[gidx]
        both = jnp.concatenate([jnp.asarray(np.pad(filled, pads)),
                                jnp.asarray(np.pad(invalid, pads))], axis=0)
        conv = np.asarray(jax.jit(
            lambda p, a, b: cv._spectral_apply_rdft(
                p, a, b, fy, fx, jnp.float32))(
                    both, np.concatenate([tr, tr]),
                    np.concatenate([ti, ti])))[:, :ny, :nx]
        num, den = conv[:nchan], 1.0 - conv[nchan:]
        out = np.where(den > 1e-8, num / np.where(den > 1e-8, den, 1),
                       np.nan)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_kernel_with_units_raises(cube_adv):
    """Unit-carrying kernels are rejected like the reference
    (test_regrid.py:174-183: u.UnitsError, same message)."""
    from spectral_cube_tpu.units import Quantity, UnitsError
    cube, _ = cube_adv
    with pytest.raises(UnitsError, match="without a unit"):
        cube.spectral_smooth(Quantity(np.hanning(5), "K"))
    with pytest.raises(UnitsError, match="without a unit"):
        cube.spatial_smooth(Quantity(np.ones((3, 3)) / 9.0, "K"),
                            raise_error_jybm=False)
    with pytest.raises(UnitsError, match="without a unit"):
        cube.spectral_interpolate(cube.spectral_axis[::2],
                                  smooth_kernel=Quantity(np.hanning(3),
                                                         "Jy"))


def test_odd_padded_sizes_are_never_generated():
    """fft_shape must return EVEN sizes: the rfft2-format transfer is
    reconstructed as fx = 2*(half-1), so an odd padded size silently
    convolves on the wrong frequency grid (review finding: 12x12 image
    + 3x3 kernel gave fx=15 -> 0.036 abs error)."""
    from scipy.signal import fftconvolve
    from spectral_cube_tpu.ops.convolve import fft_shape, convolve2d_nan_fft
    for n in range(1, 64):
        assert fft_shape(n) % 2 == 0 and fft_shape(n) >= n
    rng = np.random.RandomState(0)
    img = rng.normal(size=(12, 12)).astype("f4")
    k = rng.normal(size=(3, 3)); k = k - k.min() + 0.1
    out = np.asarray(convolve2d_nan_fft(img, k))
    ref = fftconvolve(img.astype(float), (k / k.sum()).astype(float),
                      mode="same")
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_allnan_window_stays_nan_1d_smooth():
    """An interior all-NaN window wider than the kernel smooths to NaN,
    not a fake 0.0 (the 1-D path used den > 0 where the f32 residual of
    a true-zero denominator is usually ~+1e-7; now the same 1e-6 floor
    as the 2-D paths)."""
    from spectral_cube_tpu.ops.smoothing import spectral_smooth_cube
    import jax.numpy as jnp
    data = np.ones((40, 2, 2), dtype=np.float32)
    data[10:30] = np.nan             # hole much wider than the kernel
    k = np.hanning(5); k /= k.sum()
    out = np.asarray(spectral_smooth_cube(jnp.asarray(data), k))
    assert np.isnan(out[15:25]).all()
    assert np.isfinite(out[:5]).all()


def test_sigma_clip_rejects_unsupported_cenfunc():
    import pytest
    from spectral_cube_tpu.ops.smoothing import sigma_clip_spectrally
    with pytest.raises(NotImplementedError):
        sigma_clip_spectrally(np.ones((8, 2, 2), np.float32),
                              cenfunc="mode")
    with pytest.raises(NotImplementedError):
        sigma_clip_spectrally(np.ones((8, 2, 2), np.float32),
                              stdfunc="biweight")


def test_sigma_clip_mean_cenfunc_matches_iterative_numpy():
    """cenfunc='mean' follows astropy.stats.sigma_clip: center = mean of
    the survivors, std around the survivors' mean, clip outside
    center +- sigma*std (reference forwards kwargs to astropy at
    spectral_cube.py:3161-3184)."""
    rng = np.random.RandomState(11)
    data = rng.randn(48, 3, 2).astype("f4")
    data[4, 0, 0] = 25.0
    data[9, 1, 1] = -17.0
    data[2, 2, 0] = np.nan

    def np_clip_mean(v, sigma, iters):
        v = v.copy()
        for _ in range(iters):
            with np.errstate(invalid="ignore"):
                c = np.nanmean(v)
                std = np.nanstd(v)
                v[np.abs(v - c) > sigma * std] = np.nan
        return v

    out = np.asarray(sigma_clip_spectrally(
        jnp.asarray(data), sigma=2.5, maxiters=5, cenfunc="mean"))
    expected = np.stack(
        [np.stack([np_clip_mean(data[:, j, i], 2.5, 5)
                   for i in range(2)], axis=-1)
         for j in range(3)], axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6,
                               equal_nan=True)


def test_sigma_clip_mad_std_matches_iterative_numpy():
    """stdfunc='mad_std' follows astropy: std = 1.4826 * median(|x -
    median(x)|) of the survivors, around the survivors' MEDIAN even when
    cenfunc='mean'."""
    rng = np.random.RandomState(23)
    data = rng.randn(40, 2, 3).astype("f4")
    data[7, 0, 1] = 40.0
    data[3, 1, 2] = -33.0
    data[5, 0, 0] = np.nan
    K = 1.482602218505602

    def np_clip(v, sigma, iters, mean_center):
        v = v.copy()
        for _ in range(iters):
            with np.errstate(invalid="ignore"):
                med = np.nanmedian(v)
                c = np.nanmean(v) if mean_center else med
                std = K * np.nanmedian(np.abs(v - med))
                v[np.abs(v - c) > sigma * std] = np.nan
        return v

    for cen, mean_center in (("median", False), ("mean", True)):
        out = np.asarray(sigma_clip_spectrally(
            jnp.asarray(data), sigma=3.0, maxiters=4, cenfunc=cen,
            stdfunc="mad_std"))
        exp = np.stack(
            [np.stack([np_clip(data[:, j, i], 3.0, 4, mean_center)
                       for i in range(3)], axis=-1)
             for j in range(2)], axis=1)
        np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-6,
                                   equal_nan=True, err_msg=cen)


def test_sigma_clip_mad_std_all_masked_spaxel():
    """An all-NaN spaxel survives the mad_std path as all-NaN (the empty
    band must not poison neighbors or produce spurious values)."""
    data = np.random.RandomState(1).randn(16, 2, 2).astype("f4")
    data[:, 0, 0] = np.nan
    out = np.asarray(sigma_clip_spectrally(jnp.asarray(data), sigma=3.0,
                                           stdfunc="mad_std"))
    assert np.isnan(out[:, 0, 0]).all()
    assert np.isfinite(out[:, 1, 1]).sum() > 0


def test_cube_sigma_clip_cenfunc_kwarg(cube_adv):
    """The cube method threads cenfunc through (it used to silently drop
    **kwargs, so cenfunc='mean' ran the median path) and rejects kwargs
    it cannot honor instead of ignoring them."""
    import pytest
    cube, data = cube_adv
    out_mean = cube.sigma_clip_spectrally(2.0, cenfunc="mean")
    out_med = cube.sigma_clip_spectrally(2.0)
    a = np.asarray(out_mean.filled_data[:])
    b = np.asarray(out_med.filled_data[:])
    assert a.shape == b.shape
    with pytest.raises(TypeError):
        cube.sigma_clip_spectrally(2.0, grow=1.5)
    # reference-accepted performance kwargs are still tolerated
    cube.sigma_clip_spectrally(2.0, num_cores=2, use_memmap=False)


def test_sigma_clip_treats_nonfinite_as_missing():
    """A +-inf voxel must not corrupt the sorted-band statistics (a -inf
    at sorted index 0 would shift the band and NaN the whole spaxel);
    non-finite values come out NaN and finite values are judged on the
    finite population only."""
    from spectral_cube_tpu.ops.smoothing import sigma_clip_spectrally

    rng = np.random.RandomState(0)
    spec = rng.normal(0.0, 1.0, 33).astype(np.float32)
    x = np.stack([spec, spec, spec], axis=1)[:, :, None]  # (33, 3, 1)
    x[5, 1, 0] = -np.inf
    x[9, 2, 0] = np.inf
    out = np.asarray(sigma_clip_spectrally(x, sigma=6.0, maxiters=5))
    # clean spaxel: nothing clipped at 6 sigma
    np.testing.assert_allclose(out[:, 0, 0], spec, rtol=1e-6)
    # inf voxels -> NaN, all finite voxels in the same spaxel survive
    assert np.isnan(out[5, 1, 0]) and np.isnan(out[9, 2, 0])
    keep1 = np.delete(np.arange(33), 5)
    keep2 = np.delete(np.arange(33), 9)
    np.testing.assert_allclose(out[keep1, 1, 0], spec[keep1], rtol=1e-6)
    np.testing.assert_allclose(out[keep2, 2, 0], spec[keep2], rtol=1e-6)


def test_kernel_classes_match_astropy_discretization():
    """Kernel objects (convolution.py) reproduce astropy's discretized
    arrays: Box fractional edges, Gaussian center sampling, unit sums.
    The 2-D Gaussian/Tophat discretizations are pinned to the reference
    suite's expected smoothing outputs in test_ref_values.py."""
    from spectral_cube_tpu.convolution import (
        Gaussian1DKernel, Gaussian2DKernel, Box1DKernel, Box2DKernel,
        Tophat2DKernel, CustomKernel)
    np.testing.assert_allclose(Box1DKernel(3).array, np.ones(3) / 3)
    np.testing.assert_allclose(Box1DKernel(2).array, [0.25, 0.5, 0.25])
    g = Gaussian1DKernel(1)
    assert g.shape == (9,)
    np.testing.assert_allclose(g.array.sum(), 1.0, rtol=1e-12)
    # center sampling: ratio of adjacent taps is exp(-0.5 * (1 - 0)) etc.
    np.testing.assert_allclose(g.array[4] / g.array[3], np.exp(0.5),
                               rtol=1e-10)
    g2 = Gaussian2DKernel(3)
    assert g2.shape == (25, 25)
    t = Tophat2DKernel(3)
    assert t.shape == (7, 7)
    # disc of radius 3 sampled at centers covers 29 pixels
    assert int((t.array > 0).sum()) == 29
    np.testing.assert_allclose(t.array.max(), 1 / 29)
    assert Box2DKernel(3).shape == (3, 3)
    with pytest.raises(ValueError):
        CustomKernel(np.ones((2, 2)))
    # kernels feed straight into the smoothing API
    from spectral_cube_tpu.ops.smoothing import spectral_smooth_cube
    data = np.random.RandomState(0).rand(8, 3, 3).astype(np.float32)
    out = np.asarray(spectral_smooth_cube(jnp.asarray(data),
                                          np.asarray(Box1DKernel(3))))
    import scipy.ndimage as ndi
    exp = ndi.convolve1d(data, np.ones(3) / 3, axis=0, mode="constant")
    np.testing.assert_allclose(out, exp, rtol=2e-6, atol=2e-7)


def test_kernel_with_units_refused():
    """Kernel widths are in pixels; a unit-ful Quantity raises UnitsError
    (reference test_regrid.py:174-182)."""
    import pytest
    from spectral_cube_tpu.convolution import (Gaussian1DKernel,
                                               Gaussian2DKernel,
                                               Box1DKernel, Tophat2DKernel)
    from spectral_cube_tpu.units import Quantity, UnitsError
    for ctor in (Gaussian1DKernel, Gaussian2DKernel, Box1DKernel,
                 Tophat2DKernel):
        with pytest.raises(UnitsError,
                           match="kernel should be defined without"):
            ctor(Quantity(1.0, "km / s"))
    # dimensionless Quantities are fine (astropy u.one)
    assert Gaussian1DKernel(Quantity(1.0, "")).array.sum() == 1.0


def test_sigma_clip_parallel_options_and_progress(cube_adv):
    """sigma_clip_spectrally validates parallel/num_cores like its
    siblings (review finding: they were silently swallowed) and drives
    update_function once per spaxel like the reference's applicator."""
    import pytest
    cube, data = cube_adv
    with pytest.raises(ValueError):
        cube.sigma_clip_spectrally(3.0, parallel=False, num_cores=4)
    hits = []
    cube.sigma_clip_spectrally(3.0, update_function=lambda: hits.append(1))
    assert len(hits) == data.shape[1] * data.shape[2]


def test_sigma_clip_fused_kernel_matches_jnp_band():
    """The fused Pallas sigma-clip (in-VMEM bitonic sort + band
    iterations, ops/clip_pallas.py) is bit-identical to the sorted-band
    jnp path it replaces on TPU, including NaN holes, an all-NaN spaxel,
    +-inf treated as missing, and both cenfuncs."""
    from spectral_cube_tpu.ops.clip_pallas import sigma_clip_fused
    rng = np.random.RandomState(5)
    for use_mean, nchan in ((False, 37), (True, 37), (False, 64)):
        data = rng.randn(nchan, 8, 128).astype(np.float32) * 2.0
        data[3, 2, 5] = np.nan
        data[:, 1, 7] = np.nan
        data[min(10, nchan - 1), 0, 0] = np.inf
        data[min(11, nchan - 1), 0, 1] = -np.inf
        ref = np.asarray(sigma_clip_spectrally(
            jnp.asarray(data), sigma=1.0, maxiters=5,
            cenfunc=("mean" if use_mean else "median")))
        out = np.asarray(sigma_clip_fused(data, 1.0, 5, use_mean,
                                          interpret=True))
        assert np.array_equal(np.isnan(out), np.isnan(ref))
        fin = ~np.isnan(ref)
        np.testing.assert_array_equal(out[fin], ref[fin])


def test_sigma_clip_fused_gates():
    """Infeasible shapes return None (caller falls back to the jnp
    path): unpadded spatial tiles and VMEM-oversized spectral axes."""
    from spectral_cube_tpu.ops.clip_pallas import sigma_clip_fused
    rng = np.random.RandomState(6)
    assert sigma_clip_fused(rng.randn(16, 7, 128).astype(np.float32),
                            1.0, 5, False, interpret=True) is None
    assert sigma_clip_fused(rng.randn(16, 8, 100).astype(np.float32),
                            1.0, 5, False, interpret=True) is None
    assert sigma_clip_fused(rng.randn(4000, 8, 128).astype(np.float32),
                            1.0, 5, False, interpret=True) is None


def test_bitonic_sort_leading_matches_numpy():
    from spectral_cube_tpu.ops.clip_pallas import bitonic_sort_leading
    rng = np.random.RandomState(8)
    v = rng.randn(128, 8, 128).astype(np.float32)
    v[3, 0, 0] = np.inf
    s = np.asarray(bitonic_sort_leading(jnp.asarray(v)))
    np.testing.assert_array_equal(s, np.sort(v, axis=0))


@pytest.mark.parametrize("nchan", [623, 513, 640, 1024, 100, 512])
def test_sort_padded_leading_matches_numpy(nchan):
    """The split sort (chunk networks + one ascending merge) produces the
    identical sorted stack + inf tail as the plain padded network, across
    the npad==nchan, nchan<=npad/2, and split regimes — including the
    623-channel shape of the reference's published benchmark."""
    from spectral_cube_tpu.ops.clip_pallas import sort_padded_leading
    rng = np.random.RandomState(9)
    npad = 1 << int(np.ceil(np.log2(max(nchan, 2))))
    v = rng.randn(nchan, 8, 128).astype(np.float32)
    v[min(3, nchan - 1), 0, 0] = np.inf
    s = np.asarray(sort_padded_leading(jnp.asarray(v), nchan, npad))
    pad = np.full((npad - nchan, 8, 128), np.inf, np.float32)
    np.testing.assert_array_equal(
        s, np.sort(np.concatenate([v, pad], axis=0), axis=0))
