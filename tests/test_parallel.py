"""Multi-device tests on a virtual 8-device CPU mesh (the analog of the
reference's in-process dask.distributed cluster test,
tests/test_dask.py:296-336; conftest sets
--xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, Quantity
from spectral_cube_tpu.parallel import (CubeMesh, ShardedCube,
                                        sharded_moments, sharded_statistics,
                                        sharded_spatial_convolve, halo_pad)
from spectral_cube_tpu.masks import LazyComparisonMask
from spectral_cube_tpu.ops.moments import moments_012
from spectral_cube_tpu.ops.smoothing import spatial_smooth_cube

from conftest import make_cube_file


@pytest.fixture(scope="module")
def cmesh():
    if len(jax.devices()) != 8:
        pytest.skip("multi-device tests need the 8-device virtual mesh")
    return CubeMesh()


@pytest.fixture
def big_cube():
    rng = np.random.RandomState(3)
    data = rng.rand(16, 24, 32).astype("f4")
    data[4, 5, 6] = np.nan
    coords = np.arange(16) * 0.5
    return data, coords, 0.5


def test_mesh_grid(cmesh):
    assert cmesh.n_devices == 8
    ny, nx = cmesh.grid
    assert ny * nx == 8


def test_sharded_moments_match_single_device(cmesh, big_cube):
    data, coords, dx = big_cube
    e0, e1, e2 = (np.asarray(m) for m in
                  moments_012(jnp.asarray(data), coords, dx))
    m0, m1, m2 = (np.asarray(m) for m in
                  sharded_moments(data, coords, dx, cmesh))
    assert np.allclose(m0, e0, rtol=1e-6, equal_nan=True)
    assert np.allclose(m1, e1, rtol=1e-6, equal_nan=True)
    assert np.allclose(m2, e2, rtol=1e-5, atol=1e-7, equal_nan=True)


def test_sharded_moments_with_mask(cmesh, big_cube):
    data, coords, dx = big_cube
    mask = LazyComparisonMask(jnp.greater, 0.3, shape=data.shape)
    e = [np.asarray(m) for m in moments_012(jnp.asarray(data), coords, dx,
                                            include=jnp.asarray(data) > 0.3)]
    got = [np.asarray(m) for m in
           sharded_moments(data, coords, dx, cmesh, mask_expr=mask)]
    for a, b in zip(got, e):
        assert np.allclose(a, b, rtol=1e-5, atol=1e-7, equal_nan=True)


def test_sharded_statistics(cmesh, big_cube):
    data, _, _ = big_cube
    st = sharded_statistics(data, cmesh)
    dd = data[np.isfinite(data)].astype("f8")
    assert st["npts"] == dd.size
    assert st["mean"] == pytest.approx(dd.mean(), rel=1e-6)
    assert st["sigma"] == pytest.approx(dd.std(ddof=1), rel=1e-4)
    assert st["min"] == pytest.approx(dd.min(), rel=1e-6)
    assert st["max"] == pytest.approx(dd.max(), rel=1e-6)


def test_halo_exchange_convolution(cmesh, big_cube):
    """Halo-exchange direct conv == single-device conv (the chunk-overlap
    correctness invariant)."""
    data, _, _ = big_cube
    k = np.outer([0.25, 0.5, 0.25], [0.25, 0.5, 0.25])
    expected = np.asarray(spatial_smooth_cube(jnp.asarray(data), k))
    got = np.asarray(sharded_spatial_convolve(data, k, cmesh))
    assert np.allclose(got, expected, rtol=1e-5, atol=1e-6, equal_nan=True)


def test_sharded_cube_facade(tmp_path, cmesh):
    path, data = make_cube_file(tmp_path, shape=(16, 24, 32))
    cube = SpectralCube.read(path)
    sc = ShardedCube(cube, cmesh)
    m0, m1, m2 = sc.moment_maps()
    ref0 = cube.moment0()
    assert np.allclose(np.asarray(m0.value), np.asarray(ref0.value),
                       rtol=1e-5, equal_nan=True)
    st = sc.statistics()
    assert st["npts"] == np.isfinite(data).sum()


def test_sharded_sigma_clip(tmp_path, cmesh):
    path, data = make_cube_file(tmp_path, shape=(16, 24, 32))
    cube = SpectralCube.read(path)
    sc = ShardedCube(cube, cmesh)
    clipped = sc.sigma_clip_spectrally(2.0)
    expected = cube.sigma_clip_spectrally(2.0)
    assert np.allclose(np.asarray(clipped.cube.unmasked_data[:].value),
                       np.asarray(expected.unmasked_data[:].value),
                       rtol=1e-5, equal_nan=True)


def test_reshard_roundtrip(cmesh, big_cube):
    data, _, _ = big_cube

    @jax.jit
    def roundtrip(d):
        d2 = cmesh.reshard(d, "spectral", source="spatial")
        return cmesh.reshard(d2 * 2.0, "spatial", source="spectral")

    out = np.asarray(roundtrip(cmesh.shard(data, "spatial")))
    assert np.allclose(out, data * 2, rtol=1e-6, equal_nan=True)


def test_reshard_is_identity_permutation(cmesh):
    """The explicit all-to-all reshard is a pure layout change: every voxel
    keeps its value, and channel blocks land y-major on the flattened mesh
    (matching P(('y','x'), None, None))."""
    my, mx = cmesh.grid
    n = cmesh.n_devices
    nchan, ny, nx = 2 * n, 4 * my, 4 * mx
    data = np.arange(nchan * ny * nx, dtype=np.float32).reshape(
        nchan, ny, nx)
    out = cmesh.reshard(cmesh.shard(data, "spatial"), "spectral",
                        source="spatial")
    np.testing.assert_array_equal(np.asarray(out), data)
    # each device's shard is a contiguous channel block in y-major order
    for sh in out.addressable_shards:
        local = np.asarray(sh.data)
        assert local.shape == (nchan // n, ny, nx)
        iy, ix = np.unravel_index(
            np.argwhere(cmesh.mesh.devices.ravel() == sh.device)[0, 0],
            (my, mx))
        blk = iy * mx + ix
        np.testing.assert_array_equal(
            local, data[blk * (nchan // n):(blk + 1) * (nchan // n)])


@pytest.mark.filterwarnings(
    "ignore::spectral_cube_tpu.utils.PossiblySlowWarning")
@pytest.mark.parametrize("shape", [(10, 13, 9), (7, 6, 8)])
def test_reshard_roundtrip_uneven(cmesh, shape):
    """Reshard stays correct when no axis divides the mesh evenly (the
    pad-exchange-slice path)."""
    rng = np.random.RandomState(3)
    data = rng.rand(*shape).astype(np.float32)

    @jax.jit
    def roundtrip(d):
        d2 = cmesh.reshard(d, "spectral", source="spatial")
        return cmesh.reshard(d2 + 1.0, "spatial", source="spectral")

    out = np.asarray(roundtrip(cmesh.shard(data, "spatial")))
    assert np.allclose(out, data + 1, rtol=1e-6)


def test_use_mesh_context(cmesh):
    from spectral_cube_tpu.parallel import use_mesh, default_mesh, CubeMesh
    base = default_mesh()
    small = CubeMesh(devices=jax.devices()[:4])
    with use_mesh(small) as m:
        assert default_mesh() is small
        assert m.n_devices == 4
    assert default_mesh() is base


def test_sharded_cube_delegation(tmp_path, cmesh):
    """ShardedCube quacks like the cube (the DaskSpectralCube mirroring):
    un-overridden methods delegate and cube-returning ops re-wrap."""
    path, data = make_cube_file(tmp_path, shape=(8, 16, 16))
    cube = SpectralCube.read(path)
    sc = ShardedCube(cube, cmesh)
    assert sc.unit == cube.unit
    np.testing.assert_allclose(np.asarray(sc.spectral_axis.value),
                               np.asarray(cube.spectral_axis.value))
    sub = sc.spectral_slab(Quantity(-321.2, "km / s"),
                           Quantity(-318.7, "km / s"))
    assert isinstance(sub, ShardedCube)
    assert sub.shape[0] == 3
    m0 = sub.moment_maps()[0]
    assert m0.shape == (16, 16)
    st = sc.statistics()
    assert st["npts"] == np.isfinite(data).sum()


def test_sharded_convolve_to_matches_unsharded(tmp_path, cmesh):
    """ShardedCube.convolve_to (spectral-layout reshard + per-channel
    spectral multiply) agrees with the single-device path."""
    from conftest import make_vr_cube_file
    from spectral_cube_tpu.units import Quantity
    path, data = make_vr_cube_file(tmp_path, shape=(8, 16, 16))
    cube = SpectralCube.read(path)
    target = cube.common_beam()
    expected = cube.convolve_to(target)
    sc = ShardedCube(cube, cmesh).convolve_to(target)
    np.testing.assert_allclose(
        np.asarray(sc.cube.unmasked_data[:].value),
        np.asarray(expected.unmasked_data[:].value),
        rtol=2e-4, atol=2e-6, equal_nan=True)
    assert sc.cube.beam == expected.beam


def _hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_compiled_collective_structure(cmesh, big_cube):
    """Compile-time guarantees on the SPMD programs (the properties that
    make the TB-scale story work):

    - moments in the spatial layout: NO collectives at all
    - statistics: all-reduces only (the psum tree), no all-gathers
    - reshard: all-to-alls only — never the 'involuntary full
      rematerialization' all-gather+dynamic-slice pattern
    """
    data, coords, dx = big_cube
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from spectral_cube_tpu.parallel.sharded import (sharded_moments,
                                                    sharded_statistics)

    placed = cmesh.shard(data, "spatial")

    mom_fn = shard_map(
        lambda d: moments_012(d, coords, dx),
        mesh=cmesh.mesh, in_specs=(P(None, "y", "x"),),
        out_specs=(P("y", "x"),) * 3)
    txt = _hlo(mom_fn, placed)
    for coll in ("all-reduce", "all-gather", "all-to-all",
                 "collective-permute"):
        assert coll not in txt, f"moments HLO contains {coll}"

    def stats_fn(d):
        from spectral_cube_tpu.ops import reductions as red

        def local(dd):
            valid = red.valid_mask(dd)
            return jax.lax.psum(jnp.sum(jnp.where(valid, dd, 0)),
                                ("y", "x"))
        return shard_map(local, mesh=cmesh.mesh,
                         in_specs=(P(None, "y", "x"),),
                         out_specs=P())(d)
    txt = _hlo(stats_fn, placed)
    assert "all-reduce" in txt
    assert "all-gather" not in txt

    def reshard_fn(d):
        return cmesh.reshard(d, "spectral", source="spatial")
    txt = _hlo(reshard_fn, placed)
    assert "all-to-all" in txt
    assert "all-gather" not in txt, \
        "reshard fell back to replicate-and-slice"


def test_sharded_halo_convolve_matches_unsharded(tmp_path, cmesh):
    """The halo-exchange per-channel separable convolution (no all-to-all)
    agrees with the unsharded batched separable path."""
    from spectral_cube_tpu.ops import convolve as cv
    from spectral_cube_tpu.parallel.sharded import (
        sharded_convolve_per_channel_separable)
    rng = np.random.RandomState(5)
    nchan, ny, nx = 6, 24, 32
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[2, 10, 12] = np.nan
    kernels = []
    for g in range(3):
        x = np.arange(9) - 4
        k = np.exp(-0.5 * np.add.outer(x ** 2, x ** 2) / (1.2 + 0.4 * g) ** 2)
        kernels.append(k / k.sum())
    kernels.append(None)
    gidx = (np.arange(nchan) % 4).astype(np.int32)
    expected = cv.convolve_per_channel_separable(jnp.asarray(data), kernels,
                                                 gidx)
    got = sharded_convolve_per_channel_separable(data, kernels, gidx, cmesh)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-6, equal_nan=True)
    # its compiled HLO contains only the halo collective-permutes
    txt = jax.jit(lambda d: sharded_convolve_per_channel_separable(
        d, kernels, gidx, cmesh)).lower(
            cmesh.shard(jnp.asarray(data), "spatial")).compile().as_text()
    assert "all-to-all" not in txt
    assert "all-gather" not in txt


def test_sharded_halo_convolve_even_kernel(cmesh):
    """Even-length kernels need the ceil half-width halo (regression: a
    floor halo dropped one tap at every tile boundary)."""
    from spectral_cube_tpu.ops import convolve as cv
    from spectral_cube_tpu.parallel.sharded import (
        sharded_convolve_per_channel_separable)
    rng = np.random.RandomState(6)
    data = rng.rand(4, 16, 16).astype("f4")
    k = np.outer(np.hanning(6)[0:4] + 0.1, np.hanning(6)[0:4] + 0.1)
    k /= k.sum()
    gidx = np.zeros(4, dtype=np.int32)
    expected = cv.convolve_per_channel_separable(jnp.asarray(data), [k],
                                                 gidx)
    got = sharded_convolve_per_channel_separable(data, [k], gidx, cmesh)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-6)


def test_fused_ops_on_sharded_arrays(cmesh):
    """The fused composed-operator paths (smooth+interp, conv+reproject)
    run on GSPMD-sharded arrays: the clean-cube lax.cond predicate is a
    global reduce, which the partitioner lowers to an all-reduce."""
    from spectral_cube_tpu.ops.interpolate import smooth_interp_cube
    from spectral_cube_tpu.ops import interpolate as itp
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d
    rng = np.random.RandomState(3)
    data_np = rng.rand(16, 16, 32).astype("f4")
    data = cmesh.shard(jnp.asarray(data_np), "spatial")
    kern = gaussian_kernel1d(1.0)
    inaxis = np.arange(16, dtype=np.float64)
    outaxis = inaxis[::2]
    ref, _ = itp.interp_cube_spectral(
        __import__("spectral_cube_tpu.ops.smoothing",
                   fromlist=["spectral_smooth_cube"])
        .spectral_smooth_cube(jnp.asarray(data_np), kern),
        inaxis, outaxis)
    # force the matmul path (CPU gates it off by default)
    orig = itp._use_matmul_interp
    itp._use_matmul_interp = lambda nin, nout: True
    try:
        got, _ = smooth_interp_cube(data, kern, inaxis, outaxis)
    finally:
        itp._use_matmul_interp = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_sharded_ops_mesh_unaligned_shapes(tmp_path):
    """Sharded ops work on cubes whose dims do NOT divide the mesh (pad
    to aligned tiles internally, crop after) and agree with the
    unsharded results — including the interpolated mask, and the
    spectral_interpolate semantics where masked voxels must not poison
    neighbors (they interpolate from RAW data; the mask interpolates
    separately, like the unsharded path)."""
    import warnings
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, ShardedCube, CubeMesh
    from spectral_cube_tpu.units import Quantity

    mesh = CubeMesh()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for shape, seed in [((9, 10, 10), 1), ((11, 5, 9), 2),
                            ((6, 8, 13), 3)]:
            p, _ = make_cube_file(tmp_path, name=f"u{seed}.fits",
                                  shape=shape, seed=seed)
            cube = SpectralCube.read(str(p))
            m = cube.with_mask(cube > Quantity(0.3, cube.unit))
            sc = ShardedCube(m, mesh)
            m0s, m1s, _ = (np.asarray(x) for x in sc.moment_maps())
            np.testing.assert_allclose(m0s, np.asarray(m.moment0()),
                                       rtol=2e-5)
            st_s, st = sc.statistics(), m.statistics()
            for k in ("npts", "mean", "sigma", "sum", "max", "min"):
                np.testing.assert_allclose(float(st_s[k]), float(st[k]),
                                           rtol=1e-5)
            kern = np.ones((3, 3)) / 9.0
            np.testing.assert_allclose(
                np.asarray(sc.spatial_smooth(kern).cube.unmasked_data[:]),
                np.asarray(m.spatial_smooth(
                    kern, raise_error_jybm=False).unmasked_data[:]),
                rtol=3e-5, atol=1e-6)
            g = m.spectral_axis[::2]
            a = sc.spectral_interpolate(g).cube
            b = m.spectral_interpolate(g)
            np.testing.assert_allclose(np.asarray(a.unmasked_data[:]),
                                       np.asarray(b.unmasked_data[:]),
                                       rtol=3e-5, atol=1e-6)
            np.testing.assert_array_equal(np.asarray(a.get_mask_array()),
                                          np.asarray(b.get_mask_array()))


def test_streaming_loaders_mesh_unaligned(tmp_path):
    """The streaming FITS/CASA loaders fall back to replicating
    non-dividing axes instead of crashing (same policy as
    CubeMesh.shard) and read values exactly."""
    import warnings
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, CubeMesh
    from spectral_cube_tpu.io import streaming

    mesh = CubeMesh()
    p, _ = make_cube_file(tmp_path, name="odd.fits", shape=(5, 9, 11),
                          seed=3)
    cube = SpectralCube.read(str(p))
    ref = np.asarray(cube.unmasked_data[:])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = streaming.read_sharded_cube(str(p), mesh)
        np.testing.assert_allclose(np.asarray(out.unmasked_data[:]), ref,
                                   rtol=0, atol=0)
        cube.write(str(tmp_path / "odd.image"), format="casa")
        out2 = streaming.read_sharded_casa(str(tmp_path / "odd.image"),
                                           mesh)
        np.testing.assert_allclose(np.asarray(out2.unmasked_data[:]), ref,
                                   rtol=1e-6)


@pytest.mark.parametrize("shape,ksize", [((3, 10, 17), 6),
                                         ((3, 10, 17), 2)])
def test_sharded_fft_fallback_uneven_shape(cmesh, shape, ksize):
    """The reshard+FFT fallback (full-rank EVEN kernel, routed off the
    halo path) works on mesh-unaligned spatial shapes: the FFT transfer
    planes must be sized from the MESH-PADDED extent, not the raw
    (ny, nx).  The (nx=17, k=2) case is the sharp regression: on a 2x4 mesh
    fft_shape(17+2-1)=18 < padded nx 20, which produced a negative pad
    width inside _convolve_planes when transfers were sized unpadded."""
    from spectral_cube_tpu.ops import convolve as cv
    from spectral_cube_tpu.parallel.sharded import sharded_spatial_convolve

    rng = np.random.RandomState(8)
    nchan, ny, nx = shape
    data = rng.rand(nchan, ny, nx).astype("f4")
    data[1, 4, 9] = np.nan
    k = rng.rand(ksize, ksize) + 0.05
    k /= k.sum()
    expected = np.asarray(cv.convolve2d_nan_fft(jnp.asarray(data), k))
    got = np.asarray(sharded_spatial_convolve(data, k, cmesh))
    assert got.shape == (nchan, ny, nx)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5,
                               equal_nan=True)


def test_reshard_generic_path_mesh_unaligned(cmesh):
    """reshard without source= degrades to the divisibility-checked spec
    like shard() (regression: raw layout spec crashed on shapes shard()
    accepted)."""
    data = np.ones((5, 7, 8), dtype="f4")
    b = cmesh.shard(jnp.asarray(data), "spatial")
    out = cmesh.reshard(b, "spectral")
    np.testing.assert_allclose(np.asarray(out), data)


def test_reshard_uneven_placement_not_just_roundtrip(cmesh):
    """The UNEVEN-shape reshard's device placement is asserted directly:
    a self-inverse roundtrip alone cannot see a symmetric layout bug
    (e.g. swapped all-to-all axis order in both directions)."""
    my, mx = cmesh.grid
    n = cmesh.n_devices
    # spatially uneven (the pad-exchange-slice path), channel axis even
    # so the post-crop sharding survives and placement is observable
    nchan, ny, nx = 2 * n, 4 * my - 1, 4 * mx - 3
    data = np.arange(nchan * ny * nx, dtype=np.float32).reshape(
        nchan, ny, nx)
    out = cmesh.reshard(cmesh.shard(data, "spatial"), "spectral",
                        source="spatial")
    got = np.asarray(out)
    np.testing.assert_array_equal(got[:nchan, :ny, :nx], data)
    per = nchan // n
    for sh in out.addressable_shards:
        iy, ix = np.unravel_index(
            np.argwhere(cmesh.mesh.devices.ravel() == sh.device)[0, 0],
            (my, mx))
        blk = iy * mx + ix
        s0, s1, _ = sh.index[0].indices(nchan)
        assert (s0, s1) == (blk * per, (blk + 1) * per), \
            (sh.device, sh.index)
        local = np.asarray(sh.data)
        np.testing.assert_array_equal(local[:, :ny, :nx],
                                      data[blk * per:(blk + 1) * per])


def test_sharded_smooth_interpolate_matches_unsharded(tmp_path):
    """ShardedCube.spectral_interpolate(smooth_kernel=) runs the fused
    smooth+regrid per spatial shard (zero communication) and matches the
    unsharded API's filled values."""
    import warnings
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, ShardedCube, CubeMesh
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d
    from spectral_cube_tpu.units import Quantity

    p, data = make_cube_file(tmp_path, name="si.fits", shape=(12, 8, 8),
                             seed=5)
    cube = SpectralCube.read(p)
    sv = np.asarray(cube.spectral_axis.value)
    grid = Quantity((sv[:-1] + sv[1:]) / 2.0, cube.spectral_unit)
    kern = gaussian_kernel1d(1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = cube.spectral_interpolate(grid, smooth_kernel=kern)
        sc = ShardedCube(cube, CubeMesh())
        got = sc.spectral_interpolate(grid, smooth_kernel=kern)
    np.testing.assert_allclose(
        np.asarray(got.cube.filled_data[:].value),
        np.asarray(ref.filled_data[:].value),
        rtol=2e-5, atol=1e-6, equal_nan=True)


def test_sharded_smooth_interpolate_threshold_mask_parity(tmp_path):
    """Review finding: threshold-style data-local masks must re-evaluate
    on the SMOOTHED data in the sharded path too — sharded and unsharded
    smooth+interp agree on filled values for cube > 0.3 masks."""
    import warnings
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, ShardedCube, CubeMesh
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d
    from spectral_cube_tpu.units import Quantity

    p, data = make_cube_file(tmp_path, name="tm.fits", shape=(10, 8, 8),
                             seed=9)
    cube0 = SpectralCube.read(p)
    cube = cube0.with_mask(cube0 > Quantity(0.3, cube0.unit))
    sv = np.asarray(cube.spectral_axis.value)
    grid = Quantity((sv[:-1] + sv[1:]) / 2.0, cube.spectral_unit)
    kern = gaussian_kernel1d(1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = cube.spectral_interpolate(grid, smooth_kernel=kern)
        got = ShardedCube(cube, CubeMesh()).spectral_interpolate(
            grid, smooth_kernel=kern)
    np.testing.assert_allclose(
        np.asarray(got.cube.filled_data[:].value),
        np.asarray(ref.filled_data[:].value),
        rtol=2e-5, atol=1e-6, equal_nan=True)


def test_sharded_smooth_interpolate_unaligned_spatial(tmp_path):
    """Review finding: zero-padding (not NaN) on mesh-unaligned spatial
    shapes keeps results identical to the unsharded call."""
    import warnings
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, ShardedCube, CubeMesh
    from spectral_cube_tpu.ops.smoothing import gaussian_kernel1d
    from spectral_cube_tpu.units import Quantity

    p, data = make_cube_file(tmp_path, name="ua.fits", shape=(8, 9, 13),
                             seed=11, with_nan=False)
    cube = SpectralCube.read(p)
    sv = np.asarray(cube.spectral_axis.value)
    grid = Quantity((sv[:-1] + sv[1:]) / 2.0, cube.spectral_unit)
    kern = gaussian_kernel1d(1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = cube.spectral_interpolate(grid, smooth_kernel=kern)
        got = ShardedCube(cube, CubeMesh()).spectral_interpolate(
            grid, smooth_kernel=kern)
    np.testing.assert_allclose(
        np.asarray(got.cube.filled_data[:].value),
        np.asarray(ref.filled_data[:].value),
        rtol=2e-5, atol=1e-6, equal_nan=True)


def test_vrods_interp_same_length_keeps_goodbeams(tmp_path):
    """Review finding: a same-length 1-D regrid keeps both the beams AND
    the goodbeams mask."""
    from conftest import make_vr_cube_file
    from spectral_cube_tpu import SpectralCube
    from spectral_cube_tpu.units import Quantity
    p, _ = make_vr_cube_file(tmp_path, shape=(4, 3, 2))
    cube = SpectralCube.read(p).mask_out_bad_beams(10.0)
    spec = cube[:, 1, 1]
    gbm = np.asarray(spec.goodbeams_mask).copy()
    sv = np.asarray(spec.spectral_axis.value)
    out = spec.spectral_interpolate(
        Quantity(sv + 0.1 * (sv[1] - sv[0]), spec.spectral_axis.unit),
        suppress_smooth_warning=True)
    assert np.all(np.asarray(out.goodbeams_mask) == gbm)
    assert len(out.beams) == gbm.sum()


def test_sharded_spatial_convolve_nonseparable_halo_path(cmesh):
    """A full-rank (non-separable) odd kernel takes the DIRECT halo-pad
    conv_general_dilated path inside sharded_spatial_convolve (the
    separable fast path returns None, the kernel fits a tile).  It must
    match the unsharded normalized-convolution oracle including the NaN
    hole."""
    from spectral_cube_tpu.parallel.sharded import sharded_spatial_convolve
    from spectral_cube_tpu.ops.smoothing import spatial_smooth_cube
    rng = np.random.RandomState(17)
    data = rng.rand(4, 16, 16).astype("f4")
    data[1, 7, 9] = np.nan
    k = rng.rand(5, 5).astype(float) + 0.05   # rank 5 > max_rank=4
    k /= k.sum()
    expected = np.asarray(spatial_smooth_cube(jnp.asarray(data), k))
    got = np.asarray(sharded_spatial_convolve(data, k, cmesh))
    np.testing.assert_allclose(got, expected, rtol=3e-5, atol=3e-6,
                               equal_nan=True)


def test_sharded_interp_no_mask_branch(cmesh):
    """sharded_spectral_interpolate(include=None) — the maskless branch —
    agrees with the single-device interp kernel."""
    from spectral_cube_tpu.parallel.sharded import (
        sharded_spectral_interpolate)
    from spectral_cube_tpu.ops.interpolate import interp_cube_spectral
    rng = np.random.RandomState(3)
    data = rng.rand(10, 8, 8).astype("f4")
    inax = np.linspace(0.0, 9.0, 10)
    outax = np.linspace(0.5, 8.5, 17)
    expected = np.asarray(interp_cube_spectral(jnp.asarray(data), inax,
                                               outax)[0])
    got, inc = sharded_spectral_interpolate(data, inax, outax, cmesh,
                                            include=None)
    assert inc is None
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5,
                               atol=2e-6, equal_nan=True)


def test_sharded_smooth_interp_boolean_mask_branch(tmp_path):
    """ShardedCube.spectral_interpolate(smooth_kernel=) with a stored
    BooleanArrayMask exercises the include-carrying fused kernel (the
    non-data-local mask branch) and matches the unsharded op."""
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, BooleanArrayMask
    from spectral_cube_tpu.units import Quantity
    path, data = make_cube_file(tmp_path, shape=(12, 8, 8))
    cube = SpectralCube.read(path)
    rng = np.random.RandomState(4)
    inc = rng.rand(*data.shape) > 0.15
    mcube = cube.with_mask(BooleanArrayMask(inc, wcs=cube.wcs,
                                            shape=data.shape),
                           inherit_mask=False)
    grid = Quantity(np.linspace(
        float(cube.spectral_axis.value[1]),
        float(cube.spectral_axis.value[-2]), 15), cube.spectral_unit)
    k = np.hanning(5)[1:-1]
    k /= k.sum()
    expected = mcube.spectral_interpolate(grid, smooth_kernel=k)
    sc = ShardedCube(mcube, CubeMesh()).spectral_interpolate(
        grid, smooth_kernel=k)
    np.testing.assert_allclose(
        np.asarray(sc.cube.filled_data[:].value),
        np.asarray(expected.filled_data[:].value),
        rtol=2e-5, atol=2e-6, equal_nan=True)
    np.testing.assert_array_equal(
        np.asarray(sc.cube.get_mask_array()),
        np.asarray(expected.get_mask_array()))


def test_sharded_vr_convolve_fft_fallback(tmp_path, cmesh):
    """When the deconvolution kernel is too large for the tilewise
    separable path, ShardedCube.convolve_to falls back to the reshard +
    spectral-multiply FFT path and still matches the unsharded result."""
    from conftest import make_vr_cube_file
    from spectral_cube_tpu import Beam
    path, data = make_vr_cube_file(tmp_path, shape=(6, 12, 12))
    cube = SpectralCube.read(path)
    # a target much broader than the members: kernel spans > 2*ny pixels
    target = cube.common_beam()
    big = Beam(major=target.major * 12, minor=target.minor * 12,
               pa=target.pa)
    expected = cube.convolve_to(big)
    sc = ShardedCube(cube, cmesh).convolve_to(big)
    np.testing.assert_allclose(
        np.asarray(sc.cube.unmasked_data[:].value),
        np.asarray(expected.unmasked_data[:].value),
        rtol=2e-4, atol=2e-6, equal_nan=True)


def test_read_use_dask_returns_sharded_cube(tmp_path):
    """SpectralCube.read(use_dask=True) lands in the ShardedCube facade
    (the reference's read-into-DaskSpectralCube,
    dask_spectral_cube.py:1390-1394) WITHOUT mutating any cube in place:
    rechunk/statistics/display surface is reachable straight from read."""
    from conftest import make_cube_file
    path, data = make_cube_file(tmp_path, "dask.fits", shape=(6, 8, 10))
    sc = SpectralCube.read(path, use_dask=True)
    assert isinstance(sc, ShardedCube)
    # the facade surface is reachable
    assert hasattr(sc, "rechunk") and hasattr(sc, "statistics")
    stats = sc.statistics()
    finite = data[np.isfinite(data)]
    np.testing.assert_allclose(float(stats["mean"].value), finite.mean(),
                               rtol=1e-6)
    re = sc.rechunk("spectral")
    assert isinstance(re, ShardedCube)
    # data is sharded over the default mesh
    assert len(sc.cube._device_data.sharding.device_set) == \
        len(jax.devices())
    # plain read is untouched by the facade path (no in-place mutation)
    plain = SpectralCube.read(path)
    assert not isinstance(plain, ShardedCube)
    np.testing.assert_allclose(
        np.asarray(plain.unmasked_data[:].value),
        np.asarray(sc.cube.unmasked_data[:].value), equal_nan=True)


def test_streaming_pipeline_tb_scale_analog(tmp_path):
    """The TB-scale story at reduced scale (reference analog:
    tests/test_performance.py:128-241): stream a FITS cube shard-by-shard
    into the full sharded pipeline on the 8-device mesh and assert

    (a) numerical equality with the single-device chain at a non-toy
        size (48x80x96 — 100x the multichip dryrun's cube),
    (b) the ingested array is genuinely distributed (each device holds
        exactly its (y, x) tile, nothing holds the global cube), and
    (c) streaming ingest never materializes the full cube on the host:
        tracemalloc peak stays well under one cube (each tile decode is
        O(shard)).
    """
    import tracemalloc
    import warnings
    from conftest import make_cube_file
    from spectral_cube_tpu import SpectralCube, CubeMesh, Beam
    from spectral_cube_tpu.io import streaming
    from spectral_cube_tpu.pipeline import run_pipeline
    from spectral_cube_tpu.units import Quantity

    if len(jax.devices()) < 8:
        # the O(shard) host-peak bound presumes cube/8 tiles; on one
        # real chip the single shard IS the cube (observed in the
        # round-5 real-TPU full-suite run), so the memory assertion is
        # meaningless there — same guard as the module's cmesh fixture
        pytest.skip("streaming TB-scale analog needs the 8-device mesh")

    shape = (48, 80, 96)
    cube_bytes = int(np.prod(shape)) * 8   # float64 on file
    p, _ = make_cube_file(tmp_path, name="tb.fits", shape=shape, seed=5)

    mesh = CubeMesh()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # Warm the ingest path on a toy cube first: first-call jit/compile
        # and module-import temporaries depend on what ran earlier in the
        # suite and are not the thing being measured (steady-state
        # per-shard decode is).
        import gc
        pw, _ = make_cube_file(tmp_path, name="warm.fits", shape=(4, 8, 8),
                               seed=6)
        streaming.read_sharded_cube(str(pw), mesh, dtype=np.float32)
        gc.collect()
        tracemalloc.start()
        sharded = streaming.read_sharded_cube(str(p), mesh,
                                              dtype=np.float32)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
    # (c) host peak during ingest is O(shard), not O(cube): each of the 8
    # tiles is cube/8; a few decode temporaries are fine, a full-cube
    # materialization is not
    assert peak < cube_bytes / 2, \
        f"streaming ingest peaked at {peak} B (cube is {cube_bytes} B)"

    # (b) the data really is mesh-distributed
    arr = sharded._data
    shards = arr.addressable_shards
    assert len(shards) == 8
    expect_tile = (shape[0], shape[1] // 2, shape[2] // 4)
    assert all(s.data.shape == expect_tile for s in shards)
    assert len({s.device for s in shards}) == 8

    # 40 arcsec target on 2-arcsec pixels: sigma ~8.5 px, so the halo
    # (34 px) exceeds the 24-px x-tiles and the convolution exercises the
    # reshard + spectral-multiply path (bare Beam floats are radians)
    beam = Beam(Quantity(40.0, "arcsec"), Quantity(40.0, "arcsec"), 0.0)
    noise = Quantity(0.28, sharded.unit)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = run_pipeline(sharded, mesh, snr_threshold=1.0,
                           target_beam=beam, noise_estimate=noise)

        # single-device chain on the conventionally-read cube
        cube = SpectralCube.read(str(p)).with_fill_value(np.nan)
        conv = cube.convolve_to(beam)
        masked = conv.with_mask(conv > Quantity(float(noise.value),
                                                conv.unit))
        m0 = np.asarray(masked.moment0().value)
        m1 = np.asarray(masked.moment1().value)
        lw = np.asarray(masked.linewidth_sigma().value)
        st = masked.statistics()

    m0s, m1s, lws = (np.asarray(x.value) for x in res["moments"])
    # (a) sharded == single-device (same f32 kernels; the halo-exchange
    # convolution and psum statistics must agree to float roundoff)
    np.testing.assert_allclose(m0s, m0, rtol=3e-5, atol=1e-6)
    fin = np.isfinite(m1)
    assert np.array_equal(np.isfinite(m1s), fin)
    np.testing.assert_allclose(m1s[fin], m1[fin], rtol=3e-5, atol=1e-4)
    finw = np.isfinite(lw)
    np.testing.assert_allclose(lws[finw], lw[finw], rtol=1e-4, atol=1e-4)
    sts = res["statistics"]
    for key in ("npts", "mean", "sigma", "sum", "max", "min"):
        np.testing.assert_allclose(float(sts[key]), float(st[key]),
                                   rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# sharded reproject (the pipeline's last stage)
# ---------------------------------------------------------------------------
def _offset_mapping(ny, nx, dy=0.37, dx=0.61):
    ys = np.broadcast_to(np.arange(ny, dtype=np.float64)[:, None] + dy,
                         (ny, nx)).copy()
    xs = np.broadcast_to(np.arange(nx, dtype=np.float64)[None, :] + dx,
                         (ny, nx)).copy()
    return ys, xs


def test_sharded_reproject_halo_matches_unsharded(cmesh, big_cube):
    """Separable offset mapping: the halo strategy must agree with the
    unsharded resample (NaN poisoning and out-of-range NaN included) and
    compile to ppermute halo exchange only — zero all-to-alls."""
    from spectral_cube_tpu.parallel.sharded import sharded_reproject
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    data, _, _ = big_cube
    nchan, ny, nx = data.shape
    zs = np.arange(nchan, dtype=np.float64)
    ys, xs = _offset_mapping(ny, nx)
    expected = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    got = np.asarray(sharded_reproject(data, zs, ys, xs, cmesh, order=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               equal_nan=True)

    txt = jax.jit(lambda d: sharded_reproject(
        d, zs, ys, xs, cmesh, order=1)).lower(
            cmesh.shard(jnp.asarray(data), "spatial")).compile().as_text()
    assert "collective-permute" in txt
    assert "all-to-all" not in txt
    assert "all-gather" not in txt


def test_sharded_reproject_reshard_rotated(cmesh, big_cube):
    """Rotated (non-separable) mapping: the reshard strategy must agree
    with the unsharded gather path and compile to explicit all-to-alls —
    never the GSPMD replicate-and-slice all-gather."""
    from spectral_cube_tpu.parallel.sharded import sharded_reproject
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    data, _, _ = big_cube
    nchan, ny, nx = data.shape
    zs = np.arange(nchan, dtype=np.float64)
    theta = np.deg2rad(3.0)
    c, s = np.cos(theta), np.sin(theta)
    yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float64)
    cy, cx = (ny - 1) / 2.0, (nx - 1) / 2.0
    ys = c * (yy - cy) - s * (xx - cx) + cy
    xs = s * (yy - cy) + c * (xx - cx) + cx
    expected = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    got = np.asarray(sharded_reproject(data, zs, ys, xs, cmesh, order=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               equal_nan=True)

    txt = jax.jit(lambda d: sharded_reproject(
        d, zs, ys, xs, cmesh, order=1)).lower(
            cmesh.shard(jnp.asarray(data), "spatial")).compile().as_text()
    assert "all-to-all" in txt
    assert "all-gather" not in txt, \
        "sharded reproject fell back to replicate-and-slice"


def test_sharded_reproject_spectral_mapping(cmesh, big_cube):
    """Non-identity spectral mapping (2x channel regrid with out-of-range
    tail) combined with a spatial offset."""
    from spectral_cube_tpu.parallel.sharded import sharded_reproject
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    data, _, _ = big_cube
    nchan, ny, nx = data.shape
    zs = np.arange(20, dtype=np.float64) * 0.5 + 0.25   # beyond nchan-1
    ys, xs = _offset_mapping(ny, nx, dy=-0.5, dx=1.25)
    expected = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    got = np.asarray(sharded_reproject(data, zs, ys, xs, cmesh, order=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               equal_nan=True)


def test_sharded_reproject_order0(cmesh, big_cube):
    """Nearest-neighbor order falls to the reshard strategy and matches."""
    from spectral_cube_tpu.parallel.sharded import sharded_reproject
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    data, _, _ = big_cube
    nchan, ny, nx = data.shape
    zs = np.arange(nchan, dtype=np.float64)
    ys, xs = _offset_mapping(ny, nx)
    expected = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 0))
    got = np.asarray(sharded_reproject(data, zs, ys, xs, cmesh, order=0))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               equal_nan=True)


def test_sharded_cube_reproject_header(tmp_path, cmesh):
    """ShardedCube.reproject(target_header) == cube.reproject (the
    pipeline's last stage, now SPMD end to end)."""
    path, _ = make_cube_file(tmp_path, name="srep.fits", shape=(6, 16, 16))
    cube = SpectralCube.read(path)
    hdr = cube.header
    hdr["CRVAL1"] = float(hdr["CRVAL1"]) + 0.3 * float(hdr["CDELT1"])
    hdr["CRVAL2"] = float(hdr["CRVAL2"]) + 0.6 * float(hdr["CDELT2"])
    expected = cube.reproject(hdr)
    got = ShardedCube(cube, cmesh).reproject(hdr)
    np.testing.assert_allclose(
        np.asarray(got.cube.unmasked_data[:].value),
        np.asarray(expected.unmasked_data[:].value),
        rtol=1e-5, atol=1e-6, equal_nan=True)
    assert got.cube.wcs.check_equality(expected.wcs, wcs_tolerance=1e-9)


def test_sharded_reproject_resizing_halo(cmesh, big_cube):
    """Rectangular (downsampling) separable mapping: per-tile blocks with
    different output/input tile sizes still agree with the unsharded
    path."""
    from spectral_cube_tpu.parallel.sharded import sharded_reproject
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    data, _, _ = big_cube
    nchan, ny, nx = data.shape
    zs = np.arange(nchan, dtype=np.float64)
    ny_out, nx_out = ny // 2, nx // 2
    ys = np.broadcast_to(
        np.arange(ny_out, dtype=np.float64)[:, None] * 2 + 0.25,
        (ny_out, nx_out)).copy()
    xs = np.broadcast_to(
        np.arange(nx_out, dtype=np.float64)[None, :] * 2 + 0.75,
        (ny_out, nx_out)).copy()
    expected = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    got = np.asarray(sharded_reproject(data, zs, ys, xs, cmesh, order=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               equal_nan=True)


def test_sharded_reproject_beyond_halo_falls_to_reshard(cmesh, big_cube):
    """A displacement beyond one-neighbor reach must take the reshard
    strategy (and still match); the compiled program contains
    all-to-alls, not a GSPMD all-gather."""
    from spectral_cube_tpu.parallel.sharded import sharded_reproject
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    data, _, _ = big_cube
    nchan, ny, nx = data.shape
    zs = np.arange(nchan, dtype=np.float64)
    # x tiles are nx/4 = 8 cols on the 2x4 mesh; a 20-col shift reaches
    # two tiles away (h = 24 > px = 8), beyond ppermute's one-neighbor
    # halo (a 20-ROW shift on the 12-row y tiles is exactly reachable,
    # h = 12 = py, and stays on the halo path)
    ys, xs = _offset_mapping(ny, nx, dy=0.37, dx=-20.0)
    expected = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    got = np.asarray(sharded_reproject(data, zs, ys, xs, cmesh, order=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7,
                               equal_nan=True)
    txt = jax.jit(lambda d: sharded_reproject(
        d, zs, ys, xs, cmesh, order=1)).lower(
            cmesh.shard(jnp.asarray(data), "spatial")).compile().as_text()
    assert "all-to-all" in txt
    assert "all-gather" not in txt
