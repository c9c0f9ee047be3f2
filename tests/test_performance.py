"""Performance/memory regression analogs (reference test_performance.py
asserts tracemalloc bounds; here the invariants are device-memory shape and
fusion properties)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, Quantity

from conftest import make_cube_file


def test_world_coordinates_are_plane_sized(tmp_path):
    """The world property must not allocate O(cube) host memory for the
    coordinate grids (reference test_memory_usage_coordinates,
    test_performance.py:204-241): broadcasting keeps base arrays small."""
    path, _ = make_cube_file(tmp_path, shape=(32, 16, 16))
    cube = SpectralCube.read(path)
    spec, lat, lon = cube.world[:, :, :]
    # broadcast views share a plane/vector-sized base buffer
    assert np.asarray(lat.value).base is not None
    assert np.asarray(lat.value).base.nbytes <= 16 * 16 * 8 * 2


def test_mask_not_materialized_by_reductions(tmp_path):
    """Reductions over a lazily-masked cube must not allocate a bool cube
    on the host (mask fusion; the analog of the reference's memmap RAM
    bound at test_performance.py:36-73)."""
    path, data = make_cube_file(tmp_path, shape=(16, 16, 16))
    cube = SpectralCube.read(path)
    masked = cube.with_mask(cube > 0.3 * u.Jy / u.beam)
    # the jaxpr of the fused reduction contains no host callbacks and the
    # mask lives only as ops inside the trace
    traced = jax.make_jaxpr(
        lambda d: jnp.sum(jnp.where(
            masked._mask.include(data=d) & jnp.isfinite(d), d, 0)))(
                masked._device_data)
    # no host callbacks inside the fused reduction
    assert "callback" not in str(traced.eqns).lower()
    out = masked.sum()
    assert np.isfinite(float(out.value))


def test_moments_single_fused_program(tmp_path):
    """All three moments come from one compiled program (not three passes
    over HBM): the cached sufficient statistics are shared."""
    path, _ = make_cube_file(tmp_path, shape=(16, 8, 8))
    cube = SpectralCube.read(path)
    m0 = cube.moment0()
    # the second/third moment reuse the cached pass
    cache = getattr(cube, "_cache__moments012")
    assert len(cache) == 1
    m1 = cube.moment1()
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m2 = cube.moment2()
    assert len(cache) == 1


def test_streaming_loader_tiles_not_full_cube(tmp_path):
    """The sharded loader must fault in tiles, never np.asarray the whole
    memmap (checked structurally: each device's shard matches its index)."""
    from spectral_cube_tpu.io.streaming import read_sharded_cube
    from spectral_cube_tpu.parallel import CubeMesh
    path, data = make_cube_file(tmp_path, shape=(8, 16, 16))
    cmesh = CubeMesh()
    cube = read_sharded_cube(path, cmesh)
    for shard in cube._data.addressable_shards:
        expected = data[shard.index]
        np.testing.assert_allclose(np.asarray(shard.data), expected,
                                   rtol=1e-6, equal_nan=True)


def test_pipeline_end_to_end(tmp_path):
    from spectral_cube_tpu.pipeline import run_pipeline
    from conftest import make_vr_cube_file
    path, data = make_vr_cube_file(tmp_path, shape=(8, 16, 16))
    cube = SpectralCube.read(path)
    out = run_pipeline(cube, snr_threshold=0.5)
    m0, m1, lw = out["moments"]
    assert m0.shape == (16, 16)
    assert out["statistics"]["npts"] > 0
    # VR cube was convolved to its common beam -> single-beam cube out
    from spectral_cube_tpu import SpectralCube as SC
    assert isinstance(out["cube"], SC)
    assert out["cube"].beam is not None


def test_pipeline_with_reproject(tmp_path):
    from spectral_cube_tpu.pipeline import run_pipeline
    path, data = make_cube_file(tmp_path, shape=(4, 12, 12))
    cube = SpectralCube.read(path)
    out = run_pipeline(cube, target_beam=None,
                       target_header=cube.header)
    got = np.asarray(out["cube"].unmasked_data[:].value)
    np.testing.assert_allclose(got, data, rtol=1e-5, equal_nan=True)


def test_moments_jit_cache_reused_across_cubes(tmp_path):
    """Fresh cubes of the same shape/mask structure reuse one compiled
    program (the 0.5-1 s/call retrace regression)."""
    from spectral_cube_tpu.ops import moments as mom
    import spectral_cube_tpu.units as u
    mom._MOMENTS_JIT_CACHE.clear()
    path, _ = make_cube_file(tmp_path, shape=(8, 8, 8))
    for i in range(3):
        cube = SpectralCube.read(path)
        masked = cube.with_mask(cube > 0.3 * u.Jy / u.beam)
        masked.moment0()
    assert len(mom._MOMENTS_JIT_CACHE) == 1


def test_compare_pix_size_approaches(tmp_path):
    """reference test_performance.py:50-59: the per-pixel _pix_size arrays
    agree with the scalar _pix_size_slice approximations."""
    from test_ref_values import moment_cube_path
    sc = SpectralCube.read(moment_cube_path(tmp_path))
    sa, ya, xa = sc._pix_size()
    s, y, x = (sc._pix_size_slice(i) for i in range(3))
    np.testing.assert_allclose(np.asarray(sa), s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ya), y, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(xa), x, rtol=1e-4)


def test_pix_cen(tmp_path):
    """reference test_performance.py:62-73: _pix_cen returns a 1-D
    spectral spine plus 2-D lat/lon planes (never cube-sized arrays)."""
    from test_ref_values import moment_cube_path
    sc = SpectralCube.read(moment_cube_path(tmp_path))
    s, y, x = sc._pix_cen()
    assert np.shape(s) == (sc.shape[0],)
    assert np.shape(y) == sc.shape[1:]
    assert np.shape(x) == sc.shape[1:]
