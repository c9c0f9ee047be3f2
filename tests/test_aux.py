"""Auxiliary subsystems: persistence, streaming sharded loader, profiling,
huge-op guards, WCS utilities."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, Quantity
from spectral_cube_tpu.persistence import (save_cube, load_cube,
                                           checkpoint_to_tmp_dir)
from spectral_cube_tpu.parallel import CubeMesh

from conftest import make_cube_file, make_vr_cube_file


def test_save_load_roundtrip(tmp_path, cube_adv):
    cube, data = cube_adv
    store = str(tmp_path / "store")
    save_cube(cube, store)
    back = load_cube(store)
    np.testing.assert_allclose(np.asarray(back.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-7)
    assert back.unit == cube.unit
    assert back.wcs.check_equality(cube.wcs, wcs_tolerance=1e-9)
    assert back.beam == cube.beam


def test_save_load_vr(tmp_path, cube_vr):
    cube, data = cube_vr
    store = str(tmp_path / "vr_store")
    save_cube(cube, store)
    back = load_cube(store)
    assert len(back.unmasked_beams) == 4
    assert back.unmasked_beams[1] == cube.unmasked_beams[1]


def test_checkpoint_applies_mask_and_cleans_up(cube_adv):
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.5 * u.Jy / u.beam)
    ck = masked.checkpoint()
    vals = np.asarray(ck.unmasked_data[:].value)
    expected = np.where(np.isfinite(data) & (data > 0.5), data, np.nan)
    np.testing.assert_allclose(vals, expected, equal_nan=True, rtol=1e-6)


def test_streaming_sharded_loader(tmp_path):
    from spectral_cube_tpu.io.streaming import read_sharded_cube
    path, data = make_cube_file(tmp_path, shape=(8, 16, 16))
    cmesh = CubeMesh()
    cube = read_sharded_cube(path, cmesh)
    assert cube.shape == (8, 16, 16)
    # the data is distributed over the mesh
    assert len(cube._data.sharding.device_set) == cmesh.n_devices
    np.testing.assert_allclose(np.asarray(cube.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-6)
    # and ops run on it directly
    m0 = cube.moment0()
    assert m0.shape == (16, 16)


def test_streaming_matches_eager(tmp_path):
    from spectral_cube_tpu.io.streaming import read_sharded_cube
    path, data = make_cube_file(tmp_path, shape=(4, 8, 8))
    eager = SpectralCube.read(path)
    sharded = read_sharded_cube(path, CubeMesh())
    np.testing.assert_allclose(
        np.asarray(sharded.unmasked_data[:].value),
        np.asarray(eager.unmasked_data[:].value), equal_nan=True)


def test_op_timer():
    from spectral_cube_tpu.profiling import OpTimer
    timer = OpTimer()
    x = jnp.ones((64, 64))
    t = timer.time("square", lambda v: v * v, x)
    assert t >= 0
    assert "square" in timer.report()


def test_progress_callback():
    from spectral_cube_tpu.profiling import ProgressCallback
    hits = []
    cb = ProgressCallback(10, update_function=lambda: hits.append(1))
    for _ in range(10):
        cb()
    assert cb.count == 10 and len(hits) == 10


def test_huge_operation_guard(tmp_path, monkeypatch):
    import spectral_cube_tpu.utils as utils_mod
    path, data = make_cube_file(tmp_path)
    cube = SpectralCube.read(path)
    monkeypatch.setattr(utils_mod, "MEMORY_THRESHOLD", 10)
    assert cube.size > 10
    # _is_huge reads cube_utils.MEMORY_THRESHOLD (the reference's knob)
    monkeypatch.setattr("spectral_cube_tpu.cube_utils.MEMORY_THRESHOLD", 10)
    with pytest.raises(ValueError):
        cube.reproject(cube.header)
    cube.allow_huge_operations = True
    out = cube.reproject(cube.header)
    assert out.shape == cube.shape


def test_add_stokes_axis(cube_adv):
    cube, _ = cube_adv
    w4 = cube.wcs.add_stokes_axis(3)
    assert w4.naxis == 4
    assert w4.ctype[3] == "STOKES"
    assert w4.spec == 2


def test_pixel_axis_correlation(cube_adv):
    cube, _ = cube_adv
    w = cube.wcs
    # spectral pixel axis is uncorrelated; celestial ones are (SIN proj)
    assert not w.is_pixel_axis_correlated(2)
    assert w.is_pixel_axis_correlated(0)


def test_flattened_world(cube_adv):
    cube, _ = cube_adv
    spec, lat, lon = cube.flattened_world()
    assert spec.size == cube.size
    assert lat.size == cube.size


def test_read_from_hdu_object(cube_adv):
    cube, data = cube_adv
    hdu = cube.hdu
    back = SpectralCube.read(hdu)
    np.testing.assert_allclose(np.asarray(back.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-7)


def test_to_sharded_facade(tmp_path):
    path, data = make_cube_file(tmp_path, shape=(8, 16, 16))
    cube = SpectralCube.read(path)
    sc = cube.to_sharded()
    m0, m1, m2 = sc.moment_maps()
    assert m0.shape == (16, 16)
    original_cube = sc.cube
    sc2 = sc.rechunk("spectral")
    # rechunk never mutates: the original ShardedCube keeps its layout
    assert sc2 is not sc
    assert sc.cube is original_cube
    m0b, _, _ = sc2.rechunk("spatial").moment_maps()
    np.testing.assert_allclose(np.asarray(m0b.value), np.asarray(m0.value),
                               rtol=1e-6, equal_nan=True)


def test_device_memory_stats():
    from spectral_cube_tpu.profiling import device_memory_stats
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_use_dask_shards_over_devices(tmp_path):
    """read(use_dask=True) distributes data over all devices and all cube
    ops keep working (GSPMD auto-partitioning)."""
    path, data = make_cube_file(tmp_path, shape=(8, 16, 16))
    cube = SpectralCube.read(path, use_dask=True)
    assert len(cube._data.sharding.device_set) == len(jax.devices())
    m0 = cube.moment0()
    ref = SpectralCube.read(path).moment0()
    np.testing.assert_allclose(np.asarray(m0.value), np.asarray(ref.value),
                               rtol=1e-5, equal_nan=True)
    st = cube.statistics()
    assert st["npts"] == np.isfinite(data).sum()


def test_sharded_checkpoint_restore(tmp_path):
    """Sharded save writes one file per shard and NO full data.npy;
    restore feeds each device its own shard without a host-global array
    (the analog of reference test_performance.py:128-201)."""
    from spectral_cube_tpu.io.streaming import read_sharded_cube
    path, data = make_cube_file(tmp_path, shape=(8, 16, 16))
    cmesh = CubeMesh()
    if cmesh.n_devices < 2:
        pytest.skip("sharded persistence needs a multi-device mesh")
    cube = read_sharded_cube(path, cmesh)
    store = str(tmp_path / "sharded_store")
    save_cube(cube, store)
    files = os.listdir(store)
    assert "data.npy" not in files
    n_shards = sum(f.startswith("shard_") for f in files)
    assert n_shards == cmesh.n_devices
    back = load_cube(store, cmesh=cmesh)
    # restored array is sharded over the same mesh
    assert len(back._data.sharding.device_set) == cmesh.n_devices
    np.testing.assert_allclose(np.asarray(back.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-6)
    # per-device shards match byte-for-byte
    for sh in back._data.addressable_shards:
        orig = [s for s in cube._data.addressable_shards
                if s.device == sh.device][0]
        np.testing.assert_array_equal(np.asarray(sh.data),
                                      np.asarray(orig.data))


def test_streaming_spectral_layout_native_decode(tmp_path):
    """Spectral-layout ingest takes the channel-contiguous native decode
    path (native/fits_decode.cpp wired into streaming tiles)."""
    from spectral_cube_tpu.io.streaming import read_sharded_cube
    path, data = make_cube_file(tmp_path, shape=(16, 8, 8))
    cmesh = CubeMesh()
    cube = read_sharded_cube(path, cmesh, layout="spectral")
    np.testing.assert_allclose(np.asarray(cube.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-7)
    for sh in cube._data.addressable_shards:
        assert np.asarray(sh.data).shape == (16 // cmesh.n_devices, 8, 8)


def test_make_rgb_movie_frames(tmp_path, monkeypatch):
    """Channel-movie frame rendering (reference visualization-tools);
    ffmpeg assembly is stubbed out (not installed here)."""
    import spectral_cube_tpu.visualization_tools as vt
    path, data = make_cube_file(tmp_path, shape=(8, 6, 6))
    cube = SpectralCube.read(path)
    monkeypatch.setattr(vt, "check_ffmpeg", lambda *a, **k: None)
    calls = []
    monkeypatch.setattr(vt.subprocess, "run",
                        lambda *a, **k: calls.append(a))
    sv = cube.spectral_axis
    frames = vt.make_rgb_movie(
        cube, str(tmp_path / "mov"),
        Quantity(float(np.asarray(sv.value)[0]), sv.unit),
        Quantity(float(np.asarray(sv.value)[-1]), sv.unit))
    assert len(frames) == 6
    for f in frames:
        assert os.path.exists(f)
    assert len(calls) == 1  # ffmpeg invoked once


def test_mask_array_properties():
    """ndim/size/dtype on masks (reference masks.py:257-266)."""
    from spectral_cube_tpu.masks import BooleanArrayMask
    m = BooleanArrayMask(np.ones((4, 3, 2), bool), shape=(4, 3, 2))
    assert m.ndim == 3
    assert m.size == 24
    assert m.dtype == np.dtype(bool)


def test_get_chunks_matches_reference_splits():
    from spectral_cube_tpu.analysis_utilities import get_chunks
    # the reference's split points are [chunk*i for i in range(n//chunk)],
    # so the LAST chunk absorbs the remainder: (10, 4) -> [4, 6]
    chunks = get_chunks(10, 4)
    assert [len(c) for c in chunks] == [4, 6]
    assert np.concatenate(chunks).tolist() == list(range(10))
    assert [len(c) for c in get_chunks(8, 8)] == [8]
    assert [len(c) for c in get_chunks(12, 4)] == [4, 4, 4]


def test_sharded_display(tmp_path, capsys):
    from spectral_cube_tpu import SpectralCube
    from spectral_cube_tpu.parallel import ShardedCube
    from conftest import make_cube_file
    path, _ = make_cube_file(tmp_path, shape=(4, 8, 8))
    sc = ShardedCube(SpectralCube.read(path))
    sharding = sc.display_dask_array()
    out = capsys.readouterr().out
    assert "mesh=" in out and "shape=(4, 8, 8)" in out
    assert sharding is not None


def test_enable_compilation_cache(tmp_path):
    import jax
    from spectral_cube_tpu import enable_compilation_cache
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = enable_compilation_cache(str(tmp_path / "xla"))
        assert jax.config.jax_compilation_cache_dir == path
        import os
        assert os.path.isdir(path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_save_load_restores_fill_value(tmp_path, cube_adv):
    """load_cube restores the saved fill_value (meta carries it; the
    constructors must receive it, not default back to NaN)."""
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.5 * u.Jy / u.beam).with_fill_value(0.0)
    store = str(tmp_path / "fv_store")
    save_cube(masked, store)
    back = load_cube(store)
    filled = np.asarray(back.filled_data[:].value)
    excluded = ~(np.isfinite(data) & (data > 0.5))
    assert excluded.any()
    assert np.all(filled[excluded] == 0.0)


def test_save_cube_without_mask_spills_raw_data(tmp_path, cube_adv):
    """include_mask=False spills the raw unmasked data: masked-but-finite
    values survive the roundtrip instead of being folded into NaN."""
    cube, data = cube_adv
    masked = cube.with_mask(cube > 0.5 * u.Jy / u.beam)
    store = str(tmp_path / "raw_store")
    save_cube(masked, store, include_mask=False)
    back = load_cube(store)
    np.testing.assert_allclose(np.asarray(back.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-7)


def test_replicated_layout_saves_each_shard_once(tmp_path):
    """A replicated sharded array presents every device's shard with the
    same index — save_cube writes ONE file, and restore still works."""
    from spectral_cube_tpu import SpectralCube

    cmesh = CubeMesh()
    if cmesh.n_devices < 2:
        pytest.skip("needs a multi-device mesh")
    path, data = make_cube_file(tmp_path, shape=(4, 8, 8), with_nan=False)
    cube = SpectralCube.read(str(path))
    arr = jax.device_put(jnp.asarray(np.asarray(cube.unmasked_data[:].value)),
                         cmesh.sharding("replicated"))
    rep = cube._new_cube_with(data=arr)
    store = str(tmp_path / "rep_store")
    save_cube(rep, store)
    files = [f for f in os.listdir(store) if f.startswith("shard_")]
    assert len(files) == 1, files
    back = load_cube(store, cmesh=cmesh)
    np.testing.assert_allclose(np.asarray(back.unmasked_data[:].value),
                               data, equal_nan=True, rtol=1e-6)


def test_warn_slow_emits_possibly_slow_warning(cube_adv):
    """Non-huge whole-cube materializations warn PossiblySlowWarning
    (reference utils.py:68-73); the wrapper must not mutate the global
    warning-filter state."""
    import warnings
    from spectral_cube_tpu.utils import PossiblySlowWarning
    cube, _ = cube_adv
    n_before = len(warnings.filters)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cube.filled()
    assert any(isinstance(r.message, PossiblySlowWarning) for r in rec)
    assert len(warnings.filters) == n_before


def test_plot_channel_maps_renders(cube_adv):
    """plot_channel_maps draws a grid of channel images (reference
    spectral_cube.py:3559-3687); exercised with the Agg backend."""
    import matplotlib
    matplotlib.use("Agg")
    cube, _ = cube_adv
    out = cube.plot_channel_maps(2, 2, [0, 1, 2, 3])
    assert out is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_rgb_movie_frames(tmp_path, cube_adv):
    """make_rgb_movie / make_multispecies_rgb render per-channel RGB PNG
    frames (reference visualization-tools.py); mp4 assembly is exercised
    only when ffmpeg exists."""
    import shutil
    import matplotlib
    matplotlib.use("Agg")
    from spectral_cube_tpu import visualization_tools as vt
    cube, _ = cube_adv
    v1 = cube.spectral_axis[0]
    v2 = cube.spectral_axis[-1]
    prefix = str(tmp_path / "mov")
    if shutil.which("ffmpeg") is None:
        with pytest.raises(OSError):
            vt.make_rgb_movie(cube, prefix, v1, v2)
        return
    frames = vt.make_rgb_movie(cube, prefix, v1, v2)
    assert frames and all(os.path.exists(f) for f in frames)
    assert os.path.exists(prefix + ".mp4")


def test_quicklook_paths(cube_adv):
    """Projection.quicklook accepts the aplpy flags (falling back to
    matplotlib), mask quicklook renders a view, and OneDSpectrum
    quicklook plots/saves (reference test_visualization.py + ldo
    quicklook, lower_dimensional_structures.py:413-440, :719-738)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import tempfile
    cube, _ = cube_adv
    mom0 = cube.moment0()
    assert mom0.quicklook(use_aplpy=False) is not None
    assert mom0.quicklook(use_aplpy=True) is not None  # matplotlib fallback
    cube.mask.quicklook(view=(0, slice(None), slice(None)))
    with tempfile.TemporaryDirectory() as td:
        f = os.path.join(td, "spec.png")
        cube[:, 0, 0].quicklook(filename=f)
        assert os.path.exists(f)
    plt.close("all")


def test_utils_module_surface():
    """Reference utils.py free functions/exceptions exist here too:
    ProgressBar (utils.py:15), computed_quantity (:19), NoBeamError /
    BeamUnitsError (:131-136); Jy/beam smoothing raises BeamUnitsError
    specifically (base_class.py:116-140)."""
    import numpy as np
    import pytest
    from spectral_cube_tpu.utils import (ProgressBar, computed_quantity,
                                         NoBeamError, BeamUnitsError)
    p = ProgressBar(3)
    p.update()
    p.close()
    q = computed_quantity(np.ones(3), "K")
    assert str(q.unit) == "K"
    assert issubclass(BeamUnitsError, Exception)
    assert issubclass(NoBeamError, Exception)


def test_jybeam_smoothing_raises_beam_units_error(cube_adv):
    import pytest
    from spectral_cube_tpu.utils import BeamUnitsError
    from spectral_cube_tpu.convolution import Gaussian2DKernel
    cube, _ = cube_adv  # Jy/beam cube
    with pytest.raises(BeamUnitsError):
        cube.spatial_smooth(Gaussian2DKernel(1.5))
    # override still works
    out = cube.spatial_smooth(Gaussian2DKernel(1.5), raise_error_jybm=False)
    assert out.shape == cube.shape


# ---------------------------------------------------------------------------
# reference test_dask.py escape-hatch battery (dask-API compat shims)
# ---------------------------------------------------------------------------

def test_apply_function_parallel_spectral_noncube(tmp_path):
    """reference test_dask.py:144-169: return_new_cube=False with
    accepts_chunks and dask layout kwargs (drop_axis/chunks consumed)."""
    from ref_fixtures import cube_and_raw
    cube, data = cube_and_raw(tmp_path, "nc.fits")
    cube = cube.rechunk(chunks=(-1, 1, 2))
    test = cube.apply_function_parallel_spectral(
        lambda c: c.sum(0), return_new_cube=False, accepts_chunks=True,
        drop_axis=[0], chunks=(1, 2))
    arr = np.asarray(test)
    assert arr.shape == cube.shape[1:]
    np.testing.assert_allclose(arr, np.asarray(cube.sum(axis=0).value),
                               rtol=1e-6)


def test_apply_function_parallel_spectral_noncube_withblockinfo(tmp_path):
    """reference test_dask.py:172-226: functions taking block_info get a
    dask-style array-location dict."""
    from ref_fixtures import cube_and_raw
    cube, data = cube_and_raw(tmp_path, "bi.fits")
    comparison = np.asarray(cube.sum(axis=0).value)

    def f(chunk, block_info=None, comparison_array=None):
        assert block_info is not None
        loc = [br[0] for br in block_info[0]["array-location"]]
        assert len(loc) == 3
        s = chunk.sum(0)
        sl = (slice(loc[1], loc[1] + s.shape[0]),
              slice(loc[2], loc[2] + s.shape[1]))
        return np.isclose(np.asarray(s), comparison_array[sl], rtol=1e-6)

    out = cube.apply_function_parallel_spectral(
        f, return_new_cube=False, accepts_chunks=True,
        comparison_array=comparison, drop_axis=[0], chunks=(1, 2))
    assert np.all(np.asarray(out))


def test_apply_function_parallel_shape():
    """reference test_dask.py:229-257 (regression 772): extra kwargs
    reach the function; use_dask_scheduler context works."""
    ref = "/root/reference/spectral_cube/tests/data/example_cube.fits"
    if not os.path.exists(ref):
        pytest.skip("reference example cube not available")
    cube = SpectralCube.read(ref)

    def func(x, add=None):
        if add is None:
            raise ValueError("add required")
        return x + add

    for ac in (True, False):
        r = cube.apply_function_parallel_spectral(func, add=1,
                                                  accepts_chunks=ac)
        np.testing.assert_allclose(
            np.asarray(r.filled_data[:].value),
            np.asarray(cube.filled_data[:].value) + 1,
            rtol=1e-6, equal_nan=True)
    with cube.use_dask_scheduler("threads", num_workers=4):
        cube.apply_function_parallel_spectral(func, add=1)


def test_op_timer_loop_reps_and_rtt():
    """loop_reps>1 wraps the op in one fori_loop jit (the tunnel-RTT
    amortization path) and subtracts the measured dispatch RTT."""
    from spectral_cube_tpu.profiling import OpTimer
    timer = OpTimer()
    rtt = timer.measure_dispatch_rtt()
    assert rtt >= 0
    x = jnp.ones((32, 32))
    t = timer.time("matmul", lambda v: v @ v, x, loop_reps=3)
    assert t >= 0
    rec = timer.records["matmul"]
    assert rec.calls == 1 and rec.best_s == t
    assert rec.mean_s == pytest.approx(t)
    # report renders one line per op with ms figures
    rep = timer.report()
    assert "matmul" in rep and "ms" in rep


def test_profiler_trace_context(tmp_path):
    """trace() produces a TensorBoard-compatible trace directory."""
    from spectral_cube_tpu.profiling import trace
    logdir = str(tmp_path / "trace")
    with trace(logdir) as d:
        np.asarray(jax.jit(lambda v: v + 1)(jnp.ones(16)))
    assert d == logdir
    found = [f for root, _, files in os.walk(logdir) for f in files]
    assert found  # profiler wrote something


def test_progress_callback_stream():
    import io
    from spectral_cube_tpu.profiling import ProgressCallback
    buf = io.StringIO()
    cb = ProgressCallback(4, desc="work", stream=buf)
    for _ in range(4):
        cb()
    cb.close()
    out = buf.getvalue()
    assert "work" in out and "100.0%" in out and out.endswith("\n")


def test_make_multispecies_rgb(tmp_path, monkeypatch):
    """Three co-gridded cubes combine channelwise into RGB frames."""
    import spectral_cube_tpu.visualization_tools as vt
    paths = [make_cube_file(tmp_path, name=f"c{i}.fits", shape=(6, 5, 5),
                            seed=i)[0] for i in range(3)]
    cr, cg, cb_ = [SpectralCube.read(p) for p in paths]
    monkeypatch.setattr(vt, "check_ffmpeg", lambda *a, **k: None)
    calls = []
    monkeypatch.setattr(vt.subprocess, "run",
                        lambda *a, **k: calls.append(a))
    sv = cr.spectral_axis
    frames = vt.make_multispecies_rgb(
        cr, cg, cb_, str(tmp_path / "multi"),
        Quantity(float(np.asarray(sv.value)[1]), sv.unit),
        Quantity(float(np.asarray(sv.value)[-2]), sv.unit))
    assert len(frames) == 4
    import matplotlib.image
    img = matplotlib.image.imread(frames[0])
    assert img.shape[:2] == (5, 5)
    assert len(calls) == 1
