"""Deterministic degenerate/awkward-shape battery.

The fuzz chains explore random shapes >= 4 per axis; these pin the
corners they never reach — single-channel cubes, single-spaxel cubes,
prime extents — against float64 numpy oracles.  The reference's fixture
factory exercises tiny 4x3x2 cubes everywhere, so a user hitting a
1-channel slab or a 1-pixel strip expects every reduction to work.
"""

import warnings

import numpy as np
import pytest

from conftest import make_cube_file
from spectral_cube_tpu import SpectralCube
from spectral_cube_tpu.units import Quantity


@pytest.mark.parametrize("shape", [(1, 5, 7), (97, 1, 1), (2, 1, 9),
                                   (3, 7, 1), (1, 1, 1)])
def test_reductions_on_degenerate_shapes(tmp_path, shape):
    path, data = make_cube_file(tmp_path, name="deg.fits", shape=shape,
                                with_nan=False)
    cube = SpectralCube.read(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m0 = np.asarray(cube.moment0().value)
        if shape[0] > 1:
            dx = abs(float(cube.spectral_axis.value[1]
                           - cube.spectral_axis.value[0]))
            np.testing.assert_allclose(m0, np.nansum(data, axis=0) * dx,
                                       rtol=2e-5, atol=1e-7)
        else:
            # single channel: moment0 = data * |CDELT| — proportionality
            # with one consistent positive channel width
            ratio = m0 / data[0]
            assert ratio.flat[0] > 0
            np.testing.assert_allclose(ratio, ratio.flat[0], rtol=2e-5)
        assert float(cube.max().value) == pytest.approx(data.max(),
                                                        rel=1e-6)
        st = cube.statistics()
        assert int(st["npts"]) == data.size
        assert float(st["mean"].value) == pytest.approx(data.mean(),
                                                        rel=1e-5)
        med = cube.median(axis=0)
        np.testing.assert_allclose(np.asarray(med.value),
                                   np.median(data, axis=0), rtol=1e-6)
        flat = cube.flattened()
        assert flat.size == data.size


@pytest.mark.parametrize("shape", [(1, 5, 7), (2, 1, 9)])
def test_transforms_on_degenerate_shapes(tmp_path, shape):
    path, data = make_cube_file(tmp_path, name="deg2.fits", shape=shape,
                                with_nan=False)
    cube = SpectralCube.read(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sm = cube.spatial_smooth(np.ones((3, 3)) / 9.0,
                                 raise_error_jybm=False)
        assert sm.shape == cube.shape
        out = cube.sigma_clip_spectrally(3.0)
        # 1-2 samples per spaxel: nothing can be clipped
        np.testing.assert_allclose(np.asarray(out.filled_data[:]), data,
                                   rtol=1e-6)
        k = cube.to("K")
        assert k.shape == cube.shape
        rp = cube.reproject(cube.header)
        np.testing.assert_allclose(np.asarray(rp.filled_data[:]), data,
                                   rtol=2e-4, atol=1e-6)


def test_prime_extents_roundtrip(tmp_path):
    """Prime sizes never align with tiles/lanes; the kernels must not
    assume divisibility."""
    path, data = make_cube_file(tmp_path, name="prime.fits",
                                shape=(13, 11, 7), with_nan=False)
    cube = SpectralCube.read(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = cube.with_mask(cube > Quantity(0.4, cube.unit))
        inc = data > 0.4
        m1 = np.asarray(m.moment1().value)
        sp = np.asarray(cube.spectral_axis.value)
        w = np.where(inc, data, 0.0)
        exp = (w * sp[:, None, None]).sum(0) / np.where(
            w.sum(0) == 0, np.nan, w.sum(0))
        np.testing.assert_allclose(m1, exp, rtol=2e-5, atol=1e-5)
        sm = cube.spectral_smooth(np.hanning(5)[1:-1]
                                  / np.hanning(5)[1:-1].sum())
        assert sm.shape == cube.shape
        ds = cube.downsample_axis(3, axis=0)
        assert ds.shape[0] == -(-13 // 3)
