"""Test fixtures: synthetic FITS cube factory (mirroring the reference's
fixture-factory strategy, /root/reference/spectral_cube/conftest.py) and a
virtual 8-device CPU mesh for multi-chip tests."""

import os
import sys

# must run before jax initializes: tests run on a virtual 8-device CPU mesh
# (force cpu even when the environment points JAX at a TPU tunnel).
# Set SCT_TEST_TPU=1 to run on the real accelerator instead (slow over a
# tunnel — compiles dominate; multi-device tests auto-skip on 1 chip).
_USE_TPU = os.environ.get("SCT_TEST_TPU", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = \
            flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not _USE_TPU:
    # the axon sitecustomize pre-configures the TPU tunnel platform;
    # override it
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from spectral_cube_tpu.io.fits_low import Header, HDU, BinTableHDU, write_fits


def base_header(nx=2, ny=3, nchan=4, ctype3="VRAD", cunit3="km/s",
                crval3=-321.2, cdelt3=1.28, bunit="JY/BEAM", beam=True):
    h = Header()
    h["SIMPLE"] = True
    h["BITPIX"] = -64
    h["NAXIS"] = 3
    h["NAXIS1"] = nx
    h["NAXIS2"] = ny
    h["NAXIS3"] = nchan
    h["CTYPE1"] = "RA---SIN"
    h["CRVAL1"] = 23.1837
    h["CDELT1"] = -5.55555561268e-4
    h["CRPIX1"] = 2.0
    h["CUNIT1"] = "deg"
    h["CTYPE2"] = "DEC--SIN"
    h["CRVAL2"] = 30.5765
    h["CDELT2"] = 5.55555561268e-4
    h["CRPIX2"] = 2.0
    h["CUNIT2"] = "deg"
    h["CTYPE3"] = ctype3
    h["CRVAL3"] = crval3
    h["CDELT3"] = cdelt3
    h["CRPIX3"] = 1.0
    h["CUNIT3"] = cunit3
    h["RESTFRQ"] = 1.42040571841e9
    h["SPECSYS"] = "BARYCENT"
    h["BUNIT"] = bunit
    if beam:
        h["BMAJ"] = 2.77777777e-4
        h["BMIN"] = 2.77777777e-4
        h["BPA"] = 0.0
    return h


def make_cube_file(tmp_path, name="adv.fits", shape=(4, 3, 2), seed=42,
                   with_nan=True, **hdrkw):
    """(nchan, ny, nx) random cube written to FITS; returns path + data."""
    nchan, ny, nx = shape
    rng = np.random.RandomState(seed)
    data = rng.rand(nchan, ny, nx)
    if with_nan:
        data[min(1, nchan - 1), min(1, ny - 1), min(1, nx - 1)] = np.nan
    h = base_header(nx=nx, ny=ny, nchan=nchan, **hdrkw)
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=data, header=h)])
    return path, data


def make_beams_table(n, major_arcsec=None):
    from collections import OrderedDict
    major = np.asarray(major_arcsec if major_arcsec is not None
                       else np.linspace(1.0, 1.5, n), dtype="f4")
    bt = BinTableHDU(columns=OrderedDict(
        BMAJ=major, BMIN=major * 0.8,
        BPA=np.zeros(n, dtype="f4"),
        CHAN=np.arange(n, dtype="i4"),
        POL=np.zeros(n, dtype="i4")), name="BEAMS",
        units={"BMAJ": "arcsec", "BMIN": "arcsec", "BPA": "deg"})
    bt.header["NCHAN"] = n
    bt.header["NPOL"] = 1
    return bt


def make_vr_cube_file(tmp_path, name="vr.fits", shape=(4, 3, 2), seed=7,
                      major_arcsec=None):
    nchan, ny, nx = shape
    rng = np.random.RandomState(seed)
    data = rng.rand(nchan, ny, nx)
    h = base_header(nx=nx, ny=ny, nchan=nchan, beam=False)
    h["CASAMBM"] = True
    path = str(tmp_path / name)
    write_fits(path, [HDU(data=data, header=h),
                      make_beams_table(nchan, major_arcsec)])
    return path, data


@pytest.fixture
def data_adv(tmp_path):
    return make_cube_file(tmp_path)


@pytest.fixture
def cube_adv(tmp_path):
    from spectral_cube_tpu import SpectralCube
    path, data = make_cube_file(tmp_path)
    return SpectralCube.read(path), data


@pytest.fixture
def cube_vr(tmp_path):
    from spectral_cube_tpu import SpectralCube
    path, data = make_vr_cube_file(tmp_path)
    return SpectralCube.read(path), data


def gaussian_line_cube(shape=(100, 8, 9), amp=1.0, v0=0.0, sigma=8.0,
                       dv=1.0, noise=0.0, seed=0):
    """Cube of identical Gaussian spectral lines with known moments
    (analog of reference tests/utilities.py gaussian_test_cube)."""
    nchan, ny, nx = shape
    v = (np.arange(nchan) - nchan / 2) * dv + v0
    spec = amp * np.exp(-0.5 * ((v - v0) / sigma) ** 2)
    data = np.broadcast_to(spec[:, None, None], shape).copy()
    if noise:
        data = data + np.random.RandomState(seed).randn(*shape) * noise
    return data, v
