"""Native CASA image reader tests (against the reference's checked-in test
images; the reference itself needs casa_formats_io + dask for these)."""

import os

import numpy as np
import pytest

import spectral_cube_tpu.units as u
from spectral_cube_tpu import SpectralCube, StokesSpectralCube

BASE = "/root/reference/spectral_cube/tests/data/"

requires_data = pytest.mark.skipif(
    not os.path.isdir(BASE + "basic.image"),
    reason="reference CASA test images not available")


@requires_data
@pytest.mark.parametrize("name", ["basic.image", "basic_bigendian.image",
                                  "nomask.image"])
def test_read_casa_image(name):
    out = SpectralCube.read(BASE + name)
    assert isinstance(out, StokesSpectralCube)
    assert set(out.components) == {"I", "Q"}
    I = out["I"]
    assert I.shape == (3, 4, 5)
    assert I.unit == u.Jy / u.beam
    # coordinates match the generating header (header_jybeam.hdr)
    assert I.wcs.ctype[0] == "RA---SIN"
    assert I.wcs.crval[0] == pytest.approx(23.1837500515, rel=1e-9)
    assert I.wcs.crval[1] == pytest.approx(30.5765277962, rel=1e-9)
    assert I.wcs.restfrq == pytest.approx(1.42040571841e9, rel=1e-9)
    sv = np.asarray(I.spectral_axis.value)
    assert sv[0] == pytest.approx(1.42192925e9, rel=1e-6)
    assert sv[0] > sv[1]  # descending frequency axis
    # both endiannesses decode to the same values
    data = np.asarray(I.unmasked_data[:].value)
    np.testing.assert_allclose(data, 1.0)


@requires_data
def test_casa_endianness_agreement():
    le = SpectralCube.read(BASE + "basic.image")["I"]
    be = SpectralCube.read(BASE + "basic_bigendian.image")["I"]
    np.testing.assert_array_equal(
        np.asarray(le.unmasked_data[:].value),
        np.asarray(be.unmasked_data[:].value))


@requires_data
def test_casa_mask_read():
    cube = SpectralCube.read(BASE + "basic.image")["I"]
    filled = np.asarray(cube.filled_data[:].value)
    assert np.isfinite(filled).all()  # mask0 is all-True here


@requires_data
def test_casa_beam():
    cube = SpectralCube.read(BASE + "basic.image")["I"]
    assert cube.beam is not None
    assert cube.beam.major.to_value("deg") * 3600 == pytest.approx(1.0,
                                                                   rel=1e-6)


@requires_data
def test_casa_moments_run():
    cube = SpectralCube.read(BASE + "basic.image")["I"]
    m0 = cube.moment0()
    # all-ones cube: mom0 = nchan * |dv|
    dv = abs(np.diff(np.asarray(cube.spectral_axis.value))[0])
    np.testing.assert_allclose(np.asarray(m0.value), 3 * dv, rtol=1e-6)


@requires_data
def test_casa_format_detection():
    from spectral_cube_tpu.io import _detect_format
    assert _detect_format(BASE + "basic.image") == "casa_image"


@requires_data
def test_aipsio_record_contents():
    from spectral_cube_tpu.io.casa_low import read_table_keywords
    rec = read_table_keywords(BASE + "basic.image/table.dat")
    assert rec["units"] == "Jy/beam"
    assert rec["coords"]["direction0"]["projection"] == "SIN"
    assert rec["imageinfo"]["objectname"] == "M33"
    np.testing.assert_allclose(
        rec["coords"]["spectral2"]["restfreq"], 1.42040571841e9)


@requires_data
def test_tiled_bool_unpack():
    from spectral_cube_tpu.io.casa_low import read_tiled_data
    mask = read_tiled_data(BASE + "basic.image/mask0", 0)
    assert mask.dtype == np.bool_
    assert mask.shape == (2, 3, 4, 5)
    assert mask.all()
