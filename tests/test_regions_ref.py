"""Region extraction against the reference's checked-in .reg files."""

import os

import numpy as np
import pytest

from spectral_cube_tpu import SpectralCube
from spectral_cube_tpu.region import parse_ds9_region, region_to_mask

from conftest import make_cube_file

BASE = "/root/reference/spectral_cube/tests/data/"

requires_data = pytest.mark.skipif(not os.path.exists(BASE + "255-fk5.reg"),
                                   reason="reference region files absent")


@requires_data
def test_fk5_and_pixel_circle_agree(tmp_path):
    """The reference ships the same circle in fk5 and pixel coords
    (255-fk5.reg / 255-pixel.reg, for a cube with the 255 delta header):
    both must rasterize to the same mask."""
    # header matching the delta-cube fixtures: 5x5 spatial grid
    path, data = make_cube_file(tmp_path, shape=(2, 5, 5))
    cube = SpectralCube.read(path)
    # re-center the fk5 circle onto this cube's WCS is not possible (its
    # coords belong to another header), so instead check parse results
    regs_fk5 = parse_ds9_region(open(BASE + "255-fk5.reg").read())
    regs_pix = parse_ds9_region(open(BASE + "255-pixel.reg").read())
    assert regs_fk5[0].shape == "circle" and regs_fk5[0].frame == "fk5"
    # RA sexagesimal 1:36:14.969 hours -> 24.0624 deg
    assert regs_fk5[0].params[0] == pytest.approx(24.0624, abs=1e-3)
    assert regs_fk5[0].params[1] == pytest.approx(29.9355, abs=1e-3)
    # 2.6509 arcsec radius
    assert regs_fk5[0].params[2] == pytest.approx(2.6509 / 3600, rel=1e-6)
    assert regs_pix[0].frame == "image"
    # ds9 image coords are 1-based: (2.528, 3.461) -> 0-based
    assert regs_pix[0].params[0] == pytest.approx(1.5282832, rel=1e-6)


@requires_data
def test_fk5_box_parse():
    regs = parse_ds9_region(open(BASE + "fk5.reg").read())
    assert regs[0].shape == "box"
    assert regs[0].params[0] == pytest.approx(24.063014, rel=1e-8)
    assert regs[0].params[2] == pytest.approx(4.61661 / 3600, rel=1e-6)
    two = parse_ds9_region(open(BASE + "fk5_twoboxes.reg").read())
    assert len(two) == 2


@requires_data
def test_image_box_mask(tmp_path):
    path, data = make_cube_file(tmp_path, shape=(2, 4, 4))
    cube = SpectralCube.read(path)
    regs = parse_ds9_region(open(BASE + "image.reg").read())
    # box(1.5, 2, 2, 1, 0) in 1-based image coords
    m = region_to_mask(regs[0], cube.wcs, cube.shape)
    assert m.any()
    ys, xs = np.where(m)
    assert xs.min() >= 0 and xs.max() <= 1  # centered at x=0.5 0-based
