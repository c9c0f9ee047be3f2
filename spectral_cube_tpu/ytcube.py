"""yt export (reference ``/root/reference/spectral_cube/ytcube.py``).

yt is not available in this environment; the exporter is gated and raises a
clear ImportError, preserving the API surface."""

from __future__ import annotations

import numpy as np


def to_yt(cube, spectral_factor=1.0, nprocs=None, **kwargs):
    try:
        import yt  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "yt is required for to_yt() but is not installed in this "
            "environment") from exc
    from yt.loaders import load_uniform_grid
    data = {"flux": np.asarray(cube.filled().value).T}
    nz, ny, nx = cube.shape
    dims = np.array([nx, ny, nz * spectral_factor], dtype=int)
    ds = load_uniform_grid(data, dims, length_unit="pc", nprocs=nprocs or 1,
                           **kwargs)
    return ytCube(cube, ds, spectral_factor=spectral_factor)


class ytCube:
    """Thin wrapper pairing a cube with its yt dataset
    (reference ytcube.py:11-286)."""

    def __init__(self, cube, dataset, spectral_factor=1.0):
        self.cube = cube
        self.wcs = cube.wcs
        self.dataset = dataset
        self.spectral_factor = spectral_factor

    def world2yt(self, world_coord, first_index=0):
        pix = self.wcs.wcs_world2pix([world_coord], first_index)[0]
        pix[2] = pix[2] * self.spectral_factor
        return pix

    def yt2world(self, yt_coord, first_index=0):
        yt_coord = list(yt_coord)
        yt_coord[2] = yt_coord[2] / self.spectral_factor
        return self.wcs.wcs_pix2world([yt_coord], first_index)[0]
