"""CASA image reading — native, no casatools/casa_formats_io required.

The reference requires the external ``casa_formats_io`` package
(``/root/reference/spectral_cube/io/casa_image.py:37-227``); this framework
parses the CASA table system directly (see :mod:`.casa_low`): pixel data
and the boolean validity mask from their tiled storage managers, the
coordinate system from the ``coords`` record, single or per-plane beams
from ``imageinfo``, and the brightness unit from ``units``.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .casa_low import read_casa_image_parts
from ..cube_utils import orient, split_stokes
from ..masks import BooleanArrayMask, LazyMask, CompositeMask
from ..utils import FITSReadError

__all__ = ["load_casa_image", "is_casa_image"]


def is_casa_image(path) -> bool:
    name = str(path)
    return os.path.isdir(name) and os.path.exists(
        os.path.join(name, "table.dat"))


def load_casa_image(filename, skipdata=False, skipvalid=False, skipcs=False,
                    target_cls=None, use_dask=None, **kwargs):
    """Load a CASA .image directory into a cube (reference
    io/casa_image.py:37-227 behavior, native implementation)."""
    from ..cube import SpectralCube, VaryingResolutionSpectralCube
    from ..stokes import StokesSpectralCube
    from ..beams import Beam, Beams

    if not is_casa_image(filename):
        raise FITSReadError(f"{filename!r} is not a CASA image directory")

    data, valid, wcs, unit, beams, misc = read_casa_image_parts(
        str(filename))
    meta = {"filename": str(filename)}
    meta.update(misc)
    if unit:
        meta["BUNIT"] = unit

    def build_cube(arr3, valid3, wcs3, cube_beams):
        arr3, wcs_o = orient(arr3, wcs3)
        djax = jnp.asarray(np.ascontiguousarray(arr3))
        mask = LazyMask(jnp.isfinite, data=djax, wcs=wcs_o)
        if valid3 is not None:
            v3, _ = orient(valid3, wcs3)
            mask = CompositeMask(
                mask, BooleanArrayMask(np.ascontiguousarray(v3),
                                       wcs=wcs_o, shape=arr3.shape), "and")
        if isinstance(cube_beams, Beams):
            return VaryingResolutionSpectralCube(
                djax, wcs_o, mask=mask, meta=dict(meta), beams=cube_beams)
        return SpectralCube(djax, wcs_o, mask=mask, meta=dict(meta),
                            beam=cube_beams)

    if data.ndim == 3:
        if isinstance(beams, list):
            beams = beams[0]
        return build_cube(data, valid, wcs, beams)
    if data.ndim == 4:
        arrays, wcs3 = split_stokes(data, wcs)
        valid_arrays = {}
        if valid is not None:
            varrays, _ = split_stokes(valid, wcs)
            valid_arrays = varrays
        # per-plane beams are per-Stokes (stokes-major keys); a single
        # Beams applies to every component
        def _beams_for(i):
            if isinstance(beams, list):
                return beams[i] if i < len(beams) else None
            return beams
        cubes = {name: build_cube(arr, valid_arrays.get(name), wcs3,
                                  _beams_for(i))
                 for i, (name, arr) in enumerate(arrays.items())}
        if len(cubes) == 1:
            return next(iter(cubes.values()))
        return StokesSpectralCube(cubes, meta=meta)
    if data.ndim == 2:
        from ..lower_dimensional_structures import Projection
        from ..units import Unit
        from ..units import parse_bunit
        return Projection(data, unit=parse_bunit(unit) if unit else None,
                          wcs=wcs, meta=meta,
                          beam=beams if isinstance(beams, Beam) else None)
    raise FITSReadError(f"unsupported CASA image dimensionality "
                        f"{data.ndim}")
