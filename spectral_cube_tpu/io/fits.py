"""High-level FITS cube reader/writer.

Parity target: ``/root/reference/spectral_cube/io/fits.py`` — 3-D files load
as a cube with a finite-mask (``:214``), 4-D files split per Stokes
component (``:229-253``), a BEAMS bintable upgrades the cube to
VaryingResolution (``:96-131``), unit forgiveness for CASA/AIPS BUNIT
quirks, and writes stamp a history card (``:263-282``).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .fits_low import (read_fits, write_fits, is_fits, Header, HDU,
                       BinTableHDU)
from ..wcs import WCS
from ..masks import LazyMask
from ..utils import FITSReadError
from ..cube_utils import orient, split_stokes

__all__ = ["load_fits_cube", "write_fits_cube", "is_fits"]


def _find_image_hdu(hdus, hdu_index=0):
    if hdu_index != 0:
        return hdus[hdu_index]
    for h in hdus:
        if getattr(h, "is_image", False) and h._lazy is not None or \
                (getattr(h, "is_image", False) and h._data is not None):
            n = int(h.header.get("NAXIS", 0))
            if n >= 3:
                return h
    # fall back to the first HDU that actually HAS data (an empty
    # primary HDU followed by tables must not be returned dataless)
    for h in hdus:
        if getattr(h, "is_image", False) and \
                (h._lazy is not None or h._data is not None):
            return h
    raise FITSReadError("No image HDU found")


def _find_beam_table(hdus):
    for h in hdus:
        if isinstance(h, BinTableHDU) and h.name.strip().upper() == "BEAMS":
            return h
    return None


def load_fits_cube(filename, hdu=0, meta=None, target_cls=None, use_dask=None,
                   **kwargs):
    """Read a FITS file into a SpectralCube / VaryingResolutionSpectralCube /
    StokesSpectralCube (reference io/fits.py:171-260)."""
    return cube_from_hdus(read_fits(filename), hdu=hdu, meta=meta,
                          target_cls=target_cls, use_dask=use_dask, **kwargs)


def cube_from_hdus(hdus, hdu=0, meta=None, target_cls=None, use_dask=None,
                   **kwargs):
    """Build a cube from already-parsed HDU objects — the zero-copy path
    for in-memory HDUs (the reference serves these through astropy's
    registry without touching disk, io/core.py:111-130)."""
    from ..cube import SpectralCube, VaryingResolutionSpectralCube
    from ..stokes import StokesSpectralCube

    ihdu = _find_image_hdu(hdus, hdu)
    header = ihdu.header
    beam_table = _find_beam_table(hdus)

    meta = dict(meta) if meta else {}
    if "BUNIT" in header:
        meta["BUNIT"] = str(header["BUNIT"]).strip()

    data = ihdu.data
    naxis = data.ndim
    wcs = WCS(header=header)

    if naxis == 3:
        data, wcs3 = orient(data, wcs)
        djax = jnp.asarray(np.ascontiguousarray(data))
        mask = LazyMask(jnp.isfinite, data=djax, wcs=wcs3)
        if beam_table is not None:
            cube = VaryingResolutionSpectralCube(
                djax, wcs3, mask=mask, meta=meta, header=header,
                beam_table=beam_table)
        else:
            cube = SpectralCube(djax, wcs3, mask=mask, meta=meta,
                                header=header)
        cube._header = header
        return cube

    if naxis == 4:
        if beam_table is not None:
            arrays, wcs3, tables = split_stokes(data, wcs,
                                                beam_table=beam_table)
        else:
            arrays, wcs3 = split_stokes(data, wcs)
            tables = None
        stokes_data = {}
        for name, arr in arrays.items():
            arr3, wcs_o = orient(arr, wcs3)
            djax = jnp.asarray(np.ascontiguousarray(arr3))
            mask = LazyMask(jnp.isfinite, data=djax, wcs=wcs_o)
            if tables is not None:
                from ..beams import Beams
                from ..units import Quantity
                t = tables[name]
                units = getattr(beam_table, "units", {}) or {}
                beams = Beams(major=Quantity(np.asarray(t["BMAJ"],
                                                        dtype=float),
                                             units.get("BMAJ", "arcsec")),
                              minor=Quantity(np.asarray(t["BMIN"],
                                                        dtype=float),
                                             units.get("BMIN", "arcsec")),
                              pa=Quantity(np.asarray(t["BPA"], dtype=float),
                                          units.get("BPA", "deg")))
                stokes_data[name] = VaryingResolutionSpectralCube(
                    djax, wcs_o, mask=mask, meta=dict(meta), header=header,
                    beams=beams)
            else:
                stokes_data[name] = SpectralCube(djax, wcs_o, mask=mask,
                                                 meta=dict(meta),
                                                 header=header)
        if len(stokes_data) == 1:
            return next(iter(stokes_data.values()))
        return StokesSpectralCube(stokes_data, meta=meta)

    raise FITSReadError(f"Data should be 3- or 4-dimensional, got {naxis}")


def write_fits_cube(cube, filename, overwrite=False,
                    include_origin_notes=True):
    """Write a cube (and its BEAMS table, if any) to FITS (reference
    io/fits.py:263-282)."""
    if os.path.exists(filename) and not overwrite:
        raise OSError(f"{filename} exists; use overwrite=True")
    hdus = cube.hdulist
    if include_origin_notes:
        hdus[0].header.add_history(
            "Written by spectral_cube_tpu")
    write_fits(filename, hdus)


def write_fits_stokes(stokes_cube, filename, overwrite=False):
    """Write a StokesSpectralCube as a 4-D FITS file."""
    if os.path.exists(filename) and not overwrite:
        raise OSError(f"{filename} exists; use overwrite=True")
    comps = stokes_cube.components
    ref = stokes_cube[comps[0]]
    data4 = np.stack([np.asarray(stokes_cube[c].filled().value)
                      for c in comps], axis=0)
    h = ref.header
    h["NAXIS"] = 4
    h["WCSAXES"] = 4
    h["NAXIS4"] = len(comps)
    h["CTYPE4"] = "STOKES"
    from ..stokes import STOKES_SYMBOLS
    sym_by_name = {v: k for k, v in STOKES_SYMBOLS.items()}
    codes = [float(sym_by_name.get(c, 1)) for c in comps]
    # a FITS STOKES axis is linear (code = CRVAL4 + CDELT4*(i+1-CRPIX4));
    # non-arithmetic component sets (e.g. {I, V}) cannot be labeled on one
    # axis — refuse rather than silently relabel them on read-back
    steps = np.diff(codes)
    if len(codes) > 1 and not np.all(steps == steps[0]):
        raise ValueError(
            f"Stokes components {comps} have codes {codes} that do not "
            "form an arithmetic sequence and cannot share a linear FITS "
            "STOKES axis; write the components separately")
    h["CRVAL4"] = codes[0]
    h["CDELT4"] = float(steps[0]) if len(codes) > 1 else 1.0
    h["CRPIX4"] = 1.0
    h["CUNIT4"] = ""
    write_fits(filename, [HDU(data=data4, header=h)])
