"""Unified cube I/O registry.

The reference wires readers/writers into astropy's unified I/O machinery
(``/root/reference/spectral_cube/io/core.py``); this framework keeps a small
native registry keyed by format name with auto-detection by file signature.
"""

from __future__ import annotations

import os

from .fits_low import is_fits, Header, HDU, BinTableHDU, read_fits, write_fits
from .fits import load_fits_cube, write_fits_cube, write_fits_stokes

__all__ = ["read_cube", "write_cube", "read_stokes_cube",
           "write_stokes_cube", "Header", "HDU", "BinTableHDU"]


def _detect_format(filename):
    name = str(filename)
    if os.path.isdir(name) and os.path.exists(os.path.join(name,
                                                           "table.dat")):
        return "casa_image"
    if name.lower().endswith(".lmv"):
        return "class_lmv"
    if is_fits(name):
        return "fits"
    if name.lower().endswith((".fits", ".fit")):
        return "fits"
    raise ValueError(f"Cannot determine format of {filename!r}; "
                     "pass format= explicitly")


def read_cube(filename, format=None, hdu=0, **kwargs):
    # accept in-memory HDU objects (reference: load_fits_cube accepts HDUs)
    if isinstance(filename, (HDU, list)):
        import tempfile
        import os as _os
        hdus = filename if isinstance(filename, list) else [filename]
        tmp = tempfile.NamedTemporaryFile(suffix=".fits", delete=False)
        tmp.close()
        try:
            write_fits(tmp.name, hdus)
            cube = load_fits_cube(tmp.name, hdu=hdu, **kwargs)
            if hasattr(cube, "_device_data"):
                cube._device_data  # force load before the temp file goes
            return cube
        finally:
            _os.unlink(tmp.name)
    format = format or _detect_format(filename)
    if format == "fits":
        return load_fits_cube(filename, hdu=hdu, **kwargs)
    if format in ("casa_image", "casa"):  # both names, like the
        # reference registry (io/casa_image.py:230-231)
        from .casa_image import load_casa_image
        return load_casa_image(filename, **kwargs)
    if format in ("class_lmv", "lmv"):
        from .class_lmv import load_lmv_cube
        return load_lmv_cube(filename, **kwargs)
    raise ValueError(f"Unknown format {format!r}")


def write_cube(cube, filename, overwrite=False, format=None):
    name = str(filename).lower()
    if format is None:
        format = "casa_image" if name.endswith((".image", ".im")) else "fits"
    if format == "fits":
        write_fits_cube(cube, filename, overwrite=overwrite)
    elif format in ("casa_image", "casa"):
        from .casa_writer import write_casa_image
        write_casa_image(cube, filename, overwrite=overwrite)
    else:
        raise ValueError(f"Unknown format {format!r}")


def read_stokes_cube(filename, format=None, hdu=0, **kwargs):
    out = read_cube(filename, format=format, hdu=hdu, **kwargs)
    from ..stokes import StokesSpectralCube
    if isinstance(out, StokesSpectralCube):
        return out
    return StokesSpectralCube({"I": out})


def write_stokes_cube(stokes_cube, filename, overwrite=False, format=None):
    write_fits_stokes(stokes_cube, filename, overwrite=overwrite)
