"""CASA mask export.

The reference writes include-masks as CASA images via ``casatools.image``
(``/root/reference/spectral_cube/io/casa_masks.py:11-127``); here the
native CASA writer (:mod:`.casa_writer`) does it without casatools: the
include mask becomes a float 1/0 CASA image with the cube's coordinate
system (the representation CASA's ia.calcmask consumes).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_casa_mask"]


def make_casa_mask(cube, outname, append_to_image=False, img=None,
                   add_stokes=True, stokes_posn=None, overwrite=False):
    """Write the cube's include mask as a CASA image directory."""
    import jax.numpy as jnp
    from .casa_writer import write_casa_image

    include = np.asarray(cube._include_view(())).astype("f4")
    mask_cube = cube._new_cube_with(data=jnp.asarray(include))
    mask_cube._mask = None  # the 1/0 image itself is the mask
    mask_cube._unit = None
    write_casa_image(mask_cube, outname, overwrite=overwrite)
    if append_to_image and img is not None:
        raise NotImplementedError(
            "appending masks into an existing CASA image requires "
            "casatools; the mask was written standalone instead")
    return outname
