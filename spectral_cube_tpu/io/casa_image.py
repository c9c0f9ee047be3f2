"""CASA image reading (gated).

The reference reads CASA images through the external ``casa_formats_io``
package (``/root/reference/spectral_cube/io/casa_image.py:37-227``), which
implements a native parser for the CASA table system (AipsIO serialization +
tiled storage managers).  Neither ``casa_formats_io`` nor ``casatools`` is
available in this environment; this module keeps the API surface and raises
a clear, actionable error.  FITS exports of CASA images (including their
per-plane BEAMS tables) are fully supported through the FITS path.
"""

from __future__ import annotations

import os

__all__ = ["load_casa_image", "is_casa_image"]


def is_casa_image(path) -> bool:
    name = str(path)
    return os.path.isdir(name) and os.path.exists(
        os.path.join(name, "table.dat"))


def load_casa_image(filename, skipdata=False, skipvalid=False, skipcs=False,
                    target_cls=None, use_dask=None, **kwargs):
    try:
        import casa_formats_io  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "Reading CASA .image tables requires the casa_formats_io "
            "package, which is not installed in this environment. Export "
            "the image to FITS (CASA: exportfits) and use "
            "SpectralCube.read on the FITS file instead.") from exc
    raise NotImplementedError(
        "casa_formats_io integration is not wired up in this build")
