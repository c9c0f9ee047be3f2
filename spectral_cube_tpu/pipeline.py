"""End-to-end sharded analysis pipeline (BASELINE config #5).

``mask -> moments -> common-beam convolve -> reproject`` over a device
mesh, in one place: the TB-scale workflow the reference runs through dask
graphs (with rechunks between op families) runs here as a sequence of
sharded jit programs — with ZERO reshards when the beams are separable
(the halo-exchange convolution keeps the spatial layout) and the target
grid is axis-aligned within one-neighbor reach (the halo-strategy
sharded reproject), or exactly two per non-conforming stage (the
spectral-multiply convolution and the rotated-reproject all-to-all
round trips) otherwise.
"""

from __future__ import annotations

import numpy as np

from .parallel import CubeMesh, ShardedCube, default_mesh
from .units import Quantity

__all__ = ["run_pipeline"]


def run_pipeline(cube, cmesh: CubeMesh | None = None, snr_threshold=None,
                 target_beam=None, target_header=None, noise_estimate=None):
    """Run the full masked-analysis pipeline on a (sharded) cube.

    Parameters
    ----------
    cube : SpectralCube or VaryingResolutionSpectralCube
    cmesh : CubeMesh, optional — defaults to all local devices.
    snr_threshold : float, optional — mask voxels below
        ``snr_threshold * mad_std`` before the moments.
    target_beam : Beam, optional — convolve to this beam (defaults to the
        common beam for varying-resolution cubes, else skipped).
    target_header : optional — reproject the convolved cube onto this WCS.

    Returns a dict with 'moments' (mom0, mom1, linewidth Projections),
    'statistics', 'cube' (the convolved/reprojected cube), all computed
    with the spatial layout except the convolution reshard.
    """
    cmesh = cmesh if cmesh is not None else default_mesh()

    # varying-resolution cubes must reach a common beam before any
    # spectral reduction (the reference's beam-sameness guard)
    if target_beam is None and hasattr(cube, "beams"):
        target_beam = cube.common_beam()
    if target_beam is not None:
        cube = ShardedCube(cube, cmesh).convolve_to(target_beam).cube

    if snr_threshold is not None:
        if noise_estimate is None:
            noise = float(cube.mad_std().value)
        else:
            noise = float(noise_estimate.to_value(cube.unit)
                          if isinstance(noise_estimate, Quantity)
                          else noise_estimate)
        cube = cube.with_mask(cube > Quantity(snr_threshold * noise,
                                              cube.unit))

    sc = ShardedCube(cube, cmesh)
    m0, m1, m2 = sc.moment_maps()
    from .lower_dimensional_structures import Projection
    linewidth = Projection(np.sqrt(np.asarray(m2.value)),
                           unit=cube.spectral_unit, wcs=m2.wcs)
    stats = sc.statistics()

    out_cube = cube
    if target_header is not None:
        # sharded reproject: halo exchange for separable in-reach
        # mappings (zero all-to-alls), the explicit two-all-to-all
        # reshard round trip otherwise (parallel/sharded.py)
        out_cube = ShardedCube(out_cube, cmesh) \
            .reproject(target_header).cube

    return {"moments": (m0, m1, linewidth), "statistics": stats,
            "cube": out_cube}
