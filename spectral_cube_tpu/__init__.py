"""spectral_cube_tpu — a TPU-native spectral-cube engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
radio-astro-tools/spectral-cube: lazy masked unit/WCS-aware cubes, fused
masked reductions and moment maps, beam handling and common-beam
convolution, spectral/spatial smoothing and regridding, Stokes cubes,
region extraction, FITS I/O, and shard_map-based multi-chip execution.
"""

from .units import Quantity, Unit
from .masks import (MaskBase, InvertedMask, CompositeMask, BooleanArrayMask,
                    LazyMask, LazyComparisonMask, FunctionMask)
from .beams import Beam, Beams
from .cube import SpectralCube, VaryingResolutionSpectralCube, \
    BaseSpectralCube
from .stokes import StokesSpectralCube

# The reference exports dask-backed twins (reference __init__.py:4); on
# TPU every cube is jit/shard_map-backed, so the names are aliases and
# the dask API surface (rechunk, statistics, save_to_tmp_dir=,
# use_dask_scheduler) lives on the classes themselves.
DaskSpectralCube = SpectralCube
DaskVaryingResolutionSpectralCube = VaryingResolutionSpectralCube
from .lower_dimensional_structures import (Projection, Slice, OneDSpectrum,
                                           VaryingResolutionOneDSpectrum,
                                           LowerDimensionalObject)
from .wcs import WCS
from .convolution import (CustomKernel, Gaussian1DKernel, Gaussian2DKernel,
                          Box1DKernel, Box2DKernel, Tophat2DKernel)
from .parallel import CubeMesh, ShardedCube, use_mesh, default_mesh
from .pipeline import run_pipeline
from .utils import enable_compilation_cache

import os as _os
if _os.environ.get("SCT_COMPILE_CACHE"):
    enable_compilation_cache()
del _os

__version__ = "0.1.0"

__all__ = ["SpectralCube", "VaryingResolutionSpectralCube",
           "DaskSpectralCube", "DaskVaryingResolutionSpectralCube",
           "BaseSpectralCube", "StokesSpectralCube", "Projection", "Slice",
           "OneDSpectrum", "VaryingResolutionOneDSpectrum",
           "LowerDimensionalObject", "MaskBase", "InvertedMask",
           "CompositeMask", "BooleanArrayMask", "LazyMask",
           "LazyComparisonMask", "FunctionMask", "Beam", "Beams", "WCS",
           "Quantity", "Unit", "CubeMesh", "ShardedCube", "use_mesh",
           "default_mesh", "run_pipeline", "enable_compilation_cache",
           "CustomKernel", "Gaussian1DKernel", "Gaussian2DKernel",
           "Box1DKernel", "Box2DKernel", "Tophat2DKernel"]
