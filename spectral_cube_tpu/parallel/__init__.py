from .mesh import CubeMesh, make_mesh, use_mesh, default_mesh
from .sharded import (ShardedCube, sharded_moments, sharded_statistics,
                      sharded_spatial_convolve, sharded_sigma_clip,
                      sharded_spectral_interpolate,
                      sharded_smooth_interpolate, halo_pad)

__all__ = ["CubeMesh", "make_mesh", "use_mesh", "default_mesh", "ShardedCube", "sharded_moments",
           "sharded_statistics", "sharded_spatial_convolve",
           "sharded_sigma_clip", "sharded_spectral_interpolate",
           "sharded_smooth_interpolate", "halo_pad"]
