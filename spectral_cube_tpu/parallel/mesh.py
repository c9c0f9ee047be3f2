"""Device mesh + sharding layouts: the replacement for the reference's dask
chunk runtime and scheduler abstraction.

The reference's chunk-layout policy (``/root/reference/spectral_cube/
dask_spectral_cube.py``: spectral ops rechunk to ``(-1,'auto','auto')`` —
whole spectral axis local, space chunked (:618); spatial ops to
``('auto',-1,-1)`` — whole planes local, channels chunked (:551)) maps
directly onto two shardings over a TPU mesh:

- ``spatial`` layout  — P(None, 'y', 'x'): spectral axis local per device,
  space sharded.  Moments, spectral smoothing/interpolation, per-spaxel
  transforms need **no communication** in this layout.
- ``spectral`` layout — P(('y','x'), None, None): channels sharded, full
  planes local.  FFT beam convolution and spatial filters run per-channel
  with no communication in this layout.

``reshard`` (the dask-rechunk analog) moves between them; XLA lowers it to
an all-to-all over ICI.  Small spatial stencils can instead stay in the
spatial layout using ppermute halo exchange (see ``sharded.halo_pad``).
"""

from __future__ import annotations

import math

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["CubeMesh", "make_mesh", "use_mesh", "default_mesh"]

_DEFAULT_MESH = None


def default_mesh() -> "CubeMesh":
    """The process-wide default CubeMesh (all local devices unless
    overridden by :func:`use_mesh`)."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = CubeMesh()
    return _DEFAULT_MESH


class use_mesh:
    """Set the default mesh, as a call or a context manager — the analog of
    the reference's ``use_dask_scheduler`` (dask_spectral_cube.py:278-312).

    >>> use_mesh(CubeMesh(shape=(2, 4)))          # set globally
    >>> with use_mesh(CubeMesh(devices=devs)):    # or scoped
    ...     cube.to_sharded().moment_maps()
    """

    def __init__(self, cmesh):
        global _DEFAULT_MESH
        self._previous = _DEFAULT_MESH
        _DEFAULT_MESH = cmesh

    def __enter__(self):
        return _DEFAULT_MESH

    def __exit__(self, *exc):
        global _DEFAULT_MESH
        _DEFAULT_MESH = self._previous
        return False


def _factor2(n):
    """Split n into the most-square (a, b) with a*b == n."""
    best = (1, n)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(devices=None, shape=None, axis_names=("y", "x")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = _factor2(n)
    ny, nx = shape
    if ny * nx != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(ny, nx)
    return Mesh(dev_array, axis_names)


class CubeMesh:
    """A 2-D ('y','x') device mesh with the two canonical cube layouts."""

    def __init__(self, devices=None, shape=None):
        self.mesh = make_mesh(devices=devices, shape=shape)

    @property
    def axis_names(self):
        return self.mesh.axis_names

    @property
    def n_devices(self):
        return self.mesh.devices.size

    @property
    def grid(self):
        return self.mesh.devices.shape

    # -- layouts ------------------------------------------------------------
    def spatial_sharding(self) -> NamedSharding:
        """[spec, y, x]: space sharded, spectral axis local."""
        return NamedSharding(self.mesh, P(None, "y", "x"))

    def spectral_sharding(self) -> NamedSharding:
        """[spec, y, x]: channels sharded over all devices, planes local."""
        return NamedSharding(self.mesh, P(("y", "x"), None, None))

    def plane_sharding(self) -> NamedSharding:
        """[y, x] maps (moment outputs) sharded like the spatial layout."""
        return NamedSharding(self.mesh, P("y", "x"))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def sharding(self, layout: str) -> NamedSharding:
        return {"spatial": self.spatial_sharding,
                "spectral": self.spectral_sharding,
                "plane": self.plane_sharding,
                "replicated": self.replicated}[layout]()

    # -- placement ------------------------------------------------------------
    def shard(self, array, layout="spatial"):
        """device_put with the requested layout (pads nothing; GSPMD handles
        uneven shards)."""
        return jax.device_put(array, self.sharding(layout))

    def reshard(self, array, layout):
        """The dask-rechunk analog: change layouts; XLA emits the all-to-all.
        """
        return jax.lax.with_sharding_constraint(array, self.sharding(layout))

    def __repr__(self):
        return f"CubeMesh(grid={self.grid}, devices={self.n_devices})"
