"""Probe a 3-D-native smooth+interp strips kernel: BlockSpec over y slabs
of the (nchan, ny, nx) cube, collapsing (by, nx) -> columns inside VMEM,
vs the current path that reshapes in HBM (a physical relayout on TPU:
measured 0.65 ms for bench one_pass vs 0.235 ms for the flat kernel).

Run: python benchmarks/probe_c2_3d.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from benchmarks.probe_strips_prod import measure
from spectral_cube_tpu.ops.smoothing import (_banded_conv_matrix,
                                             gaussian_kernel1d)
from spectral_cube_tpu.ops.interpolate import interp_weights, _interp_matrix
from spectral_cube_tpu.ops.banded_pallas import (plan_strips, strip_blocks,
                                                 _dot)

nchan, ny, nx = 512, 256, 256
rng = np.random.RandomState(1)
data_np = rng.rand(nchan, ny, nx).astype(np.float32)
coords = np.arange(nchan, dtype=np.float64)
outaxis = coords[::2]
kern = gaussian_kernel1d(2.0)
k = kern / kern.sum()
Sm = _banded_conv_matrix(nchan, k).astype(np.float64)
idx, frac = interp_weights(coords, outaxis)
Im = _interp_matrix(idx, frac, nchan).astype(np.float64)
M_host = (Im @ Sm).astype(np.float32)
nout = M_host.shape[0]

m, K = plan_strips(M_host != 0.0)
blocks, starts = strip_blocks(M_host, m, K)
nb = blocks.shape[0]

data = jnp.asarray(data_np)
exp = (M_host.astype(np.float64)
       @ data_np.reshape(nchan, -1).astype(np.float64)).reshape(nout, ny, nx)


def strips3d_reshape(by):
    """3-D blocks, collapse (by, nx) -> columns via jnp.reshape in VMEM."""
    def kernel(x_ref, b_ref, o_ref):
        X = x_ref[:].reshape(nchan, by * nx)
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
            o_ref[:] = o_ref[:]  # ensure write below dominates
            o_ref[i * m:hi] = part[:hi - i * m].reshape(hi - i * m, by, nx)

    def kernel2(x_ref, b_ref, o_ref):
        X = x_ref[:].reshape(nchan, by * nx)
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
            o_ref[i * m:hi] = part[:hi - i * m].reshape(hi - i * m, by, nx)

    fn = pl.pallas_call(
        kernel2, grid=(ny // by,),
        in_specs=[pl.BlockSpec((nchan, by, nx), lambda j: (0, j, 0)),
                  pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, by, nx), lambda j: (0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nout, ny, nx), jnp.float32))
    b = jnp.asarray(blocks)
    return lambda x: fn(x, b)


def strips3d_perrow(by):
    """3-D blocks, one (m,K)@(K,nx) dot per y row — no reshape at all."""
    def kernel(x_ref, b_ref, o_ref):
        for y in range(by):
            X = x_ref[:, y, :]
            for i in range(nb):
                hi = min((i + 1) * m, nout)
                part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
                o_ref[i * m:hi, y, :] = part[:hi - i * m]

    fn = pl.pallas_call(
        kernel, grid=(ny // by,),
        in_specs=[pl.BlockSpec((nchan, by, nx), lambda j: (0, j, 0)),
                  pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, by, nx), lambda j: (0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nout, ny, nx), jnp.float32))
    b = jnp.asarray(blocks)
    return lambda x: fn(x, b)


def run(tag, f):
    try:
        one = jax.jit(f)
        got = np.asarray(one(data))
        rel = np.abs(got - exp).max() / np.abs(exp).max()
        per = measure(f, (data,), reps=100)
        print(f"{tag:28s} {per*1e3:.3f} ms  rel {rel:.1e}", flush=True)
    except Exception as e:
        print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    for by in (2, 4, 8):
        run(f"3d reshape by={by}", strips3d_reshape(by))
    for by in (2, 8):
        run(f"3d per-row by={by}", strips3d_perrow(by))


def strips3d_xsplit(by, bx):
    """Grid over (ny/by, nx/bx): blocks (nchan, by, bx), collapse in VMEM."""
    def kernel(x_ref, b_ref, o_ref):
        X = x_ref[:].reshape(nchan, by * bx)
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
            o_ref[i * m:hi] = part[:hi - i * m].reshape(hi - i * m, by, bx)

    fn = pl.pallas_call(
        kernel, grid=(ny // by, nx // bx),
        in_specs=[pl.BlockSpec((nchan, by, bx), lambda j, k: (0, j, k)),
                  pl.BlockSpec((nb, m, K), lambda j, k: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, by, bx), lambda j, k: (0, j, k)),
        out_shape=jax.ShapeDtypeStruct((nout, ny, nx), jnp.float32))
    b = jnp.asarray(blocks)
    return lambda x: fn(x, b)


def prod3d():
    from spectral_cube_tpu.ops.banded_pallas import smooth_interp_strips_3d
    Sm32 = Sm.astype(np.float32)
    Im32 = Im.astype(np.float32)
    return lambda x: smooth_interp_strips_3d(x, M_host, Sm32, Im32)
