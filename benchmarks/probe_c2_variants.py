"""Isolate config-2 (smooth+interp strips) overhead on the real TPU.

Variants: prod kernel / clean-only strips at xb in {512, 1024, 2048} /
pure-copy DMA floor at the same grid granularities.  The prod kernel's
0.634 ms vs the 0.246 ms HBM model leaves ~0.39 ms unattributed; this
probe tells whether it's the always-resident NaN scratches (VMEM forcing
xb=512), grid-step overhead, or the strip dots themselves.

Run: python benchmarks/probe_c2_variants.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
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
S_cols = ny * nx
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
print(f"plan m={m} K={K} nb={nb} starts={starts}", flush=True)

flat = jnp.asarray(data_np.reshape(nchan, S_cols))
exp = (M_host.astype(np.float64) @ data_np.reshape(nchan, -1).astype(np.float64))


def clean_strips(xb):
    """Strip matmuls only — no isfinite, no scratches, no branch."""
    def kernel(x_ref, b_ref, o_ref):
        X = x_ref[:]
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
            o_ref[i * m:hi] = part[:hi - i * m]

    fn = pl.pallas_call(
        kernel, grid=(S_cols // xb,),
        in_specs=[pl.BlockSpec((nchan, xb), lambda j: (0, j)),
                  pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, xb), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nout, S_cols), jnp.float32))
    b = jnp.asarray(blocks)
    return lambda x: fn(x, b)


def clean_strips_finite(xb):
    """Strips + the isfinite/all check (branch body empty) — isolates the
    VPU check cost."""
    def kernel(x_ref, b_ref, o_ref):
        X = x_ref[:]
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
            o_ref[i * m:hi] = part[:hi - i * m]
        v = jnp.isfinite(X)

        @pl.when(jnp.logical_not(jnp.all(v)))
        def _():
            o_ref[0:8] = o_ref[0:8] * 1.0

    fn = pl.pallas_call(
        kernel, grid=(S_cols // xb,),
        in_specs=[pl.BlockSpec((nchan, xb), lambda j: (0, j)),
                  pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, xb), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nout, S_cols), jnp.float32))
    b = jnp.asarray(blocks)
    return lambda x: fn(x, b)


def copy_floor(xb):
    """Read (nin, xb), write (nout, xb) — the DMA floor at this grid."""
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:nout, :]

    fn = pl.pallas_call(
        kernel, grid=(S_cols // xb,),
        in_specs=[pl.BlockSpec((nchan, xb), lambda j: (0, j))],
        out_specs=pl.BlockSpec((nout, xb), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nout, S_cols), jnp.float32))
    return fn


def run(tag, f, check=True):
    one = jax.jit(f)
    got = np.asarray(one(flat))
    if check:
        rel = np.abs(got - exp).max() / np.abs(exp).max()
        tagacc = f"rel {rel:.1e}"
    else:
        tagacc = "copy"
    per = measure(f, (flat,), reps=100)
    print(f"{tag:28s} {per*1e3:.3f} ms  {tagacc}", flush=True)


if __name__ == "__main__":
    from spectral_cube_tpu.ops.banded_pallas import smooth_interp_strips
    run("prod smooth_interp_strips",
        lambda x: smooth_interp_strips(x, M_host, Sm.astype(np.float32),
                                       Im.astype(np.float32)))
    for xb in (512, 1024, 2048):
        run(f"clean strips xb={xb}", clean_strips(xb))
    run("clean+finite-check xb=1024", clean_strips_finite(1024))
    for xb in (512, 2048):
        run(f"copy floor xb={xb}", copy_floor(xb), check=False)
