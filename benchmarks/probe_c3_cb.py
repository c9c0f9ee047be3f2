"""Config-3 channel-blocking: does per-grid-step fixed overhead explain
the gap between the measured 0.417 ms and the 0.262 ms X6 MXU model?

Variants run CB channels per grid step (clean-only kernel, strips both
axes, same math as the production clean path).  If the gap is per-step
overhead, time should drop toward the MXU model as CB grows; if it is
MXU inefficiency at these tile shapes, time stays flat.

Run: python benchmarks/probe_c3_cb.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure
from spectral_cube_tpu.ops import convolve as cv
from spectral_cube_tpu.ops.banded_pallas import (plan_strips, strip_blocks,
                                                 _dot)

n = 256
ngroups = 64
rng = np.random.RandomState(2)
data_np = rng.rand(n, n, n).astype(np.float32)
kernels = []
for g in range(ngroups):
    sig = 2.0 + 0.05 * g
    x = np.arange(31) - 15
    k = np.exp(-0.5 * (np.add.outer(x ** 2, x ** 2)) / sig ** 2)
    kernels.append(k / k.sum())
group_idx = (np.arange(n) % ngroups).astype(np.int32)
data = jnp.asarray(data_np)

my = np.stack([cv._conv_matrix_1d(n, cv.separable_factors(kk)[0][:, 0])
               for kk in kernels])[:, None]
mx = np.stack([cv._conv_matrix_1d(n, cv.separable_factors(kk)[1][:, 0])
               for kk in kernels])[:, None]
m_y, K_y = plan_strips(np.any(my != 0.0, axis=(0, 1)), max_m=128)
m_x, K_x = plan_strips(np.any(mx != 0.0, axis=(0, 1)), max_m=128)
yb, ys = strip_blocks(my, m_y, K_y)
xbl, xs = strip_blocks(mx, m_x, K_x)
nb_y, nb_x = yb.shape[2], xbl.shape[2]
nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
# channels sorted by group: with CB | (nchan/ngroups) each step is
# single-group
perm = np.argsort(group_idx, kind="stable").astype(np.int32)
gsorted = group_idx[perm].astype(np.int32)


def make_cb(CB):
    gstep = gsorted[::CB].copy()          # group of each step
    pstep = perm.reshape(-1, CB).copy()   # channels of each step

    def kernel(ps_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref,
               t_ref, u_ref, w_ref):
        for j in range(CB):
            Z = x_ref[j]
            for s in range(nb_y):
                t_ref[s * m_y:(s + 1) * m_y] = _dot(
                    yb_ref[0, 0, s], Z[ys[s]:ys[s] + K_y, :])
            u_ref[:] = t_ref[:n].T
            U = u_ref[:]
            for s in range(nb_x):
                w_ref[s * m_x:(s + 1) * m_x] = _dot(
                    xb_ref[0, 0, s], U[xs[s]:xs[s] + K_x, :])
            o_ref[j] = w_ref[:n].T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n // CB,),
        in_specs=[
            pl.BlockSpec((CB, n, n), lambda c, p, g: (p[c, 0] // CB, 0, 0)),
            pl.BlockSpec((1, 1, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, nb_x, m_x, K_x),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CB, n, n),
                               lambda c, p, g: (p[c, 0] // CB, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nbm_y, n), jnp.float32),
                        pltpu.VMEM((n, n), jnp.float32),
                        pltpu.VMEM((nbm_x, n), jnp.float32)])
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32))

    def run(d):
        return fn(jnp.asarray(pstep), jnp.asarray(gstep), d,
                  jnp.asarray(yb), jnp.asarray(xbl))
    return run


# correctness: group_idx = c % 64 and perm sorted means channel order in
# blocks is perm-grouped; compare against applying the right kernel per
# channel (permuted write-back); for CB blocks the p[c,0]//CB block start
# must equal the sorted channel run — holds because perm here is a
# transpose pattern: channels [g, g+64, g+128, g+192] share group g; CB=4
# blocks are exactly those (perm rows), BUT the in-block index maps the
# CUBE block at p//CB — only correct when perm rows are contiguous runs.
# They are not for this interleaved group_idx, so for timing we use a
# contiguous group layout instead (groups = c // 4):
group_idx2 = (np.arange(n) // (n // ngroups)).astype(np.int32)
perm = np.argsort(group_idx2, kind="stable").astype(np.int32)   # identity
gsorted = group_idx2[perm].astype(np.int32)

ref = None
for CB in (1, 2, 4, 8):
    run = make_cb(CB)
    out = np.asarray(jax.jit(run)(data))
    if ref is None:
        ref = out
    else:
        assert np.allclose(out, ref, rtol=2e-5, atol=1e-6), CB
    per = _measure(run, (data,), reps=60)
    print(f"CB={CB}: {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
