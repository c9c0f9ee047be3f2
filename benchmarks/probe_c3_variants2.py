"""Config-3 kernel surgery: attribute the MXU shortfall.

Variants (timing-only where noted):
  base        — shipped per_channel_conv_strips
  groups=1    — same kernel, all channels share one group (are the
                per-group block fetches the cost?)
  no-trans    — transposes replaced by copies (WRONG MATH, timing only:
                what do the two VPU transposes cost?)
  dense-x     — x pass as one dot_general contracting on dim 1 against
                the full (nx, nx) matrix: no transposes, no windows,
                2x modeled MXU flops on the x side

Run: python benchmarks/probe_c3_variants2.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
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


def one_pass_base(d):
    return cv.convolve_per_channel_separable(d, kernels, group_idx)


per = _measure(one_pass_base, (data,), reps=20)
print(f"base (64 groups): {per * 1e3:.3f} ms", flush=True)

k1 = [kernels[0]]
gidx1 = np.zeros(n, np.int32)


def one_pass_g1(d):
    return cv.convolve_per_channel_separable(d, k1, gidx1)


per = _measure(one_pass_g1, (data,), reps=20)
print(f"groups=1: {per * 1e3:.3f} ms", flush=True)


# ---- custom kernel variants (clean data only: no NaN branch) ----------
def factors(kern):
    yt, xt = cv.separable_factors(kern)
    return yt, xt


my = np.stack([cv._conv_matrix_1d(n, factors(kk)[0][:, 0]) for kk in kernels])
mx = np.stack([cv._conv_matrix_1d(n, factors(kk)[1][:, 0]) for kk in kernels])
my = my[:, None]
mx = mx[:, None]

m_y, K_y = plan_strips(np.any(my != 0.0, axis=(0, 1)), max_m=128)
m_x, K_x = plan_strips(np.any(mx != 0.0, axis=(0, 1)), max_m=128)
yb, ys = strip_blocks(my, m_y, K_y)
xbl, xs = strip_blocks(mx, m_x, K_x)
nb_y, nb_x = yb.shape[2], xbl.shape[2]
nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
perm = np.argsort(group_idx, kind="stable").astype(np.int32)
gsorted = group_idx[perm].astype(np.int32)


def make_variant(transpose: bool, dense_x: bool):
    mx_full = np.transpose(mx[:, 0], (0, 2, 1)).copy()  # (G, nx, nx) = Mx^T

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref,
               t_ref, u_ref, w_ref):
        X = x_ref[0]
        for s in range(nb_y):
            t_ref[s * m_y:(s + 1) * m_y] = _dot(
                yb_ref[0, 0, s], X[ys[s]:ys[s] + K_y, :])
        T = t_ref[:n]
        if dense_x:
            # out = T @ Mx^T: one big dot, contracting dim1 x dim0 of Mx^T
            o_ref[0] = lax.dot_general(
                T, xb_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
            return
        if transpose:
            u_ref[:] = T.T
        else:
            u_ref[:] = T          # WRONG math; timing only
        U = u_ref[:]
        for s in range(nb_x):
            w_ref[s * m_x:(s + 1) * m_x] = _dot(
                xb_ref[0, 0, s], U[xs[s]:xs[s] + K_x, :])
        if transpose:
            o_ref[0] = w_ref[:n].T
        else:
            o_ref[0] = w_ref[:n]

    if dense_x:
        xspec = pl.BlockSpec((1, n, n), lambda c, p, g: (g[c], 0, 0))
        xarg = jnp.asarray(mx_full)
    else:
        xspec = pl.BlockSpec((1, 1, nb_x, m_x, K_x),
                             lambda c, p, g: (g[c], 0, 0, 0, 0))
        xarg = jnp.asarray(xbl)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, 1, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            xspec,
        ],
        out_specs=pl.BlockSpec((1, n, n), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((nbm_y, n), jnp.float32),
                        pltpu.VMEM((n, n), jnp.float32),
                        pltpu.VMEM((nbm_x, n), jnp.float32)])
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32))

    def run(d):
        return fn(jnp.asarray(perm), jnp.asarray(gsorted), d,
                  jnp.asarray(yb), xarg)
    return run


ref = np.asarray(jax.jit(make_variant(True, False))(data))
out_dense = np.asarray(jax.jit(make_variant(False, True))(data))
print("dense-x matches strips:",
      bool(np.allclose(out_dense, ref, rtol=2e-5, atol=1e-6)), flush=True)

for label, v in (("strips+transposes (clean-only)", make_variant(True, False)),
                 ("no-transpose TIMING-ONLY", make_variant(False, False)),
                 ("dense-x (no transposes)", make_variant(False, True))):
    per = _measure(v, (data,), reps=20)
    print(f"{label}: {per * 1e3:.3f} ms", flush=True)
