"""Config-3 round 4: the dense-x kernel regressed under the full NaN
machinery (bench: strips 0.440 ms -> dense-x 0.553 ms, while clean-only
dense-x measured 0.318).  Head-to-head in ONE process:

  prod dense-x      — shipped kernel, dense_x=True (unconditional
                      where + pl.when den pass)
  prod strips       — shipped kernel, dense_x=False
  gated dense-x     — clean path under pl.when(all finite), conv(X)
                      with no where; dirty path num/den

Run: python benchmarks/probe_c3_variants4.py
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
from spectral_cube_tpu.ops.banded_pallas import (
    plan_strips, strip_blocks, per_channel_conv_strips, _dot, _dense_xT,
    _make_conv_dx, _DEN_EPS)

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

for label, dx in (("prod dense-x", True), ("prod strips", False)):
    fn = jax.jit(lambda d, _dx=dx: per_channel_conv_strips(
        d, my, mx, group_idx, dense_x=_dx))
    per = _measure(lambda d, _f=fn: _f(d), (data,), reps=60)
    print(f"{label}: {per * 1e3:.3f} ms", flush=True)


def gated_dense(d):
    m_y, K_y = plan_strips(np.any(my != 0.0, axis=(0, 1)), max_m=128)
    yb, ys = strip_blocks(my, m_y, K_y)
    nb_y = yb.shape[2]
    nbm_y = nb_y * m_y
    xT = _dense_xT(mx)
    perm = np.argsort(group_idx, kind="stable").astype(np.int32)
    gsorted = group_idx[perm].astype(np.int32)
    dims_y = (m_y, K_y, nb_y, n)

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref, t_ref):
        conv = _make_conv_dx(1, dims_y, ys, t_ref)
        X = x_ref[0]
        v = jnp.isfinite(X)
        allv = jnp.all(v)

        @pl.when(allv)
        def _():
            o_ref[0] = conv(yb_ref, xb_ref, X)

        @pl.when(jnp.logical_not(allv))
        def _():
            num = conv(yb_ref, xb_ref, jnp.where(v, X, 0.0))
            den = 1.0 - conv(yb_ref, xb_ref,
                             jnp.logical_not(v).astype(jnp.float32))
            ok = den > _DEN_EPS
            o = jnp.where(ok, num / jnp.where(ok, den, 1.0), jnp.nan)
            o_ref[0] = jnp.where(jnp.any(v), o, jnp.nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, 1, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, n, n), lambda c, p, g: (g[c], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, n), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((nbm_y, n), jnp.float32)])
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32))
    return fn(jnp.asarray(perm), jnp.asarray(gsorted), d,
              jnp.asarray(yb), jnp.asarray(xT))


ref = np.asarray(jax.jit(lambda d: per_channel_conv_strips(
    d, my, mx, group_idx, dense_x=False))(data))
got = np.asarray(jax.jit(gated_dense)(data))
print("gated matches:", bool(np.allclose(got, ref, rtol=2e-5, atol=1e-6)),
      flush=True)
per = _measure(gated_dense, (data,), reps=60)
print(f"gated dense-x: {per * 1e3:.3f} ms", flush=True)

# NaN-cube timing for the two competitive variants
data_nan = data_np.copy()
data_nan[::7, 100, 100] = np.nan
dn = jnp.asarray(data_nan)
for label, f in (
        ("prod dense-x (nan cube)",
         jax.jit(lambda d: per_channel_conv_strips(d, my, mx, group_idx,
                                                   dense_x=True))),
        ("prod strips (nan cube)",
         jax.jit(lambda d: per_channel_conv_strips(d, my, mx, group_idx,
                                                   dense_x=False))),
        ("gated dense-x (nan cube)", gated_dense)):
    per = _measure(lambda d, _f=f: _f(d), (dn,), reps=60)
    print(f"{label}: {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
