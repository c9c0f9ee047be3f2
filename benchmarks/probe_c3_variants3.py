"""Config-3 round 3: dense-y vs strips-y (both with dense-x), and the
pl.when-separated clean path with full NaN machinery.

Run: python benchmarks/probe_c3_variants3.py
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
data_nan = data_np.copy()
data_nan[::7, 100, 100] = np.nan
data_nan = jnp.asarray(data_nan)

my = np.stack([cv._conv_matrix_1d(n, cv.separable_factors(kk)[0][:, 0])
               for kk in kernels])[:, None]
mx = np.stack([cv._conv_matrix_1d(n, cv.separable_factors(kk)[1][:, 0])
               for kk in kernels])[:, None]
m_y, K_y = plan_strips(np.any(my != 0.0, axis=(0, 1)), max_m=128)
yb, ys = strip_blocks(my, m_y, K_y)
nb_y = yb.shape[2]
nbm_y = nb_y * m_y
perm = np.argsort(group_idx, kind="stable").astype(np.int32)
gsorted = group_idx[perm].astype(np.int32)
my_full = my[:, 0].copy()                                # (G, ny, ny)
mx_fullT = np.transpose(mx[:, 0], (0, 2, 1)).copy()      # (G, nx, nx)


def _big(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def make(dense_y: bool, with_nan_machinery: bool):
    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref, t_ref):
        X = x_ref[0]

        def conv(Z):
            if dense_y:
                t_ref[:n] = _big(yb_ref[0], Z)
            else:
                for s in range(nb_y):
                    t_ref[s * m_y:(s + 1) * m_y] = _dot(
                        yb_ref[0, 0, s], Z[ys[s]:ys[s] + K_y, :])
            return _big(t_ref[:n], xb_ref[0])

        if not with_nan_machinery:
            o_ref[0] = conv(X)
            return
        v = jnp.isfinite(X)
        allv = jnp.all(v)

        @pl.when(allv)
        def _():
            o_ref[0] = conv(X)

        @pl.when(jnp.logical_not(allv))
        def _():
            num = conv(jnp.where(v, X, 0.0))
            den = 1.0 - conv(jnp.logical_not(v).astype(jnp.float32))
            ok = den > 1e-6
            o = jnp.where(ok, num / jnp.where(ok, den, 1.0), jnp.nan)
            o_ref[0] = jnp.where(jnp.any(v), o, jnp.nan)

    yspec = (pl.BlockSpec((1, n, n), lambda c, p, g: (g[c], 0, 0))
             if dense_y else
             pl.BlockSpec((1, 1, nb_y, m_y, K_y),
                          lambda c, p, g: (g[c], 0, 0, 0, 0)))
    yarg = jnp.asarray(my_full if dense_y else yb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n,),
        in_specs=[pl.BlockSpec((1, n, n), lambda c, p, g: (p[c], 0, 0)),
                  yspec,
                  pl.BlockSpec((1, n, n), lambda c, p, g: (g[c], 0, 0))],
        out_specs=pl.BlockSpec((1, n, n), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((nbm_y if not dense_y else n, n),
                                   jnp.float32)])
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((n, n, n),
                                                       jnp.float32))

    def run(d):
        return fn(jnp.asarray(perm), jnp.asarray(gsorted), d,
                  yarg, jnp.asarray(mx_fullT))
    return run


def base(d):
    return cv.convolve_per_channel_separable(d, kernels, group_idx)


ref = np.asarray(jax.jit(base)(data))
ref_nan = np.asarray(jax.jit(base)(data_nan))
for label, dy, nanm in (("strips-y + dense-x, clean-only", False, False),
                        ("dense-y + dense-x, clean-only", True, False),
                        ("strips-y + dense-x, FULL", False, True),
                        ("dense-y + dense-x, FULL", True, True)):
    v = make(dy, nanm)
    out = np.asarray(jax.jit(v)(data))
    ok = np.allclose(out, ref, rtol=2e-5, atol=1e-6)
    oknan = True
    if nanm:
        outn = np.asarray(jax.jit(v)(data_nan))
        fin = np.isfinite(ref_nan)
        oknan = (np.allclose(outn[fin], ref_nan[fin], rtol=2e-5, atol=1e-6)
                 and np.array_equal(np.isfinite(outn), fin))
    per = _measure(v, (data,), reps=20)
    pern = _measure(v, (data_nan,), reps=20) if nanm else float("nan")
    print(f"{label}: clean {per * 1e3:.3f} ms, nan-cube {pern * 1e3:.3f} "
          f"ms (match={ok}, nan-match={oknan})", flush=True)
