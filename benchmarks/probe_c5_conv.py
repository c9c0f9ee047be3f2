"""Probe the clean path of conv_reproject_raw_strips (config 5 stage B):
it measures 0.40-0.49 ms vs its 0.294 ms X6-MXU bound.  Per channel the
kernel does y strips -> VMEM transpose -> x strips -> transpose back;
candidates for the ~0.1-0.2 ms gap are the two (256,256) XLU transposes,
the per-channel isnan/any check, and grid overhead.

Variants (timing-only; 'notrans' is numerically wrong by design):
  prod      — y strips, T, x strips, T (the production structure)
  notrans   — same dots with the transposes replaced by copies
  latewin   — transpose-free: x strips as T[:, s:s+K] @ XbT with
              misaligned lane windows, column-strip stores
  nocheck   — prod without the isnan/any NaN gate
  dma       — pure per-channel copy floor

Run: python benchmarks/probe_c5_conv.py
"""

import sys
import os
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure
from spectral_cube_tpu.ops.banded_pallas import (plan_strips, strip_blocks,
                                                 _dot)
from spectral_cube_tpu.ops.convolve import separable_factors, _conv_matrix_1d
from spectral_cube_tpu.ops.interpolate import _interp_matrix

n = 256
rng = np.random.RandomState(4)
data = jnp.asarray(rng.rand(n, n, n).astype(np.float32))
x = np.arange(31) - 15
k2 = np.exp(-0.5 * np.add.outer(x ** 2, x ** 2) / 9.0)
k2 = k2 / k2.sum()
yt, xt = separable_factors(k2)
R = _interp_matrix(np.clip(np.arange(n, dtype=np.int64), 0, n - 2),
                   np.full(n, 0.37), n).astype(np.float64)
Gy = (R @ _conv_matrix_1d(n, yt[:, 0]).astype(np.float64)).astype(np.float32)
Gx = (R @ _conv_matrix_1d(n, xt[:, 0]).astype(np.float64)).astype(np.float32)
m, K = plan_strips(Gy != 0.0, max_m=128)
yb, ys = strip_blocks(Gy, m, K)
xb, xs = strip_blocks(Gx, m, K)
nb = yb.shape[0]
print(f"plan m={m} K={K} nb={nb}", flush=True)
xbT = np.ascontiguousarray(np.transpose(xb, (0, 2, 1)))  # (nb, K, m)


def build(variant):
    def kernel(x_ref, yb_ref, xb_ref, o_ref, t_ref, u_ref, w_ref):
        Z = x_ref[0]
        if variant == "dma":
            o_ref[0] = Z
            return
        if variant != "nocheck":
            bad = jnp.any(jnp.isnan(Z))

        def clean():
            for s in range(nb):
                t_ref[s * m:(s + 1) * m] = _dot(
                    yb_ref[s], Z[ys[s]:ys[s] + K, :])
            if variant == "latewin":
                T = t_ref[:n]
                for s in range(nb):
                    hi = min((s + 1) * m, n)
                    res = jax.lax.dot_general(
                        T[:, xs[s]:xs[s] + K], xb_ref[s],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    o_ref[0, :, s * m:hi] = res[:, :hi - s * m]
                return
            if variant == "notrans":
                u_ref[:] = t_ref[:n]
            else:
                u_ref[:] = t_ref[:n].T
            U = u_ref[:]
            for s in range(nb):
                w_ref[s * m:(s + 1) * m] = _dot(
                    xb_ref[s], U[xs[s]:xs[s] + K, :])
            if variant == "notrans":
                o_ref[0] = w_ref[:n]
            else:
                o_ref[0] = w_ref[:n].T

        if variant == "nocheck":
            clean()
        else:
            @pl.when(jnp.logical_not(bad))
            def _():
                clean()

            @pl.when(bad)
            def _():
                o_ref[0] = Z

    xop = xbT if variant == "latewin" else xb
    fn = pl.pallas_call(
        kernel, grid=(n,),
        in_specs=[pl.BlockSpec((1, n, n), lambda c: (c, 0, 0)),
                  pl.BlockSpec(yb.shape, lambda c: (0, 0, 0)),
                  pl.BlockSpec(xop.shape, lambda c: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, n, n), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb * m, n), jnp.float32),
                        pltpu.VMEM((n, n), jnp.float32),
                        pltpu.VMEM((nb * m, n), jnp.float32)])
    return fn, xop


for variant in ("prod", "notrans", "latewin", "nocheck", "dma"):
    fn, xop = build(variant)
    per = _measure(lambda d: fn(d, jnp.asarray(yb), jnp.asarray(xop)),
                   (data,), reps=50)
    print(f"{variant:8s}: {per * 1e3:.3f} ms", flush=True)

from spectral_cube_tpu.ops import regrid as rg
ysg = np.broadcast_to(np.arange(n, dtype=np.float64)[:, None] + 0.37,
                      (n, n)).copy()
xsg = np.broadcast_to(np.arange(n, dtype=np.float64)[None, :] + 0.61,
                      (n, n)).copy()
per = _measure(lambda d: rg.convolve_reproject_separable(d, k2, ysg, xsg),
               (data,), reps=50)
print(f"{'api':8s}: {per * 1e3:.3f} ms", flush=True)
