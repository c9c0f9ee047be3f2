"""Probe variants of the in-kernel statistics tail of moments_012_pallas:
the fused moments+stats pass costs 0.227 ms vs 0.062 ms for moments alone
(256^3, SNR mask), so the stats tail — sum-of-squares pass, min/max
where-pairs, and the mean-centered deviation pass — triples the kernel.

Variants measured here (all return the same 9 planes):
  prod      — the production kernel (w*w pass + where/min + where/max +
              centered dev pass)
  no-ss     — drop the w*w pass; recombine derives ss = d2 + cnt*m_i^2 at
              plane level (exact: s0 = cnt*m_i)
  no-dev    — drop the centered dev pass; d2 = ss - cnt*m_i^2 (the
              cancellation-prone direction — ceiling probe only)
  minmax1   — min/max from a single where(valid, block, nan)-free pair
              using the already-computed w and a +/-inf blend

Run: python benchmarks/probe_c5_stats.py
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
from spectral_cube_tpu.ops.moments import (_center, _moment_stats,
                                           _pick_tiles, moments_012_pallas)
from spectral_cube_tpu.masks import LazyComparisonMask

n = 256
rng = np.random.RandomState(4)
data_np = (np.exp(-0.5 * ((np.arange(n) - n / 2) / 16.0) ** 2)
           [:, None, None] * rng.rand(1, n, n)
           + 0.1 * rng.randn(n, n, n)).astype(np.float32)
coords = np.arange(n, dtype=np.float64)
snr_mask = LazyComparisonMask(jnp.greater, 0.25, shape=(n, n, n))
data = jnp.asarray(data_np)
coords_c, xbar = _center(coords)
xc_col = jnp.asarray(coords_c, dtype=jnp.float32).reshape(n, 1)
ty, tx = _pick_tiles(n, n, n)
gy, gx = n // ty, n // tx


def build(variant):
    def kernel(data_ref, xc_ref, s0_ref, m1_ref, r1_ref, s2_ref,
               cnt_ref, ss_ref, mn_ref, mx_ref, d2_ref):
        block = data_ref[:]
        valid = jnp.logical_and(jnp.isfinite(block), block > 0.25)
        w = jnp.where(valid, block, 0).astype(jnp.float32)
        xc = xc_ref[:].reshape(n, 1, 1)
        s0, m1_est, r1, s2c, cnt = _moment_stats(w, valid, xc)
        s0_ref[:] = s0
        m1_ref[:] = m1_est
        r1_ref[:] = r1
        s2_ref[:] = s2c
        cnt_ref[:] = cnt.astype(jnp.int32)
        cntf = jnp.maximum(cnt, 1).astype(jnp.float32)
        m_i = s0 / cntf
        if variant == "prod":
            ss_ref[:] = jnp.sum(w * w, axis=0)
            mn_ref[:] = jnp.min(jnp.where(valid, block, jnp.inf), axis=0)
            mx_ref[:] = jnp.max(jnp.where(valid, block, -jnp.inf), axis=0)
            dev = jnp.where(valid, block.astype(jnp.float32) - m_i[None],
                            0.0)
            d2_ref[:] = jnp.sum(dev * dev, axis=0)
        elif variant == "no-ss":
            mn_ref[:] = jnp.min(jnp.where(valid, block, jnp.inf), axis=0)
            mx_ref[:] = jnp.max(jnp.where(valid, block, -jnp.inf), axis=0)
            dev = jnp.where(valid, block.astype(jnp.float32) - m_i[None],
                            0.0)
            d2 = jnp.sum(dev * dev, axis=0)
            d2_ref[:] = d2
            ss_ref[:] = d2 + cnt.astype(jnp.float32) * m_i * m_i
        elif variant == "no-dev":
            ss = jnp.sum(w * w, axis=0)
            ss_ref[:] = ss
            mn_ref[:] = jnp.min(jnp.where(valid, block, jnp.inf), axis=0)
            mx_ref[:] = jnp.max(jnp.where(valid, block, -jnp.inf), axis=0)
            d2_ref[:] = ss - cnt.astype(jnp.float32) * m_i * m_i
        elif variant == "minmax-w":
            # min/max over w (zeros at invalid) then fix spaxels whose
            # true extremum is hidden by the injected zeros at plane level
            # is WRONG in general; measure the op saving only
            ss_ref[:] = jnp.sum(w * w, axis=0)
            mn_ref[:] = jnp.min(w, axis=0)
            mx_ref[:] = jnp.max(w, axis=0)
            dev = jnp.where(valid, block.astype(jnp.float32) - m_i[None],
                            0.0)
            d2_ref[:] = jnp.sum(dev * dev, axis=0)

    fmap = jax.ShapeDtypeStruct((n, n), jnp.float32)
    imap = jax.ShapeDtypeStruct((n, n), jnp.int32)
    out_spec = pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(gy, gx),
        in_specs=[pl.BlockSpec((n, ty, tx), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec,) * 9,
        out_shape=(fmap, fmap, fmap, fmap, imap, fmap, fmap, fmap, fmap))
    return fn


for variant in ("prod", "no-ss", "no-dev", "minmax-w"):
    fn = build(variant)
    per = _measure(lambda d: fn(d, xc_col), (data,), reps=50)
    print(f"{variant:10s}: {per * 1e3:.3f} ms", flush=True)

per = _measure(lambda d: moments_012_pallas(
    d, coords, 1.0, mask_expr=snr_mask, with_stats=True), (data,), reps=50)
print(f"{'api prod':10s}: {per * 1e3:.3f} ms", flush=True)
per = _measure(lambda d: moments_012_pallas(
    d, coords, 1.0, mask_expr=snr_mask), (data,), reps=50)
print(f"{'api no-stat':10s}: {per * 1e3:.3f} ms", flush=True)
