"""Probe the whole-pipeline fusion (ops/pipeline_fused) against the
shipped two-program config-5 chain on the bench workload (256^3).

Variants:
  chain      — moments_012_pallas(with_stats) + convolve_reproject_separable
               (the production config-5 one_pass)
  fused cbN  — moments_conv_reproject_fused with CB = N channels/grid step
  fused dx   — dense-x contraction variant

All loops keep >=30 ms in-loop (CLAUDE.md RTT rule).

Run: python benchmarks/probe_fused_pipeline.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure
from spectral_cube_tpu.masks import LazyComparisonMask
from spectral_cube_tpu.ops.moments import moments_012_pallas
from spectral_cube_tpu.ops import regrid as rg
from spectral_cube_tpu.ops.pipeline_fused import moments_conv_reproject_fused

n = 256
rng = np.random.RandomState(4)
data_np = (np.exp(-0.5 * ((np.arange(n) - n / 2) / 16.0) ** 2)
           [:, None, None] * rng.rand(1, n, n)
           + 0.1 * rng.randn(n, n, n)).astype(np.float32)
coords = np.arange(n, dtype=np.float64)
x = np.arange(31) - 15
k = np.exp(-0.5 * np.add.outer(x ** 2, x ** 2) / 9.0)
ys = np.broadcast_to(np.arange(n, dtype=np.float64)[:, None] + 0.37,
                     (n, n)).copy()
xs = np.broadcast_to(np.arange(n, dtype=np.float64)[None, :] + 0.61,
                     (n, n)).copy()
snr_mask = LazyComparisonMask(jnp.greater, 0.25, shape=(n, n, n))
data = jnp.asarray(data_np)


def consume(rep, m0, m1, m2, stats):
    return (jnp.nan_to_num(rep) + (m0 + m1 + m2)[None, :, :]
            + (stats["mean"] + stats["sigma"] + stats["min"]
               + stats["max"]))


def chain(d):
    m0, m1, m2, stats = moments_012_pallas(
        d, coords, 1.0, mask_expr=snr_mask, with_stats=True)
    rep = rg.convolve_reproject_separable(d, k, ys, xs)
    return consume(rep, m0, m1, m2, stats)


def make_fused(cb=None, dense_x=None):
    def run(d):
        res = moments_conv_reproject_fused(
            d, k, ys, xs, coords, 1.0, mask_expr=snr_mask,
            cb=cb, dense_x=dense_x)
        assert res is not None
        rep, m0, m1, m2, stats = res
        return consume(rep, m0, m1, m2, stats)
    return run


# numerics sanity on the bench cube before timing
exp = np.asarray(jax.jit(chain)(data))
for cb in (1, 2, 4):
    got = np.asarray(jax.jit(make_fused(cb=cb))(data))
    err = np.nanmax(np.abs(got - exp) / np.maximum(np.abs(exp), 1e-3))
    print(f"fused cb{cb} vs chain: max rel dev {err:.2e}", flush=True)

per = _measure(chain, (data,), reps=120)
print(f"chain          : {per * 1e3:.3f} ms", flush=True)
for cb in (1, 2, 4):
    per = _measure(make_fused(cb=cb), (data,), reps=120)
    print(f"fused cb{cb}      : {per * 1e3:.3f} ms", flush=True)
for dx in (True, False):
    per = _measure(make_fused(cb=4, dense_x=dx), (data,), reps=120)
    print(f"fused cb4 dx={int(dx)}: {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
