"""Probe CB channel blocking with BLOCK-LEVEL NaN gating in
conv_reproject_raw_strips (config-5 stage B / config-4 sibling), clean
and NaN cubes, plus the composed config-5 chain at the winning CB.

Run: python benchmarks/probe_conv_cb.py
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
from spectral_cube_tpu.ops.banded_pallas import conv_reproject_raw_strips

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
nan_np = data_np.copy()
nan_np[::16, 10:40, :64] = np.nan          # 16 dirty channels
nan_data = jnp.asarray(nan_np)

OPS = rg._conv_reproject_operators((n, n, n), k, ys, xs, force=True)
Gy, Gx, My, Mx, Ry, Rx, valid_np, _ = OPS


def stage_b(cb):
    def run(d):
        return conv_reproject_raw_strips(d, Gy, Gx, My, Mx, Ry, Rx,
                                         valid_np, cb=cb)
    return run


# bitwise parity across CB before timing (clean + NaN)
for src in (data, nan_data):
    ref = np.asarray(jax.jit(stage_b(1))(src))
    for cb in (2, 4):
        got = np.asarray(jax.jit(stage_b(cb))(src))
        assert np.array_equal(got, ref, equal_nan=True), cb
print("bitwise parity CB 1/2/4 OK (clean + NaN)", flush=True)

for cb in (1, 2, 4):
    per = _measure(stage_b(cb), (data,), reps=120)
    print(f"stageB clean cb{cb}: {per * 1e3:.3f} ms", flush=True)
for cb in (1, 4):
    per = _measure(stage_b(cb), (nan_data,), reps=120)
    print(f"stageB nan   cb{cb}: {per * 1e3:.3f} ms", flush=True)


def chain(d):
    m0, m1, m2, stats = moments_012_pallas(
        d, coords, 1.0, mask_expr=snr_mask, with_stats=True)
    rep = rg.convolve_reproject_separable(d, k, ys, xs)
    return (jnp.nan_to_num(rep) + (m0 + m1 + m2)[None, :, :]
            + (stats["mean"] + stats["sigma"] + stats["min"]
               + stats["max"]))


per = _measure(chain, (data,), reps=120)
print(f"config5 chain (auto CB): {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
