"""Probe channel blocking in per_channel_shift_lerp (config 4) and the
strips-x alternative in conv_reproject_raw_strips at CB=4 (config 5
stage B).

Run: python benchmarks/probe_c4_cb.py
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
from spectral_cube_tpu.ops.banded_pallas import (per_channel_shift_lerp,
                                                 conv_reproject_raw_strips)
from spectral_cube_tpu.ops import regrid as rg

# ---- config-4 shape: 512 planes of 256^2, +0.37/+0.61 translation ----
nplane, ny, nx = 512, 256, 256
rng = np.random.RandomState(3)
planes = jnp.asarray(rng.rand(nplane, ny, nx).astype(np.float32))
valid = np.ones((ny, nx), bool)
valid[-1, :] = False
valid[:, -1] = False

for cb in (1, 2, 4):
    def run(d, cb=cb):
        return per_channel_shift_lerp(d, 0, 0.37, 0, 0.61, valid, cb=cb)
    per = _measure(run, (planes,), reps=60)
    print(f"shift_lerp 512x256^2 cb{cb}: {per * 1e3:.3f} ms", flush=True)

# ---- config-5 stage B: strips-x vs dense-x at CB=4 -------------------
n = 256
rng = np.random.RandomState(4)
data = jnp.asarray((np.exp(-0.5 * ((np.arange(n) - n / 2) / 16.0) ** 2)
                    [:, None, None] * rng.rand(1, n, n)
                    + 0.1 * rng.randn(n, n, n)).astype(np.float32))
x = np.arange(31) - 15
k = np.exp(-0.5 * np.add.outer(x ** 2, x ** 2) / 9.0)
ys = np.broadcast_to(np.arange(n, dtype=np.float64)[:, None] + 0.37,
                     (n, n)).copy()
xs = np.broadcast_to(np.arange(n, dtype=np.float64)[None, :] + 0.61,
                     (n, n)).copy()
Gy, Gx, My, Mx, Ry, Rx, valid_np, _ = rg._conv_reproject_operators(
    (n, n, n), k, ys, xs, force=True)

ref = None
for dx_flag in (True, False):
    def run(d, dx_flag=dx_flag):
        return conv_reproject_raw_strips(d, Gy, Gx, My, Mx, Ry, Rx,
                                         valid_np, cb=4, dense_x=dx_flag)
    out = np.asarray(jax.jit(run)(data))
    if ref is None:
        ref = out
    else:
        dev = np.nanmax(np.abs(out - ref))
        print(f"strips-x vs dense-x max dev {dev:.2e} "
              "(different dot order: small f32 wobble expected)",
              flush=True)
    per = _measure(run, (data,), reps=120)
    print(f"stageB cb4 dense_x={int(dx_flag)}: {per * 1e3:.3f} ms",
          flush=True)
print("done", flush=True)
