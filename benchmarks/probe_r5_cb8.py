"""Round-5 probe: honest CB=8 measurements now that explicit cb requests
are honored (round-4's cb=8 probe silently ran CB=1).

1. per_channel_shift_lerp at CB=4/8 (config-4's kernel; the 13 MB gate
   admits CB=8: 8.7 MB residency at 256^2 planes).
2. conv_reproject_raw_strips stage B at CB=8 strips-x vs CB=4.

Run: python benchmarks/probe_r5_cb8.py
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

nplane, ny, nx = 512, 256, 256
rng = np.random.RandomState(3)
planes = jnp.asarray(rng.rand(nplane, ny, nx).astype(np.float32))
valid = np.ones((ny, nx), bool)
valid[-1, :] = False
valid[:, -1] = False

ref = None
for cb in (4, 8):
    def run(d, cb=cb):
        return per_channel_shift_lerp(d, 0, 0.37, 0, 0.61, valid, cb=cb)
    out = np.asarray(jax.jit(run)(planes))
    if ref is None:
        ref = out
    else:
        assert np.array_equal(out, ref, equal_nan=True), \
            "CB=8 changed shift-lerp results"
    per = _measure(run, (planes,), reps=60)
    print(f"shift_lerp 512x256^2 cb{cb}: {per * 1e3:.3f} ms", flush=True)

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
for cb in (4, 8):
    def run(d, cb=cb):
        return conv_reproject_raw_strips(d, Gy, Gx, My, Mx, Ry, Rx,
                                         valid_np, cb=cb, dense_x=False)
    out = jax.jit(run)(data)
    if out is None:
        print(f"stageB strips-x cb{cb}: infeasible (returned None)",
              flush=True)
        continue
    out = np.asarray(out)
    if ref is None:
        ref = out
    else:
        assert np.array_equal(out, ref, equal_nan=True), \
            "CB=8 changed stage-B results"
    per = _measure(run, (data,), reps=120)
    print(f"stageB strips-x cb{cb}: {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
