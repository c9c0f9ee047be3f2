"""Probe CB=8 (vs 4) in conv_reproject_raw_strips and re-measure the
config-5 stage budget with the round-4 kernels.

Run: python benchmarks/probe_c5_cb8.py
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
from spectral_cube_tpu.ops.banded_pallas import conv_reproject_raw_strips
from spectral_cube_tpu.ops import regrid as rg
from spectral_cube_tpu.ops.moments import moments_012_pallas
from spectral_cube_tpu.masks import LazyComparisonMask

n = 256
rng = np.random.RandomState(4)
data_np = (np.exp(-0.5 * ((np.arange(n) - n / 2) / 16.0) ** 2)
           [:, None, None] * rng.rand(1, n, n)
           + 0.1 * rng.randn(n, n, n)).astype(np.float32)
data = jnp.asarray(data_np)
coords = np.arange(n, dtype=np.float64)
x = np.arange(31) - 15
k = np.exp(-0.5 * np.add.outer(x ** 2, x ** 2) / 9.0)
ys = np.broadcast_to(np.arange(n, dtype=np.float64)[:, None] + 0.37,
                     (n, n)).copy()
xs = np.broadcast_to(np.arange(n, dtype=np.float64)[None, :] + 0.61,
                     (n, n)).copy()
Gy, Gx, My, Mx, Ry, Rx, valid_np, _ = rg._conv_reproject_operators(
    (n, n, n), k, ys, xs, force=True)

# ---- stage A: fused masked moments + statistics -----------------------
snr_mask = LazyComparisonMask(jnp.greater, 0.25, shape=(n, n, n))


def stage_a(d):
    m0, m1, m2, stats = moments_012_pallas(
        d, coords, 1.0, mask_expr=snr_mask, with_stats=True)
    return m0 + m1 + m2 + stats["mean"] + stats["sigma"]


per = _measure(stage_a, (data,), reps=240)
print(f"stageA fused moments+stats: {per * 1e3:.3f} ms", flush=True)

# ---- stage B at CB 4 / 8 ----------------------------------------------
ref = None
for cb in (4, 8):
    def run(d, cb=cb):
        out = conv_reproject_raw_strips(d, Gy, Gx, My, Mx, Ry, Rx,
                                        valid_np, cb=cb)
        if out is None:
            return None
        return out
    out = run(data)
    if out is None:
        print(f"stageB cb{cb}: does not fit VMEM budget", flush=True)
        continue
    out = np.asarray(jax.jit(run)(data))
    if ref is None:
        ref = out
    else:
        same = np.array_equal(out, ref, equal_nan=True)
        print(f"cb8 vs cb4 bitwise: {same}", flush=True)
    per = _measure(run, (data,), reps=120)
    print(f"stageB cb{cb}: {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
