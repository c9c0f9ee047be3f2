"""Round-5 probe: whole-pipeline fusion with BLOCK-TWO-PASS moment
accumulation (the channel-chunked scheme) vs the shipped two-program
chain on the BASELINE config-5 shape.

Round 4 measured the fused kernel at 1.05-1.12 ms — VPU-bound on its
per-voxel Dekker products (~70 ops/voxel) — vs 0.505 ms for the chain.
The accumulation now runs the block's own two-pass sums (~2 extra VPU
ops/voxel) with plane-level pair conversion once per CB-channel block,
so the fused two-HBM-pass layout gets a second chance.

Run: python benchmarks/probe_c5_fused_v2.py
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
from spectral_cube_tpu.ops.pipeline_fused import moments_conv_reproject_fused
from spectral_cube_tpu.ops.moments import moments_012_pallas
from spectral_cube_tpu.ops import regrid as rg

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
snr_mask = LazyComparisonMask(jnp.greater, 0.25, shape=(n, n, n))


def chain(d):
    m0, m1, m2, stats = moments_012_pallas(
        d, coords, 1.0, mask_expr=snr_mask, with_stats=True)
    rep = rg.convolve_reproject_separable(d, k, ys, xs)
    return (jnp.nan_to_num(rep) + (m0 + m1 + m2)[None, :, :]
            + (stats["mean"] + stats["sigma"] + stats["min"]
               + stats["max"]))


def make_fused(cb):
    def fused(d, cb=cb):
        out, m0, m1, m2, stats = moments_conv_reproject_fused(
            d, k, ys, xs, coords, 1.0, mask_expr=snr_mask, cb=cb)
        return (jnp.nan_to_num(out) + (m0 + m1 + m2)[None, :, :]
                + (stats["mean"] + stats["sigma"] + stats["min"]
                   + stats["max"]))
    return fused


# correctness cross-check fused vs chain before timing
ref = np.asarray(jax.jit(chain)(data))
got = np.asarray(jax.jit(make_fused(4))(data))
dev = np.nanmax(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3))
print(f"fused(cb4) vs chain max rel dev {dev:.2e}", flush=True)

per = _measure(chain, (data,), reps=120)
print(f"chain: {per * 1e3:.3f} ms", flush=True)
for cb in (4, 8):
    try:
        fused = make_fused(cb)
        if jax.jit(fused)(data) is None:
            print(f"fused cb{cb}: infeasible", flush=True)
            continue
        per = _measure(fused, (data,), reps=120)
        print(f"fused cb{cb}: {per * 1e3:.3f} ms", flush=True)
    except Exception as exc:
        print(f"fused cb{cb} failed: {type(exc).__name__}: {exc}",
              flush=True)
print("done", flush=True)
