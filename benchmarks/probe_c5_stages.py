"""Stage-level breakdown of BASELINE config 5 on the real TPU: fused
moments+stats vs convolve_reproject_separable vs the final combine, to
attribute the gap between the 0.33 ms HBM model and the ~0.8 ms measured
pipeline.

Run: python benchmarks/probe_c5_stages.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _measure

from spectral_cube_tpu.ops.moments import moments_012_pallas
from spectral_cube_tpu.masks import LazyComparisonMask
from spectral_cube_tpu.ops import regrid as rg

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


def report(name, per, passes):
    gbps = n ** 3 * 4 * passes / per / 1e9
    print(f"{name}: {per * 1e3:.3f} ms  ({gbps:.0f} GB/s apparent, "
          f"{passes} passes modeled)", flush=True)


# stage A: fused moments + statistics
per = _measure(lambda d: moments_012_pallas(
    d, coords, 1.0, mask_expr=snr_mask, with_stats=True), (data,), reps=50)
report("A  moments+stats (fused)", per, 1)

per = _measure(lambda d: moments_012_pallas(
    d, coords, 1.0, mask_expr=snr_mask), (data,), reps=50)
report("A' moments only", per, 1)

# stage B: fused convolve+reproject
per = _measure(lambda d: rg.convolve_reproject_separable(d, k, ys, xs),
               (data,), reps=50)
report("B  convolve+reproject (fused)", per, 2)

# stage C: the combine (nan_to_num + broadcast adds)
m0 = jnp.zeros((n, n)); s = jnp.float32(1.0)


def combine(d):
    return jnp.nan_to_num(d) + (m0 + m0 + m0)[None] + s


per = _measure(combine, (data,), reps=50)
report("C  combine elementwise", per, 2)

# whole pipeline for cross-check
def one_pass(d):
    m0_, m1_, m2_, stats = moments_012_pallas(
        d, coords, 1.0, mask_expr=snr_mask, with_stats=True)
    rep = rg.convolve_reproject_separable(d, k, ys, xs)
    return (jnp.nan_to_num(rep) + (m0_ + m1_ + m2_)[None, :, :]
            + (stats["mean"] + stats["sigma"] + stats["min"]
               + stats["max"]))


per = _measure(one_pass, (data,), reps=50)
report("ALL pipeline", per, 4)
