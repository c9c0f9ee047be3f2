"""ALMA spectral-line shape probe: (4096, 512, 512) float32 (4.3 GB) —
the 4k-channel regime real spectral-line cubes occupy (round-3 task 10 /
round-5 planner-cache work).  Exercises the channel-chunked moments
kernel, the one-pass statistics route, and the overlap-save smooth at a
long spectral axis, with host operator-build time reported separately
(the planner caches make repeat calls free).

Run: python benchmarks/probe_alma_shape.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure
from spectral_cube_tpu.masks import LazyComparisonMask
from spectral_cube_tpu.ops import moments
from spectral_cube_tpu.ops import smoothing as sm

nchan, ny, nx = 4096, 512, 512
gvox = nchan * ny * nx / 1e9

key = jax.random.PRNGKey(0)
data = jax.jit(lambda k2: jax.random.uniform(
    k2, (nchan, ny, nx), jnp.float32))(key)
jax.block_until_ready(data)
coords = np.arange(nchan, dtype=np.float64)
mask = LazyComparisonMask(jnp.greater, 0.25, shape=(nchan, ny, nx))

per = _measure(lambda d: moments.moments_012_pallas(
    d, coords, 1.0, mask_expr=mask), (data,), reps=6)
print(f"masked_moments 4096x512x512: {per * 1e3:.2f} ms "
      f"({gvox / per:.1f} Gvox/s)", flush=True)

per = _measure(lambda d: tuple(moments.statistics_pallas(d).values()),
               (data,), reps=6)
print(f"statistics     4096x512x512: {per * 1e3:.2f} ms "
      f"({gvox / per:.1f} Gvox/s)", flush=True)

k = sm.gaussian_kernel1d(2.0)
t0 = time.perf_counter()
_ = sm.spectral_smooth_cube(data[:, :8, :128], k)   # host operator build
jax.block_until_ready(_)
print(f"smooth operator build+compile (first call, small slab): "
      f"{time.perf_counter() - t0:.1f} s", flush=True)
# half-plane cube for the NaN-capable smooth: its dirty branch holds
# ~5 cube-sized buffers (input/filled/num/den/out) and XLA reserves the
# max over cond branches, so a 4.3 GB cube needs ~21 GB — beyond one
# chip's HBM, exactly the regime the mesh shards over (bigcube.py makes
# the same cut for the convolution family)
data_h = data[:, :, :256]
jax.block_until_ready(data_h)
gvox_h = nchan * ny * 256 / 1e9
per = _measure(lambda d: sm.spectral_smooth_cube(d, k), (data_h,), reps=6)
print(f"spectral_smooth 4096x512x256: {per * 1e3:.2f} ms "
      f"({gvox_h / per:.1f} Gvox/s)", flush=True)
print("done", flush=True)
