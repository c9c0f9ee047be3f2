"""per_channel_resample_raw_strips: dense-x vs strips-x on TPU, robust
rep counts (config-4's general axis-aligned resample path).

Run: python benchmarks/probe_resample_dense.py
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
from spectral_cube_tpu.ops.banded_pallas import per_channel_resample_raw_strips
from spectral_cube_tpu.ops.regrid import _separable_taps

n = 256
rng = np.random.RandomState(3)
data_np = rng.rand(n, n, n).astype(np.float32)

# axis-aligned non-translation mapping (slight zoom): separable taps
ys = (np.arange(n, dtype=np.float64) * 0.997)[:, None].repeat(n, 1)
xs = (np.arange(n, dtype=np.float64) * 0.998)[None, :].repeat(n, 0)
y0 = np.clip(ys.astype(np.int64), 0, n - 2)
x0 = np.clip(xs.astype(np.int64), 0, n - 2)
wy = (ys - y0).astype(np.float32)
wx = (xs - x0).astype(np.float32)
taps = _separable_taps(y0, wy, x0, wx, n, n, n, n)
assert taps is not None
my, mx = taps
gidx = np.zeros(n, np.int32)
valid = np.ones((n, n), np.float32)

data = jnp.asarray(data_np)
data_nan = data_np.copy()
data_nan[::7, 100, 100] = np.nan
dn = jnp.asarray(data_nan)

ref = None
for label, dx in (("dense-x", True), ("strips-x", False)):
    fn = jax.jit(lambda d, _dx=dx: per_channel_resample_raw_strips(
        d, my[None, None], mx[None, None], gidx, valid_plane=valid,
        dense_x=_dx))
    out = np.asarray(fn(data))
    if ref is None:
        ref = out
    else:
        assert np.allclose(out, ref, rtol=2e-5, atol=1e-6), label
    per = _measure(lambda d, _f=fn: _f(d), (data,), reps=80)
    pern = _measure(lambda d, _f=fn: _f(d), (dn,), reps=80)
    print(f"{label}: clean {per * 1e3:.3f} ms, nan {pern * 1e3:.3f} ms",
          flush=True)
print("done", flush=True)
