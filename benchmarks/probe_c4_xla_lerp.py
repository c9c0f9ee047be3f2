"""Round-5 probe: XLA shift-lerp vs the Pallas kernel for config 4.

The Pallas per-channel shift-lerp sits AT the Pallas pure-copy floor
(~0.58 ms, 460 GB/s in+out — every layout tried, probe_c4_floor2.py),
while XLA materializes a copy and re-reads it at 688 GB/s
(probe_c4_floor3.py).  If an XLA roll+lerp chain (with the same
validity masking and cond-gated NaN poisoning) streams at XLA rates,
the translation fast path should be XLA, not Pallas.

Run: python benchmarks/probe_c4_xla_lerp.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure
from spectral_cube_tpu.ops.banded_pallas import per_channel_shift_lerp

nplane, ny, nx = 512, 256, 256
rng = np.random.RandomState(3)
data_np = rng.rand(nplane, ny, nx).astype(np.float32)
planes = jnp.asarray(data_np)
valid = np.ones((ny, nx), bool)
valid[-1, :] = False
valid[:, -1] = False
vp = jnp.asarray(valid)
sy, wy, sx, wx = 0, 0.37, 0, 0.61


def _shift(z, s, axis):
    # out[i] = z[i + s]: roll by -s (wrap lands only on vp-masked edges)
    return z if s == 0 else jnp.roll(z, -s, axis=axis)


def xla_lerp(d):
    f = jnp.nan_to_num(d)
    a = _shift(f, sy, 1)
    t = (1.0 - wy) * a + wy * _shift(f, sy + 1, 1)
    b = _shift(t, sx, 2)
    out = (1.0 - wx) * b + wx * _shift(t, sx + 1, 2)

    def poison(o):
        m = jnp.isnan(d).astype(jnp.float32)
        am = _shift(m, sy, 1)
        tm = (1.0 - wy) * am + wy * _shift(m, sy + 1, 1)
        bm = _shift(tm, sx, 2)
        wn = (1.0 - wx) * bm + wx * _shift(tm, sx + 1, 2)
        return jnp.where(wn > 1e-6, jnp.nan, o)

    out = lax.cond(jnp.isnan(d).any(), poison, lambda o: o, out)
    return jnp.where(vp[None], out, jnp.nan)


# parity vs the Pallas kernel (valid region identical; invalid is NaN)
ref = np.asarray(jax.jit(lambda d: per_channel_shift_lerp(
    d, sy, wy, sx, wx, valid))(planes))
got = np.asarray(jax.jit(xla_lerp)(planes))
assert np.array_equal(np.isnan(got), np.isnan(ref)), "NaN mismatch"
m = np.isfinite(ref)
dev = np.abs(got[m] - ref[m]).max()
print(f"xla vs pallas max dev {dev:.2e}", flush=True)

per = _measure(xla_lerp, (planes,), reps=60)
print(f"xla shift_lerp: {per * 1e3:.3f} ms", flush=True)
per = _measure(lambda d: per_channel_shift_lerp(d, sy, wy, sx, wx, valid),
               (planes,), reps=60)
print(f"pallas shift_lerp cb4: {per * 1e3:.3f} ms", flush=True)

# dirty-cube variant (the poison branch actually runs)
dirty = data_np.copy()
dirty[7, 100, 100] = np.nan
dirty_j = jnp.asarray(dirty)
refd = np.asarray(jax.jit(lambda d: per_channel_shift_lerp(
    d, sy, wy, sx, wx, valid))(dirty_j))
gotd = np.asarray(jax.jit(xla_lerp)(dirty_j))
assert np.array_equal(np.isnan(gotd), np.isnan(refd)), "dirty NaN mismatch"
per = _measure(xla_lerp, (dirty_j,), reps=60)
print(f"xla shift_lerp dirty: {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
