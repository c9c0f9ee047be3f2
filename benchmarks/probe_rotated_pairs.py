"""Round-5 probe: rotated bilinear via 2 slice-gathers instead of 4
row takes.

In the channels-minor (space, nz) layout the bilinear corners (y, x0)
and (y, x1 = x0+1) are ADJACENT rows of the flattened plane, so one
gather with slice size (2, nz) fetches both taps of an x-pair — halving
the gather count (the rotated path's cost is gather issue rate, not
bytes: 1.6 ms measured vs the 0.90 ms 11-pass byte model).

Run: python benchmarks/probe_rotated_pairs.py
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
from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z

n = 256
rng = np.random.RandomState(7)
data_np = rng.rand(n, n, n).astype(np.float32)
data = jnp.asarray(data_np)
theta = np.deg2rad(3.0)
c, s = np.cos(theta), np.sin(theta)
yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
cy = cx = (n - 1) / 2.0
ys = c * (yy - cy) - s * (xx - cx) + cy
xs = s * (yy - cy) + c * (xx - cx) + cx
zs = np.arange(n, dtype=np.float64)

# host index/weight prep (mirrors the bilinear path)
yvalid = np.isfinite(ys) & (ys >= -1e-3) & (ys <= n - 1 + 1e-3)
xvalid = np.isfinite(xs) & (xs >= -1e-3) & (xs <= n - 1 + 1e-3)
ycl = np.clip(np.nan_to_num(ys), 0, n - 1)
xcl = np.clip(np.nan_to_num(xs), 0, n - 1)
y0 = np.clip(ycl.astype(np.int64), 0, n - 2)
x0 = np.clip(xcl.astype(np.int64), 0, n - 2)
wy = (ycl - y0).astype(np.float32)
wx = (xcl - x0).astype(np.float32)
valid = jnp.asarray((yvalid & xvalid)[None, :, :])

idx0 = jnp.asarray((y0 * n + x0).ravel())          # (y0, x0); +1 = (y0, x1)
idx1 = jnp.asarray(((y0 + 1) * n + x0).ravel())    # (y1, x0); +1 = (y1, x1)
w00 = jnp.asarray(((1 - wy) * (1 - wx)).ravel())[:, None]
w01 = jnp.asarray(((1 - wy) * wx).ravel())[:, None]
w10 = jnp.asarray((wy * (1 - wx)).ravel())[:, None]
w11 = jnp.asarray((wy * wx).ravel())[:, None]


def pair_gather(flat, idx):
    # gather (2, nz) slices starting at each idx: both x taps in one op
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    out = lax.gather(flat, idx[:, None], dn, slice_sizes=(2, n),
                     mode=lax.GatherScatterMode.CLIP)
    return out  # (ny*nx, 2, nz)


def rotated_pairs(d):
    flat = d.reshape(n, n * n).T                   # (space, nz)
    g0 = pair_gather(flat, idx0)
    g1 = pair_gather(flat, idx1)
    acc = (g0[:, 0] * w00 + g0[:, 1] * w01
           + g1[:, 0] * w10 + g1[:, 1] * w11)
    out = acc.T.reshape(n, n, n)
    return jnp.where(valid, out, jnp.nan)


def rotated_takes(d):
    return jnp.nan_to_num(_bilinear_spatial_then_linear_z(d, zs, ys, xs, 1))


# parity on the valid region
a = np.asarray(jax.jit(rotated_pairs)(data))
b = np.asarray(jax.jit(rotated_takes)(data))
m = np.isfinite(a) & (np.abs(b) > 0)
dev = np.abs(np.nan_to_num(a)[m] - b[m]).max()
print(f"pairs vs takes max dev {dev:.2e}", flush=True)

per = _measure(lambda d: jnp.nan_to_num(rotated_pairs(d)), (data,), reps=50)
print(f"pair-gather rotated: {per * 1e3:.3f} ms", flush=True)
per = _measure(rotated_takes, (data,), reps=50)
print(f"4-take rotated (shipped): {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
