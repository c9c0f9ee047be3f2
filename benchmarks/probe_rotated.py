"""Rotated (non-separable) reproject on TPU: measure the existing
corner-gather path against a channels-minor row-gather layout.

A rotated WCS mapping defeats the separable tap-matmul path
(ops/regrid.py routes it to four jnp.take gathers along the flattened
spatial axis).  With the cube in (nz, ny*nx) layout each gathered
element is a column strided by the plane size — the worst case for the
TPU's vector memory.  Transposing to (ny*nx, nz) first makes every
gathered row a contiguous nz-vector, turning the gather into large-slice
row copies.

Run: python benchmarks/probe_rotated.py
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

n = 256
rng = np.random.RandomState(7)
data_np = rng.rand(n, n, n).astype(np.float32)

theta = np.deg2rad(3.0)
c, s = np.cos(theta), np.sin(theta)
yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
cy = cx = (n - 1) / 2.0
ys = c * (yy - cy) - s * (xx - cx) + cy
xs = s * (yy - cy) + c * (xx - cx) + cx

yvalid = (ys >= 0) & (ys <= n - 1)
xvalid = (xs >= 0) & (xs <= n - 1)
ycl = np.clip(ys, 0, n - 1)
xcl = np.clip(xs, 0, n - 1)
y0 = np.clip(ycl.astype(np.int64), 0, n - 2)
x0 = np.clip(xcl.astype(np.int64), 0, n - 2)
wy = (ycl - y0).astype(np.float32)
wx = (xcl - x0).astype(np.float32)
y1 = y0 + 1
x1 = x0 + 1
valid = jnp.asarray((yvalid & xvalid)[None])

corners = [((yv * n + xv).ravel(), w.astype(np.float32).ravel())
           for yv, xv, w in ((y0, x0, (1 - wy) * (1 - wx)),
                             (y0, x1, (1 - wy) * wx),
                             (y1, x0, wy * (1 - wx)),
                             (y1, x1, wy * wx))]


def path_take_axis1(d):
    flat = d.reshape(n, n * n)
    out = jnp.zeros((n, n * n), d.dtype)
    for idx, w in corners:
        out = out + jnp.take(flat, jnp.asarray(idx), axis=1) * \
            jnp.asarray(w)[None, :]
    return jnp.where(valid, out.reshape(n, n, n), jnp.nan)


def path_transpose_rows(d):
    flat = d.reshape(n, n * n).T          # (spatial, nz) channels-minor
    out = jnp.zeros((n * n, n), d.dtype)
    for idx, w in corners:
        out = out + jnp.take(flat, jnp.asarray(idx), axis=0) * \
            jnp.asarray(w)[:, None]
    return jnp.where(valid, out.T.reshape(n, n, n), jnp.nan)


def path_onehot_matmul(d):
    # control: gather as bf16 one-hot matmul would be n^2 x n^2 — absurd;
    # instead 2-step: gather rows of y (banded per output row is not
    # representable as one matmul) — skipped
    return None


data = jnp.asarray(data_np)
ref = None
for name, fn in (("take(axis=1) [current]", path_take_axis1),
                 ("transpose+row-gather", path_transpose_rows)):
    out = np.asarray(jax.jit(fn)(data))
    if ref is None:
        ref = out
    else:
        fin = np.isfinite(ref)
        assert np.allclose(out[fin], ref[fin], rtol=1e-6), name
    per = _measure(fn, (data,), reps=10)
    gbps = data_np.size * 4 * 2 / per / 1e9
    print(f"{name}: {per * 1e3:.3f} ms  ({gbps:.0f} GB/s apparent, "
          f"in+out model)", flush=True)

# bicubic: nonseparable spline path as shipped
from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
zs = np.arange(n, dtype=np.float64)


def shipped_bilinear(d):
    return jnp.nan_to_num(_bilinear_spatial_then_linear_z(d, zs, ys, xs, 1))


def shipped_bicubic(d):
    return jnp.nan_to_num(_bilinear_spatial_then_linear_z(d, zs, ys, xs, 3))


for name, fn, reps in (("shipped rotated bilinear", shipped_bilinear, 10),
                       ("shipped rotated bicubic", shipped_bicubic, 5)):
    per = _measure(fn, (data,), reps=reps)
    gbps = data_np.size * 4 * 2 / per / 1e9
    print(f"{name}: {per * 1e3:.3f} ms  ({gbps:.0f} GB/s apparent)",
          flush=True)
