"""HBM-scale single-chip benchmark: a 1024^3 float32 cube (4.3 GB).

The synthetic cube is generated ON DEVICE (shipping 4 GB through the
tunnel at ~27 MB/s is not an option), then the core pipeline ops run at
the scale a real ALMA shard would occupy: SNR-masked fused moments,
one-pass statistics, spectral Gaussian smooth (1024-channel banded
matmul), single-beam separable convolution, and the axis-aligned
reproject.  This exercises the same kernels as bench.py but with HBM
~1/3 full, 1024-wide MXU operands, and Pallas grids at 1024^2.

Usage: python benchmarks/bigcube.py [N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# persist compiled programs across runs: the 1024^3 kernels compile for
# minutes each over the tunnel (same rationale as bench.py)
from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = 20


def _timed(fn, *args, reps=REPS):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            dep = jax.lax.optimization_barrier((a[0], acc))
            out = fn(dep[0], *a[1:])
            # full-sum consumption of EVERY leaf: a single-element slice
            # (or skipping leaves) lets XLA DCE the measured work
            tot = dep[1]
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(jnp.real(leaf)).astype(jnp.float32)
            return tot
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    t0 = time.perf_counter()
    np.asarray(looped(*args))
    compile_s = time.perf_counter() - t0
    tiny = jax.jit(lambda d: d.ravel()[0] * 1.0)
    np.asarray(tiny(args[0]))

    def once():
        t0 = time.perf_counter()
        np.asarray(tiny(args[0]))
        return time.perf_counter() - t0
    rtt = min(once() for _ in range(3))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(looped(*args))
        best = min(best, time.perf_counter() - t0)
    return max((best - rtt) / reps, 1e-9), compile_s


def main():
    print(f"backend={jax.default_backend()}  cube={N}^3 f32 "
          f"({N ** 3 * 4 / 2 ** 30:.1f} GiB)", file=sys.stderr)
    from spectral_cube_tpu.ops import moments
    from spectral_cube_tpu.ops.moments import (moments_012,
                                               moments_012_pallas)
    from spectral_cube_tpu.ops import reductions as red
    from spectral_cube_tpu.ops import smoothing as sm
    from spectral_cube_tpu.ops import convolve as cv
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    from spectral_cube_tpu.masks import LazyComparisonMask

    coords = np.arange(N, dtype=np.float64)
    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def synth(key):
        # Gaussian line profile + uniform noise, built in HBM
        v = (jnp.arange(N, dtype=jnp.float32) - N / 2) / (N / 16)
        line = jnp.exp(-0.5 * v * v)[:, None, None]
        noise = jax.random.uniform(key, (N, N, N), jnp.float32)
        return line * noise + 0.1

    data = synth(jax.random.PRNGKey(0))
    jax.block_until_ready(data)
    gvox = N ** 3 / 1e9
    results = []

    # the NaN-normalizing convolution family holds ~4 cube-sized buffers
    # (filled + invalid + num + den); at N^3 * 4B that exceeds one chip's
    # HBM for N=1024 — exactly the regime the mesh shards over.  On a
    # single chip, run those ops on an N x N/2 x N/2 cube (1/4 the voxels)
    ns = N // 2
    data_small = data[:, :ns, :ns]
    jax.block_until_ready(data_small)
    gvox_s = N * ns * ns / 1e9

    mask = LazyComparisonMask(jnp.greater, 0.25, shape=(N, N, N))

    def mom(d):
        if on_tpu:
            return moments_012_pallas(d, coords, 1.0, mask_expr=mask)
        return moments_012(d, coords, 1.0, include=d > 0.25)

    def stats(d):
        # the product path (cube.statistics): one-HBM-pass Pallas route
        # on TPU, masked_statistics' two-pass form elsewhere
        if on_tpu:
            return tuple(moments.statistics_pallas(d).values())
        return tuple(red.masked_statistics(d, red.valid_mask(d)).values())

    for name, fn, extra in [
        ("masked_moments", mom, ()),
        ("statistics", stats, ()),
    ]:
        per, comp = _timed(fn, data, *extra)
        results.append({"op": name, "ms": round(per * 1e3, 3),
                        "gvox_per_s": round(gvox / per, 2)})
        print(f"{name:22s} {per * 1e3:8.2f} ms  {gvox / per:7.1f} Gvox/s"
              f"  (compile {comp:.0f}s)", file=sys.stderr)

    per, comp = _timed(lambda d: sm.spectral_smooth_cube(
        d, sm.gaussian_kernel1d(2.0)), data_small)
    results.append({"op": "spectral_smooth", "ms": round(per * 1e3, 3),
                    "gvox_per_s": round(gvox_s / per, 2)})
    print(f"{'spectral_smooth':22s} {per * 1e3:8.2f} ms  "
          f"{gvox_s / per:7.1f} Gvox/s  (compile {comp:.0f}s)",
          file=sys.stderr)

    # single-beam separable convolution (31x31 Gaussian)
    x = np.arange(31) - 15
    k = np.exp(-0.5 * np.add.outer(x ** 2, x ** 2) / 9.0)
    k /= k.sum()
    per, comp = _timed(lambda d: cv.convolve2d_separable(d, k),
                       data_small)
    results.append({"op": "separable_convolve", "ms": round(per * 1e3, 3),
                    "gvox_per_s": round(gvox_s / per, 2)})
    print(f"{'separable_convolve':22s} {per * 1e3:8.2f} ms  "
          f"{gvox_s / per:7.1f} Gvox/s  (compile {comp:.0f}s)",
          file=sys.stderr)

    ys = np.broadcast_to(np.arange(ns, dtype=np.float64)[:, None] + 0.37,
                         (ns, ns)).copy()
    xs = np.broadcast_to(np.arange(ns, dtype=np.float64)[None, :] + 0.61,
                         (ns, ns)).copy()
    per, comp = _timed(lambda d: _bilinear_spatial_then_linear_z(
        d, coords, ys, xs, 1), data_small)
    results.append({"op": "reproject", "ms": round(per * 1e3, 3),
                    "gvox_per_s": round(gvox_s / per, 2)})
    print(f"{'reproject':22s} {per * 1e3:8.2f} ms  {gvox_s / per:7.1f} "
          f"Gvox/s  (compile {comp:.0f}s)", file=sys.stderr)

    print(json.dumps({"backend": jax.default_backend(), "n": N,
                      "results": results}))


if __name__ == "__main__":
    main()
