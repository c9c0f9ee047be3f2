"""Internal benchmark suite: per-op device throughput on the current backend.

Covers the BASELINE.json configs:
  1. SNR-masked moment 0/1/2 (+ linewidth) on a 256^3 cube
  2. spectral Gaussian smoothing + 2x spectral interpolation regrid
  3. varying-beam -> common-beam FFT convolution
  4. full-cube reprojection onto an offset WCS
  plus sigma_clip_spectrally (the reference docs' headline timing,
  docs/dask.rst:188-212) and one-pass statistics.

Each op is timed inside one jit with a lax.fori_loop; reps scale up until
compute dominates the (jittery) dispatch RTT.  NOTE: on a tunneled chip
each rep escalation recompiles (minutes per op) — expect a long run there;
on a locally attached chip the suite completes in well under a minute.
Usage: python benchmarks/suite.py [N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = 50


def rtt():
    x = jnp.zeros(8)
    f = jax.jit(lambda v: v * 1.0)
    np.asarray(f(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(name, one_pass, data, reps=REPS, bytes_per_pass=None,
          extra_args=()):
    # device arrays (esp. complex transfers) must enter as jit ARGUMENTS:
    # a device-array closure constant is fetched to host at trace time,
    # which wedges the tunneled backend for complex dtypes (CLAUDE.md)
    def run(nreps):
        @jax.jit
        def looped(d, *extra):
            def body(i, acc):
                # optimization_barrier pins the op inside the loop
                d_dep, acc = jax.lax.optimization_barrier((d, acc))
                out = one_pass(d_dep, *extra)
                # consume the FULL output of EVERY leaf: a single-element
                # slice lets XLA push it through the banded/tap matmuls
                # and DCE the measured work (CLAUDE.md hard-won rule)
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(jnp.real(leaf)).astype(jnp.float32)
                return acc
            return jax.lax.fori_loop(0, nreps, body, jnp.float32(0))
        np.asarray(looped(data, *extra_args))
        t0 = time.perf_counter()
        np.asarray(looped(data, *extra_args))
        return time.perf_counter() - t0

    elapsed = run(reps)
    # dispatch RTT jitters by several ms; keep raising reps until the
    # compute dominates so the subtraction is well-conditioned
    while elapsed < 4 * _RTT and reps < 20000:
        reps *= 8
        elapsed = run(reps)
    per = max((elapsed - _RTT) / reps, 1e-9)
    gvox = data.size / 1e9
    entry = {"op": name, "ms_per_pass": round(per * 1e3, 3),
             "gvox_per_s": round(gvox / per, 2)}
    if bytes_per_pass:
        entry["gb_per_s"] = round(bytes_per_pass / per / 1e9, 1)
    print(f"{name:34s} {per * 1e3:9.3f} ms   {gvox / per:8.2f} Gvox/s"
          + (f"   {bytes_per_pass / per / 1e9:7.1f} GB/s"
             if bytes_per_pass else ""))
    return entry


def main():
    global _RTT
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(N, N, N).astype("f4"))
    coords = np.arange(N, dtype=np.float64) - N / 2
    nbytes = data.size * 4

    _RTT = rtt()
    print(f"backend={jax.default_backend()}  cube={N}^3 f32 "
          f"({nbytes / 2**20:.0f} MiB)  dispatch RTT={_RTT * 1e3:.1f} ms\n")

    from spectral_cube_tpu.ops.moments import moments_012, moments_012_pallas
    from spectral_cube_tpu.ops import smoothing as sm
    from spectral_cube_tpu.ops.interpolate import interp_cube_spectral
    from spectral_cube_tpu.ops.convolve import (_convolve_planes,
                                                _kernel_transfer,
                                                _padded_shape)
    from spectral_cube_tpu.ops import reductions as red
    from spectral_cube_tpu.masks import LazyComparisonMask

    results = []
    on_tpu = jax.default_backend() == "tpu"

    mask = LazyComparisonMask(jnp.greater, 0.25, shape=data.shape)
    if on_tpu:
        results.append(timed(
            "masked moments 0/1/2 (pallas)",
            lambda d: moments_012_pallas(d, coords, 1.0, mask_expr=mask),
            data, bytes_per_pass=nbytes))
    results.append(timed(
        "masked moments 0/1/2 (xla)",
        lambda d: moments_012(d, coords, 1.0, include=d > 0.25),
        data, bytes_per_pass=nbytes))

    if on_tpu:
        # the product route (cube.statistics on TPU): one HBM pass via
        # the with-stats Pallas kernel
        from spectral_cube_tpu.ops.moments import statistics_pallas
        results.append(timed(
            "statistics (one-pass pallas)",
            lambda d: tuple(statistics_pallas(d).values()),
            data, bytes_per_pass=nbytes))
    results.append(timed(
        "statistics (two-pass xla)",
        lambda d: tuple(red.masked_statistics(
            d, red.valid_mask(d)).values()),
        data, bytes_per_pass=nbytes))

    kern = sm.gaussian_kernel1d(2.0)
    results.append(timed(
        "spectral gaussian smooth",
        lambda d: sm.spectral_smooth_cube(d, kern), data,
        bytes_per_pass=nbytes * 2))

    results.append(timed(
        "sigma_clip_spectrally (5 iters)",
        lambda d: sm.sigma_clip_spectrally(d, 3.0, maxiters=5), data,
        bytes_per_pass=nbytes * 2, reps=10))

    outaxis = coords[::2][: N // 2]
    results.append(timed(
        "spectral_interpolate 2x regrid",
        lambda d: interp_cube_spectral(d, coords, outaxis)[0], data,
        bytes_per_pass=nbytes * 1.5))

    # FFT beam convolution: 4 distinct beams grouped over N channels.
    # device_complex, NOT jnp.asarray: a complex64 host constant inside
    # the jit closure wedges the tunneled TPU backend (CLAUDE.md)
    from spectral_cube_tpu.ops.convolve import device_complex
    fy, fx = _padded_shape((N, N), (31, 31))
    transfers = device_complex(
        np.ones((4, fy, fx // 2 + 1), dtype=np.complex64))
    group_idx = (np.arange(N) % 4).astype(np.int32)
    results.append(timed(
        "common-beam FFT convolution",
        lambda d, t: _convolve_planes(d, t, group_idx),
        data, bytes_per_pass=nbytes * 2, reps=10,
        extra_args=(transfers,)))

    # reprojection: separable trilinear resample (half-pixel offset grid)
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z
    zs_h = np.arange(N, dtype=np.float64)
    ys_h = np.broadcast_to(np.arange(N, dtype=np.float64)[:, None] + 0.5,
                           (N, N))
    xs_h = np.broadcast_to(np.arange(N, dtype=np.float64)[None, :] + 0.3,
                           (N, N))
    results.append(timed(
        "reproject trilinear resample",
        lambda d: _bilinear_spatial_then_linear_z(d, zs_h, ys_h, xs_h, 1),
        data, bytes_per_pass=nbytes * 2, reps=10))

    print()
    print(json.dumps({"backend": jax.default_backend(), "n": N,
                      "results": results}))


if __name__ == "__main__":
    main()
