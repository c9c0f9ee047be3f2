"""Fused Pallas sigma-clip kernel: in-VMEM bitonic sort + band iterations.

``sigma_clip_spectrally`` (ops/smoothing.py — the reference's single
published benchmark, docs/dask.rst:188-212) is algorithmically one sort
plus a handful of masked reductions, but ``jnp.sort`` over the spectral
axis of an HBM-resident cube is a multi-pass XLA sort: measured 152 ms of
a 207 ms total on the 623x768x768 v5e workload, ~40 HBM passes.  The
kernel here never materializes the sorted cube: each (nchan, 8, 128)
spaxel tile is loaded once, padded to the next power of two with +inf,
sorted by a fully-vectorized bitonic network *in VMEM* (compare-exchange
on contiguous half-blocks — reshape + static slice + min/max, no
gathers), the clip-band iterations run on the sorted registers, and the
tile's clipped values are written straight out.  Total HBM traffic is
cube-in + cube-out.

Semantics are bit-compatible with the sorted-band algorithm in
ops/smoothing.sigma_clip_spectrally (same f32 sums, same indicator-mask
median, same cnt>0 guards); the host wrapper there dispatches to this
kernel on TPU when shapes allow and keeps the jnp path as the fallback
and as the oracle in tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sigma_clip_fused", "bitonic_sort_leading"]

_VMEM_BUDGET = 10 * 2 ** 20


def bitonic_sort_leading(v):
    """Ascending bitonic sort of ``v`` (pow2, 8, 128) along axis 0,
    vectorized over blocks: every compare-exchange stage is one
    reshape + two static half-slices + min/max + a per-block direction
    select.  Runs inside a Pallas kernel on VMEM-resident values."""
    n = v.shape[0]
    assert n & (n - 1) == 0, "bitonic network needs a power-of-two length"
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            nb = n // (2 * j)
            w = v.reshape((nb, 2 * j) + v.shape[1:])
            a = w[:, :j]
            b = w[:, j:]
            mn = jnp.minimum(a, b)
            mx = jnp.maximum(a, b)
            # ascending where (block_start & k) == 0: constant per
            # 2j-block because j <= k/2 (iota, not a captured constant —
            # pallas kernels must not close over host arrays)
            bidx = jax.lax.broadcasted_iota(
                jnp.int32, (nb,) + (1,) * (w.ndim - 1), 0)
            ascb = (bidx * (2 * j)) & k == 0
            lo = jnp.where(ascb, mn, mx)
            hi = jnp.where(ascb, mx, mn)
            v = jnp.concatenate([lo, hi], axis=1).reshape(v.shape)
            j //= 2
        k *= 2
    return v


def sigma_clip_fused(data, sigma, maxiters, use_mean_center,
                     interpret=False):
    """Sigma clip as one band kernel + one fused elementwise pass.

    The kernel reads each spaxel tile once, sorts it in VMEM, iterates
    the clip band entirely in registers, and emits only the band-edge
    planes (lo, hi, survivor count) — the clipped cube itself is produced
    by a single XLA ``where`` (which fuses the comparisons), so total HBM
    traffic is three cube passes instead of ~45 for an HBM-space sort.
    The cube never fits next to its padded sort copy in VMEM, which is
    why the keep test is NOT in-kernel: emitting planes keeps the kernel
    footprint to in-tile + sort copy + stage temporaries.

    Returns the clipped (nchan, ny, nx) float32 cube or None when
    infeasible (non-TPU, unpadded spatial tiles, or a VMEM-oversized
    spectral axis).  stdfunc='std' only — mad_std's per-iteration
    deviation sort stays on the jnp path."""
    if not (interpret or jax.default_backend() == "tpu"):
        return None
    nchan, ny, nx = data.shape
    if ny % 8 or nx % 128:
        return None
    npad = 1 << int(np.ceil(np.log2(max(nchan, 2))))
    # in tile + padded sort chain (Mosaic reuses the stage buffers; the
    # empirical ceiling on v5e was nchan=623/npad=1024 compiling fine at
    # this estimate ~11.8 MB, while the 16 MB scoped limit aborts)
    if (nchan + 2 * npad) * 8 * 128 * 4 > 12 * 2 ** 20:
        return None
    sigma = float(sigma)

    def kernel(x_ref, lo_ref, hi_ref, cnt_ref):
        X = x_ref[...]
        finite = jnp.isfinite(X)
        pad = jnp.full((npad - nchan,) + X.shape[1:], jnp.inf, jnp.float32)
        S = bitonic_sort_leading(
            jnp.concatenate([jnp.where(finite, X, jnp.inf), pad], axis=0))
        iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, 0)
        i_hi = jnp.sum(finite.astype(jnp.int32), axis=0)
        i_lo = jnp.zeros_like(i_hi)

        for _ in range(int(maxiters)):
            cnt = i_hi - i_lo
            safe = jnp.maximum(cnt, 1).astype(jnp.float32)
            in_band = (iota >= i_lo[None]) & (iota < i_hi[None])
            ssum = jnp.sum(jnp.where(in_band, S, 0.0), axis=0)
            mean = ssum / safe
            if use_mean_center:
                center = mean
            else:
                m_lo = i_lo + (cnt - 1) // 2
                m_hi = i_lo + cnt // 2
                center = (jnp.sum(jnp.where(iota == m_lo[None], S, 0.0),
                                  axis=0)
                          + jnp.sum(jnp.where(iota == m_hi[None], S, 0.0),
                                    axis=0)) / 2
            var = jnp.sum(jnp.where(in_band, (S - mean[None]) ** 2, 0.0),
                          axis=0) / safe
            std = jnp.sqrt(var)
            lo_v = center - sigma * std
            hi_v = center + sigma * std
            n_lt = jnp.sum((S < lo_v[None]).astype(jnp.int32), axis=0)
            n_le = jnp.sum((S <= hi_v[None]).astype(jnp.int32), axis=0)
            i_lo = jnp.where(cnt > 0, jnp.maximum(i_lo, n_lt), i_lo)
            i_hi = jnp.where(cnt > 0, jnp.minimum(i_hi, n_le), i_hi)

        cnt = i_hi - i_lo
        lo_ref[...] = jnp.sum(jnp.where(iota == i_lo[None], S, 0.0), axis=0)
        hi_ref[...] = jnp.sum(jnp.where(iota == (i_hi - 1)[None], S, 0.0),
                              axis=0)
        cnt_ref[...] = cnt

    grid = (ny // 8, nx // 128)
    plane = pl.BlockSpec((8, 128), lambda i, j: (i, j))
    fn = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec((nchan, 8, 128), lambda i, j: (0, i, j))],
        out_specs=[plane, plane, plane],
        out_shape=[jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((ny, nx), jnp.int32)],
        # the 623-channel workload sits 56 KB over the default 16 MB
        # scoped-vmem limit; the hardware allows raising it (the XLA
        # default deliberately reserves headroom)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret)
    x = jnp.asarray(data, jnp.float32)
    lo_val, hi_val, cnt = fn(x)
    keep = (jnp.isfinite(x) & (cnt > 0)[None]
            & (x >= lo_val[None]) & (x <= hi_val[None]))
    return jnp.where(keep, x, jnp.nan)
