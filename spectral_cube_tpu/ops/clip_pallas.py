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

__all__ = ["sigma_clip_fused", "bitonic_sort_leading",
           "bitonic_merge_leading", "sort_padded_leading"]

_VMEM_BUDGET = 10 * 2 ** 20


def bitonic_sort_leading(v, ascending=True):
    """Bitonic sort of ``v`` (pow2, 8, 128) along axis 0, vectorized over
    blocks: every compare-exchange stage is one reshape + two static
    half-slices + min/max + a per-block direction select.  Runs inside a
    Pallas kernel on VMEM-resident values.  ``ascending=False`` sorts
    descending (used by the split sort: Mosaic has no ``rev`` lowering,
    so the high chunk sorts descending instead of reversing)."""
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
            if k == n and not ascending:
                ascb = jnp.logical_not(ascb)
            lo = jnp.where(ascb, mn, mx)
            hi = jnp.where(ascb, mx, mn)
            v = jnp.concatenate([lo, hi], axis=1).reshape(v.shape)
            j //= 2
        k *= 2
    return v


def bitonic_merge_leading(v):
    """Ascending bitonic MERGE of ``v`` (pow2, 8, 128) along axis 0 —
    the final k==n phase of the network only, valid when ``v`` is already
    bitonic (one ascending run, then one descending run, cyclically).
    Every block merges ascending, so the per-block direction select of
    the full sorter (iota + two wheres) drops out: ~3 ops per stage
    instead of ~6."""
    n = v.shape[0]
    assert n & (n - 1) == 0, "bitonic network needs a power-of-two length"
    j = n // 2
    while j >= 1:
        nb = n // (2 * j)
        w = v.reshape((nb, 2 * j) + v.shape[1:])
        a = w[:, :j]
        b = w[:, j:]
        v = jnp.concatenate([jnp.minimum(a, b), jnp.maximum(a, b)],
                            axis=1).reshape(v.shape)
        j //= 2
    return v


def sort_padded_leading(vals, nchan, npad):
    """Ascending sort of ``vals`` ((nchan, 8, 128), +inf at masked
    entries) into (npad, 8, 128) with a +inf tail.

    For nchan strictly between npad/2 and npad, a split sort beats one
    npad-wide network: sort the first P=npad/2 rows with a P-network,
    sort the remaining rem=nchan-P rows with a next-pow2(rem) network,
    then lay out [A ascending | +inf gap | reversed(B) descending] —
    ascending, rising to +inf, falling through B's maximum: bitonic — and
    finish with ONE ascending npad merge.  For the 623-channel workload
    (the reference's published sigma-clip benchmark) this is 45 stages on
    512 + 28 on 128 + 10 select-free merge stages on 1024, ~44% fewer
    vector ops than the 55-stage 1024 network the padded sort needs.
    """
    if nchan == npad:
        return bitonic_sort_leading(vals)
    tail = vals.shape[1:]
    P = npad // 2
    if nchan <= P:   # caller sizes npad = next_pow2(nchan); defensive
        pad = jnp.full((npad - nchan,) + tail, jnp.inf, jnp.float32)
        return bitonic_sort_leading(jnp.concatenate([vals, pad], axis=0))
    rem = nchan - P
    Q = 1 << int(np.ceil(np.log2(max(rem, 2))))
    A = bitonic_sort_leading(vals[:P])
    padB = jnp.full((Q - rem,) + tail, jnp.inf, jnp.float32)
    # B sorts DESCENDING (its +inf pad leads) rather than reversing an
    # ascending sort: Mosaic has no `rev` lowering for axis-0 flips
    B = bitonic_sort_leading(jnp.concatenate([vals[P:], padB], axis=0),
                             ascending=False)
    gap = jnp.full((npad - P - Q,) + tail, jnp.inf, jnp.float32)
    return bitonic_merge_leading(jnp.concatenate([A, gap, B], axis=0))


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

    # band indices never exceed nchan, so every iteration reduction runs
    # on the first sublane-aligned nit rows of the sorted stack — the
    # +inf pad tail (401 rows on the 623-channel workload) drops out of
    # the per-iteration vector work entirely
    nit = min(npad, -(-nchan // 8) * 8)

    def kernel(x_ref, lo_ref, hi_ref, cnt_ref):
        X = x_ref[...]
        finite = jnp.isfinite(X)
        S = sort_padded_leading(jnp.where(finite, X, jnp.inf), nchan,
                                npad)[:nit]
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
