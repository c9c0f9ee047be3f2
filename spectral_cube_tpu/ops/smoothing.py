"""Spectral/spatial smoothing, filtering, and sigma clipping.

Replaces the reference's per-spectrum/per-plane joblib fan-out
(``/root/reference/spectral_cube/spectral_cube.py:2749-3222``) with
vectorized jit kernels: 1-D spectral convolutions run as a single
``lax.conv_general_dilated`` over all spaxels at once, spatial filters as
batched 2-D convs over channels, and median filters as sliding-window
``jnp.median`` stacks.  NaN handling matches astropy ``convolve``
(``nan_treatment='interpolate'``, ``boundary='fill'(0)``,
``normalize_kernel=True``), which is what the reference's smoothing calls
use.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["convolve1d_nan", "spectral_smooth_cube", "spatial_smooth_cube",
           "spectral_median_filter_cube", "spatial_median_filter_cube",
           "sigma_clip_spectrally", "gaussian_kernel1d"]


def gaussian_kernel1d(stddev, size=None):
    """Host-side 1-D Gaussian kernel matching astropy Gaussian1DKernel:
    sampled at integer offsets, support 8*stddev (odd), normalized."""
    if size is None:
        size = int(8 * float(stddev) + 1) | 1
    x = np.arange(size, dtype=float) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / float(stddev)) ** 2)
    return k / k.sum()


# crossover between the single dense banded matmul (quadratic FLOPs,
# best MXU tiling) and the overlap-save chunked form (linear FLOPs):
# measured on v5e with DCE-proof full-output consumption, n=512 dense
# 1.3 ms ~ chunked 1.65 ms; n=1024 dense 21 ms vs chunked 13.3 ms
_DENSE_CONV_MAX_N = 512
_MATMUL_CONV_MAX_N = 4096  # kept for external references


def _round_up(x, m):
    return -(-x // m) * m


def _banded_conv_matrix(n, kernel):
    """(n, n) banded true-convolution matrix with zero-fill boundary.

    The kernel is flipped so asymmetric kernels match np.convolve
    'same' / astropy convolve semantics (convolution, not correlation)."""
    k = np.asarray(kernel, dtype=np.float32)[::-1]
    half = len(k) - 1 - (len(k) - 1) // 2
    mat = np.zeros((n, n), dtype=np.float32)
    for o, kv in enumerate(k):
        d = o - half
        idx = np.arange(max(0, -d), min(n, n - d))
        mat[idx, idx + d] = kv
    return mat


def _block_banded_conv(data, kernel, chunk=512):
    """Overlap-save banded convolution: the channel axis splits into
    chunks of C; every chunk applies the SAME (C, C+2h) Toeplitz band
    matrix to its haloed window, so the cost is linear in n while the
    matmul operand keeps a dense-friendly MXU shape (a batch of identical
    (C, C+2h) x (C+2h, S) products).  Zero padding outside [0, n) exactly
    reproduces the dense banded operator's zero-fill boundary."""
    n = data.shape[0]
    kf = np.asarray(kernel, dtype=np.float32)[::-1]
    klen = len(kf)
    half_lo = klen - 1 - (klen - 1) // 2   # taps reaching backward
    half_hi = (klen - 1) // 2              # taps reaching forward
    h = max(half_lo, half_hi)
    # small chunks win: FLOPs scale with the window/chunk ratio but the
    # (C, C+2h) operand is reused across the huge spaxel dimension, so
    # the MXU stays fed even at C=64 (measured on v5e, 1024ch x 256^2:
    # C=64 2.50 ms vs C=256 3.13 ms for a 17-tap kernel; wide kernels
    # flat at ~3.1 ms for any C >= 64).  An explicitly-passed chunk is
    # honored (probes; the default 512 takes the policy clamp).
    if chunk == 512:
        chunk = max(64, _round_up(h + 1, 8) * 2)
    chunk = min(chunk, _round_up(n, 8))
    nb = -(-n // chunk)
    npad = nb * chunk
    # W[r, c] over the haloed window: output row r reads window column
    # r + h + d for tap offset d in [-half_lo, half_hi]
    rr, cc = np.mgrid[0:chunk, 0:chunk + 2 * h]
    o = cc - rr - h + half_lo              # kernel tap index per cell
    W = np.where((o >= 0) & (o < klen),
                 kf[np.clip(o, 0, klen - 1)], 0.0).astype(np.float32)
    # per-block einsums on clipped windows, minor dims untouched: the
    # old form flattened to (n, spatial) — a physical HBM relayout both
    # ways on TPU — AND materialized a zero-padded copy plus a stacked
    # (nb, C+2h, ...) window array (~4 extra cube passes).  Here each
    # block contracts a direct slice of the input (edge blocks drop the
    # out-of-range W columns, which is exactly the zero-fill boundary),
    # and the outputs concatenate straight into the result allocation.
    # bigcube 1024x512x512 spectral smooth: 19.6 (flat+stack) -> 16.3
    # (unflattened stack) -> this form.
    Wj = jnp.asarray(W)
    outs = []
    for i in range(nb):
        s, e = i * chunk - h, i * chunk + chunk + h
        cs, ce = max(s, 0), min(e, n)
        rows = min(chunk, n - i * chunk)
        Wi = Wj[:rows, cs - s:W.shape[1] - (e - ce)]
        outs.append(jnp.einsum(
            "rc,c...->r...", Wi, lax.slice_in_dim(data, cs, ce, axis=0),
            precision=lax.Precision.HIGHEST))
    out = outs[0] if nb == 1 else jnp.concatenate(outs, axis=0)
    return out.astype(data.dtype)


def _conv1d_along_axis0(data, kernel):
    """Correlate data (n, ...) with kernel (k,) along axis 0, zero padding.

    TPU-first: a 1-D convolution along the channel axis is a banded
    (n_out x n_in) matrix product against the flattened spaxels — it runs
    on the MXU at full precision instead of crawling through XLA's
    channel-dim conv lowering (measured 0.1 ms vs 140 ms on a 256^3 cube).
    Long spectral axes switch to a block-banded decomposition (same
    operator, n/(3B) fewer FLOPs).
    """
    n = data.shape[0]
    if n > _DENSE_CONV_MAX_N:
        # dense is quadratic in n; overlap-save chunking is linear while
        # keeping a dense MXU operand shape (handles any kernel width:
        # the chunk grows with the halo)
        return _block_banded_conv(data, kernel)
    mat = jnp.asarray(_banded_conv_matrix(n, kernel), dtype=data.dtype)
    # contract along the MAJOR axis with the minor dims untouched: a
    # (n, spatial) reshape of a 3-D cube is a physical HBM relayout on
    # TPU (the (8, 128) tiling binds the two minor dims — the config-2
    # lesson), which this path used to pay both ways
    out = jnp.einsum("ab,b...->a...", mat, data,
                     precision=lax.Precision.HIGHEST)
    return out.astype(data.dtype)


def convolve1d_nan(data, kernel, axis=0):
    """astropy-convolve semantics along ``axis``: NaNs are interpolated over
    (normalized convolution), zero-fill boundary, kernel normalized."""
    data = jnp.asarray(data)
    kernel = np.asarray(kernel, dtype=float)
    kernel = kernel / kernel.sum()
    if axis != 0:
        data = jnp.moveaxis(data, axis, 0)
    comp = jnp.float32 if data.dtype != jnp.float64 else jnp.float64

    # astropy boundary='fill': zero padding counts as valid data, so the
    # denominator only drops below 1 around NaN holes.  BOTH convs live
    # inside the lax.cond branches with ``data`` as the only operand:
    # the clean branch convolves the input directly (bitwise equal to
    # conv(where(valid, data, 0)) when all-finite), so all-finite cubes
    # pay no filled-copy materialization and no num operand copy — the
    # pre-round-5 form computed num OUTSIDE the cond and paid ~2 extra
    # cube passes for it on every clean call.
    def _clean(d):
        return _conv1d_along_axis0(d.astype(comp), kernel)

    def _dirty(d):
        v = jnp.isfinite(d)
        n = _conv1d_along_axis0(jnp.where(v, d, 0).astype(comp), kernel)
        den = 1.0 - _conv1d_along_axis0((~v).astype(comp), kernel)
        # den floor 1e-6 like every other normalized-convolution path
        # (CLAUDE.md): f32 HIGHEST reconstructs a true 0 only to ~1e-7,
        # and `> 0` let all-NaN windows emit fake 0.0 instead of NaN
        eps = 1e-6
        o = jnp.where(den > eps, n / jnp.where(den > eps, den, 1), jnp.nan)
        return jnp.where(jnp.any(v, axis=0, keepdims=True), o, jnp.nan)

    out = lax.cond(jnp.all(jnp.isfinite(data)), _clean, _dirty, data)
    # astropy keeps original NaNs NaN only when interpolation impossible;
    # with nan_treatment='interpolate' NaN positions get interpolated values
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out.astype(data.dtype)


def spectral_smooth_cube(data, kernel):
    """Convolve along the spectral axis (axis 0) of a [spec, y, x] cube."""
    return convolve1d_nan(data, kernel, axis=0)


def spatial_smooth_cube(data, kernel2d):
    """Convolve each channel map with a 2-D kernel (zero boundary,
    NaN-interpolating, normalized) — batched over channels.

    Low-rank kernels (every Gaussian) run as SVD-separable banded MXU
    matmuls: XLA's 2-D conv lowering measures 100.7 ms on a 256^3 cube
    where the separable matmuls take 0.90 ms (same NaN semantics,
    agreement 2e-6).  Full-rank kernels keep the conv path."""
    data = jnp.asarray(data)
    k = np.asarray(kernel2d, dtype=float)
    k = k / k.sum()
    if data.ndim == 3 and k.shape[0] <= 2 * data.shape[1] \
            and k.shape[1] <= 2 * data.shape[2]:
        from .convolve import convolve2d_separable
        out = convolve2d_separable(data, k)
        if out is not None:
            return out
    nchan = data.shape[0]
    valid = jnp.isfinite(data)
    comp = jnp.float64 if data.dtype == jnp.float64 else jnp.float32
    filled = jnp.where(valid, data, 0).astype(comp)

    kj = jnp.asarray(k[::-1, ::-1], dtype=comp)[None, None]
    py, px = (k.shape[0] - 1) // 2, (k.shape[1] - 1) // 2
    py_hi, px_hi = k.shape[0] - 1 - py, k.shape[1] - 1 - px

    def conv(x):
        # HIGHEST: the TPU default runs conv at bf16 (~1e-3 rel error)
        return lax.conv_general_dilated(
            x[:, None], kj, window_strides=(1, 1),
            padding=((py_hi, py), (px_hi, px)),
            precision=lax.Precision.HIGHEST,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

    num = conv(filled)

    # zero-fill boundary counts as valid data (astropy boundary='fill');
    # all-finite cubes return num directly — the denominator conv AND the
    # divide/NaN-where postlude live in the dirty branch of one lax.cond
    # (clean num == where(1>eps, num/1, nan) bitwise when den == 1)
    def _dirty(args):
        n, v = args
        den = 1.0 - conv((~v).astype(comp))
        eps = 1e-6   # same den floor as the separable/rDFT paths
        o = jnp.where(den > eps, n / jnp.where(den > eps, den, 1), jnp.nan)
        return jnp.where(jnp.any(v, axis=(1, 2), keepdims=True), o, jnp.nan)

    out = lax.cond(jnp.all(valid), lambda a: a[0], _dirty, (num, valid))
    return out.astype(data.dtype)


def _sliding_stack(data, size, axis):
    """Stack ``size`` shifted copies along a new leading axis, reflect-padded
    (scipy.ndimage default boundary mode)."""
    half = size // 2
    pads = [(0, 0)] * data.ndim
    pads[axis] = (half, size - 1 - half)
    # scipy.ndimage 'reflect' duplicates the edge sample, which numpy calls
    # 'symmetric'
    padded = jnp.pad(data, pads, mode="symmetric")
    slices = []
    n = data.shape[axis]
    for o in range(size):
        idx = [slice(None)] * data.ndim
        idx[axis] = slice(o, o + n)
        slices.append(padded[tuple(idx)])
    return jnp.stack(slices, axis=0)


def spectral_median_filter_cube(data, size):
    """scipy.ndimage.median_filter semantics along the spectral axis
    (NaNs propagate, reflect boundary) — the reference's
    ``spectral_smooth_median`` (spectral_cube.py:3186)."""
    stack = _sliding_stack(jnp.asarray(data), int(size), axis=0)
    return jnp.median(stack, axis=0)


def spatial_median_filter_cube(data, size):
    """Per-channel 2-D median filter, ``size`` an int or (ky, kx)."""
    if np.isscalar(size):
        ky = kx = int(size)
    else:
        ky, kx = (int(s) for s in size)
    stack = _sliding_stack(jnp.asarray(data), ky, axis=1)
    stack = _sliding_stack(stack, kx, axis=3)
    flat = stack.reshape((ky * kx,) + data.shape)
    return jnp.median(flat, axis=0)


def sigma_clip_spectrally(data, sigma=3.0, maxiters=5, cenfunc="median",
                          stdfunc="std"):
    """Iterative per-spaxel sigma clipping along the spectral axis,
    astropy.stats.sigma_clip semantics (cenfunc=median|mean,
    stdfunc=std|mad_std; clipped values -> NaN); the reference workload
    at docs/dask.rst:188-212 and spectral_cube.py:3161.

    The sort-once band algorithm supports any *interval* clip, so both
    cenfunc choices share one code path: survivors of each iteration are a
    contiguous band of the per-spaxel sorted spectrum, and the center is
    either the band median (indicator-masked sums) or the band mean.
    """
    if cenfunc in ("median", np.median, np.nanmedian):
        use_mean_center = False
    elif cenfunc in ("mean", np.mean, np.nanmean):
        use_mean_center = True
    else:
        raise NotImplementedError(
            "the sorted-band sigma-clip implements cenfunc='median' and "
            f"'mean' only (got {cenfunc!r})")
    if stdfunc in ("std", np.std, np.nanstd):
        use_mad_std = False
    elif stdfunc == "mad_std":
        use_mad_std = True
    else:
        raise NotImplementedError(
            "the sorted-band sigma-clip implements stdfunc='std' and "
            f"'mad_std' only (got {stdfunc!r})")
    data = jnp.asarray(data)
    comp = jnp.float64 if data.dtype == jnp.float64 else jnp.float32
    if comp == jnp.float32 and not use_mad_std and data.ndim == 3:
        # fused Pallas kernel: per-spaxel tiles sort in VMEM and iterate
        # the band in registers — 3 HBM passes total vs ~45 for the
        # HBM-space jnp.sort below (measured 207 -> 39 ms on the
        # reference's 623x768x768 published benchmark); bit-identical
        # to this function's sorted-band semantics (tests pin it)
        from .clip_pallas import sigma_clip_fused
        fused = sigma_clip_fused(data, sigma, maxiters, use_mean_center)
        if fused is not None:
            return fused.astype(data.dtype)
    x = data.astype(comp)
    n = x.shape[0]

    # Sort-once band algorithm, gather-free.  Each iteration's survivors
    # are a contiguous band [i_lo, i_hi) of the per-spaxel SORTED spectrum
    # (clipping by a value interval preserves contiguity; intersecting
    # with the previous band keeps clipped values clipped, like astropy).
    # Every per-iteration statistic — count, mean, variance, and the
    # median itself — is an elementwise-masked SUM over the sorted array:
    # the median hides behind indicator masks (iota == median_index), so
    # no dynamic gather ever runs.  On v5e the old loop spent 4.9 ms per
    # iteration re-sorting inside nanmedian (5x = 27 ms total); one sort
    # is 2.8 ms and the masked sums are ~0.1 ms per iteration.
    # non-finite values are treated as missing: +-inf would otherwise sort
    # inside/adjacent to the finite band while i_hi0 counts only finite
    # values, corrupting the band statistics (a -inf at sorted index 0
    # would shift the whole band and NaN the spaxel)
    s = jnp.sort(jnp.where(jnp.isfinite(x), x, jnp.nan), axis=0)
    tail = (1,) * (x.ndim - 1)
    iota = jnp.arange(n, dtype=jnp.int32).reshape((n,) + tail)
    i_hi0 = jnp.sum(jnp.isfinite(x), axis=0).astype(jnp.int32)
    # derived from data (not a constant) so the loop carry keeps the same
    # varying-manual-axes type under shard_map
    i_lo0 = i_hi0 * 0

    def body(_, band):
        i_lo, i_hi = band
        cnt = i_hi - i_lo
        safe = jnp.maximum(cnt, 1).astype(comp)
        in_band = (iota >= i_lo[None]) & (iota < i_hi[None])
        ssum = jnp.sum(jnp.where(in_band, s, 0), axis=0)
        mean = ssum / safe
        if not use_mean_center or use_mad_std:
            m_lo = i_lo + (cnt - 1) // 2
            m_hi = i_lo + cnt // 2
            med = (jnp.sum(jnp.where(iota == m_lo[None], s, 0), axis=0)
                   + jnp.sum(jnp.where(iota == m_hi[None], s, 0),
                             axis=0)) / 2
        center = mean if use_mean_center else med
        if use_mad_std:
            # astropy.stats.mad_std: 1.4826 * median(|x - median(x)|) —
            # the MAD is around the band MEDIAN regardless of cenfunc.
            # Deviations of a sorted band are bitonic, not sorted, so
            # sort them per iteration (out-of-band -> +inf tail) and
            # read the middle with the same indicator trick.
            dev = jnp.where(in_band, jnp.abs(s - med[None]), jnp.inf)
            dsort = jnp.sort(dev, axis=0)
            d_lo = (cnt - 1) // 2
            d_hi = cnt // 2
            mad = (jnp.sum(jnp.where(iota == d_lo[None], dsort, 0), axis=0)
                   + jnp.sum(jnp.where(iota == d_hi[None], dsort, 0),
                             axis=0)) / 2
            std = mad * 1.482602218505602
        else:
            var = jnp.sum(jnp.where(in_band, (s - mean[None]) ** 2, 0),
                          axis=0) / safe
            std = jnp.sqrt(var)
        lo_v = center - sigma * std
        hi_v = center + sigma * std
        # counts of sorted values below/through the new interval (NaN
        # comparisons are False, so the NaN tail never counts)
        n_lt = jnp.sum((s < lo_v[None]).astype(jnp.int32), axis=0)
        n_le = jnp.sum((s <= hi_v[None]).astype(jnp.int32), axis=0)
        new_lo = jnp.where(cnt > 0, jnp.maximum(i_lo, n_lt), i_lo)
        new_hi = jnp.where(cnt > 0, jnp.minimum(i_hi, n_le), i_hi)
        return new_lo, new_hi

    i_lo, i_hi = lax.fori_loop(0, int(maxiters), body, (i_lo0, i_hi0))
    cnt = i_hi - i_lo
    # band-edge values via the same indicator trick; the band is defined
    # by value cuts, so duplicates never straddle an edge and the value
    # test below reproduces the band membership exactly
    lo_val = jnp.sum(jnp.where(iota == i_lo[None], s, 0), axis=0)
    hi_val = jnp.sum(jnp.where(iota == (i_hi - 1)[None], s, 0), axis=0)
    keep = (jnp.isfinite(x) & (cnt > 0)[None]
            & (x >= lo_val[None]) & (x <= hi_val[None]))
    return jnp.where(keep, x, jnp.nan).astype(data.dtype)
