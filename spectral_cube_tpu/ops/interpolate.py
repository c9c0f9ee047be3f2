"""Spectral interpolation / regridding and axis downsampling.

The reference loops ``np.interp`` per spaxel
(``/root/reference/spectral_cube/spectral_cube.py:3224-3332``); here the
interpolation weights are computed once from the shared spectral axis and
applied as two gathers + a lerp over the whole cube — one fused jit kernel,
no per-spaxel loop.  Mask channels interpolate alongside the data
(reference :3298-3315).  ``downsample_axis`` reproduces the block-estimator
reduce at spectral_cube.py:3421-3557.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from ..utils import SmoothingWarning

__all__ = ["interp_weights", "interp_cube_spectral", "smooth_interp_cube",
           "interp_spectrum", "linear_spectral_wcs", "downsample_axis",
           "downsample_include"]


def interp_weights(inaxis, outaxis):
    """Indices and fractions for linear interpolation from ``inaxis`` onto
    ``outaxis`` with np.interp edge-clamping semantics.

    Both axes may be descending; the reference requires monotonicity and a
    *linear* output grid (checks at spectral_cube.py:3253-3285)."""
    inaxis = np.asarray(inaxis, dtype=np.float64)
    outaxis = np.asarray(outaxis, dtype=np.float64)
    if inaxis.size < 2:
        raise ValueError("spectral interpolation needs at least 2 input "
                         f"channels, got {inaxis.size}")
    flip_in = False
    if inaxis.size > 1 and inaxis[1] < inaxis[0]:
        inaxis = inaxis[::-1]
        flip_in = True
    if np.any(np.diff(inaxis) <= 0):
        raise ValueError("input spectral axis must be strictly monotonic")
    idx = np.searchsorted(inaxis, outaxis, side="right") - 1
    idx = np.clip(idx, 0, inaxis.size - 2)
    x0 = inaxis[idx]
    x1 = inaxis[idx + 1]
    frac = (outaxis - x0) / (x1 - x0)
    frac = np.clip(frac, 0.0, 1.0)  # np.interp clamps outside the range
    if flip_in:
        idx = inaxis.size - 2 - idx
        frac = 1.0 - frac
    return idx.astype(np.int32), frac


def _interp_matrix(idx, frac, nin):
    """(nout, nin) 2-tap linear-interpolation matrix.  Zero-weight taps are
    simply absent, preserving np.interp's exact-hit semantics (a NaN
    zero-weight neighbor must not poison the result)."""
    nout = idx.shape[0]
    mat = np.zeros((nout, nin), dtype=np.float32)
    rows = np.arange(nout)
    np.add.at(mat, (rows, idx), (1.0 - frac).astype(np.float32))
    np.add.at(mat, (rows, idx + 1), frac.astype(np.float32))
    return mat


def compose_interp_banded(idx, frac, banded, dtype=np.float64):
    """``_interp_matrix(idx, frac, nin) @ banded`` without the dense
    O(nout*nin^2) host matmul OR full-row gathers: the interp operator
    has exactly two taps per row and ``banded``'s rows have compact
    nonzero spans, so each output row is a weighted float64 sum of two
    gathered row WINDOWS — O(nout*band) arithmetic with no full-size
    float64 temporaries.  Band values are the exact float64 products
    rounded once to ``dtype``; at float64 the result is bit-identical to
    the dense product (the skipped terms are exact zeros).  Measured at
    8192 channels on the host: dense compose 28 s, full-row-gather
    compose 11 s (plus a 6 s float64 cast of the band matrix); this form
    ~0.3 s including the O(nnz) span scan."""
    B = np.asarray(banded)
    nrow, nin = B.shape
    idx = np.asarray(idx)
    w1 = np.asarray(frac, dtype=np.float64)[:, None]
    nout = idx.shape[0]
    i1 = np.minimum(idx + 1, nrow - 1)
    # per-row nonzero spans of B from the nonzero coordinates (O(nnz);
    # all-zero rows get an empty [nin, -1) span and contribute zeros)
    nz_r, nz_c = np.nonzero(B)
    lo = np.full(nrow, nin, np.int64)
    hi = np.full(nrow, -1, np.int64)
    np.minimum.at(lo, nz_r, nz_c)
    np.maximum.at(hi, nz_r, nz_c)
    rlo = np.minimum(lo[idx], lo[i1])
    rhi = np.maximum(hi[idx], hi[i1])
    W = max(1, int((rhi - rlo + 1).max())) if nout else 1
    rlo = np.clip(rlo, 0, nin - W)
    cols = rlo[:, None] + np.arange(W)[None, :]
    band = (1.0 - w1) * B[idx[:, None], cols].astype(np.float64) \
        + w1 * B[i1[:, None], cols].astype(np.float64)
    out = np.zeros((nout, nin), dtype)
    np.put_along_axis(out, cols, band.astype(dtype), axis=1)
    return out


def block_tap_matmul(flat, i0, frac, chunk=64,
                     precision=None):
    """Apply the 2-tap lerp operator in block-windowed form.

    The dense (nout, nin) tap matrix wastes nin/2 of its FLOPs on
    structural zeros; here each chunk of output rows reads only its input
    window (like the overlap-save convolution, ops/smoothing.py): a
    (nb, chunk, W) matrix batch against (nb, W, S) windows.  Exact-hit
    semantics match `_interp_matrix` (zero-weight taps are structural
    zeros).  ``flat``: (nin, S); returns (nout, S) float32.
    """
    import jax.lax as lax
    if precision is None:
        precision = lax.Precision.HIGHEST
    nin, S = flat.shape
    i0 = np.asarray(i0, dtype=np.int64)
    frac = np.asarray(frac, dtype=np.float64)
    nout = i0.shape[0]
    nb = -(-nout // chunk)
    starts = np.empty(nb, np.int64)
    widths = np.empty(nb, np.int64)
    for b in range(nb):
        rows = slice(b * chunk, min((b + 1) * chunk, nout))
        starts[b] = i0[rows].min()
        widths[b] = i0[rows].max() + 2 - starts[b]
    W = int(widths.max())
    mats = np.zeros((nb, chunk, W), np.float32)
    for b in range(nb):
        lo = b * chunk
        hi = min(lo + chunk, nout)
        cols = i0[lo:hi] - starts[b]
        rows = np.arange(hi - lo)
        np.add.at(mats[b], (rows, cols), (1.0 - frac[lo:hi]).astype("f4"))
        np.add.at(mats[b], (rows, cols + 1), frac[lo:hi].astype("f4"))
    pad_hi = int(max(0, (starts + W).max() - nin))
    xp = jnp.pad(flat.astype(jnp.float32), ((0, pad_hi), (0, 0)))
    windows = jnp.stack([
        lax.slice(xp, (int(starts[b]), 0), (int(starts[b]) + W, S))
        for b in range(nb)])
    out = jnp.einsum("brw,bws->brs", jnp.asarray(mats), windows,
                     precision=precision)
    return out.reshape(nb * chunk, S)[:nout]


def block_matmul_from_dense(M, flat, chunk=64, precision=None):
    """Apply a host-side banded (nout, nin) operator in block-windowed
    form: each chunk of output rows multiplies only the input window its
    band touches.  Generalizes :func:`block_tap_matmul` to any banded
    matrix (e.g. the composed smooth+interp operator)."""
    import jax.lax as lax
    if precision is None:
        precision = lax.Precision.HIGHEST
    M = np.asarray(M, dtype=np.float32)
    nout, nin = M.shape
    S = flat.shape[1]
    nb = -(-nout // chunk)
    starts = np.zeros(nb, np.int64)
    widths = np.zeros(nb, np.int64)
    for b in range(nb):
        rows = M[b * chunk:min((b + 1) * chunk, nout)]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        if nz.size == 0:
            starts[b], widths[b] = 0, 1
            continue
        starts[b] = nz[0]
        widths[b] = nz[-1] + 1 - nz[0]
    W = int(widths.max())
    starts = np.minimum(starts, np.maximum(nin - W, 0))
    mats = np.zeros((nb, chunk, W), np.float32)
    for b in range(nb):
        lo = b * chunk
        hi = min(lo + chunk, nout)
        w_hi = min(int(starts[b]) + W, nin)
        mats[b, :hi - lo, :w_hi - int(starts[b])] = \
            M[lo:hi, int(starts[b]):w_hi]
    pad_hi = int(max(0, (starts + W).max() - nin))
    xp = jnp.pad(flat.astype(jnp.float32), ((0, pad_hi), (0, 0)))
    windows = jnp.stack([
        lax.slice(xp, (int(starts[b]), 0), (int(starts[b]) + W, S))
        for b in range(nb)])
    out = jnp.einsum("brw,bws->brs", jnp.asarray(mats), windows,
                     precision=precision)
    return out.reshape(nb * chunk, S)[:nout]


# past this many channels the dense interp matrix stops paying for itself
_MATMUL_INTERP_MAX_N = 4096


def _use_matmul_interp(nin, nout):
    import jax
    return (jax.default_backend() == "tpu"
            and nin <= _MATMUL_INTERP_MAX_N
            and nout <= _MATMUL_INTERP_MAX_N)


def _interp_by_matmul(data, idx, frac, include):
    """Spectral lerp as one (nout, nin) banded matmul on the MXU — a flat
    take along axis 0 is a slow dynamic-gather on TPU, while the same
    2-tap sparse operator as a dense matmul runs at MXU speed (the trick
    that makes spectral smoothing fast, ops/smoothing.py).

    NaN semantics match the gather path: outputs whose *nonzero-weight*
    neighbors include a NaN are NaN (np.interp propagation); zero-weight
    NaN neighbors don't poison (the matrix has no tap there)."""
    import jax.lax as lax
    nin = data.shape[0]
    spatial = int(np.prod(data.shape[1:]))
    # long axes use the block-windowed tap matmul: the dense operator's
    # FLOPs grow with nin while the 2-tap band stays O(1) wide (measured
    # 1.02 vs 2.21 ms for a 2x regrid of a 2048-channel 128^2 cube)
    use_block = nin > 512
    mat = None if use_block else jnp.asarray(_interp_matrix(idx, frac, nin))
    flat = data.reshape(nin, spatial)
    nanmask = jnp.isnan(flat)
    filled = jnp.where(nanmask, 0, flat)

    def mm(x, precision=lax.Precision.HIGHEST):
        if use_block:
            return block_tap_matmul(x.astype(jnp.float32),
                                    idx.astype(np.int64), frac,
                                    precision=precision)
        return lax.dot_general(mat, x.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)

    out = mm(filled)
    # flag matmuls only feed a >0 threshold: bf16 (DEFAULT) is exact enough
    # and runs the MXU at full rate.  (NOT lax.cond-gated on cleanliness:
    # for cheap bf16 flag matmuls the cond's materialized operands/outputs
    # cost more than the matmul they skip — measured on the reproject
    # nan-weight path.)
    poisoned = mm(nanmask.astype(jnp.float32),
                  precision=lax.Precision.DEFAULT) > 0
    out = jnp.where(poisoned, jnp.nan, out)
    out = out.reshape((idx.shape[0],) + data.shape[1:]).astype(data.dtype)
    new_include = None
    if include is not None:
        # include only where EVERY contributing neighbor is included: the
        # reference interpolates the *filled* data, so one excluded
        # neighbor NaN-poisons the sample (spectral_cube.py:3267-3310,
        # pinned by test_spectral_interpolate_with_mask's [0, .5, nan,
        # nan]).  Computed as "excluded mass == 0", which is exact in any
        # matmul precision (zero inputs produce exact zeros; any nonzero
        # weight on an excluded channel produces a strictly positive sum).
        inc = jnp.asarray(include).astype(jnp.float32)
        exc_b = 1.0 - jnp.broadcast_to(inc, data.shape).reshape(nin, spatial)
        new_include = (mm(exc_b, precision=lax.Precision.DEFAULT) == 0) \
            .reshape((idx.shape[0],) + data.shape[1:])
    return out, new_include


def interp_cube_spectral(data, inaxis, outaxis, include=None):
    """Interpolate a [spec, y, x] cube onto a new spectral grid.

    Returns (new_data, new_include_or_None).  The mask interpolates as a
    float and stays included only where every contributing neighbor is
    included: the reference interpolates the *filled* data, so one
    excluded neighbor NaN-poisons the output sample
    (spectral_cube.py:3267-3310).
    On TPU the lerp runs as a banded matmul (see _interp_by_matmul);
    elsewhere as two gathers + a lerp.
    """
    idx, frac = interp_weights(inaxis, outaxis)
    data = jnp.asarray(data)
    if _use_matmul_interp(data.shape[0], idx.shape[0]):
        return _interp_by_matmul(data, idx, frac, include)
    idxj = jnp.asarray(idx)
    fracj = jnp.asarray(frac, dtype=jnp.float32)[:, None, None]
    lo = data[idxj]
    hi = data[idxj + 1]
    # exact grid hits return the exact sample (np.interp semantics: a NaN
    # zero-weight neighbor must not poison the result)
    lerp = lo * (1 - fracj) + hi * fracj
    out = jnp.where(fracj == 0, lo, jnp.where(fracj == 1, hi, lerp))
    new_include = None
    if include is not None:
        # broadcast sub-dimensional includes (1-D spectral / 2-D spatial)
        # to the cube shape BEFORE gathering along axis 0, matching the
        # matmul path above.  Include only where every contributing
        # neighbor is included ("excluded mass == 0") — reference
        # semantics, see _interp_by_matmul.
        exc = 1.0 - jnp.broadcast_to(
            jnp.asarray(include).astype(jnp.float32), data.shape)
        exc_lerp = exc[idxj] * (1 - fracj) + exc[idxj + 1] * fracj
        exc_i = jnp.where(fracj == 0, exc[idxj],
                          jnp.where(fracj == 1, exc[idxj + 1], exc_lerp))
        new_include = exc_i == 0
    return out.astype(data.dtype), new_include


_SI_OP_CACHE = {}


def _si_operators(k, idx, frac, nin):
    """Host operator triple (S float32 band matrix, I float32 2-tap
    matrix, M = I@S float32 composed) for the fused smooth+interp,
    cached by VALUE of the normalized kernel and the interp weights.

    The dense band-matrix builds plus the windowed compose are O(n^2)
    host scans (~1.6 s at 8192 channels, benchmarks/
    probe_planner_scale.py) that eager per-call users would otherwise
    pay on every invocation; returning the SAME array objects across
    calls also keys banded_pallas's identity-keyed strip-plan cache.
    S stays float32 throughout: compose_interp_banded does its band
    arithmetic in float64 on gathered windows, so a full-size float64
    copy of S (512 MB / ~6 s at 8192 channels) buys nothing.
    """
    key = (int(nin), k.tobytes(), idx.tobytes(), frac.tobytes())
    hit = _SI_OP_CACHE.get(key)
    if hit is not None:
        return hit
    from .smoothing import _banded_conv_matrix
    S = _banded_conv_matrix(nin, k)
    Imat = _interp_matrix(idx, frac, nin)
    M_host = compose_interp_banded(idx, frac, S, dtype=np.float32)
    val = (S, Imat, M_host)
    # bound by BYTES, not entries: each triple is O(nin^2) dense — at
    # 8192 channels ~0.5 GB — so 8 unbounded entries could pin multi-GB
    # host RAM across a parameter sweep
    nbytes = sum(a.nbytes for a in val)
    total = sum(sum(a.nbytes for a in v) for v in _SI_OP_CACHE.values())
    if len(_SI_OP_CACHE) >= 8 or total + nbytes > 2 * 2 ** 30:
        _SI_OP_CACHE.clear()
    _SI_OP_CACHE[key] = val
    return val


def smooth_interp_cube(data, kernel, inaxis, outaxis, include=None):
    """Fused spectral smooth + regrid of a [spec, ...] cube.

    The workflow the reference documents as ``spectral_smooth`` then
    ``spectral_interpolate`` (two full passes, docs/smoothing.rst) is a
    composition of two *linear* operators along the spectral axis, so on
    TPU the normalized smoothing band matrix S and the 2-tap interp matrix
    I compose on the host into one (nout, nin) operator M = I @ S: an
    all-finite cube runs ONE MXU matmul instead of the chain's four
    (smooth numerator+denominator, interp output+poison).  Cubes that
    contain NaN take the exact sequential chain inside ``lax.cond``
    (normalized-convolution NaN semantics do not compose).

    Returns (new_data, new_include_or_None) like interp_cube_spectral.
    """
    from .smoothing import spectral_smooth_cube
    import jax.lax as lax
    data = jnp.asarray(data)
    idx, frac = interp_weights(inaxis, outaxis)
    nin, nout = data.shape[0], idx.shape[0]
    if not _use_matmul_interp(nin, nout):
        sm = spectral_smooth_cube(data, kernel)
        return interp_cube_spectral(sm, inaxis, outaxis, include=include)

    k = np.asarray(kernel, dtype=np.float64)
    k = k / k.sum()
    S, Imat, M_host = _si_operators(k, idx, frac, nin)
    spatial = int(np.prod(data.shape[1:])) if data.ndim > 1 else 1
    flat = data.reshape(nin, spatial)
    # long axes apply the composed operator block-windowed (its band is
    # only ~kernel+2 wide), keeping FLOPs linear in nin
    use_block = nin > 512
    M = None if use_block else jnp.asarray(M_host)

    def mm(mat, x, precision=lax.Precision.HIGHEST):
        return lax.dot_general(mat, x.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)

    def fused(x):
        if use_block:
            return block_matmul_from_dense(M_host, x)
        return mm(M, x)

    def chain(x):
        sm = spectral_smooth_cube(x, k)
        out, _ = interp_cube_spectral(sm, inaxis, outaxis)
        return out.astype(jnp.float32)

    def new_include():
        if include is None:
            return None
        # the smooth step leaves the include-mask unchanged; only the
        # interp operator transforms it (reference spectral_cube.py:3308).
        # Include only where every contributing neighbor is included
        # ("excluded mass == 0"), matching interp_cube_spectral.
        inc = jnp.asarray(include).astype(jnp.float32)
        exc_b = 1.0 - jnp.broadcast_to(inc, data.shape).reshape(nin, spatial)
        if use_block:
            exc_i = block_tap_matmul(exc_b, idx.astype(np.int64), frac,
                                     precision=lax.Precision.DEFAULT)
        else:
            exc_i = mm(jnp.asarray(Imat), exc_b,
                       precision=lax.Precision.DEFAULT)
        return (exc_i == 0).reshape((nout,) + data.shape[1:])

    out = None
    import jax
    if jax.default_backend() == "tpu" and data.dtype != jnp.float64:
        # strip-blocked Pallas path: NaN handling decided per spaxel
        # block INSIDE the kernel, so all-finite cubes skip both the
        # has-NaN prepass and the lax.cond operand materialization
        # (measured 1.149 -> ~0.4 ms on the 512-chan BASELINE config).
        # 3-D cubes go through the 3-D-native kernel: the (nin, spatial)
        # reshape is a physical HBM relayout on TPU (the (8, 128) tiling
        # binds the two minor dims) costing more than the kernel itself —
        # measured 0.65 vs 0.32 ms on the 512-channel BASELINE config.
        from .banded_pallas import (smooth_interp_strips,
                                    smooth_interp_strips_3d)
        if data.ndim == 3:
            out3 = smooth_interp_strips_3d(data, M_host, S, Imat)
            if out3 is not None:
                return out3.astype(data.dtype), new_include()
        out = smooth_interp_strips(flat, M_host, S, Imat)
    if out is None:
        has_nan = jnp.any(~jnp.isfinite(flat))
        out = lax.cond(has_nan, chain, fused, flat)
    out = out.reshape((nout,) + data.shape[1:]).astype(data.dtype)
    return out, new_include()


def check_nyquist(inaxis, outaxis):
    indiff = np.abs(np.diff(inaxis).mean())
    outdiff = np.abs(np.diff(outaxis).mean())
    if outdiff > 2 * indiff:
        warnings.warn("Input grid has too small a spacing. The data should "
                      "be smoothed prior to resampling.", SmoothingWarning)


def linear_spectral_wcs(wcs, outaxis, unit=None):
    """New WCS with a linear spectral axis matching ``outaxis`` (reference
    spectral_cube.py:3317-3324)."""
    outaxis = np.asarray(outaxis, dtype=np.float64)
    new = wcs.deepcopy()
    i = new.spec
    new.crpix[i] = 1.0
    new.crval[i] = float(outaxis[0])
    new.cdelt[i] = float(outaxis[1] - outaxis[0]) if outaxis.size > 1 \
        else new.cdelt[i]
    new.pc[i, :] = 0.0
    new.pc[:, i] = 0.0
    new.pc[i, i] = 1.0
    if unit is not None:
        new.cunit[i] = unit
    # the axis is now linearly sampled in its own variable
    ct = new.ctype[i]
    if len(ct) > 4:
        new.ctype[i] = ct[:4]
    return new


def interp_spectrum(value, inaxis, outaxis, wcs, suppress_smooth_warning=False,
                    fill_value=None, include=None):
    """1-D case used by OneDSpectrum.spectral_interpolate.

    Returns ``(out, new_wcs, new_include_or_None)``.  The include mask
    transforms like the cube path: a sample stays included only where
    every contributing neighbor is included (reference
    spectral_cube.py:3267-3310 filled-data poisoning semantics)."""
    if not suppress_smooth_warning:
        check_nyquist(inaxis, outaxis)
    idx, frac = interp_weights(inaxis, outaxis)
    lerp = value[idx] * (1 - frac) + value[idx + 1] * frac
    # np.interp semantics: exact grid hits and edge clamps return the
    # sample itself — a zero-weight NaN neighbor must not poison them
    out = np.where(frac == 0, value[idx],
                   np.where(frac == 1, value[idx + 1], lerp))
    if fill_value is not None:
        lo, hi = min(inaxis[0], inaxis[-1]), max(inaxis[0], inaxis[-1])
        out = np.where((outaxis < lo) | (outaxis > hi), fill_value, out)
    new_include = None
    if include is not None:
        exc = 1.0 - np.asarray(include, dtype=float)
        exc_lerp = exc[idx] * (1 - frac) + exc[idx + 1] * frac
        exc_i = np.where(frac == 0, exc[idx],
                         np.where(frac == 1, exc[idx + 1], exc_lerp))
        new_include = exc_i == 0
    return out, linear_spectral_wcs(wcs, outaxis), new_include


ESTIMATORS = {"mean": jnp.nanmean, "sum": jnp.nansum, "median": jnp.nanmedian,
              "max": jnp.nanmax, "min": jnp.nanmin}


def downsample_axis(data, factor, axis, estimator="mean", truncate=False):
    """Block-downsample along ``axis`` with a NaN-aware estimator
    (reference spectral_cube.py:3421-3557).

    With ``truncate=False`` a ragged tail block is padded with NaN so the
    estimator sees only real samples (matching the reference's use of
    nan-functions over a NaN-padded reshape)."""
    data = jnp.asarray(data)
    est = ESTIMATORS[estimator] if isinstance(estimator, str) else estimator
    n = data.shape[axis]
    factor = int(factor)
    if truncate:
        keep = (n // factor) * factor
        idx = [slice(None)] * data.ndim
        idx[axis] = slice(0, keep)
        data = data[tuple(idx)]
        n = keep
    pad = (-n) % factor
    if pad:
        pads = [(0, 0)] * data.ndim
        pads[axis] = (0, pad)
        data = jnp.pad(data, pads, constant_values=jnp.nan)
    shape = list(data.shape)
    shape[axis] = data.shape[axis] // factor
    shape.insert(axis + 1, factor)
    blocked = data.reshape(shape)
    return est(blocked, axis=axis + 1)


def downsample_include(include, factor, axis, truncate=False):
    """Block-downsample a boolean include mask: a block is included if any
    of its members is (reference spectral_cube.py:3497-3503 ``np.any`` over
    each factor-block; the ragged tail pads with excluded)."""
    include = jnp.asarray(include, dtype=bool)
    factor = int(factor)
    n = include.shape[axis]
    if truncate:
        keep = (n // factor) * factor
        idx = [slice(None)] * include.ndim
        idx[axis] = slice(0, keep)
        include = include[tuple(idx)]
        n = keep
    pad = (-n) % factor
    if pad:
        pads = [(0, 0)] * include.ndim
        pads[axis] = (0, pad)
        include = jnp.pad(include, pads, constant_values=False)
    shape = list(include.shape)
    shape[axis] = include.shape[axis] // factor
    shape.insert(axis + 1, factor)
    return jnp.any(include.reshape(shape), axis=axis + 1)
