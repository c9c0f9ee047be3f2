"""Masked reductions with the reference's NaN semantics, as fused jnp kernels.

The reference implements these as nan-aware numpy functions over mask-filled
copies, dispatched across cube/slice/ray iteration strategies to bound RAM
(``/root/reference/spectral_cube/spectral_cube.py:361-819``, strategy select
at :424-427).  On TPU the strategy layer is obsolete: each reduction is a
single jit-compiled expression where the mask predicate fuses into the scan
(``jnp.where``), and XLA tiles it over the VPU.  The critical semantic is
``allbadtonan`` (reference ``np_compat.py:3-27``): positions where *no*
included finite value exists along the reduced axis yield NaN, not 0.

All functions take the combined validity mask explicitly (``valid = mask
include & isfinite(data)``) so the caller controls mask fusion.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["valid_mask", "masked_sum", "masked_mean", "masked_std",
           "masked_max", "masked_min", "masked_argmax", "masked_argmin",
           "masked_median", "masked_percentile", "masked_mad_std",
           "masked_statistics"]


def valid_mask(data, include=None):
    """Combined predicate: included and finite."""
    finite = jnp.isfinite(data)
    if include is None:
        return finite
    return jnp.logical_and(finite, include)


def _fill(data, valid, fill):
    return jnp.where(valid, data, jnp.asarray(fill, dtype=data.dtype))


def _float_dtype(data):
    return data.dtype if jnp.issubdtype(data.dtype, jnp.floating) \
        else jnp.float32


def masked_sum(data, valid, axis=None):
    """nansum with allbadtonan: all-invalid positions -> NaN."""
    s = jnp.sum(_fill(data, valid, 0), axis=axis)
    cnt = jnp.sum(valid, axis=axis)
    return jnp.where(cnt > 0, s, jnp.nan)


def masked_mean(data, valid, axis=None):
    s = jnp.sum(_fill(data, valid, 0), axis=axis)
    cnt = jnp.sum(valid, axis=axis).astype(_float_dtype(data))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)


def masked_std(data, valid, axis=None, ddof=0):
    """nanstd (two-pass form, matching numpy nanstd numerics)."""
    cnt = jnp.sum(valid, axis=axis).astype(_float_dtype(data))
    s = jnp.sum(_fill(data, valid, 0), axis=axis)
    mean = s / jnp.maximum(cnt, 1)
    mean_b = jnp.expand_dims(mean, axis) if axis is not None else mean
    dev = _fill((data - mean_b) ** 2, valid, 0)
    var = jnp.sum(dev, axis=axis) / jnp.maximum(cnt - ddof, 1)
    return jnp.where(cnt > ddof, jnp.sqrt(var), jnp.nan)


def masked_max(data, valid, axis=None):
    m = jnp.max(_fill(data, valid, -jnp.inf), axis=axis)
    any_valid = jnp.any(valid, axis=axis)
    return jnp.where(any_valid, m, jnp.nan)


def masked_min(data, valid, axis=None):
    m = jnp.min(_fill(data, valid, jnp.inf), axis=axis)
    any_valid = jnp.any(valid, axis=axis)
    return jnp.where(any_valid, m, jnp.nan)


def masked_argmax(data, valid, axis=0):
    """nanargmax semantics with fill=-inf (reference spectral_cube.py:771-795):
    ties break to the first index.

    All-invalid positions return index 0 — identical to the reference,
    which fills *masked* voxels with -inf before np.nanargmax, so an
    all-masked spaxel argmaxes over uniform -inf and also yields 0.  (The
    one divergence: a spaxel of genuine included NaNs raises All-NaN in
    numpy's nanargmax; here NaN data is folded into the validity predicate
    and yields 0 as well — a deliberate choice, since data-dependent raises
    cannot live inside jit.)"""
    return jnp.argmax(_fill(data, valid, -jnp.inf), axis=axis)


def masked_argmin(data, valid, axis=0):
    return jnp.argmin(_fill(data, valid, jnp.inf), axis=axis)


def masked_median(data, valid, axis=None):
    return masked_percentile(data, valid, 50.0, axis=axis)


def masked_percentile(data, valid, q, axis=None):
    """nanpercentile over the masked data (linear interpolation)."""
    filled = _fill(data, valid, jnp.nan)
    return jnp.nanpercentile(filled, q, axis=axis)


MAD_STD_FACTOR = 1.482602218505602  # 1/Phi^-1(3/4), astropy.stats.mad_std


def masked_mad_std(data, valid, axis=None):
    """Median-absolute-deviation std estimate (astropy mad_std semantics,
    used by reference spectral_cube.py:719-767)."""
    med = masked_median(data, valid, axis=axis)
    med_b = jnp.expand_dims(med, axis) if axis is not None else med
    dev = jnp.abs(data - med_b)
    return MAD_STD_FACTOR * masked_median(dev, valid, axis=axis)


def masked_statistics(data, valid):
    """One-pass global stats, CASA ia.statistics naming (reference
    ``dask_spectral_cube.py:769-814``).  Returns raw floats; the cube layer
    attaches units.  On a sharded cube these sums become psum-tree
    reductions (see parallel.sharded)."""
    cnt = jnp.sum(valid)
    s = jnp.sum(_fill(data, valid, 0))
    ss = jnp.sum(_fill(data * data, valid, 0))
    mn = jnp.min(_fill(data, valid, jnp.inf))
    mx = jnp.max(_fill(data, valid, -jnp.inf))
    npts = cnt.astype(jnp.float64 if data.dtype == jnp.float64
                      else jnp.float32)
    nan = jnp.asarray(jnp.nan, dtype=npts.dtype)
    # npts in {0, 1}: NaN stats, not div-by-zero artifacts (reference
    # tolerates all-NaN chunks, tests/test_dask.py:110-118)
    mean = jnp.where(cnt > 0, s / jnp.maximum(npts, 1), nan)
    # sigma via a second, mean-centered pass: the one-pass
    # (ss - s^2/n)/(n-1) form catastrophically cancels in float32 for
    # data with a large DC offset (mean ~1e3, std ~0.01 leaves pure
    # rounding noise, sometimes negative under the sqrt) — the same
    # reason the moments kernel uses two-pass numerics (ops/moments.py)
    mean_safe = jnp.where(cnt > 0, mean, 0)
    dev = _fill(data - mean_safe, valid, 0)
    s2c = jnp.sum(dev * dev)
    sigma = jnp.where(cnt > 1,
                      jnp.sqrt(s2c / jnp.maximum(npts - 1, 1)), nan)
    rms = jnp.where(cnt > 0, jnp.sqrt(ss / jnp.maximum(npts, 1)), nan)
    mn = jnp.where(cnt > 0, mn, nan)
    mx = jnp.where(cnt > 0, mx, nan)
    s = jnp.where(cnt > 0, s, nan)
    ss = jnp.where(cnt > 0, ss, nan)
    return {"npts": cnt, "min": mn, "max": mx, "sum": s, "sumsq": ss,
            "mean": mean, "sigma": sigma, "rms": rms}
