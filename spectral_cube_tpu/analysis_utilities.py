"""Spectral stacking & Fourier shifting.

Parity target: ``/root/reference/spectral_cube/analysis_utilities.py`` —
``fourier_shift`` (:14-94), ``stack_spectra`` (:134-318, which loops a
per-spectrum FFT shift over a joblib pool), ``stack_cube`` (:321-432).

TPU-first design: all spaxel spectra shift in a *single* batched FFT with a
per-spectrum phase ramp (one jit kernel, no pool, no chunking), and the NaN
mask shifts alongside the data exactly as the reference does.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from . import units as u
from .units import Quantity
from .utils import BadVelocitiesWarning
from .beams import NoBeamError
from .lower_dimensional_structures import (OneDSpectrum,
                                           VaryingResolutionOneDSpectrum)

__all__ = ["fourier_shift", "stack_spectra", "stack_cube", "get_chunks"]


def get_chunks(num_items, chunk):
    """Split ``range(num_items)`` into arrays of ``chunk`` items plus a
    remainder (reference analysis_utilities.py:97-126, same split points).
    The reference feeds these to its joblib pool; here stacking is one
    vmapped jit so the helper is kept only as an API-compatibility
    utility."""
    import numpy as _np
    items = _np.arange(int(num_items))
    if num_items == chunk:
        return [items]
    chunks = _np.array_split(items, [chunk * i for i in
                                     range(int(num_items / chunk))])
    if chunks and chunks[-1].size == 0:
        chunks = chunks[:-1]
    if chunks and chunks[0].size == 0:
        chunks = chunks[1:]
    return chunks


@jax.jit
def _fourier_shift_batch(specs, shifts):
    """Shift each row of (nspec, nchan) by its own (fractional) pixel count
    via FFT phase ramps; NaNs shift with the data and re-mask the output
    (reference fourier_shift semantics).

    Jitted: eager op-by-op execution would dispatch a complex-scalar
    constant transfer, which the axon tunnel backend cannot do (and a
    failed transfer wedges the process); under jit the complex phase stays
    entirely on device."""
    specs = jnp.asarray(specs)
    nanmask = ~jnp.isfinite(specs)
    filled = jnp.where(nanmask, 0.0, specs)
    n = specs.shape[1]
    m = jnp.fft.fftfreq(n)
    phase = jnp.exp(-2j * np.pi * m[None, :]
                    * jnp.asarray(shifts, dtype=jnp.float32)[:, None])
    shifted = jnp.real(jnp.fft.ifft(jnp.fft.fft(filled, axis=1) * phase,
                                    axis=1))
    mask_shift = jnp.real(jnp.fft.ifft(
        jnp.fft.fft(nanmask.astype(filled.dtype), axis=1) * phase, axis=1))
    out = jnp.where(mask_shift > 0.5, jnp.nan, shifted)
    # rows that were entirely NaN stay NaN
    allnan = jnp.all(nanmask, axis=1, keepdims=True)
    return jnp.where(allnan, jnp.nan, out)


def fourier_shift(x, shift, axis=0, add_pad=False, pad_size=None):
    """Shift a spectrum (or array) in the Fourier plane (reference
    analysis_utilities.py:14-94)."""
    x = np.asarray(x, dtype=float)
    nanmask = ~np.isfinite(x)
    if nanmask.all() and not add_pad:
        return x
    if add_pad:
        if pad_size is None:
            pad = int(np.ceil(abs(shift)))
            pad_size = (pad, 0) if shift > 0 else (0, pad)
        pads = [(0, 0)] * x.ndim
        pads[axis] = pad_size
        # pad with valid zeros (reference analysis_utilities.py:59-63):
        # NaN padding would shift INTO the data and blank edge channels
        x = np.pad(x, pads, mode="constant", constant_values=0.0)
        nanmask = ~np.isfinite(x)
    if nanmask.all():
        return np.full(x.shape, np.nan)
    moved = np.moveaxis(x, axis, -1)
    flat = moved.reshape(-1, moved.shape[-1])
    out = np.asarray(_fourier_shift_batch(flat,
                                          np.full(flat.shape[0], shift)))
    return np.moveaxis(out.reshape(moved.shape), -1, axis)


def stack_spectra(cube, velocity_surface, v0=None, stack_function=None,
                  xy_posns=None, num_cores=None, chunk_size=-1,
                  progressbar=False, pad_edges=True, vdiff_tol=0.01,
                  weights=None):
    """Shift every spaxel's spectrum by a velocity surface and stack.

    Matches reference stack_spectra (analysis_utilities.py:134-318):
    fractional pixel shifts from (velocity_surface - v0)/dv with the sign of
    the spectral axis, optional edge padding so no spectrum wraps, NaN mask
    shifted along, reduced with ``stack_function`` (default nanmean).
    """
    if isinstance(velocity_surface, Quantity):
        vel = velocity_surface
    else:
        vel = Quantity(np.asarray(velocity_surface),
                       cube.spectral_axis.unit)
    velv = np.asarray(vel.to_value(cube.spectral_axis.unit), dtype=float)
    if not np.isfinite(velv).any():
        raise ValueError("velocity_surface contains no finite values.")
    if velv.shape != cube.shape[1:]:
        raise ValueError("Velocity surface map does not match cube spatial "
                         "dimensions.")

    if xy_posns is None:
        xy_posns = np.where(np.isfinite(velv))

    sv = np.asarray(cube.spectral_axis.value, dtype=float)
    if v0 is None:
        v0v = sv.mean()
    else:
        if not isinstance(v0, Quantity):
            raise ValueError("v0 must be a quantity.")
        v0v = float(v0.to_value(cube.spectral_axis.unit))
        if v0v < sv.min() or v0v > sv.max():
            raise ValueError("v0 must be within the range of the spectral "
                             "axis of the cube.")

    dv = sv[1] - sv[0]
    dv2 = sv[-1] - sv[-2]
    if not np.isclose(abs(dv2), abs(dv), rtol=vdiff_tol):
        raise ValueError("Cannot shift spectra on a non-linear axis")
    vdiff_sign = -1.0 if dv > 0 else 1.0
    vdiff = abs(dv)

    vmax, vmin = sv.max(), sv.min()
    if np.any(velv[np.isfinite(velv)] > vmax) or \
            np.any(velv[np.isfinite(velv)] < vmin):
        warnings.warn("Some velocities are outside the allowed range and "
                      "will be masked out.", BadVelocitiesWarning)
        velv = np.where((velv < vmax) & (velv > vmin), velv, np.nan)
        xy_posns = np.where(np.isfinite(velv))
        if xy_posns[0].size == 0:
            raise ValueError(
                "All velocities in velocity_surface are outside the "
                f"cube's spectral range [{vmin:g}, {vmax:g}] "
                f"{cube.spectral_axis.unit}; nothing to stack.")

    pix_shifts = vdiff_sign * (velv - v0v) / vdiff
    shifts = pix_shifts[xy_posns]

    n = sv.size
    if pad_edges:
        max_pos = int(np.ceil(np.nanmax(shifts)))
        max_neg = int(np.ceil(np.nanmin(shifts)))
        max_neg = min(max_neg, 0)
        max_pos = max(max_pos, 0)
        pad_lo, pad_hi = -max_neg, max_pos
    else:
        pad_lo = pad_hi = 0

    data = cube._get_filled_data(fill=np.nan)
    specs = jnp.moveaxis(data, 0, -1)[xy_posns]       # (nspec, nchan)
    if pad_lo or pad_hi:
        specs = jnp.pad(specs, ((0, 0), (pad_lo, pad_hi)),
                        constant_values=0.0)
    shifted = _fourier_shift_batch(specs, jnp.asarray(shifts))

    arr = np.asarray(shifted)
    if weights is not None:
        # weighted MEAN: sum(w*s)/sum(w) per channel, NaN-aware — a bare
        # multiply fed zero-weight rows into nanmean as valid zeros and
        # scaled the stack by the mean weight
        wv = np.asarray(weights, dtype=float)[xy_posns][:, None]
        wmask = np.where(np.isfinite(arr), wv, 0.0)
        num = np.nansum(arr * wv, axis=0)
        den = wmask.sum(axis=0)
        stacked = np.where(den > 0, num / np.where(den > 0, den, 1),
                           np.nan)
        if stack_function is not None:
            # a bare stack_function(arr * w) is biased (zero-weight rows
            # enter nanmean as valid zeros; the result scales with the
            # mean weight instead of normalizing by sum(w)) — refuse the
            # ambiguous combination rather than silently mis-stack
            raise ValueError(
                "weights are only supported with the default "
                "weighted-mean stacking; fold your weighting into "
                "stack_function instead")
    elif stack_function is None:
        stacked = np.nanmean(arr, axis=0)
    else:
        stacked = stack_function(arr, axis=0)

    # build the stacked spectrum's WCS: same spectral sampling, crpix
    # shifted by the left padding
    new_wcs = cube._wcs.spectral
    new_wcs = new_wcs.deepcopy()
    new_wcs.crpix[0] += pad_lo

    if hasattr(cube, "beams"):
        return VaryingResolutionOneDSpectrum(
            stacked, unit=cube.unit, wcs=new_wcs, meta=dict(cube.meta),
            beams=cube.unmasked_beams)
    return OneDSpectrum(stacked, unit=cube.unit, wcs=new_wcs,
                        meta=dict(cube.meta),
                        beam=getattr(cube, "_beam", None))


def stack_cube(cube, linelist, vmin, vmax, average=None, convolve_beam=None,
               return_hdu=False, return_cutouts=False):
    """Stack multiple spectral lines onto a common velocity grid
    (reference analysis_utilities.py:321-432): per-(line, cube) velocity
    reslab, lines whose slab has <= 1 channel are skipped, per-slab
    common-beam convolution for varying-resolution cubes, interpolation
    onto the first slab's grid, then averaging.  ``cube`` may be a list of
    cubes sharing the spatial grid; the result clears the rest frequency
    and records ``meta['stacked_lines']``."""
    from .cube import VaryingResolutionSpectralCube

    if isinstance(cube, (list, tuple)):
        cubes = list(cube)
        cube = cubes[0]
        for cb in cubes[1:]:
            if cb.shape[1:] != cube.shape[1:]:
                raise ValueError("If you pass multiple cubes, they must "
                                 "have the same spatial shape.")
        if convolve_beam is None:
            try:
                beams_differ = not all(cb.beam == cube.beam
                                       for cb in cubes[1:])
            except (ValueError, AttributeError, NoBeamError):
                beams_differ = False  # beam-less cubes stack as-is
            if any(hasattr(cb, "beams") for cb in cubes) or beams_differ:
                raise ValueError("If the cubes have different resolution, "
                                 "`convolve_beam` must be specified.")
    else:
        cubes = [cube]
    if not hasattr(linelist, "__len__"):
        linelist = [linelist]

    slabs = []
    included_lines = []
    for restval in linelist:
        for cb in cubes:
            line_cube = cb.with_spectral_unit(u.km_s,
                                              velocity_convention="radio",
                                              rest_value=restval)
            line_cutout = line_cube.spectral_slab(vmin, vmax)
            if line_cutout.shape[0] <= 1:
                # out-of-band line for this cube: skip (reference :390)
                continue
            included_lines.append(restval)
            if isinstance(line_cutout, VaryingResolutionSpectralCube):
                if convolve_beam is None:
                    raise ValueError(
                        "If any of the input cubes have varying resolution,"
                        " a target `convolve_beam` must be specified.")
                line_cutout = line_cutout.convolve_to(convolve_beam)
            slabs.append(line_cutout)
    if not slabs:
        raise ValueError("No line in linelist falls inside any cube's "
                         "spectral range.")

    reference_cube = slabs[0]
    reference_grid = Quantity(
        np.asarray(reference_cube.spectral_axis.value),
        reference_cube.spectral_axis.unit)
    cutouts = [reference_cube]
    for slab in slabs[1:]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cutouts.append(slab.spectral_interpolate(reference_grid))

    stacked = jnp.stack([c._get_filled_data(fill=np.nan) for c in cutouts])
    if average is None:
        out = jnp.nanmean(stacked, axis=0)
    else:
        out = average(np.asarray(stacked), axis=0)
    new_wcs = reference_cube._wcs.copy()
    new_wcs.restfrq = 0.0  # rest frequency is no longer defined
    meta = dict(reference_cube.meta)
    meta["stacked_lines"] = included_lines
    result = reference_cube._new_cube_with(data=jnp.asarray(out), mask=None,
                                           wcs=new_wcs, meta=meta)
    retval = result.hdu if return_hdu else result
    if return_cutouts:
        return retval, [np.asarray(c._get_filled_data(fill=np.nan))
                        for c in cutouts]
    return retval
