"""Sharded cube execution: SPMD kernels over a CubeMesh.

This is the functional replacement for the reference's
``DaskSpectralCube`` (``/root/reference/spectral_cube/dask_spectral_cube.py``,
1650 LoC): instead of re-implementing the cube API over a chunked-graph
runtime, the same fused kernels from ``ops/`` run SPMD over a device mesh —
GSPMD partitions the elementwise/reduction work automatically, ``psum``
trees replace the chunk-aggregation graphs (``statistics()`` :769-814),
``ppermute`` halo exchange replaces chunk-overlap handling for spatial
stencils, and ``reshard`` replaces rechunk between op families.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from .mesh import CubeMesh
from ..masks import expr_key as _expr_key
from ..ops import moments as _mom
from ..ops import reductions as _red

# compiled-program cache: rebuilding shard_map wrappers retraces the whole
# kernel every call (~0.5-1 s host time); same-shaped cubes reuse programs
_SHARDED_JIT_CACHE = {}
# cache sentinel: kernels known to be unsupported by the separable path
_SEP_UNSUPPORTED = object()


def _cache_put(key, fn):
    if len(_SHARDED_JIT_CACHE) > 64:  # runaway-shape backstop
        _SHARDED_JIT_CACHE.clear()
    _SHARDED_JIT_CACHE[key] = fn

__all__ = ["sharded_moments", "sharded_statistics", "halo_pad",
           "sharded_convolve_per_channel_separable",
           "sharded_spatial_convolve", "sharded_spectral_convolve_fft",
           "sharded_sigma_clip", "sharded_spectral_interpolate",
           "sharded_smooth_interpolate", "sharded_reproject",
           "ShardedCube"]


def _pad_spatial(data, cmesh, pad_value, include=None):
    """Pad the spatial dims of a [spec, y, x] array up to multiples of the
    mesh grid so shard_map's even-divisibility requirement always holds
    (production ingest pads at read time; this covers ad-hoc cubes).

    ``pad_value`` chooses the semantics: NaN = invalid (reductions,
    clipping, interpolation — padded voxels never contribute), 0 = the
    astropy ``boundary='fill'`` valid-zero convention (convolution).
    Returns (padded, include_padded, crop) where ``crop`` slices the
    padded output back to the true extent."""
    my, mx = cmesh.grid
    nchan, ny, nx = data.shape
    py, px = (-ny) % my, (-nx) % mx
    crop = (slice(None), slice(0, ny), slice(0, nx))
    if py == 0 and px == 0:
        return data, include, crop
    pads = ((0, 0), (0, py), (0, px))
    data = jnp.pad(jnp.asarray(data), pads, constant_values=pad_value)
    if include is not None:
        include = jnp.pad(jnp.asarray(include), pads, constant_values=False)
    return data, include, crop


def _pad_chan(data, cmesh, pad_value):
    """Pad the spectral dim up to a multiple of the total device count so
    the spectral layout (all planes of a channel on one device) divides.
    Returns (padded, nchan_orig)."""
    n_dev = int(np.prod(cmesh.grid))
    nchan = data.shape[0]
    pc = (-nchan) % n_dev
    if pc == 0:
        return data, nchan
    pads = ((0, pc),) + ((0, 0),) * (data.ndim - 1)
    return jnp.pad(jnp.asarray(data), pads, constant_values=pad_value), nchan


# ---------------------------------------------------------------------------
# moments: spatial layout, zero communication
# ---------------------------------------------------------------------------
def sharded_moments(data, coords, dx, cmesh: CubeMesh, include=None,
                    mask_expr=None):
    """Masked moments 0/1/2 over a spatially-sharded cube.

    Each device reduces its own (nchan, y/py, x/px) shard along the local
    spectral axis — no collectives at all.  On TPU each shard runs the fused
    Pallas kernel; elsewhere the jnp expression."""
    mesh = cmesh.mesh
    use_pallas = jax.default_backend() == "tpu"

    data, include, crop = _pad_spatial(data, cmesh, jnp.nan, include)
    in_specs = [P(None, "y", "x")]
    args = [cmesh.shard(data, "spatial")]
    if include is not None:
        in_specs.append(P(None, "y", "x"))
        args.append(cmesh.shard(include, "spatial"))

    def local(d, *rest):
        inc = rest[0] if rest else None
        if use_pallas:
            return _mom.moments_012_pallas(d, coords, dx,
                                           mask_expr=mask_expr, include=inc)
        if mask_expr is not None:
            inc2 = mask_expr._include(data=d)
            inc = inc2 if inc is None else jnp.logical_and(inc, inc2)
        return _mom.moments_012(d, coords, dx, include=inc)

    # check_vma=False: the Pallas call's out_shape carries no varying
    # manual-axes annotation, which newer shard_map validation rejects
    key = (data.shape, str(getattr(data, "dtype", "f4")),
           np.asarray(coords, dtype=np.float64).tobytes(), float(dx),
           _expr_key(mask_expr), include is not None,
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(("moments", key))
    if fn is None:
        fn = jax.jit(shard_map(
            local, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=(P("y", "x"), P("y", "x"), P("y", "x")),
            check_vma=False))
        _cache_put(("moments", key), fn)
    sp_crop = crop[1:]
    return tuple(m[sp_crop] for m in fn(*args))


# ---------------------------------------------------------------------------
# one-pass global statistics: psum tree over the mesh
# ---------------------------------------------------------------------------
def sharded_statistics(data, cmesh: CubeMesh, include=None):
    """CASA-style global stats over a spatially-sharded cube: per-shard
    {n, min, max, sum, sumsq} then a psum/pmax tree over ('y','x') — the
    direct analog of the reference's per-chunk accumulation
    (dask_spectral_cube.py:769-814)."""
    mesh = cmesh.mesh
    data, include, _ = _pad_spatial(data, cmesh, jnp.nan, include)
    in_specs = [P(None, "y", "x")]
    args = [cmesh.shard(data, "spatial")]
    if include is not None:
        in_specs.append(P(None, "y", "x"))
        args.append(cmesh.shard(include, "spatial"))

    def local(d, *rest):
        inc = rest[0] if rest else None
        valid = _red.valid_mask(d, inc)
        cnt = jnp.sum(valid)
        s = jnp.sum(jnp.where(valid, d, 0))
        ss = jnp.sum(jnp.where(valid, d * d, 0))
        mn = jnp.min(jnp.where(valid, d, jnp.inf))
        mx = jnp.max(jnp.where(valid, d, -jnp.inf))
        axes = ("y", "x")
        cnt = jax.lax.psum(cnt, axes)
        s = jax.lax.psum(s, axes)
        ss = jax.lax.psum(ss, axes)
        mn = jax.lax.pmin(mn, axes)
        mx = jax.lax.pmax(mx, axes)
        # second, mean-centered pass for sigma: the one-pass
        # (ss - s^2/n) form catastrophically cancels in f32 for data
        # with a large DC offset (same fix as ops/reductions.py)
        npts = jnp.maximum(cnt, 1).astype(d.dtype)
        mean = s / npts
        s2c = jax.lax.psum(
            jnp.sum(jnp.where(valid, (d - mean) ** 2, 0)), axes)
        return cnt, mn, mx, s, ss, s2c

    key = ("stats", data.shape, str(getattr(data, "dtype", "f4")),
           include is not None,
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                               out_specs=(P(),) * 6))
        _cache_put(key, fn)
    cnt, mn, mx, s, ss, s2c = fn(*args)
    # two fetches (npts exact + stacked floats), not six round trips
    stacked = np.asarray(jnp.stack([mn, mx, s, ss, s2c]))
    npts_i = int(np.asarray(cnt))
    mn, mx, s, ss, s2c = (float(v) for v in stacked)
    npts = float(npts_i)
    # all-masked / single-point cubes: NaN stats, never ZeroDivisionError
    # (reference handles all-NaN chunks, tests/test_dask.py:110-118)
    if npts == 0:
        return {"npts": 0, "min": np.nan, "max": np.nan, "sum": np.nan,
                "sumsq": np.nan, "mean": np.nan, "sigma": np.nan,
                "rms": np.nan}
    out = {"npts": npts_i, "min": mn, "max": mx,
           "sum": s, "sumsq": ss, "mean": s / npts}
    out["sigma"] = float(np.sqrt(s2c / (npts - 1))) if npts > 1 else np.nan
    out["rms"] = float(np.sqrt(out["sumsq"] / npts))
    return out


# ---------------------------------------------------------------------------
# halo exchange for spatial stencils (the ppermute analog of dask chunk
# overlap; SURVEY 2.10 "halo exchange for spatial convolution")
# ---------------------------------------------------------------------------
def halo_pad(local, halo_y, halo_x, axis_y="y", axis_x="x"):
    """Pad a local [..., py, px] shard with neighbor data via ppermute.

    Edge shards get zero padding (matching the zero-fill boundary of the
    astropy-convolve semantics used throughout)."""

    def exchange(arr, halo, axis_name, axis):
        if halo == 0:
            return arr
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        lo = jax.lax.slice_in_dim(arr, 0, halo, axis=axis)
        hi = jax.lax.slice_in_dim(arr, arr.shape[axis] - halo,
                                  arr.shape[axis], axis=axis)
        # send my high edge to my right neighbor (it becomes their left halo)
        right = [(i, i + 1) for i in range(n - 1)]
        left = [(i, i - 1) for i in range(1, n)]
        from_left = jax.lax.ppermute(hi, axis_name, right)
        from_right = jax.lax.ppermute(lo, axis_name, left)
        zeros = jnp.zeros_like(lo)
        left_halo = jnp.where(idx > 0, from_left, zeros)
        right_halo = jnp.where(idx < n - 1, from_right, zeros)
        return jnp.concatenate([left_halo, arr, right_halo], axis=axis)

    out = exchange(local, halo_y, axis_y, local.ndim - 2)
    out = exchange(out, halo_x, axis_x, local.ndim - 1)
    return out


def sharded_spatial_convolve(data, kernel, cmesh: CubeMesh):
    """NaN-interpolating spatial convolution of a spatially-sharded cube
    with a (small) 2-D kernel, using halo exchange instead of resharding.

    Low-rank kernels delegate to the group-indexed separable band-matmul
    path (one group): XLA's 2-D conv lowering measures ~100x slower than
    the equivalent MXU matmuls on TPU (see ops/smoothing.py).  Full-rank
    kernels keep the per-shard conv."""
    k = np.asarray(kernel, dtype=float)
    k = k / k.sum()
    nchan0 = int(np.shape(data)[0])   # never np.asarray a device cube
    sep = sharded_convolve_per_channel_separable(
        data, [k], np.zeros(nchan0, np.int32), cmesh)
    if sep is not None:
        return sep
    mesh = cmesh.mesh
    hy, hx = k.shape[0] // 2, k.shape[1] // 2
    my, mx = cmesh.grid
    _, ny0, nx0 = np.shape(data)
    py0 = -(-max(ny0, 1) // my)
    px0 = -(-max(nx0, 1) // mx)
    if (hy > py0 or hx > px0          # halo wider than a tile
            or k.shape[0] % 2 == 0 or k.shape[1] % 2 == 0):
        # even kernels would emit py+1 VALID rows per shard (misaligned
        # reassembly); both cases take the reshard + spectral-multiply
        # path instead
        from ..ops.convolve import _kernel_transfer, _padded_shape
        # size the FFT planes from the MESH-PADDED extent: the fft path
        # pads (ny0, nx0) up to mesh-grid multiples before convolving
        fy, fx = _padded_shape((ny0 + (-ny0) % my, nx0 + (-nx0) % mx),
                               k.shape)
        transfers = _kernel_transfer(k, fy, fx)[None]
        return sharded_spectral_convolve_fft(
            data, transfers, np.zeros(nchan0, np.int32), cmesh)

    def local(d):
        valid = jnp.isfinite(d)
        comp = jnp.float64 if d.dtype == jnp.float64 else jnp.float32
        filled = jnp.where(valid, d, 0).astype(comp)
        # zero-fill boundary counts as valid (astropy boundary='fill'), so
        # the halo-exchanged denominator tracks only NaN holes
        inv = (~valid).astype(comp)
        both = jnp.concatenate([filled, inv], axis=0)
        padded = halo_pad(both, hy, hx)
        nchan = d.shape[0]
        pf, pv = padded[:nchan], padded[nchan:]
        kj = jnp.asarray(k[::-1, ::-1], dtype=comp)[None, None]
        conv = lambda x: jax.lax.conv_general_dilated(
            x[:, None], kj, (1, 1), padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
        num = conv(pf)
        den = 1.0 - conv(pv)
        eps = 1e-6   # the codebase-wide normalized-convolution floor
        out = jnp.where(den > eps, num / jnp.where(den > eps, den, 1),
                        jnp.nan)
        return out.astype(d.dtype)

    data, _, crop = _pad_spatial(data, cmesh, 0.0)
    key = ("spatconv", k.tobytes(), data.shape,
           str(getattr(data, "dtype", "f4")),
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=(P(None, "y", "x"),),
                               out_specs=P(None, "y", "x")))
        _cache_put(key, fn)
    return fn(cmesh.shard(data, "spatial"))[crop]


def sharded_convolve_per_channel_separable(data, kernels, group_idx,
                                           cmesh: CubeMesh, max_rank=4):
    """Per-channel separable beam convolution in the SPATIAL layout with
    halo exchange — zero all-to-alls.

    The banded tap matrices are Toeplitz away from the global edges, so
    every tile applies the SAME (local, local+2h) interior band window to
    its halo-padded block; edge tiles see zero halos, which reproduces the
    zero-fill boundary exactly.  NaN normalization runs like the other
    convolution paths.  Returns None when the kernels aren't low-rank or
    a tile is smaller than the kernel half-width (fall back to the
    reshard + spectral-multiply path)."""
    from ..ops.convolve import separable_factors
    import jax.lax as lax

    mesh = cmesh.mesh
    my, mx = cmesh.grid
    # mesh-align with valid zeros (the fill-boundary convention), crop
    # after — _pad_spatial guarantees ny % my == nx % mx == 0 below
    data, _, crop = _pad_spatial(jnp.asarray(data), cmesh, 0.0)
    nchan, ny, nx = data.shape
    py, px = ny // my, nx // mx
    # consult the cache BEFORE any host-side SVD/band construction: the
    # factors and band windows are fully determined by the key, and for
    # many-beam cubes their numpy cost dominates a jit-cache hit
    key = ("sepconv", data.shape, str(getattr(data, "dtype", "f4")),
           tuple(kk.tobytes() if kk is not None else None
                 for kk in kernels),
           np.asarray(group_idx, np.int32).tobytes(), max_rank,
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is _SEP_UNSUPPORTED:
        return None
    if fn is not None:
        return fn(cmesh.shard(data, "spatial"))[crop]
    ytaps_g, xtaps_g, ranks = [], [], []
    hy = hx = 0
    for k in kernels:
        if k is None:
            ytaps_g.append(None)
            xtaps_g.append(None)
            ranks.append(1)
            continue
        fac = separable_factors(k, max_rank=max_rank)
        if fac is None:
            _cache_put(key, _SEP_UNSUPPORTED)
            return None
        ytaps_g.append(fac[0])
        xtaps_g.append(fac[1])
        ranks.append(fac[0].shape[1])
        # backward reach after the flip is ceil((klen-1)/2) — using the
        # floor would drop a tap at tile boundaries for even kernels
        hy = max(hy, k.shape[0] - 1 - (k.shape[0] - 1) // 2)
        hx = max(hx, k.shape[1] - 1 - (k.shape[1] - 1) // 2)
    if hy > py or hx > px:
        _cache_put(key, _SEP_UNSUPPORTED)
        return None
    r = max(ranks)
    ngroup = len(kernels)

    def band(n_local, h, taps_list):
        """(ngroup, r, n_local, n_local + 2h) interior band windows."""
        out = np.zeros((ngroup, r, n_local, n_local + 2 * h),
                       dtype=np.float32)
        rows, cols = np.mgrid[0:n_local, 0:n_local + 2 * h]
        for g in range(ngroup):
            taps = taps_list[g]
            if taps is None:  # identity
                out[g, 0][cols == rows + h] = 1.0
                continue
            kf = taps[::-1, :]  # flip: true convolution
            klen = kf.shape[0]
            half_lo = klen - 1 - (klen - 1) // 2
            o = cols - rows - h + half_lo
            ok = (o >= 0) & (o < klen)
            for i in range(taps.shape[1]):
                out[g, i][ok] = kf[np.clip(o, 0, klen - 1), i][ok]
        return out

    myc = jnp.asarray(band(py, hy, ytaps_g))[jnp.asarray(group_idx)]
    mxc = jnp.asarray(band(px, hx, xtaps_g))[jnp.asarray(group_idx)]
    my2 = jnp.concatenate([myc, myc])
    mx2 = jnp.concatenate([mxc, mxc])

    def local(d):
        valid = jnp.isfinite(d)
        comp = jnp.float64 if d.dtype == jnp.float64 else jnp.float32
        filled = jnp.where(valid, d, 0).astype(comp)
        invalid = (~valid).astype(comp)
        both = jnp.concatenate([filled, invalid], axis=0)
        padded = halo_pad(both, hy, hx)

        def apply(arr, prec):
            t = jnp.einsum("crab,cbx->crax", my2, arr, precision=prec)
            return jnp.einsum("crax,crvx->cav", t, mx2, precision=prec)

        conv = apply(padded, lax.Precision.HIGHEST)
        num, den_c = conv[:nchan], conv[nchan:]
        den = 1.0 - den_c
        eps = 1e-6   # codebase-wide normalized-convolution floor
        out = jnp.where(den > eps, num / jnp.where(den > eps, den, 1),
                        jnp.nan)
        any_valid = jax.lax.psum(
            jnp.any(valid, axis=(1, 2)).astype(jnp.int32), ("y", "x")) > 0
        return jnp.where(any_valid[:, None, None], out, jnp.nan) \
            .astype(d.dtype)

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(None, "y", "x"),),
                           out_specs=P(None, "y", "x")))
    _cache_put(key, fn)
    return fn(cmesh.shard(data, "spatial"))[crop]


# ---------------------------------------------------------------------------
# FFT beam convolution: reshard to channel layout (the rechunk analog)
# ---------------------------------------------------------------------------
def sharded_spectral_convolve_fft(data, transfers, group_idx,
                                  cmesh: CubeMesh):
    """Per-channel FFT convolution over a mesh: reshard [spec,y,x] to the
    spectral layout (all-to-all over ICI), run full-plane FFTs locally per
    channel, reshard back."""
    from ..ops.convolve import _convolve_planes

    data, _, crop = _pad_spatial(jnp.asarray(data), cmesh, 0.0)
    data, nchan0 = _pad_chan(data, cmesh, 0.0)
    if data.shape[0] != nchan0:
        group_idx = np.concatenate(
            [np.asarray(group_idx),
             np.zeros(data.shape[0] - nchan0, np.int32)])

    mesh = cmesh.mesh
    key = ("fftconv", data.shape, str(getattr(data, "dtype", "f4")),
           np.asarray(group_idx, np.int32).tobytes(),
           np.shape(transfers),
           tuple(id(d) for d in mesh.devices.ravel()))
    run = _SHARDED_JIT_CACHE.get(key)
    if run is None:
        @jax.jit
        def run(d, t):
            d2 = cmesh.reshard(d, "spectral", source="spatial")
            out = _convolve_planes(d2, t, group_idx)
            return cmesh.reshard(out, "spatial", source="spectral")
        _cache_put(key, run)

    from ..ops.convolve import device_complex
    out = run(cmesh.shard(data, "spatial"), device_complex(transfers))
    return out[(slice(0, nchan0),) + crop[1:]]


def sharded_sigma_clip(data, cmesh: CubeMesh, sigma=3.0, maxiters=5,
                       cenfunc="median", stdfunc="std"):
    """Per-spaxel sigma clip: zero-communication in the spatial layout."""
    from ..ops.smoothing import sigma_clip_spectrally
    mesh = cmesh.mesh
    data, _, crop = _pad_spatial(jnp.asarray(data), cmesh, jnp.nan)
    key = ("sclip", data.shape, str(getattr(data, "dtype", "f4")),
           float(sigma), int(maxiters), str(cenfunc), str(stdfunc),
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(shard_map(
            lambda d: sigma_clip_spectrally(d, sigma=sigma,
                                            maxiters=maxiters,
                                            cenfunc=cenfunc,
                                            stdfunc=stdfunc),
            mesh=mesh, in_specs=(P(None, "y", "x"),),
            out_specs=P(None, "y", "x")))
        _cache_put(key, fn)
    return fn(cmesh.shard(data, "spatial"))[crop]


def sharded_spectral_interpolate(data, inaxis, outaxis, cmesh: CubeMesh,
                                 include=None):
    """Spectral regrid: gather weights are shared, so each device regrids
    its own spatial shard with zero communication.  The include mask, if
    given, interpolates alongside the data (reference
    spectral_cube.py:3298-3315); returns ``(out, new_include_or_None)``."""
    from ..ops.interpolate import interp_cube_spectral
    mesh = cmesh.mesh
    data, include, crop = _pad_spatial(jnp.asarray(data), cmesh, jnp.nan,
                                       include)
    axkey = (np.asarray(inaxis, np.float64).tobytes(),
             np.asarray(outaxis, np.float64).tobytes())
    key = ("interp", data.shape, str(getattr(data, "dtype", "f4")),
           axkey, include is not None,
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if include is None:
        if fn is None:
            fn = jax.jit(shard_map(
                lambda d: interp_cube_spectral(d, inaxis, outaxis)[0],
                mesh=mesh, in_specs=(P(None, "y", "x"),),
                out_specs=P(None, "y", "x")))
            _cache_put(key, fn)
        return fn(cmesh.shard(data, "spatial"))[crop], None
    if fn is None:
        fn = jax.jit(shard_map(
            lambda d, i: interp_cube_spectral(d, inaxis, outaxis,
                                              include=i),
            mesh=mesh, in_specs=(P(None, "y", "x"), P(None, "y", "x")),
            out_specs=(P(None, "y", "x"), P(None, "y", "x"))))
        _cache_put(key, fn)
    out, inc = fn(cmesh.shard(data, "spatial"),
                  cmesh.shard(jnp.asarray(include), "spatial"))
    return out[crop], inc[crop]


def sharded_smooth_interpolate(data, kernel, inaxis, outaxis,
                               cmesh: CubeMesh, include=None):
    """Fused spectral smooth + regrid per spatial shard (zero
    communication: both operators act along the unsharded spectral
    axis).  Composes to one MXU matmul per shard for all-finite shards,
    exactly like the single-chip smooth_interp_cube."""
    from ..ops.interpolate import smooth_interp_cube
    mesh = cmesh.mesh
    kernel = np.asarray(kernel, dtype=float)
    # pad with ZEROS, not NaN: both operators act purely along the
    # spectral axis, the padded columns are cropped afterwards, and a
    # NaN pad would flip smooth_interp_cube's has_nan cond to the slow
    # sequential chain on every edge shard
    data, include, crop = _pad_spatial(jnp.asarray(data), cmesh, 0.0,
                                       include)
    axkey = (np.asarray(inaxis, np.float64).tobytes(),
             np.asarray(outaxis, np.float64).tobytes(),
             kernel.tobytes())
    key = ("smooth_interp", data.shape, str(getattr(data, "dtype", "f4")),
           axkey, include is not None,
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if include is None:
        if fn is None:
            fn = jax.jit(shard_map(
                lambda d: smooth_interp_cube(d, kernel, inaxis,
                                             outaxis)[0],
                mesh=mesh, in_specs=(P(None, "y", "x"),),
                out_specs=P(None, "y", "x")))
            _cache_put(key, fn)
        return fn(cmesh.shard(data, "spatial"))[crop], None
    if fn is None:
        fn = jax.jit(shard_map(
            lambda d, i: smooth_interp_cube(d, kernel, inaxis, outaxis,
                                            include=i),
            mesh=mesh, in_specs=(P(None, "y", "x"), P(None, "y", "x")),
            out_specs=(P(None, "y", "x"), P(None, "y", "x"))))
        _cache_put(key, fn)
    out, inc = fn(cmesh.shard(data, "spatial"),
                  cmesh.shard(jnp.asarray(include), "spatial"))
    return out[crop], inc[crop]


def _reproject_tile_blocks(tap, m, n_out, n_in):
    """Cut an (n_out, n_in) separable resample tap matrix into per-tile
    halo-window blocks for an m-way mesh axis.

    Tile t of the output (rows [t*po, (t+1)*po)) multiplies only the
    input window [t*pi - h, (t+1)*pi + h) of its halo-padded shard; ``h``
    is the smallest halo that covers every tile's tap columns.  Returns
    ``(blocks (m, po, pi + 2h) float32, h)`` or None when some tile's
    taps reach beyond the nearest neighbor (h > pi — ppermute halo
    exchange only reaches one tile)."""
    n_out_p = n_out + (-n_out) % m
    n_in_p = n_in + (-n_in) % m
    po, pi = n_out_p // m, n_in_p // m
    h = 0
    for t in range(m):
        r0, r1 = t * po, min((t + 1) * po, n_out)
        if r0 >= r1:
            continue
        nzc = np.nonzero(np.any(tap[r0:r1] != 0.0, axis=0))[0]
        if nzc.size == 0:
            continue
        h = max(h, t * pi - int(nzc[0]), int(nzc[-1]) + 1 - (t + 1) * pi)
    if h > pi:
        return None
    blocks = np.zeros((m, po, pi + 2 * h), np.float32)
    for t in range(m):
        r0, r1 = t * po, min((t + 1) * po, n_out)
        if r0 >= r1:
            continue
        c0 = t * pi - h
        s0, s1 = max(c0, 0), min(c0 + pi + 2 * h, n_in)
        if s0 < s1:
            blocks[t, :r1 - r0, s0 - c0:s1 - c0] = tap[r0:r1, s0:s1]
    return blocks, h


def sharded_reproject(data, zs, ys, xs, cmesh: CubeMesh, order=1):
    """Reproject a spatially-sharded [spec, y, x] cube onto the host-side
    target->source mappings ``(zs, ys, xs)`` — the SPMD form of
    ``ops/regrid._bilinear_spatial_then_linear_z`` (orders 0/1; the
    reference routes cubes through ``reproject_interp``'s map_coordinates,
    ``/root/reference/spectral_cube/spectral_cube.py:2649-2746``).

    Stage 1, spectral lerp: zero communication — the spectral axis is
    local in the spatial layout, so each device lerps its own shard's
    channels (the filled data and the NaN-weight plane together).

    Stage 2, spatial resample, two strategies:

    - **halo**: when the mapping is axis-aligned (separable bilinear) and
      every output tile's 2-tap windows reach at most one neighbor tile,
      each device applies its OWN per-tile slice of the (n_out, n_in) tap
      matrices to its ppermute-halo-padded block — zero all-to-alls, the
      direct analog of the halo convolution.  This covers the
      offset / low-shear mosaicking case (BASELINE configs 4/5); halo
      width = max tap displacement (``_reproject_tile_blocks``).
    - **reshard**: rotations, non-separable mappings, order-0, and
      beyond-halo displacements reshard to the spectral layout (full
      planes local per channel), run the unsharded spatial resample
      semantics on local channels, and reshard back — exactly two
      explicit all-to-alls over ICI, never a GSPMD all-gather
      (asserted by tests/test_parallel.py's HLO checks).

    NaN-weight poisoning (>1e-6), in-range valid-plane and per-channel
    ``zvalid`` masking follow the unsharded contract exactly.  Returns
    the (nz, ny_out, nx_out) reprojected array in the spatial layout.
    """
    import jax.lax as lax
    mesh = cmesh.mesh
    my_m, mx_m = cmesh.grid
    data = jnp.asarray(data)
    nchan_in, ny_in, nx_in = data.shape
    zs = np.asarray(zs, np.float64)
    ys = np.asarray(ys, np.float64)
    xs = np.asarray(xs, np.float64)
    nz = zs.shape[0]
    ny_out, nx_out = ys.shape
    order = int(order)
    if order not in (0, 1):
        raise ValueError("sharded_reproject supports orders 0/1 "
                         "(nearest/bilinear); spline orders take the "
                         "unsharded path")

    # ---- host index/weight computation: SHARED with the unsharded
    # path (ops/regrid.bilinear_host_maps), so the two derivations
    # cannot diverge — the sharded contract is exact agreement ----
    from ..ops.regrid import bilinear_host_maps
    (zvalid, z0, zf, z_identity, yvalid, xvalid, y0, y1, wy,
     x0, x1, wx) = bilinear_host_maps(zs, ys, xs, nchan_in, ny_in,
                                      nx_in, order)
    vp = (yvalid & xvalid)
    zvj_shape = (nz, 1, 1)

    zj0 = jnp.asarray(z0)
    zj1 = jnp.asarray(np.minimum(z0 + 1, nchan_in - 1))
    zf3 = jnp.asarray(zf)[:, None, None]

    def zlerp(arr):
        if z_identity:
            return arr
        lo = arr[zj0]
        if order == 0 or nchan_in == 1:
            return lo
        return lo * (1 - zf3) + arr[zj1] * zf3

    key = ("reproject", data.shape, str(getattr(data, "dtype", "f4")),
           order, zs.tobytes(), ys.tobytes(), xs.tobytes(),
           tuple(id(d) for d in mesh.devices.ravel()))
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is not None:
        return fn(cmesh.shard(data, "spatial"))

    # ---- halo strategy: separable mapping within one-neighbor reach ----
    ysep = order == 1 and np.ptp(y0, axis=1).max() == 0 \
        and np.ptp(wy, axis=1).max() == 0
    xsep = order == 1 and np.ptp(x0, axis=0).max() == 0 \
        and np.ptp(wx, axis=0).max() == 0
    halo = None
    if ysep and xsep and ny_in > 1 and nx_in > 1:
        from ..ops.interpolate import _interp_matrix
        my_tap = _interp_matrix(y0[:, 0], wy[:, 0], ny_in)
        mx_tap = _interp_matrix(x0[0, :], wx[0, :], nx_in)
        by = _reproject_tile_blocks(my_tap, my_m, ny_out, ny_in)
        bx = _reproject_tile_blocks(mx_tap, mx_m, nx_out, nx_in)
        if by is not None and bx is not None:
            halo = (by, bx)

    zvalid_j = jnp.asarray(zvalid.reshape(zvj_shape))
    if halo is not None:
        (myb, hy), (mxb, hx) = halo
        ny_out_p = ny_out + (-ny_out) % my_m
        nx_out_p = nx_out + (-nx_out) % mx_m
        vp_p = np.zeros((ny_out_p, nx_out_p), np.float32)
        vp_p[:ny_out, :nx_out] = vp

        def local(d, myb_l, mxb_l, vp_l):
            fz = zlerp(jnp.nan_to_num(d))
            wz = zlerp(jnp.isnan(d).astype(jnp.float32))
            padded = halo_pad(jnp.concatenate([fz, wz], axis=0), hy, hx)
            fzp, wzp = padded[:nz], padded[nz:]
            My, Mx = myb_l[0], mxb_l[0]
            t = jnp.einsum("ab,cbx->cax", My, fzp,
                           precision=lax.Precision.HIGHEST)
            out = jnp.einsum("cax,vx->cav", t, Mx,
                             precision=lax.Precision.HIGHEST)
            # the NaN-weight plane only feeds a >1e-6 threshold: DEFAULT
            # (bf16) is exact enough for 0..1 flags (unsharded contract)
            tw = jnp.einsum("ab,cbx->cax", jnp.abs(My), wzp,
                            precision=lax.Precision.DEFAULT)
            wn = jnp.einsum("cax,vx->cav", tw, jnp.abs(Mx),
                            precision=lax.Precision.DEFAULT)
            out = jnp.where(wn > 1e-6, jnp.nan, out)
            return jnp.where((vp_l != 0.0) & zvalid_j, out, jnp.nan)

        def run(d):
            d, _, _ = _pad_spatial(d, cmesh, 0.0)
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(None, "y", "x"), P("y", None, None),
                          P("x", None, None), P("y", "x")),
                out_specs=P(None, "y", "x"))(
                    d, jnp.asarray(myb), jnp.asarray(mxb),
                    jnp.asarray(vp_p))[:, :ny_out, :nx_out]
    else:
        # ---- reshard strategy: full planes local per channel ----
        ny_in_p = ny_in + (-ny_in) % my_m
        nx_in_p = nx_in + (-nx_in) % mx_m
        corners = ((y0, x0, (1 - wy) * (1 - wx)),
                   (y0, x1, (1 - wy) * wx),
                   (y1, x0, wy * (1 - wx)),
                   (y1, x1, wy * wx))
        cidx = [jnp.asarray((yy * nx_in_p + xx).ravel())
                for yy, xx, _ in corners]
        cw = [jnp.asarray(w.ravel().astype(np.float32))
              for _, _, w in corners]

        def spatial_local(f2, w2):
            nzl = f2.shape[0]
            # channels-minor layout: each gathered element sits in a
            # contiguous channel row (the unsharded path's layout choice)
            flat_f = f2.reshape(nzl, ny_in_p * nx_in_p).T

            def gathers(flat):
                acc = jnp.zeros((ny_out * nx_out, nzl), flat.dtype)
                for idx, w in zip(cidx, cw):
                    acc = acc + jnp.take(flat, idx, axis=0) * w[:, None]
                    if order == 0:
                        break
                return acc

            out = gathers(flat_f)

            def poison(o):
                wn = gathers(w2.reshape(nzl, ny_in_p * nx_in_p).T)
                return jnp.where(wn > 1e-6, jnp.nan, o)

            out = lax.cond(jnp.any(w2 != 0.0), poison, lambda o: o, out)
            return out.T.reshape(nzl, ny_out, nx_out)

        vp_j = jnp.asarray(vp)
        # pre-pad so the reshard helpers neither pad nor crop: the
        # spectral-layout planes must keep the padded (ny_in_p, nx_in_p)
        # stride the corner indices were built against, and the channel
        # count must divide the device count for the spectral layout
        nz_p = nz + (-nz) % (my_m * mx_m)

        def run(d):
            # z-stage in the spatial layout (z local, zero communication)
            fz = zlerp(jnp.nan_to_num(d))
            wz = zlerp(jnp.isnan(d).astype(jnp.float32))
            pads = ((0, nz_p - nz), (0, ny_in_p - ny_in),
                    (0, nx_in_p - nx_in))
            f2 = cmesh.reshard(jnp.pad(fz, pads), "spectral",
                               source="spatial")
            w2 = cmesh.reshard(jnp.pad(wz, pads), "spectral",
                               source="spatial")
            out2 = shard_map(
                spatial_local, mesh=mesh,
                in_specs=(P(("y", "x"), None, None),) * 2,
                out_specs=P(("y", "x"), None, None))(f2, w2)
            out = cmesh.reshard(out2, "spatial", source="spectral")[:nz]
            return jnp.where(vp_j[None] & zvalid_j, out, jnp.nan)

    fn = jax.jit(run)
    _cache_put(key, fn)
    return fn(cmesh.shard(data, "spatial"))


# ---------------------------------------------------------------------------
# ShardedCube: cube facade bound to a mesh
# ---------------------------------------------------------------------------
class ShardedCube:
    """Wraps a SpectralCube with a CubeMesh, running its hot operations
    SPMD.  This is the user-facing analog of ``DaskSpectralCube``:
    ``SpectralCube.read(..., use_dask=True)`` becomes
    ``ShardedCube(cube, mesh)`` (or ``cube.to_sharded(mesh)``)."""

    def __init__(self, cube, cmesh: CubeMesh | None = None):
        from .mesh import default_mesh
        self.cmesh = cmesh if cmesh is not None else default_mesh()
        # place the data once; all downstream jit calls keep the layout.
        # The caller's cube object is never mutated: if placement changes,
        # we wrap a shallow copy carrying the sharded array.
        target = self.cmesh.sharding("spatial")
        data = cube._device_data
        if getattr(data, "sharding", None) != target:
            cube = cube._new_cube_with(
                data=self.cmesh.shard(data, "spatial"))
        self.cube = cube

    def display_dask_array(self):
        """Show the device layout of the wrapped array — the analog of the
        reference's dask-graph HTML display (dask_spectral_cube.py:341):
        here the 'graph' is the GSPMD sharding, rendered as jax's
        per-device ASCII layout plus the mesh/spec summary."""
        import jax
        data = self.cube._device_data
        try:
            jax.debug.visualize_array_sharding(data[0])
        except Exception:
            pass
        print(f"shape={tuple(data.shape)} dtype={data.dtype} "
              f"mesh={dict(self.cmesh.mesh.shape)} "
              f"sharding={data.sharding}")
        return data.sharding

    display_sharding = display_dask_array

    def __getattr__(self, name):
        """Everything not explicitly overridden delegates to the wrapped
        cube (whose data is mesh-sharded, so GSPMD partitions the work) —
        the ShardedCube quacks like the cube, the way DaskSpectralCube
        mirrors SpectralCube.  Methods returning a new cube re-wrap."""
        attr = getattr(self.cube, name)
        if callable(attr):
            from ..cube import BaseSpectralCube

            def wrapped(*args, **kwargs):
                out = attr(*args, **kwargs)
                if isinstance(out, BaseSpectralCube):
                    return ShardedCube(out, self.cmesh)
                return out
            return wrapped
        return attr

    def use_dask_scheduler(self, scheduler=None, num_workers=None):
        """API-compat shim for the reference's scheduler selection
        (dask_spectral_cube.py:278-312).  The XLA runtime owns scheduling
        here; use :func:`parallel.use_mesh` to change the device set.
        Returns a no-op context manager."""
        import contextlib
        import warnings as _w
        from ..utils import NotImplementedWarning
        _w.warn("use_dask_scheduler has no effect: scheduling is owned by "
                "the XLA runtime; pick a device set with use_mesh()",
                NotImplementedWarning)
        return contextlib.nullcontext(self)

    def rechunk(self, layout="spatial", save_to_tmp_dir=False):
        """Move the cube between mesh layouts (the dask ``rechunk`` analog;
        reference dask_spectral_cube.py:349-384).  With
        ``save_to_tmp_dir=True`` the current state is spilled to host
        first (the zarr persistence analog)."""
        cube = self.cube
        if save_to_tmp_dir:
            cube = cube.checkpoint()
        cube = cube._new_cube_with(
            data=self.cmesh.shard(cube._device_data, layout))
        out = object.__new__(ShardedCube)
        out.cube = cube
        out.cmesh = self.cmesh
        return out

    @property
    def shape(self):
        return self.cube.shape

    def _include(self):
        c = self.cube
        if c._mask is None:
            return None
        from ..masks import is_data_local
        if is_data_local(c._mask):
            return None  # evaluated in-kernel
        return c._mask.include(data=c._device_data)

    def moment_maps(self):
        """(mom0, mom1, mom2) Projections in one sharded pass."""
        c = self.cube
        coords = c._spectral_offsets()
        dx = c._spectral_pix_size()
        from ..masks import is_data_local
        mask_expr = c._mask if (c._mask is not None
                                and is_data_local(c._mask)) else None
        include = None if mask_expr is not None else self._include()
        m0, m1, m2 = sharded_moments(c._device_data, coords, dx, self.cmesh,
                                     include=include, mask_expr=mask_expr)
        sv0 = float(np.asarray(c.spectral_axis.value)[0])
        from ..lower_dimensional_structures import Projection
        new_wcs = c._wcs.dropaxis(2)
        u0 = c.unit * c.spectral_unit
        return (Projection(np.asarray(m0), unit=u0, wcs=new_wcs),
                Projection(np.asarray(m1) + sv0, unit=c.spectral_unit,
                           wcs=new_wcs),
                Projection(np.asarray(m2), unit=c.spectral_unit ** 2,
                           wcs=new_wcs))

    def statistics(self):
        from ..units import Quantity
        c = self.cube
        raw = sharded_statistics(c._device_data, self.cmesh,
                                 include=c._mask.include(
                                     data=c._device_data)
                                 if c._mask is not None else None)
        out = {"npts": raw["npts"]}
        for k in ("min", "max", "sum", "mean", "sigma", "rms"):
            out[k] = Quantity(raw[k], c.unit)
        out["sumsq"] = Quantity(raw["sumsq"], c.unit ** 2)
        return out

    def sigma_clip_spectrally(self, threshold, maxiters=5,
                              cenfunc="median", stdfunc="std"):
        out = sharded_sigma_clip(self.cube._get_filled_data(fill=np.nan),
                                 self.cmesh, sigma=threshold,
                                 maxiters=maxiters, cenfunc=cenfunc,
                                 stdfunc=stdfunc)
        return ShardedCube(self.cube._new_cube_with(data=out), self.cmesh)

    def spatial_smooth(self, kernel):
        karr = np.asarray(getattr(kernel, "array", kernel), dtype=float)
        out = sharded_spatial_convolve(
            self.cube._get_filled_data(fill=np.nan), karr, self.cmesh)
        return ShardedCube(self.cube._new_cube_with(data=out), self.cmesh)

    def spectral_interpolate(self, spectral_grid, smooth_kernel=None):
        from ..units import Quantity
        from ..masks import BooleanArrayMask
        from ..ops.interpolate import linear_spectral_wcs
        c = self.cube
        grid = spectral_grid.to_value(c.spectral_unit) \
            if isinstance(spectral_grid, Quantity) \
            else np.asarray(spectral_grid)
        inax = np.asarray(c.spectral_axis.value, dtype=float)
        if smooth_kernel is not None:
            from ..masks import LazyMask, is_data_local
            karr = np.asarray(getattr(smooth_kernel, "array",
                                      smooth_kernel), dtype=float)
            finiteness = c._mask is None or (
                isinstance(c._mask, LazyMask)
                and getattr(c._mask, "_function", None) in (jnp.isfinite,
                                                            np.isfinite))
            if not finiteness and is_data_local(c._mask):
                # a threshold-style data-local mask must re-evaluate on
                # the SMOOTHED data (the unsharded branch's semantics,
                # cube.py spectral_interpolate) — delegate so sharded and
                # unsharded calls can never diverge
                return ShardedCube(c.spectral_interpolate(
                    spectral_grid, smooth_kernel=smooth_kernel),
                    self.cmesh)
            include = None if finiteness else \
                c._mask.include(data=c._device_data)
            out, new_include = sharded_smooth_interpolate(
                c._get_filled_data(fill=np.nan), karr, inax, grid,
                self.cmesh, include=include)
            new_wcs = linear_spectral_wcs(c._wcs, grid)
            if finiteness:
                # mirror the unsharded fast path: the re-bound
                # finiteness mask tracks the fused result exactly
                mask = LazyMask(jnp.isfinite, data=out, wcs=new_wcs,
                                shape=tuple(out.shape))
            else:
                mask = BooleanArrayMask(new_include, wcs=new_wcs,
                                        shape=tuple(out.shape)) \
                    if new_include is not None else None
            return ShardedCube(c._new_cube_with(data=out, wcs=new_wcs,
                                                mask=mask), self.cmesh)
        include = c._mask.include(data=c._device_data) \
            if c._mask is not None else None
        # RAW data, not filled: masked voxels must not poison neighbors —
        # the mask interpolates separately, exactly like the unsharded
        # path (cube.py spectral_interpolate passes _device_data)
        out, new_include = sharded_spectral_interpolate(
            c._device_data, inax, grid, self.cmesh, include=include)
        new_wcs = linear_spectral_wcs(c._wcs, grid)
        # the interpolated mask replaces the old-shape one (the unsharded
        # path's semantics, cube.py spectral_interpolate); stays sharded
        mask = BooleanArrayMask(new_include, wcs=new_wcs,
                                shape=tuple(out.shape)) \
            if new_include is not None else None
        return ShardedCube(c._new_cube_with(data=out, wcs=new_wcs,
                                            mask=mask),
                           self.cmesh)

    def reproject(self, header, order="bilinear", use_memmap=False,
                  filled=True, **kwargs):
        """Sharded reprojection onto a new spatial(+spectral) WCS: the
        mappings are host-computed exactly like the unsharded
        ``cube.reproject``, then :func:`sharded_reproject` runs the
        resample SPMD (halo exchange for separable in-reach mappings,
        the two-all-to-all reshard round trip otherwise).  Spline orders
        (2/3) delegate to the unsharded path."""
        from ..ops.regrid import reproject_mappings, _order_int
        from ..masks import BooleanArrayMask
        c = self.cube
        if _order_int(order) >= 2:
            return ShardedCube(c.reproject(header, order=order,
                                           filled=filled, **kwargs),
                               self.cmesh)
        data = c._get_filled_data(fill=np.nan) if filled \
            else c._device_data
        zs, ys, xs, wcs_out = reproject_mappings(
            c._wcs, header, c.shape[0],
            spectral_values_in=np.asarray(c.spectral_axis.value))
        out = sharded_reproject(data, zs, ys, xs, self.cmesh,
                                order=_order_int(order))
        footprint = jnp.isfinite(out)
        mask = BooleanArrayMask(footprint, wcs=wcs_out, shape=out.shape)
        new = c.__class__(data=out, wcs=wcs_out, mask=mask,
                          meta=dict(c._meta), unit=c._unit,
                          fill_value=c._fill_value,
                          allow_huge_operations=c.allow_huge_operations)
        return ShardedCube(new, self.cmesh)

    def convolve_to(self, beam):
        """Common-beam convolution with the reshard (rechunk-analog) path."""
        from ..ops import convolve as _conv
        c = self.cube
        beams = getattr(c, "_beams", None)
        beam_list = list(beams) if beams is not None \
            else [c.beam] * c.shape[0]
        pixscale = float(np.mean(np.abs(
            c._wcs.celestial.proj_plane_pixel_scales()))) * np.pi / 180.0
        nchan, ny, nx = c.shape
        groups, group_idx = [], np.zeros(nchan, dtype=np.int32)
        for i, b in enumerate(beam_list):
            for gi, gb in enumerate(groups):
                if b == gb:
                    group_idx[i] = gi
                    break
            else:
                groups.append(b)
                group_idx[i] = len(groups) - 1
        kernels, max_k = [], (1, 1)
        for b in groups:
            cb = beam.deconvolve(b)
            if cb.major_rad <= 0:
                kernels.append(None)
                continue
            k = cb.as_kernel(pixscale)
            kernels.append(k)
            max_k = (max(max_k[0], k.shape[0]), max(max_k[1], k.shape[1]))
        # separable kernels convolve in the spatial layout with halo
        # exchange - no all-to-all at all; non-separable/oversized kernels
        # fall through to the reshard + spectral-multiply path
        out = sharded_convolve_per_channel_separable(
            c._get_filled_data(fill=np.nan), kernels, group_idx,
            self.cmesh)
        if out is not None:
            factors = np.array([_conv.beam_unit_factor(c.unit, b, beam)
                                for b in beam_list])
            if not np.allclose(factors, 1.0):
                out = out * jnp.asarray(factors,
                                        dtype=out.dtype)[:, None, None]
            from ..cube import SpectralCube
            new = SpectralCube(data=out, wcs=c._wcs, mask=c._mask,
                               meta=dict(c._meta), unit=c._unit, beam=beam)
            return ShardedCube(new, self.cmesh)
        my, mx = self.cmesh.grid
        fy, fx = _conv._padded_shape((ny + (-ny) % my, nx + (-nx) % mx),
                                     max_k)
        transfers = np.zeros((len(groups), fy, fx // 2 + 1),
                             dtype=np.complex128)
        for gi, k in enumerate(kernels):
            transfers[gi] = 1.0 if k is None else _conv._kernel_transfer(
                k, fy, fx)
        out = sharded_spectral_convolve_fft(
            c._get_filled_data(fill=np.nan), transfers, group_idx,
            self.cmesh)
        factors = np.array([_conv.beam_unit_factor(c.unit, b, beam)
                            for b in beam_list])
        if not np.allclose(factors, 1.0):
            out = out * jnp.asarray(factors, dtype=out.dtype)[:, None, None]
        from ..cube import SpectralCube
        new = SpectralCube(data=out, wcs=c._wcs, mask=c._mask,
                           meta=dict(c._meta), unit=c._unit, beam=beam)
        return ShardedCube(new, self.cmesh)
