"""Gather-based reprojection onto new spatial/spectral WCS, plus mosaics.

The reference delegates to the external ``reproject`` package with the full
cube in host memory (``/root/reference/spectral_cube/spectral_cube.py:
2649-2746``) and builds mosaics by scatter-adding reprojected cubes with
weight maps (``cube_utils.py:791-856``).  Here the target->source pixel
mapping is computed host-side in float64 through the standalone WCS stack,
then the resample runs on device as a ``map_coordinates`` gather — bilinear
by default, matching ``reproject_interp(order='bilinear')``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from ..wcs import WCS

__all__ = ["spatial_pixel_mapping", "reproject_image", "reproject_cube",
           "mosaic_add"]

_ORDERS = {"nearest-neighbor": 0, "nearest": 0, "bilinear": 1,
           "biquadratic": 2, "bicubic": 3}


def _order_int(order):
    """Accept the reference's order names (reproject_interp's documented
    'nearest-neighbor'|'bilinear'|'biquadratic'|'bicubic', reference
    spectral_cube.py:2671-2678) or a bare int 0-3."""
    if isinstance(order, (int, np.integer)):
        if order not in (0, 1, 2, 3):
            raise ValueError(f"order must be 0-3, got {order}")
        return int(order)
    try:
        return _ORDERS[order]
    except KeyError:
        raise ValueError(f"unknown interpolation order {order!r}; expected "
                         f"one of {sorted(_ORDERS)} or an int 0-3") from None


def _spline_1d_matrix(n_in, coords, order):
    """Exact (n_out, n_in) scipy spline-resample operator along one axis.

    Built by applying ``scipy.ndimage.map_coordinates`` (the same routine
    the reference's ``reproject_interp`` order=2/3 path bottoms out in,
    reference spectral_cube.py:2671-2678) to an identity matrix, which
    composes the IIR spline prefilter and the B-spline tap evaluation —
    boundary handling included — by construction.  The exponentially
    decaying prefilter tail is truncated at 1e-8 (a <1e-7 relative
    perturbation) so the operator is banded and runs as an MXU matmul
    like the order-1 tap matrices.  Out-of-range coordinates produce
    all-zero rows; callers NaN them via the validity mask."""
    from scipy.ndimage import map_coordinates as _mc
    coords = np.asarray(coords, dtype=np.float64)
    n_out = coords.shape[0]
    cc = np.stack([np.repeat(coords, n_in),
                   np.tile(np.arange(n_in, dtype=np.float64), n_out)])
    T = _mc(np.eye(n_in), cc, order=order, mode="constant", cval=0.0)\
        .reshape(n_out, n_in)
    T[np.abs(T) < 1e-8] = 0.0
    return T.astype(np.float32)


def _spline_separable_resample(fz, wz, ys, xs, yvalid, xvalid, order):
    """Order-2/3 spatial resample when the mapping is axis-aligned:
    exact scipy-operator matmuls along y then x (see _spline_1d_matrix).

    NaN poisoning uses |T|-weighted NaN mass > 1e-6 — *localized* to the
    taps that numerically matter, where scipy itself would smear a single
    NaN along the whole prefiltered line (reproject's docs warn against
    NaN input at order>1; on finite data the two agree to 1e-6)."""
    import jax.lax as lax
    nz, ny_in, nx_in = fz.shape
    ty = _spline_1d_matrix(ny_in, ys[:, 0], order)
    tx = _spline_1d_matrix(nx_in, xs[0, :], order)
    my, mx = jnp.asarray(ty), jnp.asarray(tx)
    ay, ax = jnp.asarray(np.abs(ty)), jnp.asarray(np.abs(tx))

    def apply(arr, a, b, prec):
        t = jnp.einsum("ab,cbx->cax", a, arr.astype(jnp.float32),
                       precision=prec)
        return jnp.einsum("cax,vx->cav", t, b, precision=prec)

    out = apply(fz, my, mx, lax.Precision.HIGHEST).astype(fz.dtype)
    wn = apply(wz, ay, ax, lax.Precision.DEFAULT)
    return out, wn


def _spline_nonseparable_resample(fz, wz, ys, xs, order):
    """Order-2/3 resample for rotated/general mappings: spline-prefilter
    both spatial axes (banded matmuls), zero-pad the coefficient planes,
    then gather the (order+1)^2 B-spline taps — the corner-gather
    generalization of the bilinear path."""
    nz, ny_in, nx_in = fz.shape
    ny, nx = ys.shape
    # scipy evaluates interior samples on mirror-extended spline
    # coefficients (verified empirically: interior agreement 1e-16 with
    # spline_filter1d(mode='mirror') + reflect-extended taps; zero
    # padding is wrong at the edges)
    from scipy.ndimage import spline_filter1d
    py = spline_filter1d(np.eye(ny_in), order=order, axis=0,
                         mode="mirror").astype(np.float32)
    px = spline_filter1d(np.eye(nx_in), order=order, axis=0,
                         mode="mirror").astype(np.float32)
    py[np.abs(py) < 1e-8] = 0.0
    px[np.abs(px) < 1e-8] = 0.0
    import jax.lax as lax

    def prefilter(arr, prec):
        t = jnp.einsum("ab,cbx->cax", jnp.asarray(py),
                       arr.astype(jnp.float32), precision=prec)
        return jnp.einsum("cax,vx->cav", t, jnp.asarray(px), precision=prec)

    pad = order  # taps reach at most `order` cells beyond the base knot
    pad_mode = "reflect" if min(ny_in, nx_in) > order else "edge"
    coeff = prefilter(fz, lax.Precision.HIGHEST)
    coeff = jnp.pad(coeff, ((0, 0), (pad, pad), (pad, pad)), mode=pad_mode)

    ycl = np.nan_to_num(np.asarray(ys, dtype=np.float64))
    xcl = np.nan_to_num(np.asarray(xs, dtype=np.float64))
    if order == 2:
        yb = np.round(ycl).astype(np.int64)
        xb = np.round(xcl).astype(np.int64)
        offs = (-1, 0, 1)
    else:
        yb = np.floor(ycl).astype(np.int64)
        xb = np.floor(xcl).astype(np.int64)
        offs = (-1, 0, 1, 2)
    fy = (ycl - yb).astype(np.float64)
    fx = (xcl - xb).astype(np.float64)

    def bw(order_, t):
        """B-spline basis value at distance t (|t| <= order/2+1)."""
        at = np.abs(t)
        if order_ == 2:
            return np.where(at < 0.5, 0.75 - at ** 2,
                            np.where(at < 1.5, 0.5 * (at - 1.5) ** 2, 0.0))
        return np.where(at < 1.0, (4.0 - 6.0 * at ** 2 + 3.0 * at ** 3) / 6.0,
                        np.where(at < 2.0, (2.0 - at) ** 3 / 6.0, 0.0))

    # channels-minor layout: with the cube as (space, nz) every gathered
    # element sits in a contiguous nz-row, so the tap gathers become
    # large-slice row copies instead of plane-strided column picks
    # (benchmarks/probe_rotated.py: 1.037 -> 0.727 ms for the 4-tap
    # bilinear gather of a 256^3 cube on v5e, transposes included)
    nxp = nx_in + 2 * pad

    def gathers(flat, absw):
        acc = jnp.zeros((ny * nx, nz), flat.dtype)
        for dy in offs:
            for dx in offs:
                w = (bw(order, fy - dy)
                     * bw(order, fx - dx)).astype(np.float32)
                if absw:
                    w = np.abs(w)
                iy = np.clip(yb + dy + pad, 0, ny_in + 2 * pad - 1)
                ix = np.clip(xb + dx + pad, 0, nxp - 1)
                idx = jnp.asarray((iy * nxp + ix).ravel())
                acc = acc + jnp.take(flat, idx, axis=0) \
                    * jnp.asarray(w.ravel())[:, None]
        return acc

    out = gathers(coeff.reshape(nz, -1).T, False)

    def poison(o):
        # the NaN-weight prefilter + (order+1)^2 gathers run only for
        # cubes that hold NaN — on all-finite cubes they are half the
        # work of the whole resample (lax.cond pays when it skips
        # HIGHEST-precision matmul/gather chains, CLAUDE.md)
        wcoef = prefilter(wz, lax.Precision.DEFAULT)
        wcoef = jnp.pad(jnp.abs(wcoef), ((0, 0), (pad, pad), (pad, pad)),
                        mode=pad_mode)
        wn = gathers(wcoef.reshape(nz, -1).T, True)
        return jnp.where(wn > 1e-6, jnp.nan, o)

    out = lax.cond(jnp.any(wz != 0.0), poison, lambda o: o, out)
    return out.T.reshape(nz, ny, nx), None


def spatial_pixel_mapping(wcs_in: WCS, wcs_out: WCS, shape_out):
    """(y_src, x_src) float64 arrays: for each output pixel, the fractional
    input pixel it samples."""
    ny, nx = shape_out
    yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float64)
    cel_out = wcs_out.celestial
    cel_in = wcs_in.celestial
    lon, lat = cel_out.pix2world(xx.ravel(), yy.ravel())
    xs, ys = cel_in.world2pix(np.asarray(lon), np.asarray(lat))
    return (np.asarray(ys).reshape(ny, nx),
            np.asarray(xs).reshape(ny, nx))


def _spline_spatial_then_z(data, zs, ys, xs, order):
    """Order-2/3 counterpart of _bilinear_spatial_then_linear_z: spectral
    spline matmul (exact scipy operator), then spatial spline resample —
    separable matmuls when the mapping is axis-aligned, prefilter+tap
    gather otherwise.  The tensor-product B-spline basis makes this
    factorization exact vs scipy's 3-D map_coordinates."""
    nchan_in, ny_in, nx_in = data.shape
    nz = zs.shape[0]
    ny, nx = ys.shape
    zvalid = np.isfinite(zs) & (zs >= -1e-3) & (zs <= nchan_in - 1 + 1e-3)
    yvalid = np.isfinite(ys) & (ys >= -1e-3) & (ys <= ny_in - 1 + 1e-3)
    xvalid = np.isfinite(xs) & (xs >= -1e-3) & (xs <= nx_in - 1 + 1e-3)
    nanmask = jnp.isnan(data).astype(jnp.float32)
    filled = jnp.nan_to_num(data)

    zc = np.nan_to_num(np.asarray(zs, dtype=np.float64))
    z_identity = (nz == nchan_in and zvalid.all()
                  and np.all(zc == np.arange(nchan_in)))
    if z_identity:
        fz, wz = filled, nanmask
    else:
        tz = _spline_1d_matrix(nchan_in, zc, order)
        import jax.lax as lax
        fz = jnp.einsum("ab,byx->ayx", jnp.asarray(tz), filled,
                        precision=lax.Precision.HIGHEST)
        wz = jnp.einsum("ab,byx->ayx", jnp.asarray(np.abs(tz)), nanmask,
                        precision=lax.Precision.DEFAULT)

    ycl = np.nan_to_num(np.asarray(ys, dtype=np.float64))
    xcl = np.nan_to_num(np.asarray(xs, dtype=np.float64))
    # 1e-9 px tolerance: a WCS pix->world->pix roundtrip leaves ~1e-12
    # noise on an exactly axis-aligned mapping, which must not demote it
    # to the nonseparable path (the weight perturbation is O(tol))
    ysep = np.ptp(ycl, axis=1).max() <= 1e-9
    xsep = np.ptp(xcl, axis=0).max() <= 1e-9
    # unlike the bilinear path there is no gather alternative to gate on
    # backend: both spline paths are matmul-based, and the separable
    # operator (exact scipy parity for ANY axis length, including ones
    # the nonseparable mirror extension can't pad) wins whenever the
    # mapping is axis-aligned
    if ysep and xsep \
            and max(ny, nx, ny_in, nx_in) <= _MATMUL_RESAMPLE_MAX_N:
        out, wn = _spline_separable_resample(fz, wz, ycl, xcl,
                                             yvalid, xvalid, order)
    else:
        out, wn = _spline_nonseparable_resample(fz, wz, ycl, xcl, order)
    valid = jnp.asarray(yvalid & xvalid)[None, :, :] & \
        jnp.asarray(zvalid)[:, None, None]
    if wn is not None:     # nonseparable path poisons inside its cond
        out = jnp.where(wn > 1e-6, jnp.nan, out)
    return jnp.where(valid, out, jnp.nan)


def bilinear_host_maps(zs, ys, xs, nchan_in, ny_in, nx_in, order):
    """Host-side index/weight/validity arrays for the separable
    trilinear resample — shared by :func:`_bilinear_spatial_then_linear_z`
    and ``parallel.sharded.sharded_reproject`` (whose contract is exact
    agreement with the unsharded path, so the derivations must not be
    able to diverge).  Returns
    ``(zvalid, z0, zf, z_identity, yvalid, xvalid, y0, y1, wy, x0, x1,
    wx)`` with ``zf``/``wy``/``wx`` float32 numpy arrays."""
    nz = zs.shape[0]
    zvalid = np.isfinite(zs) & (zs >= -1e-3) & (zs <= nchan_in - 1 + 1e-3)
    zc = np.clip(np.nan_to_num(zs), 0, nchan_in - 1)
    z0 = np.clip(zc.astype(np.int32), 0, nchan_in - 2) \
        if nchan_in > 1 else np.zeros(nz, np.int32)
    zf = (zc - z0).astype(np.float32)
    if order == 0:
        z0 = np.clip(np.round(zc).astype(np.int32), 0, nchan_in - 1)
        zf = np.zeros(nz, np.float32)
    z_identity = (nz == nchan_in and np.all(zc == np.arange(nchan_in))
                  and zvalid.all())

    yvalid = np.isfinite(ys) & (ys >= -1e-3) & (ys <= ny_in - 1 + 1e-3)
    xvalid = np.isfinite(xs) & (xs >= -1e-3) & (xs <= nx_in - 1 + 1e-3)
    ycl = np.clip(np.nan_to_num(ys), 0, ny_in - 1)
    xcl = np.clip(np.nan_to_num(xs), 0, nx_in - 1)
    if order == 0:
        y0 = np.clip(np.round(ycl).astype(np.int64), 0, ny_in - 1)
        x0 = np.clip(np.round(xcl).astype(np.int64), 0, nx_in - 1)
        wy = np.zeros_like(ycl, np.float32)
        wx = np.zeros_like(xcl, np.float32)
    else:
        y0 = np.clip(ycl.astype(np.int64), 0, max(ny_in - 2, 0))
        x0 = np.clip(xcl.astype(np.int64), 0, max(nx_in - 2, 0))
        wy = (ycl - y0).astype(np.float32)
        wx = (xcl - x0).astype(np.float32)
    y1 = np.minimum(y0 + 1, ny_in - 1)
    x1 = np.minimum(x0 + 1, nx_in - 1)
    return (zvalid, z0, zf, z_identity, yvalid, xvalid, y0, y1, wy,
            x0, x1, wx)


def _bilinear_spatial_then_linear_z(data, zs, ys, xs, order):
    """Separable trilinear resample: spectral lerp (shared weights per
    channel) then spatial bilinear via four flat takes.

    map_coordinates' general 3-D gather is pathologically slow on TPU
    (measured ~2 s for a 256^3 cube); exploiting separability — the channel
    mapping depends only on z, the spatial mapping only on (y, x) — brings
    it to a handful of HBM passes.  NaN poisoning follows nonzero-weight
    semantics: zero-weight NaN neighbors never poison outputs.

    Orders 2/3 (biquadratic/bicubic, reference reproject_interp's
    remaining documented orders) dispatch to the spline path.
    """
    if order >= 2:
        return _spline_spatial_then_z(data, np.asarray(zs), np.asarray(ys),
                                      np.asarray(xs), order)
    nchan_in, ny_in, nx_in = data.shape
    nz = zs.shape[0]
    ny, nx = ys.shape

    (zvalid, z0, zf_np, z_identity, yvalid, xvalid, y0, y1, wy,
     x0, x1, wx) = bilinear_host_maps(zs, ys, xs, nchan_in, ny_in,
                                      nx_in, order)
    zf = jnp.asarray(zf_np)[:, None, None]

    if z_identity and order == 1:
        # one-kernel fast paths: when the spectral axis is untouched and
        # the spatial mapping is axis-aligned, the raw-input kernels
        # detect NaN, zero-fill, poison, and apply the in-range mask all
        # in VMEM — exactly cube-in + cube-out over HBM, vs the four
        # extra full-cube passes (isnan + nan_to_num materialization and
        # the final validity where) of the staged path below.
        # Pure translations additionally skip the MXU entirely (VPU
        # shift-lerp) — but only when every VALID output pixel's taps
        # stay in range, so no roll-wrap ever feeds a valid pixel.
        tr = _translation_params(ys, xs, ny_in, nx_in)
        if tr is not None:
            sy, wyc, sx, wxc = tr
            rows = np.where(yvalid[:, 0])[0]
            cols = np.where(xvalid[0, :])[0]
            ok_y = rows.size == 0 or (
                rows.min() + sy >= 0
                and rows.max() + sy + (1 if wyc > 0 else 0) <= ny_in - 1)
            ok_x = cols.size == 0 or (
                cols.min() + sx >= 0
                and cols.max() + sx + (1 if wxc > 0 else 0) <= nx_in - 1)
            if ok_y and ok_x:
                from .banded_pallas import per_channel_shift_lerp
                out = per_channel_shift_lerp(
                    data, sy, wyc, sx, wxc, (yvalid & xvalid), zvalid)
                if out is not None:
                    return out.astype(data.dtype)
        taps = _separable_taps(y0, wy, x0, wx, ny_in, nx_in, ny, nx)
        if taps is not None:
            from .banded_pallas import per_channel_resample_raw_strips
            my, mx = taps
            out = per_channel_resample_raw_strips(
                data, my[None, None], mx[None, None],
                np.zeros(nz, np.int32),
                valid_plane=(yvalid & xvalid),
                zvalid=zvalid)
            if out is not None:
                return out.astype(data.dtype)

    nanmask = jnp.isnan(data).astype(jnp.float32)
    filled = jnp.nan_to_num(data)

    def zlerp(arr):
        if z_identity:
            # unchanged spectral axis (the common reprojection case): no
            # gather at all
            return arr
        lo = arr[jnp.asarray(z0)]
        if order == 0 or nchan_in == 1:
            return lo
        hi = arr[jnp.asarray(np.minimum(z0 + 1, nchan_in - 1))]
        return lo * (1 - zf) + hi * zf

    fz = zlerp(filled)
    wz = zlerp(nanmask)

    sep = _separable_resample(fz, wz, y0, y1, wy, x0, x1, wx, order)
    if sep is not None:
        out, wn = sep
        out = jnp.where(wn > 1e-6, jnp.nan, out)
    else:
        corners = ((y0, x0, (1 - wy) * (1 - wx)), (y0, x1, (1 - wy) * wx),
                   (y1, x0, wy * (1 - wx)), (y1, x1, wy * wx))
        # channels-minor layout (see _spline_nonseparable_resample): row
        # gathers over (space, nz) beat plane-strided column gathers
        flat_f = fz.reshape(nz, ny_in * nx_in).T

        def gathers(flat):
            acc = jnp.zeros((ny * nx, nz), flat.dtype)
            for yy, xx, w in corners:
                idx = jnp.asarray((yy * nx_in + xx).ravel())
                wj = jnp.asarray(w.ravel())[:, None]
                acc = acc + jnp.take(flat, idx, axis=0) * wj
                if order == 0:
                    break
            return acc

        out = gathers(flat_f)

        def poison(o):
            # NaN-weight gathers only run for cubes that actually hold
            # NaN: on an all-finite cube they are half of the gather
            # traffic plus the mask materialization, and lax.cond skips
            # expensive gather chains profitably (CLAUDE.md).  The weight
            # cube is recomputed from ``data`` INSIDE the branch — a
            # closed-over traced wz would be hoisted as a cond operand
            # and computed unconditionally.
            wzl = zlerp(jnp.isnan(data).astype(jnp.float32))
            wn_flat = gathers(wzl.reshape(nz, ny_in * nx_in).T)
            return jnp.where(wn_flat > 1e-6, jnp.nan, o)

        import jax.lax as lax
        out = lax.cond(jnp.isnan(data).any(), poison, lambda o: o, out)
        out = out.T.reshape(nz, ny, nx)
    valid = jnp.asarray((yvalid & xvalid)[None, :, :]) & \
        jnp.asarray(zvalid)[:, None, None]
    return jnp.where(valid, out, jnp.nan)


# past this output size the resample matrices stop paying for themselves
_MATMUL_RESAMPLE_MAX_N = 4096


def _use_matmul_resample():
    import jax
    return jax.default_backend() == "tpu"


def _translation_params(ys, xs, ny_in, nx_in):
    """(sy, wy, sx, wx) when the output grid is the input grid shifted by
    a constant — integer parts sy/sx, fractions in [0, 1) — else None.
    Tolerance 1e-9 pixel: (i + t) - i wobbles at the float64 ulp of the
    coordinate, ~7 decades below what an f32 lerp weight can resolve."""
    ny, nx = np.asarray(ys).shape
    if ny != ny_in or nx != nx_in:
        return None
    dy = np.asarray(ys) - np.arange(ny, dtype=np.float64)[:, None]
    dx = np.asarray(xs) - np.arange(nx, dtype=np.float64)[None, :]
    if not (np.isfinite(dy).all() and np.isfinite(dx).all()):
        return None
    if np.ptp(dy) > 1e-9 or np.ptp(dx) > 1e-9:
        return None
    ty, tx = float(dy.mean()), float(dx.mean())
    sy = int(np.floor(ty))
    sx = int(np.floor(tx))
    return sy, ty - sy, sx, tx - sx


def _separable_taps(y0, wy, x0, wx, ny_in, nx_in, ny_out, nx_out):
    """2-tap (ny_out, ny_in)/(nx_out, nx_in) interp matrices for an
    axis-aligned bilinear mapping, or None when the target y-coordinates
    vary with column / x with row (rotation between the WCS pair) or the
    grids exceed _MATMUL_RESAMPLE_MAX_N."""
    if not _use_matmul_resample():
        return None
    if max(ny_out, nx_out, ny_in, nx_in) > _MATMUL_RESAMPLE_MAX_N:
        return None
    ysep = np.ptp(y0, axis=1).max() == 0 and np.ptp(wy, axis=1).max() == 0
    xsep = np.ptp(x0, axis=0).max() == 0 and np.ptp(wx, axis=0).max() == 0
    if not (ysep and xsep):
        return None
    from .interpolate import _interp_matrix

    def tap_matrix(n_in, i0, w):
        # i0 is pre-clipped to n_in-2, so the shared 2-tap builder applies
        # (single-column inputs collapse to an all-ones matrix)
        if n_in == 1:
            return np.ones((w.shape[0], 1), dtype=np.float32)
        return _interp_matrix(i0.astype(np.int64), w, n_in)

    return (tap_matrix(ny_in, y0[:, 0], wy[:, 0]),
            tap_matrix(nx_in, x0[0, :], wx[0, :]))


def _separable_resample(fz, wz, y0, y1, wy, x0, x1, wx, order):
    """Axis-aligned bilinear resample as two banded matmuls per channel.

    When the target y-coordinates vary only with row and x only with
    column (no rotation between the WCS pair — the common mosaicking /
    regridding case), the 4-corner gather factorizes into (ny_out, ny_in)
    and (nx_out, nx_in) 2-tap matrices: flat takes are slow dynamic
    gathers on TPU, while the same operator as dense matmuls rides the
    MXU (measured 16 ms -> ~1 ms on a 512-plane stack).  Returns
    (out, nan_weight) or None when the mapping isn't separable."""
    if order != 1:
        return None
    ny, nx = wy.shape
    nz, ny_in, nx_in = fz.shape
    taps = _separable_taps(y0, wy, x0, wx, ny_in, nx_in, ny, nx)
    if taps is None:
        return None
    import jax.lax as lax
    my, mx = taps

    # strip-blocked Pallas path: the dense tap einsums are MXU-bound on
    # structural zeros (nin FLOPs per 2-tap output row); the K=128 strip
    # blocks cut that by nin/K, and the NaN-weight pass runs only for
    # channels whose weight plane is nonzero (measured 1.203 -> ~0.6 ms
    # on the 4x128-plane BASELINE reproject+Stokes config)
    from .banded_pallas import per_channel_resample_strips
    out = per_channel_resample_strips(fz, wz, my[None, None],
                                      mx[None, None],
                                      np.zeros(nz, np.int32))
    if out is not None:
        # poisoning already applied in-kernel; the caller's
        # where(wn > 1e-6) must be a no-op
        return out.astype(fz.dtype), jnp.zeros((1, 1, 1), jnp.float32)

    myj, mxj = jnp.asarray(my), jnp.asarray(mx)

    def apply(arr, prec):
        t = jnp.einsum("ab,cbx->cax", myj, arr.astype(jnp.float32),
                       precision=prec)
        return jnp.einsum("cax,vx->cav", t, mxj, precision=prec)

    # the NaN-weight plane only feeds a >1e-6 threshold: bf16 (DEFAULT)
    # is exact enough for the 0..1 flags and runs the MXU at full rate
    return (apply(fz, lax.Precision.HIGHEST).astype(fz.dtype),
            apply(wz, lax.Precision.DEFAULT))


def _conv_reproject_operators(shape, kernel, ys, xs, force=False):
    """Host-side operator construction shared by the fused
    convolve+reproject paths (``convolve_reproject_separable`` and the
    whole-pipeline fusion in ``ops/pipeline_fused``): the SVD-separable
    convolution factors M, the 2-tap resample matrices R, and their
    composition G = R @ M per axis and rank.

    Returns ``(Gy, Gx, My, Mx, Ry, Rx, valid, r)`` (all numpy; G/M with
    leading (1, r) dims, R with (1, 1), ``valid`` the in-range output
    plane) or None when the kernel does not separate, the mapping is not
    axis-aligned, or the size gates fail.
    """
    from .convolve import separable_factors, _conv_matrix_1d
    from .interpolate import _interp_matrix, compose_interp_banded
    nchan, ny_in, nx_in = shape
    ny, nx = np.asarray(ys).shape
    if not (_use_matmul_resample() or force) \
            or max(ny, nx, ny_in, nx_in) > _MATMUL_RESAMPLE_MAX_N:
        return None
    factors = separable_factors(np.asarray(kernel, dtype=np.float64)
                                / np.asarray(kernel, dtype=np.float64).sum())
    if factors is None:
        return None
    yvalid = np.isfinite(ys) & (ys >= -1e-3) & (ys <= ny_in - 1 + 1e-3)
    xvalid = np.isfinite(xs) & (xs >= -1e-3) & (xs <= nx_in - 1 + 1e-3)
    ycl = np.clip(np.nan_to_num(ys), 0, ny_in - 1)
    xcl = np.clip(np.nan_to_num(xs), 0, nx_in - 1)
    y0 = np.clip(ycl.astype(np.int64), 0, max(ny_in - 2, 0))
    x0 = np.clip(xcl.astype(np.int64), 0, max(nx_in - 2, 0))
    wy = (ycl - y0).astype(np.float64)
    wx = (xcl - x0).astype(np.float64)
    ysep = np.ptp(y0, axis=1).max() == 0 and np.ptp(wy, axis=1).max() == 0
    xsep = np.ptp(x0, axis=0).max() == 0 and np.ptp(wx, axis=0).max() == 0
    if not (ysep and xsep):
        return None

    ytaps, xtaps = factors
    r = ytaps.shape[1]
    if ny_in < 2 or nx_in < 2:
        return None   # singleton spatial dim: _interp_matrix needs 2 taps
    Ry = _interp_matrix(y0[:, 0], wy[:, 0], ny_in).astype(np.float64)
    Rx = _interp_matrix(x0[0, :], wx[0, :], nx_in).astype(np.float64)
    Gy_np = np.stack([compose_interp_banded(
        y0[:, 0], wy[:, 0], _conv_matrix_1d(ny_in, ytaps[:, i]))
        .astype(np.float32) for i in range(r)], axis=0)[None]
    Gx_np = np.stack([compose_interp_banded(
        x0[0, :], wx[0, :], _conv_matrix_1d(nx_in, xtaps[:, i]))
        .astype(np.float32) for i in range(r)], axis=0)[None]
    My_np = np.stack([_conv_matrix_1d(ny_in, ytaps[:, i])
                      .astype(np.float32) for i in range(r)])[None]
    Mx_np = np.stack([_conv_matrix_1d(nx_in, xtaps[:, i])
                      .astype(np.float32) for i in range(r)])[None]
    return (Gy_np, Gx_np, My_np, Mx_np,
            Ry.astype(np.float32)[None, None],
            Rx.astype(np.float32)[None, None], (yvalid & xvalid), r)


def convolve_reproject_separable(data, kernel, ys, xs):
    """Fused common-beam convolve + axis-aligned reproject.

    Both stages are linear maps along y and x — the SVD-separable
    convolution factors M and the 2-tap resample matrices R compose on the
    host into G = R @ M per axis and rank, so an all-finite cube runs one
    pair of banded einsums per rank instead of the chain's six matmul
    passes (convolution numerator+denominator on both axes, resample
    output+nan-weight).  Cubes containing NaN take the exact sequential
    chain inside ``lax.cond`` (normalized convolution is nonlinear there).

    Applicable when the kernel SVD-separates, the (ys, xs) mapping is
    axis-aligned, and the spectral axis is untouched; returns None
    otherwise so callers fall back to the two-stage path.
    """
    import jax.lax as lax
    data = jnp.asarray(data)
    nchan, ny_in, nx_in = data.shape
    ny, nx = np.asarray(ys).shape
    ops = _conv_reproject_operators(data.shape, kernel, ys, xs)
    if ops is None:
        return None
    Gy_np, Gx_np, My_np, Mx_np, Ry, Rx, valid_np, r = ops
    Gy = [jnp.asarray(Gy_np[0, i]) for i in range(r)]
    Gx = [jnp.asarray(Gx_np[0, i]) for i in range(r)]

    # fully-fused kernel: clean channels apply G in one strip pair,
    # NaN channels run the exact normalized-convolution chain in VMEM —
    # no lax.cond operand materialization, no isfinite prepass, no
    # validity where (all in-kernel)
    from .banded_pallas import conv_reproject_raw_strips
    fused_out = conv_reproject_raw_strips(
        data, Gy_np, Gx_np, My_np, Mx_np, Ry, Rx, valid_np)
    if fused_out is not None:
        return fused_out.astype(data.dtype)

    def fused(x):
        # strip-blocked Pallas apply of the composed operators (this
        # branch only runs on all-finite cubes, so no NaN machinery)
        from .banded_pallas import per_channel_plain_strips
        out = per_channel_plain_strips(x, Gy_np, Gx_np,
                                       np.zeros(nchan, np.int32))
        if out is not None:
            return out
        out = jnp.zeros((nchan, ny, nx), jnp.float32)
        for i in range(r):
            t = jnp.einsum("ab,cbx->cax", Gy[i], x.astype(jnp.float32),
                           precision=lax.Precision.HIGHEST)
            out = out + jnp.einsum("cax,vx->cav", t, Gx[i],
                                   precision=lax.Precision.HIGHEST)
        return out

    def chain(x):
        from .convolve import convolve2d_separable
        conv = convolve2d_separable(x, np.asarray(kernel, dtype=np.float64)
                                    / np.asarray(kernel,
                                                 dtype=np.float64).sum())
        zs = np.arange(nchan, dtype=np.float64)
        return _bilinear_spatial_then_linear_z(
            conv, zs, np.asarray(ys), np.asarray(xs), 1) \
            .astype(jnp.float32)

    has_nan = jnp.any(~jnp.isfinite(data))
    out = lax.cond(has_nan, chain, fused, data)
    valid = jnp.asarray(valid_np)[None, :, :]
    return jnp.where(valid, out, jnp.nan).astype(data.dtype)


def _resample_planes(data, ys, xs, order):
    """Gather [*, ny_in, nx_in] planes at fractional (ys, xs); NaN outside."""
    data = jnp.asarray(data)
    single = data.ndim == 2
    if single:
        data = data[None]
    nchan = data.shape[0]
    zs = np.arange(nchan, dtype=np.float64)
    out = _bilinear_spatial_then_linear_z(data, zs, np.asarray(ys),
                                          np.asarray(xs), order)
    return out[0] if single else out


def reproject_image(data, wcs_in: WCS, target_header, order="bilinear"):
    """Reproject a 2-D image onto the celestial WCS of ``target_header``."""
    wcs_out = WCS(header=target_header)
    ny = int(target_header["NAXIS2"])
    nx = int(target_header["NAXIS1"])
    ys, xs = spatial_pixel_mapping(wcs_in, wcs_out, (ny, nx))
    out = _resample_planes(data, ys, xs, _order_int(order))
    return np.asarray(out), wcs_out.celestial if wcs_out.naxis > 2 \
        else wcs_out


def reproject_mappings(wcs_in: WCS, target_header, nchan_in,
                       spectral_values_in=None):
    """Host-side target->source pixel mappings for reprojection onto
    ``target_header``: returns ``(zs, ys, xs, wcs_out)`` with ``zs`` the
    (nz,) input-channel coordinate of each output channel and ``ys``/``xs``
    the (ny, nx) fractional input-pixel maps.  Shared by the unsharded
    :func:`reproject_cube` and ``parallel.sharded.sharded_reproject``."""
    wcs_out = WCS(header=target_header)
    nz = int(target_header.get("NAXIS3", nchan_in))
    ny = int(target_header["NAXIS2"])
    nx = int(target_header["NAXIS1"])
    ys, xs = spatial_pixel_mapping(wcs_in, wcs_out, (ny, nx))

    # spectral mapping: world value of each output channel -> input pixel
    sv_out = wcs_out.spectral_axis_values(nz)
    out_unit = wcs_out.spectral_unit
    in_unit = wcs_in.spectral_unit
    in_root = wcs_in.ctype[wcs_in.spec].strip().upper()[:4]
    out_root = wcs_out.ctype[wcs_out.spec].strip().upper()[:4]
    if in_root == out_root:
        sv_out_in_units = out_unit.to(in_unit, np.asarray(sv_out))
    else:
        # cross-type spectral axes (e.g. a FREQ cube onto a WAVE or
        # velocity template): route through the spectral conversion
        # engine in SI (reference handles this via astropy world
        # coordinates inside the reproject package)
        from ..wcs.spectral import spectral_value_transform, _rest_freq_si
        rest = _rest_freq_si(wcs_out) or _rest_freq_si(wcs_in)
        val, _ = spectral_value_transform(out_root, in_root, rest)
        si = np.asarray(sv_out, dtype=np.float64) * out_unit.scale
        sv_out_in_units = np.asarray(val(si)) / in_unit.scale
    if spectral_values_in is not None:
        # invert via the actual input axis (handles nonlinear sampling)
        inax = np.asarray(spectral_values_in, dtype=np.float64)
        order_in = np.argsort(inax)
        srt = inax[order_in]
        # snap float-epsilon overshoots onto the endpoint channels: a
        # unit/ctype conversion roundtrip perturbs the edge values by
        # ~1e-16 relative, which would otherwise NaN the edge channels
        sv = np.asarray(sv_out_in_units, dtype=np.float64)
        tol = min(1e-9 * max(abs(srt[0]), abs(srt[-1])),
                  1e-3 * np.min(np.diff(srt))) if len(srt) > 1 else 0.0
        sv = np.where((sv < srt[0]) & (sv > srt[0] - tol), srt[0], sv)
        sv = np.where((sv > srt[-1]) & (sv < srt[-1] + tol), srt[-1], sv)
        zs = np.interp(sv, srt,
                       np.arange(len(inax), dtype=np.float64)[order_in],
                       left=np.nan, right=np.nan)
    else:
        zs = np.asarray(wcs_in._spectral_world2inter(sv_out_in_units)
                        / wcs_in.cdelt[wcs_in.spec]
                        + wcs_in.crpix[wcs_in.spec] - 1.0)
    return np.asarray(zs), ys, xs, wcs_out


def reproject_cube(data, wcs_in: WCS, target_header, order="bilinear",
                   spectral_values_in=None):
    """Reproject a [spec, y, x] cube onto a full 3-D target WCS.

    Separable evaluation (the reference requires separable spectral/
    celestial WCS throughout): the channel mapping depends only on z and the
    spatial mapping only on (y, x); both are host-computed then fused into a
    single 3-D gather on device.
    """
    zs, ys, xs, wcs_out = reproject_mappings(
        wcs_in, target_header, data.shape[0],
        spectral_values_in=spectral_values_in)
    data = jnp.asarray(data)
    out = _bilinear_spatial_then_linear_z(data, np.asarray(zs),
                                          np.asarray(ys), np.asarray(xs),
                                          _order_int(order))
    # the footprint stays a device array: np.asarray here would fetch a
    # cube-sized bool to host (hundreds of ms over a tunnel) for nothing —
    # BooleanArrayMask holds jnp arrays fine
    footprint = jnp.isfinite(out)
    return out, footprint, wcs_out


def mosaic_add(accum, weights, cube_data, wcs_in, target_header,
               order="bilinear", spectral_values_in=None):
    """Scatter-add one reprojected cube into a mosaic accumulator
    (reference mosaic_cubes, cube_utils.py:791-856): accum += data*w,
    weights += w, with w the reprojection footprint."""
    out, foot, _ = reproject_cube(cube_data, wcs_in, target_header,
                                  order=order,
                                  spectral_values_in=spectral_values_in)
    w = foot.astype(accum.dtype)
    accum = accum + jnp.where(foot, out, 0) * 1.0
    weights = weights + w
    return accum, weights
