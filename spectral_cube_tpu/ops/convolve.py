"""Beam convolution via batched XLA FFTs.

Replaces the reference's per-plane astropy ``convolve``/``convolve_fft``
loops (``/root/reference/spectral_cube/spectral_cube.py:3334-3392`` single
beam, ``:4126-4240`` per-channel varying beams) with one batched rfft2 over
channel blocks.  Per-channel kernels are grouped by unique beam so their
transfer functions are FFT'd once each (SURVEY hard-part (c)).

Semantics matched: astropy convolve/convolve_fft with boundary zero-fill,
``nan_treatment='interpolate'`` (normalized convolution: convolve the
zero-filled data and the validity mask, divide), ``normalize_kernel=True``;
Jy/beam data are rescaled by the beam-area ratio
(reference :3374-3378).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..beams import Beam
from ..units import Unit

__all__ = ["convolve2d_nan_fft", "convolve_cube_to_beam",
           "convolve_image_to_beam", "beam_unit_factor", "fft_shape"]


def fft_shape(n):
    """Next fast EVEN FFT size >= n (2 * products of 2/3/5,
    TPU-friendly).  Must be even: the rfft2-format transfers carry
    fx//2+1 columns, from which _convolve_planes reconstructs
    fx = 2*(half-1) — an odd size would silently transform the data on
    a different frequency grid than the kernel."""
    best = 1 << max((int(n) - 1).bit_length(), 1)
    m = 2
    while m < n * 2:
        for f in (1, 3, 5, 9, 15):
            c = m * f
            if c >= n and c < best:
                best = c
        m *= 2
    return best


_COMBINE_COMPLEX = None
_DFT_MAT_CACHE = {}


def device_complex(arr):
    """Move a host complex array to device as a real/imag pair recombined
    on device.  Direct complex host<->device transfers are UNIMPLEMENTED
    on some backends (notably the axon TPU tunnel); real transfers plus an
    on-device lax.complex are universally supported."""
    import jax
    global _COMBINE_COMPLEX
    arr = np.asarray(arr)
    if arr.dtype.kind != "c":
        return jnp.asarray(arr)
    real_dt = np.float64 if arr.dtype == np.complex128 else np.float32
    re = jnp.asarray(np.ascontiguousarray(arr.real, dtype=real_dt))
    im = jnp.asarray(np.ascontiguousarray(arr.imag, dtype=real_dt))
    if _COMBINE_COMPLEX is None:
        _COMBINE_COMPLEX = jax.jit(jax.lax.complex)  # one cached wrapper
    return _COMBINE_COMPLEX(re, im)


def _kernel_transfer(kernel, fy, fx):
    """rfft2 of a centered, zero-padded kernel."""
    ky, kx = kernel.shape
    pad = np.zeros((fy, fx), dtype=np.float64)
    pad[:ky, :kx] = kernel
    # center the kernel at (0,0) so convolution does not translate the
    # image; (k-1)//2 matches np.convolve 'same' and the direct-conv/
    # banded paths for EVEN kernels (astropy rejects those outright, so
    # the convention is ours to fix — it must agree across paths)
    pad = np.roll(pad, (-((ky - 1) // 2), -((kx - 1) // 2)), axis=(0, 1))
    return np.fft.rfft2(pad)


def convolve2d_nan_fft(data, kernel):
    """NaN-interpolating normalized FFT convolution of [ny, nx] or
    [nchan, ny, nx] data with a single 2-D kernel."""
    data = jnp.asarray(data)
    single = data.ndim == 2
    if single:
        data = data[None]
    transfers = _kernel_transfer(np.asarray(kernel, dtype=float)
                                 / np.asarray(kernel, dtype=float).sum(),
                                 *_padded_shape(data.shape[1:], kernel.shape))
    out = _convolve_planes(data, device_complex(transfers[None]),
                           np.zeros(data.shape[0], dtype=np.int32))
    return out[0] if single else out


def _padded_shape(img_shape, kernel_shape):
    ny, nx = img_shape
    ky, kx = kernel_shape
    return fft_shape(ny + ky - 1), fft_shape(nx + kx - 1)


# Above this plane size the DFT matrices stop fitting nicely and XLA's FFT
# wins back; below it, on TPU, spectral multiply via dense DFT matmuls runs
# on the MXU at tens of TFLOP/s vs ~0.3 TFLOP/s for the FFT op (the
# round-1 ROADMAP's 24 ms -> ~3 ms lever).
_DFT_MATMUL_MAX_F = 1024


# the DFT path's workspace (full per-channel complex transfers + the 2x
# stacked planes + einsum temporaries) must leave HBM headroom; past this
# the rfft2 path (half-width transfers, no per-channel expansion) wins
_DFT_MATMUL_MAX_BYTES = 4 * 2**30


def _use_dft_matmul(fy, fx, nchan=1):
    import jax
    workspace = 3 * (2 * nchan) * fy * fx * 8  # complex64 planes, ~3 live
    return (jax.default_backend() == "tpu"
            and fy <= _DFT_MATMUL_MAX_F and fx <= _DFT_MATMUL_MAX_F
            and workspace <= _DFT_MATMUL_MAX_BYTES)


def _dft_mats(n, dtype):
    """(n, n) forward DFT matrix and its inverse, complex.

    The cache stores the REAL/IMAG parts (concrete device arrays) and the
    complex combine runs per call: combining inside the cache would store
    a tracer whenever the first call happens during a jit trace, and any
    later program reusing that DFT size would crash with
    UnexpectedTracerError.  The combine itself goes through the jitted
    lax.complex wrapper so eager use never dispatches an eager complex
    primitive over the tunnel (UNIMPLEMENTED there)."""
    import jax
    global _COMBINE_COMPLEX
    cast = np.float64 if dtype == jnp.complex128 else np.float32
    rw, iw, ri, ii = _dft_parts(n, cast)
    if _COMBINE_COMPLEX is None:
        _COMBINE_COMPLEX = jax.jit(jax.lax.complex)
    return _COMBINE_COMPLEX(rw, iw), _COMBINE_COMPLEX(ri, ii)


def _full_transfer(transfers, fy, fx):
    """Expand rfft2-format transfers (ngroup, fy, fx//2+1) to full
    (ngroup, fy, fx) via Hermitian symmetry."""
    half = transfers
    u = (fy - np.arange(fy)) % fy
    v = (fx - np.arange(fx)) % fx
    # columns fx//2+1 .. fx-1 mirror conj(T[-u, -v])
    tail = jnp.conj(half[:, u][:, :, v[fx // 2 + 1:]])
    return jnp.concatenate([half, tail], axis=2)


def _spectral_apply_dft(planes, t_full, fy, fx, comp):
    """out = iFy @ ((Fy @ X @ Fx^T) * T) @ iFx^T as batched complex
    einsums — XLA lowers each to 4 real MXU matmuls, the whole chain is
    3 passes over the (nbatch, fy, fx) workspace."""
    import jax.lax as lax
    Fy, iFy = _dft_mats(fy, comp)
    Fx, iFx = _dft_mats(fx, comp)
    prec = lax.Precision.HIGHEST
    z = jnp.einsum("ab,cbx->cax", Fy, planes.astype(comp),
                   precision=prec)
    z = jnp.einsum("cax,vx->cav", z, Fx, precision=prec)
    z = z * t_full
    z = jnp.einsum("ab,cbx->cax", iFy, z, precision=prec)
    z = jnp.einsum("cax,vx->cav", z, iFx, precision=prec)
    return jnp.real(z)


_RDFT_MAT_CACHE = {}


def _rdft_mats(n, cast):
    """Real matrices for a length-n rFFT along the last axis and its
    inverse: (C, S) with shape (n//2+1, n) computing Zr = X C^T,
    Zi = X S^T, and (Ar, Ai) with shape (n, n//2+1) computing
    out = Zr Ar^T + Zi Ai^T (Hermitian fold + 1/n folded in).  Host
    numpy only, for the same tracer-safety reasons as _dft_mats."""
    key = (int(n), str(cast))
    if key not in _RDFT_MAT_CACHE:
        k = np.arange(n // 2 + 1)
        t = 2.0 * np.pi * np.outer(k, np.arange(n)) / n
        c, s = np.cos(t), -np.sin(t)
        w = np.full(n // 2 + 1, 2.0)
        w[0] = 1.0
        if n % 2 == 0:
            w[-1] = 1.0
        ar = (c * w[:, None] / n).T
        ai = (s * w[:, None] / n).T
        _RDFT_MAT_CACHE[key] = tuple(
            np.ascontiguousarray(m, dtype=cast) for m in (c, s, ar, ai))
    return _RDFT_MAT_CACHE[key]


def _spectral_apply_rdft(planes, tr, ti, fy, fx, real):
    """Circular convolution as REAL MXU matmuls at half spectral width.

    Equivalent to iF2 @ ((F2 @ X) * T) for real X, but factored through
    the rFFT along x so every pass carries fx//2+1 columns and real/imag
    parts separately: 12 half-width real matmuls per application vs the
    16 full-width ones of the complex-einsum form (_spectral_apply_dft)
    — measured 2.3x faster on 256^3 on a v5e.

    planes: (c, fy, fx) real; tr/ti: (c, fy, fx//2+1) transfer parts.
    """
    import jax.lax as lax
    cast = np.float64 if real == jnp.float64 else np.float32
    cx, sx, arx, aix = (jnp.asarray(m) for m in _rdft_mats(fx, cast))
    fyr, fyi, iyr, iyi = (jnp.asarray(m) for m in _dft_parts(fy, cast))
    prec = lax.Precision.HIGHEST
    x = planes.astype(real)
    zr = jnp.einsum("cyx,kx->cyk", x, cx, precision=prec)
    zi = jnp.einsum("cyx,kx->cyk", x, sx, precision=prec)
    wr = (jnp.einsum("ab,cbk->cak", fyr, zr, precision=prec)
          - jnp.einsum("ab,cbk->cak", fyi, zi, precision=prec))
    wi = (jnp.einsum("ab,cbk->cak", fyr, zi, precision=prec)
          + jnp.einsum("ab,cbk->cak", fyi, zr, precision=prec))
    mr = wr * tr - wi * ti
    mi = wr * ti + wi * tr
    vr = (jnp.einsum("ab,cbk->cak", iyr, mr, precision=prec)
          - jnp.einsum("ab,cbk->cak", iyi, mi, precision=prec))
    vi = (jnp.einsum("ab,cbk->cak", iyr, mi, precision=prec)
          + jnp.einsum("ab,cbk->cak", iyi, mr, precision=prec))
    return (jnp.einsum("cyk,nk->cyn", vr, arx, precision=prec)
            + jnp.einsum("cyk,nk->cyn", vi, aix, precision=prec))


def _dft_parts(n, cast):
    """Real/imag parts of the full forward/inverse DFT matrices as HOST
    numpy arrays (the single fill point for _DFT_MAT_CACHE; host arrays
    only — any jnp value created here would be, or become, a tracer when
    the first call happens under jit)."""
    key = (int(n), str(jnp.complex128 if cast == np.float64
                       else jnp.complex64))
    if key not in _DFT_MAT_CACHE:
        k = np.arange(n)
        w = np.exp(-2j * np.pi * np.outer(k, k) / n)
        wi = np.conj(w) / n
        _DFT_MAT_CACHE[key] = tuple(
            np.ascontiguousarray(part, dtype=cast)
            for part in (w.real, w.imag, wi.real, wi.imag))
    return _DFT_MAT_CACHE[key]


def _convolve_planes(data, transfers, group_idx):
    """Convolve each channel with its group's transfer function.

    data: (nchan, ny, nx); transfers: (ngroup, fy, fx//2+1) complex;
    group_idx: (nchan,) int32.

    On TPU with moderate padded plane sizes the circular convolution runs
    as dense DFT matmuls on the MXU (see _use_dft_matmul); elsewhere as
    batched rfft2/irfft2.
    """
    nchan, ny, nx = data.shape
    fy = (transfers.shape[1])
    fx = 2 * (transfers.shape[2] - 1)
    comp = jnp.complex128 if data.dtype == jnp.float64 else jnp.complex64
    real = jnp.float64 if data.dtype == jnp.float64 else jnp.float32

    valid = jnp.isfinite(data)
    filled = jnp.where(valid, data, 0).astype(real)
    # astropy boundary='fill' treats the zero padding as *valid* data, so
    # the normalized-convolution denominator is 1 - conv(invalid): only NaN
    # holes (nan_treatment='interpolate') reduce the local weight.

    pads = ((0, 0), (0, fy - ny), (0, fx - nx))
    gidx = jnp.asarray(group_idx)
    import jax.lax as lax

    if _use_dft_matmul(fy, fx, nchan):
        tg = transfers[gidx]
        tr = jnp.real(tg).astype(real)
        ti = jnp.imag(tg).astype(real)

        def conv2(arr):
            return _spectral_apply_rdft(jnp.pad(arr, pads), tr, ti,
                                        fy, fx, real)[:, :ny, :nx]
    else:
        t = transfers.astype(comp)[gidx]

        def conv2(arr):
            return jnp.fft.irfft2(jnp.fft.rfft2(jnp.pad(arr, pads)) * t,
                                  s=(fy, fx))[:, :ny, :nx]

    num = conv2(filled)

    # All-finite cubes return ``num`` directly: the denominator rDFT/FFT
    # chain AND the divide/NaN-where/any_valid postlude all sit inside the
    # dirty branch of one lax.cond, so the clean path pays zero extra HBM
    # passes (num == where(1>eps, num/1, nan) bitwise when den == 1).
    def _clean(args):
        return args[0]

    def _dirty(args):
        n, v = args
        den = 1.0 - conv2((~v).astype(real))
        # den is the fraction of kernel weight drawn from valid data; the
        # f32 HIGHEST matmul/rDFT chains reconstruct an exact 0 only to
        # ~1e-7, so anything below 1e-6 is numerically indistinguishable
        # from "no valid weight" and must map to NaN CONSISTENTLY across
        # the separable, rDFT, and rfft2 paths (a smaller eps made the
        # NaN set depend on which path computed it).
        eps = 1e-6
        o = jnp.where(den > eps, n / jnp.where(den > eps, den, 1), jnp.nan)
        # all-NaN planes stay NaN
        any_valid = jnp.any(v, axis=(1, 2), keepdims=True)
        return jnp.where(any_valid, o, jnp.nan)

    out = lax.cond(jnp.all(valid), _clean, _dirty, (num, valid))
    return out.astype(data.dtype)


def _conv_matrix_1d(n, taps):
    """(n, n) banded true-convolution matrix for 1-D taps (shared builder
    with the spectral-smoothing path, ops/smoothing.py)."""
    from .smoothing import _banded_conv_matrix
    return _banded_conv_matrix(n, taps)


def separable_factors(kernel, tol=1e-7, max_rank=8):
    """SVD-separate a 2-D kernel into rank-r 1-D tap pairs.

    A rotated elliptical Gaussian has tiny numerical rank, so convolution
    becomes r pairs of banded matrix products on the MXU instead of four
    FFTs (measured ~10x faster for single-kernel convolve_to).
    Returns (ytaps (ky, r), xtaps (kx, r)) or None if rank > max_rank."""
    k = np.asarray(kernel, dtype=np.float64)
    U, s, Vt = np.linalg.svd(k)
    r = int(np.sum(s > s[0] * tol))
    if r == 0:
        r = 1
    if r > max_rank:
        return None
    return U[:, :r] * s[:r], Vt[:r, :].T


_SEP_OP_CACHE = {}


def _sep_operator_stacks(ytaps, xtaps, ny, nx):
    """Value-cached (1, r, ny, ny)/(1, r, nx, nx) banded operator stacks
    for the single-kernel separable convolution; bounded by bytes (the
    stacks are O(n^2) dense)."""
    key = (ny, nx, ytaps.tobytes(), xtaps.tobytes())
    hit = _SEP_OP_CACHE.get(key)
    if hit is not None:
        return hit
    r = ytaps.shape[1]
    my = np.stack([_conv_matrix_1d(ny, ytaps[:, i])
                   for i in range(r)])[None]
    mx = np.stack([_conv_matrix_1d(nx, xtaps[:, i])
                   for i in range(r)])[None]
    val = (my, mx)
    nbytes = my.nbytes + mx.nbytes
    total = sum(v[0].nbytes + v[1].nbytes for v in _SEP_OP_CACHE.values())
    if len(_SEP_OP_CACHE) >= 16 or total + nbytes > 2 ** 29:
        _SEP_OP_CACHE.clear()
    _SEP_OP_CACHE[key] = val
    return val


def convolve2d_separable(data, kernel, precision=None):
    """NaN-interpolating linear convolution of [nchan, ny, nx] data with one
    2-D kernel via SVD-separable banded matmuls (zero-fill boundary —
    identical semantics to the FFT path)."""
    import jax.lax as lax
    precision = precision or lax.Precision.HIGHEST
    factors = separable_factors(kernel)
    if factors is None:
        return None
    ytaps, xtaps = factors
    data = jnp.asarray(data)
    nchan, ny, nx = data.shape
    import jax
    if jax.default_backend() == "tpu" and data.dtype == jnp.float32 \
            and precision == lax.Precision.HIGHEST:
        # strip-blocked Pallas route (single group): the dense einsums
        # below spend ~nin/K of their MXU flops on structural zeros —
        # bigcube's 1024x512x512 separable-convolve row measured
        # 23.2 ms dense vs the strips kernel's banded flops (~5x less
        # MXU work); NaN semantics identical (per-channel normalized
        # convolution, same 1e-6 floor, oracle-tested).  The operator
        # stacks are value-cached so repeat eager calls (convolve_to on
        # many same-beam cubes) reuse the SAME arrays — which also keys
        # banded_pallas's identity-keyed strip-plan cache, skipping the
        # O(n^2) plan/cut host scans per call.
        my, mx = _sep_operator_stacks(ytaps, xtaps, ny, nx)
        gi = np.zeros(nchan, np.int32)
        from .banded_pallas import (per_channel_conv_strips,
                                    per_channel_conv_strips_blocked)
        out = per_channel_conv_strips_blocked(data, my, mx, gi)
        if out is None:
            out = per_channel_conv_strips(data, my, mx, gi)
        if out is not None:
            return out.astype(data.dtype)
    valid = jnp.isfinite(data)
    comp = jnp.float64 if data.dtype == jnp.float64 else jnp.float32
    filled = jnp.where(valid, data, 0).astype(comp)
    invalid = (~valid).astype(comp)

    def apply(arr):
        out = jnp.zeros_like(arr)
        for i in range(ytaps.shape[1]):
            my = jnp.asarray(_conv_matrix_1d(ny, ytaps[:, i]), dtype=comp)
            mx = jnp.asarray(_conv_matrix_1d(nx, xtaps[:, i]), dtype=comp)
            tmp = jnp.einsum("yz,czx->cyx", my, arr, precision=precision)
            out = out + jnp.einsum("cyx,wx->cyw", tmp, mx,
                                   precision=precision)
        return out

    num = apply(filled)
    # all-finite cubes skip the denominator matmuls (lax.cond): den == 1
    import jax.lax as lax
    den = lax.cond(jnp.all(valid),
                   lambda inv: jnp.ones_like(inv),
                   lambda inv: 1.0 - apply(inv), invalid)
    # den is the fraction of kernel weight drawn from valid data; the f32
    # HIGHEST matmul/rDFT chains reconstruct an exact 0 only to ~1e-7, so
    # anything below 1e-6 is numerically indistinguishable from "no valid
    # weight" and must map to NaN CONSISTENTLY across the separable,
    # rDFT, and rfft2 paths (a smaller eps made the NaN set depend on
    # which path computed it).
    eps = 1e-6
    out = jnp.where(den > eps, num / jnp.where(den > eps, den, 1), jnp.nan)
    any_valid = jnp.any(valid, axis=(1, 2), keepdims=True)
    out = jnp.where(any_valid, out, jnp.nan)
    return out.astype(data.dtype)


# the per-channel matrix gathers ((nchan, r, n, n) per axis) must leave
# HBM headroom; beyond this the spectral-multiply paths take over
_PER_CHANNEL_SEP_MAX_BYTES = 4 * 2**30


def convolve_per_channel_separable(data, kernels, group_idx, max_rank=4,
                                   max_plane=1024):
    """NaN-interpolating per-channel 2-D convolution via group-indexed
    separable banded matmuls, batched over channels.

    Handles ANY number of distinct beams at MXU speed: each group's kernel
    SVD-separates into rank-r 1-D taps, the (ngroup, r, n, n) banded
    matrices are gathered per channel, and two batched einsums apply them —
    no FFTs, no python loop over groups.  Returns None when any kernel
    isn't low-rank or the planes are too large for the matrix batch."""
    import jax.lax as lax
    data = jnp.asarray(data)
    nchan, ny, nx = data.shape
    if max(ny, nx) > max_plane:
        return None
    ytaps_g, xtaps_g, ranks = [], [], []
    for k in kernels:
        if k is None:  # delta: identity
            ytaps_g.append(None)
            xtaps_g.append(None)
            ranks.append(1)
            continue
        if k.shape[0] > 2 * ny or k.shape[1] > 2 * nx:
            return None
        fac = separable_factors(k, max_rank=max_rank)
        if fac is None:
            return None
        ytaps_g.append(fac[0])
        xtaps_g.append(fac[1])
        ranks.append(fac[0].shape[1])
    r = max(ranks)
    ngroup = len(kernels)
    my = np.zeros((ngroup, r, ny, ny), dtype=np.float32)
    mx = np.zeros((ngroup, r, nx, nx), dtype=np.float32)
    eye_y = np.eye(ny, dtype=np.float32)
    eye_x = np.eye(nx, dtype=np.float32)
    for g in range(ngroup):
        if ytaps_g[g] is None:
            my[g, 0] = eye_y
            mx[g, 0] = eye_x
            continue
        for i in range(ytaps_g[g].shape[1]):
            my[g, i] = _conv_matrix_1d(ny, ytaps_g[g][:, i])
            mx[g, i] = _conv_matrix_1d(nx, xtaps_g[g][:, i])

    import jax
    if jax.default_backend() == "tpu" and data.dtype == jnp.float32:
        # strip-blocked Pallas path: channels visit in group-sorted order
        # so the per-group band blocks stay resident in VMEM (no
        # per-channel HBM gather of (n, n) matrices), and the normalized-
        # convolution NaN machinery runs per channel inside the kernel
        # (measured 0.846 -> ~0.43 ms on the 64-group 256^3 BASELINE
        # config; that workload is MXU-bound at f32 HIGHEST)
        from .banded_pallas import (per_channel_conv_strips,
                                    per_channel_conv_strips_blocked)
        gi = np.asarray(group_idx, dtype=np.int32)
        # contiguous beam groups (the monotone-drift VRSC common case):
        # 4-channel-blocked grid amortizes per-step overheads (0.438 ->
        # 0.343 ms on the 64-group 256^3 config); interleaved groups
        # keep the one-channel group-sorted kernel
        out = per_channel_conv_strips_blocked(data, my, mx, gi)
        if out is None:
            out = per_channel_conv_strips(data, my, mx, gi)
        if out is not None:
            return out.astype(data.dtype)

    # gathered per-channel matrices + the (nchan, r, ny, nx) temporary
    gathered = nchan * r * (ny * ny + nx * nx + 2 * ny * nx) * 4
    if gathered > _PER_CHANNEL_SEP_MAX_BYTES:
        return None
    gidx = jnp.asarray(np.asarray(group_idx, dtype=np.int32))
    myc = jnp.asarray(my)[gidx]          # (nchan, r, ny, ny)
    mxc = jnp.asarray(mx)[gidx]          # (nchan, r, nx, nx)

    valid = jnp.isfinite(data)
    comp = jnp.float64 if data.dtype == jnp.float64 else jnp.float32
    filled = jnp.where(valid, data, 0).astype(comp)

    def apply(arr, prec):
        t = jnp.einsum("crab,cbx->crax", myc, arr, precision=prec)
        return jnp.einsum("crax,crvx->cav", t, mxc, precision=prec)

    num = apply(filled, lax.Precision.HIGHEST)

    # All-finite cubes return ``num`` directly: the whole normalized-
    # convolution postlude (denominator matmuls, divide, NaN wheres,
    # any_valid reduction) sits INSIDE the cond's dirty branch, so the
    # clean path pays zero extra HBM passes.  On the clean path
    # num == where(1>eps, num/1, nan) bitwise, so results are unchanged.
    def _clean(args):
        n, _ = args
        return n

    def _dirty(args):
        n, v = args
        inv = (~v).astype(comp)
        # the denominator DIVIDES the output (normalized convolution), so
        # it needs full precision too — unlike threshold-only flag matmuls
        den = 1.0 - apply(inv, lax.Precision.HIGHEST)
        # den is the fraction of kernel weight drawn from valid data; the
        # f32 HIGHEST matmul/rDFT chains reconstruct an exact 0 only to
        # ~1e-7, so anything below 1e-6 is numerically indistinguishable
        # from "no valid weight" and must map to NaN CONSISTENTLY across
        # the separable, rDFT, and rfft2 paths (a smaller eps made the
        # NaN set depend on which path computed it).
        eps = 1e-6
        o = jnp.where(den > eps, n / jnp.where(den > eps, den, 1), jnp.nan)
        any_valid = jnp.any(v, axis=(1, 2), keepdims=True)
        return jnp.where(any_valid, o, jnp.nan)

    out = lax.cond(jnp.all(valid), _clean, _dirty, (num, valid))
    return out.astype(data.dtype)


def beam_unit_factor(unit: Unit, current: Beam, target: Beam) -> float:
    """Jy/beam rescaling under a beam change (reference
    spectral_cube.py:3374-3378): 'beam' in the denominator means the value
    scales with the beam solid angle."""
    from .. import units as u
    if unit.dims == (u.Jy / u.beam).dims:
        return float(target.sr.value / current.sr.value)
    return 1.0


def convolve_cube_to_beam(data, beams, target: Beam, pixscale_rad,
                          unit: Unit = None, goodchannels=None):
    """Convolve every channel of [nchan, ny, nx] ``data`` to ``target``.

    ``beams``: a single Beam or a per-channel sequence.  Channels sharing a
    beam share one FFT'd transfer function.  Returns (out, factors) where
    ``factors`` is the per-channel Jy/beam rescale (ones if N/A).
    """
    nchan, ny, nx = data.shape
    if isinstance(beams, Beam):
        beam_list = [beams] * nchan
    else:
        beam_list = list(beams)
    # group channels by (numerically) unique beam
    groups = []
    group_idx = np.zeros(nchan, dtype=np.int32)
    for i, b in enumerate(beam_list):
        for gi, gb in enumerate(groups):
            if b == gb:
                group_idx[i] = gi
                break
        else:
            groups.append(b)
            group_idx[i] = len(groups) - 1

    kernels = []
    max_k = (1, 1)
    for b in groups:
        conv_beam = target.deconvolve(b)
        if conv_beam.major_rad <= 0:
            kernels.append(None)  # identity
            continue
        k = conv_beam.as_kernel(pixscale_rad)
        kernels.append(k)
        max_k = (max(max_k[0], k.shape[0]), max(max_k[1], k.shape[1]))

    out = None
    if len(groups) == 1:
        # single target kernel (SpectralCube.convolve_to): shared-matrix
        # SVD-separable MXU matmuls — Gaussian kernels have tiny numerical
        # rank, so this beats every spectral-multiply path (measured on
        # v5e, 256^3: ~3 ms vs 13.5 ms DFT-matmul vs 28 ms XLA FFT, max
        # rel err 3e-7)
        k = kernels[0]
        if k is None:
            out = jnp.asarray(data)
        elif k.shape[0] <= 2 * ny:
            out = convolve2d_separable(jnp.asarray(data), k)
    if out is None:
        # any number of distinct beams: batched group-indexed separable
        # matmuls (no group loop, no FFTs; measured 1.2 ms for 64 groups
        # on 256^3) — falls through to the spectral-multiply path only
        # for non-separable kernels or very large planes
        kern_ok = all(k is None or k.shape[0] <= 2 * ny for k in kernels)
        if kern_ok:
            out = convolve_per_channel_separable(jnp.asarray(data),
                                                 kernels, group_idx)

    if out is None:
        fy, fx = _padded_shape((ny, nx), max_k)
        transfers = np.zeros((len(groups), fy, fx // 2 + 1),
                             dtype=np.complex128)
        for gi, k in enumerate(kernels):
            if k is None:
                transfers[gi] = 1.0  # delta function: identity convolution
            else:
                transfers[gi] = _kernel_transfer(k, fy, fx)
        out = _convolve_planes(jnp.asarray(data), device_complex(transfers),
                               group_idx)

    factors = np.ones(nchan)
    if unit is not None:
        for i, b in enumerate(beam_list):
            factors[i] = beam_unit_factor(unit, b, target)
    if goodchannels is not None:
        bad = ~np.asarray(goodchannels)
        if bad.any():
            out = out.at[jnp.asarray(np.where(bad)[0])].set(jnp.nan)
    return out, factors


def convolve_image_to_beam(img, current: Beam, target: Beam, wcs,
                           unit: Unit = None):
    """2-D Projection convolution (reference
    lower_dimensional_structures.py:450-494)."""
    pixscale = float(np.mean(np.abs(wcs.celestial.proj_plane_pixel_scales()))
                     ) * np.pi / 180.0
    conv_beam = target.deconvolve(current)
    if conv_beam.major_rad <= 0:
        out = jnp.asarray(img)
    else:
        kernel = conv_beam.as_kernel(pixscale)
        out = convolve2d_nan_fft(img, kernel)
    factor = beam_unit_factor(unit, current, target) if unit is not None \
        else 1.0
    return np.asarray(out), factor
