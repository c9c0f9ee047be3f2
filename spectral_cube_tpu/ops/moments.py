"""Fused masked moment kernels (moment 0/1/2 + linewidths in one pass).

Reference math: ``/root/reference/spectral_cube/_moments.py:170-193``
(cubewise), with ``allbadtonan`` NaN semantics (``np_compat.py:3-27``) and
the moment-1 world offset applied by the caller
(``spectral_cube.py:1709-1710``).  The reference needs up to three passes
over the cube (mom0, mom1, then mom2 against mom1); here a single pass
accumulates the sufficient statistics

    S0 = sum w,  S1 = sum w*xc,  S2 = sum w*xc^2,  n = sum valid

with ``xc = x - mean(x)`` (centering makes the one-pass variance form
numerically safe in float32), from which::

    mom0 = S0 * dx                     (NaN where n == 0)
    mom1 = xbar + S1/S0                (+ world offset by the caller)
    mom2 = S2/S0 - (S1/S0)^2

Two implementations: a pure-jnp expression (any backend; XLA multi-output
fusion reads the cube once) and a Pallas TPU kernel that additionally fuses
*data-local* mask predicates into the VMEM-resident block loop, so the mask
is never materialized in HBM.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..masks import is_data_local

__all__ = ["moments_012", "moments_012_pallas", "moment_generic",
           "SIGMA2FWHM"]

SIGMA2FWHM = 2.0 * math.sqrt(2.0 * math.log(2.0))


def _center(coords):
    coords = np.asarray(coords, dtype=np.float64)
    xbar = float(coords.mean()) if coords.size else 0.0
    return coords - xbar, xbar


def _moment_stats(w, valid, xc):
    """Sufficient statistics for moments 0/1/2 with two-pass numerics.

    First pass estimates the centroid from centered coordinates; the second
    pass accumulates the residual mean and second moment *about that
    estimate*, so no large squares are ever differenced (the naive one-pass
    ``S2/S0 - (S1/S0)^2`` form loses ~3 digits in float32 on real data).
    Inside the Pallas kernel both passes read the same VMEM-resident block,
    so HBM sees the data exactly once.
    """
    s0 = jnp.sum(w, axis=0)
    s1 = jnp.sum(w * xc, axis=0)
    cnt = jnp.sum(valid, axis=0)
    safe_s0 = jnp.where(s0 == 0, 1, s0)
    m1_est = s1 / safe_s0                      # centroid estimate (pass 1)
    d = xc - m1_est[None, :, :]
    r1 = jnp.sum(w * d, axis=0) / safe_s0      # residual mean (tiny)
    s2c = jnp.sum(w * (d * d), axis=0)         # second moment about m1_est
    return s0, m1_est, r1, s2c, cnt


def _finalize(s0, m1_est, r1, s2c, cnt, xbar, dx, dtype):
    valid = cnt > 0
    nan = jnp.asarray(jnp.nan, dtype=dtype)
    mom0 = jnp.where(valid, s0 * dx, nan)
    mom1 = jnp.where(valid, xbar + m1_est + r1, nan)
    safe_s0 = jnp.where(s0 == 0, 1, s0)
    mom2 = jnp.where(valid, s2c / safe_s0 - r1 * r1, nan)
    return mom0, mom1, mom2


def moments_012(data, coords, dx, include=None, precision="float32"):
    """Masked moments 0/1/2 along axis 0 in one fused jnp expression.

    Parameters
    ----------
    data : (nchan, ny, nx) array
    coords : (nchan,) spectral coordinate of each channel, relative to
        channel 0, in the cube's spectral unit (reference ``_pix_cen``).
    dx : scalar channel width (reference ``_pix_size_slice(0)``).
    include : optional boolean include mask broadcastable to data.
    """
    acc = jnp.float64 if precision == "float64" else jnp.float32
    coords_c, xbar = _center(coords)
    xc = jnp.asarray(coords_c, dtype=acc)[:, None, None]
    valid = jnp.isfinite(data)
    if include is not None:
        valid = jnp.logical_and(valid, include)
    w = jnp.where(valid, data, 0).astype(acc)
    stats = _moment_stats(w, valid, xc)
    out_dtype = data.dtype if jnp.issubdtype(data.dtype, jnp.floating) \
        else acc
    m0, m1, m2 = _finalize(*stats, xbar, dx, acc)
    return m0.astype(out_dtype), m1.astype(out_dtype), m2.astype(out_dtype)


def _pick_tiles(nchan, ny, nx, itemsize=4, n_block_inputs=1,
                vmem_budget=6 * 2**20):
    """Choose spatial tile sizes so the (nchan, ty, tx) input blocks fit
    VMEM.  The budget covers all cube-shaped inputs *with double buffering*
    (Pallas prefetches the next block while computing), staying under the
    ~16 MB/core VMEM limit with headroom for outputs and temporaries.

    Measured on v5e (256^3 f32, SNR mask): ty=8 -> 101 Gvox/s, ty=16 ->
    103 Gvox/s; the kernel is VPU-bound (~11 elementwise ops/voxel), not
    HBM-bound, so larger tiles give marginal gains.  An MXU basis-matmul
    variant reaches 128 Gvox/s at bf16 precision (fails the 1e-6 target)
    and 89 Gvox/s at HIGHEST precision (operand-splitting VPU cost), so
    the two-pass VPU form is the best accuracy/speed point."""
    tx = 128  # lane width; narrower planes still occupy one 128-lane tile
    ty = 8
    per_row = nchan * tx * itemsize * n_block_inputs * 2  # 2x: double buffer
    while ty < 256 and per_row * (ty * 2) <= vmem_budget \
            and ty * 2 <= _round_up(ny, 8):
        ty *= 2
    return ty, tx


def _round_up(x, m):
    return -(-x // m) * m


def moments_012_pallas(data, coords, dx, mask_expr=None, include=None,
                       interpret=False, with_stats=False):
    """Pallas TPU kernel: one HBM pass, mask fused in VMEM.

    ``mask_expr``: a data-local mask expression (see
    ``masks.is_data_local``) evaluated on each block inside the kernel.
    ``include``: explicit boolean array for non-data-local masks.

    ``with_stats=True`` additionally accumulates the global-statistics
    sufficient planes (sum-of-squares, per-spaxel min/max, per-spaxel
    mean-centered second moment) in the SAME pass and returns
    ``(m0, m1, m2, stats_dict)`` — the pipeline's moments+statistics
    otherwise costs three cube reads (one here, two in
    reductions.masked_statistics' two-pass sigma).  The global sigma
    recombines per-spaxel centered sums in float64 at plane level
    (s2c = sum d2_i + sum n_i (m_i - M)^2), which keeps the DC-offset
    robustness of the two-pass form without a second cube pass.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchan, ny, nx = data.shape
    coords_c, xbar = _center(coords)
    n_block_inputs = 2 if include is not None else 1
    ty, tx = _pick_tiles(nchan, ny, nx, data.dtype.itemsize,
                         n_block_inputs=n_block_inputs)
    # the kernel holds the whole spectral axis of each tile in VMEM (the
    # two-pass numerics need it); with temporaries (~4x the input block)
    # and double buffering this stops fitting the ~16 MB/core VMEM around
    # nchan ~ 1024.  First shrink the tile height (ty=8 costs ~2% vs
    # ty=16, see _pick_tiles; falling off Pallas costs ~3x — with_stats
    # used to do exactly that: its +2 temporary factor tipped the 256^3
    # estimate to 16.8 MB and the whole pipeline silently took the XLA
    # fallback, 0.227 ms vs 0.08).  Only when ty=8 still does not fit
    # fall back to the XLA expression (still one fused HBM pass, ~45% of
    # the Pallas kernel's throughput).
    factor = 2 + 4 + (2 if with_stats else 0)
    per_tile = nchan * tx * data.dtype.itemsize * n_block_inputs
    while ty > 8 and per_tile * ty * factor > 15 * 2 ** 20:
        ty //= 2
    block_bytes = per_tile * ty
    if block_bytes * factor > 15 * 2 ** 20:
        # the whole spectral axis no longer fits one VMEM block (~1024
        # channels at f32): chunk the channel axis instead of falling
        # off Pallas — per-chunk two-pass numerics, exact pair
        # accumulation across chunks (round-4's 2x throughput falloff at
        # 1024^3 was exactly this silent XLA fallback, 94 vs 178 Gvox/s)
        out = _moments_pallas_chunked(data, coords_c, xbar, dx,
                                      mask_expr, include, interpret,
                                      with_stats)
        if out is not None:
            return out
        if mask_expr is not None:
            inc2 = mask_expr._include(data=data)
            include = inc2 if include is None \
                else jnp.logical_and(include, inc2)
        moms = moments_012(data, coords, dx, include=include)
        if not with_stats:
            return moms
        from . import reductions as red
        valid = red.valid_mask(data, include)
        return moms + (red.masked_statistics(data, valid),)
    gy, gx = pl.cdiv(ny, ty), pl.cdiv(nx, tx)
    ragged = (ny % ty != 0) or (nx % tx != 0)

    xc_col = jnp.asarray(coords_c, dtype=jnp.float32).reshape(nchan, 1)

    use_mask_input = include is not None
    if mask_expr is not None and not is_data_local(mask_expr):
        raise ValueError("mask_expr must be data-local for in-kernel fusion")

    def kernel(*refs):
        if use_mask_input:
            (data_ref, xc_ref, inc_ref, s0_ref, m1_ref, r1_ref, s2_ref,
             cnt_ref, *stat_refs) = refs
        else:
            (data_ref, xc_ref, s0_ref, m1_ref, r1_ref, s2_ref,
             cnt_ref, *stat_refs) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        block = data_ref[:]                      # (nchan, ty, tx)
        valid = jnp.isfinite(block)
        if mask_expr is not None:
            valid = jnp.logical_and(valid, mask_expr._include(data=block))
        if use_mask_input:
            valid = jnp.logical_and(valid, inc_ref[:] != 0)
        if ragged:
            # guard spatial padding at the ragged edges (skipped entirely
            # when the tiles divide the plane — one fewer VPU op/voxel)
            row = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 1)
            inb = jnp.logical_and(i * ty + row < ny, j * tx + col < nx)
            valid = jnp.logical_and(valid, inb[None, :, :])
        w = jnp.where(valid, block, 0).astype(jnp.float32)
        xc = xc_ref[:].reshape(nchan, 1, 1)
        # two-pass numerics over the VMEM-resident block (see _moment_stats)
        s0, m1_est, r1, s2c, cnt = _moment_stats(w, valid, xc)
        s0_ref[:] = s0
        m1_ref[:] = m1_est
        r1_ref[:] = r1
        s2_ref[:] = s2c
        cnt_ref[:] = cnt.astype(jnp.int32)
        if with_stats:
            mn_ref, mx_ref, d2_ref = stat_refs
            mn_ref[:] = jnp.min(jnp.where(valid, block, jnp.inf), axis=0)
            mx_ref[:] = jnp.max(jnp.where(valid, block, -jnp.inf), axis=0)
            # per-spaxel mean-centered second moment: accurate in f32
            # because the spaxel's own DC offset is removed before
            # squaring (same reason _moment_stats is two-pass).  The
            # sum-of-squares plane is NOT accumulated here: it follows
            # exactly as ss_i = d2_i + n_i m_i^2 (since s0 = n_i m_i) at
            # plane level in _recombine_statistics — all-positive terms,
            # no cancellation — saving a w*w pass over the block
            # (measured 0.101 -> 0.044 ms on 256^3).
            m_i = s0 / jnp.maximum(cnt, 1).astype(jnp.float32)
            dev = jnp.where(valid, block.astype(jnp.float32) - m_i[None],
                            0.0)
            d2_ref[:] = jnp.sum(dev * dev, axis=0)

    in_specs = [
        pl.BlockSpec((nchan, ty, tx), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nchan, 1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [data, xc_col]
    if use_mask_input:
        in_specs.append(pl.BlockSpec((nchan, ty, tx), lambda i, j: (0, i, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(include.astype(jnp.uint8))

    out_spec = pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    oy, ox = gy * ty, gx * tx
    fmap = jax.ShapeDtypeStruct((oy, ox), jnp.float32)
    imap = jax.ShapeDtypeStruct((oy, ox), jnp.int32)
    n_out = 8 if with_stats else 5
    shapes = (fmap, fmap, fmap, fmap, imap) + \
        ((fmap, fmap, fmap) if with_stats else ())
    outs = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=shapes,
        interpret=interpret,
    )(*inputs)
    outs = [a[:ny, :nx] for a in outs]
    s0, m1_est, r1, s2c, cnt = outs[:5]
    out_dtype = data.dtype
    m0, m1, m2 = _finalize(s0, m1_est, r1, s2c, cnt, xbar, dx, jnp.float32)
    moms = (m0.astype(out_dtype), m1.astype(out_dtype),
            m2.astype(out_dtype))
    if not with_stats:
        return moms
    mn_p, mx_p, d2_p = outs[5:]
    return moms + (_recombine_statistics(s0, cnt, mn_p, mx_p, d2_p),)


def _moments_pallas_chunked(data, coords_c, xbar, dx, mask_expr, include,
                            interpret, with_stats):
    """Channel-chunked Pallas moments for spectral axes too long for one
    VMEM block (~1024 f32 channels): grid (gy, gx, gc) with the channel
    dim innermost, so the per-spaxel sufficient planes stay VMEM-resident
    across chunk steps.

    Numerics: each (cc, ty, tx) chunk runs the same two-pass form as the
    single-block kernel but keeps the RAW residual sum, so its
    contribution converts EXACTLY into the global-centered sums
    (S1 += s0*m1 + R1, S2 += s0*m1^2 + 2*m1*R1 + s2c, Dekker products)
    accumulated as compensated float32 pairs; the pair-space finalization
    (``_finalize_pairs``) then evaluates the cancelling mom2/d2 forms at
    ~1e-14 relative — the same scheme test_pipeline_fused validates
    against an adversarial narrow-line-far-from-center cube.  The pair
    arithmetic runs at PLANE level once per chunk (~40 VPU plane ops
    amortized over cc channels), so the per-voxel cost stays the
    single-block kernel's ~11 ops.  Returns None when no channel divisor
    fits VMEM (callers fall back to the XLA expression)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .df32 import two_sum, two_prod, df_div

    if not interpret and jax.default_backend() != "tpu":
        return None
    nchan, ny, nx = data.shape
    n_block_inputs = 2 if include is not None else 1
    tx = 128
    factor = 2 + 4 + (2 if with_stats else 0)
    choice = None
    for ty in (16, 8):
        for k in range(2, 65):
            if nchan % k:
                continue
            cc = nchan // k
            if cc * ty * tx * data.dtype.itemsize * n_block_inputs \
                    * factor <= 15 * 2 ** 20:
                choice = (ty, cc)
                break
        if choice:
            break
    if choice is None:
        return None
    ty, cc = choice
    gc = nchan // cc
    gy, gx = pl.cdiv(ny, ty), pl.cdiv(nx, tx)
    ragged = (ny % ty != 0) or (nx % tx != 0)
    xc_col = jnp.asarray(coords_c, dtype=jnp.float32).reshape(nchan, 1)
    use_mask_input = include is not None
    if mask_expr is not None and not is_data_local(mask_expr):
        raise ValueError("mask_expr must be data-local for in-kernel fusion")

    def kernel(*refs):
        if use_mask_input:
            (data_ref, xc_ref, inc_ref, s0h, s0l, s1h, s1l, s2h, s2l,
             cnt_ref, *stat_refs) = refs
        else:
            (data_ref, xc_ref, s0h, s0l, s1h, s1l, s2h, s2l, cnt_ref,
             *stat_refs) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            for r in (s0h, s0l, s1h, s1l, s2h, s2l):
                r[:] = jnp.zeros_like(r[:])
            cnt_ref[:] = jnp.zeros_like(cnt_ref[:])
            if with_stats:
                mn_ref, mx_ref, qh, ql = stat_refs
                mn_ref[:] = jnp.full_like(mn_ref[:], jnp.inf)
                mx_ref[:] = jnp.full_like(mx_ref[:], -jnp.inf)
                qh[:] = jnp.zeros_like(qh[:])
                ql[:] = jnp.zeros_like(ql[:])

        block = data_ref[:]                      # (cc, ty, tx)
        valid = jnp.isfinite(block)
        if mask_expr is not None:
            valid = jnp.logical_and(valid, mask_expr._include(data=block))
        if use_mask_input:
            valid = jnp.logical_and(valid, inc_ref[:] != 0)
        if ragged:
            row = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 1)
            inb = jnp.logical_and(i * ty + row < ny, j * tx + col < nx)
            valid = jnp.logical_and(valid, inb[None, :, :])
        w = jnp.where(valid, block, 0).astype(jnp.float32)
        xc = xc_ref[:].reshape(cc, 1, 1)
        # chunk-local two-pass (the single-block numerics, raw residual)
        s0_i = jnp.sum(w, axis=0)
        s1_i = jnp.sum(w * xc, axis=0)
        cnt_i = jnp.sum(valid, axis=0).astype(jnp.int32)
        safe = jnp.where(s0_i == 0, 1.0, s0_i)
        m1 = s1_i / safe
        d = xc - m1[None]
        R1 = jnp.sum(w * d, axis=0)
        s2c = jnp.sum(w * (d * d), axis=0)

        def acc2(h, l, vh, vl):
            s, e = two_sum(h[:], vh)
            l[:] = l[:] + (e + vl)
            h[:] = s

        p1h, p1l = two_prod(s0_i, m1)
        t2h, t2l = two_prod(p1h, m1)
        acc2(s0h, s0l, s0_i, jnp.zeros_like(s0_i))
        acc2(s1h, s1l, p1h, p1l + R1)
        acc2(s2h, s2l, t2h, t2l + p1l * m1 + 2.0 * m1 * R1)
        acc2(s2h, s2l, s2c, jnp.zeros_like(s2c))
        cnt_ref[:] = cnt_ref[:] + cnt_i

        if with_stats:
            mn_ref, mx_ref, qh, ql = stat_refs
            mn_ref[:] = jnp.minimum(
                mn_ref[:], jnp.min(jnp.where(valid, block, jnp.inf),
                                   axis=0))
            mx_ref[:] = jnp.maximum(
                mx_ref[:], jnp.max(jnp.where(valid, block, -jnp.inf),
                                   axis=0))
            # chunk sum-of-squares, derived (no w*w pass): Sum w^2 =
            # d2_i + s0_i^2/cnt_i, with the big division as a PAIR so Q
            # keeps pair accuracy through the final d2 = Q - S0^2/N
            cntf_i = jnp.maximum(cnt_i, 1).astype(jnp.float32)
            m_i = s0_i / cntf_i
            dev = jnp.where(valid, block.astype(jnp.float32) - m_i[None],
                            0.0)
            d2_i = jnp.sum(dev * dev, axis=0)
            sqh, sql = two_prod(s0_i, s0_i)
            dh, dl = df_div((sqh, sql), (cntf_i, jnp.zeros_like(cntf_i)))
            acc2(qh, ql, d2_i, jnp.zeros_like(d2_i))
            acc2(qh, ql, dh, dl)

    in_specs = [
        pl.BlockSpec((cc, ty, tx), lambda i, j, c: (c, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cc, 1), lambda i, j, c: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [data, xc_col]
    if use_mask_input:
        in_specs.append(pl.BlockSpec((cc, ty, tx),
                                     lambda i, j, c: (c, i, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(include.astype(jnp.uint8))
    out_spec = pl.BlockSpec((ty, tx), lambda i, j, c: (i, j),
                            memory_space=pltpu.VMEM)
    oy, ox = gy * ty, gx * tx
    fmap = jax.ShapeDtypeStruct((oy, ox), jnp.float32)
    imap = jax.ShapeDtypeStruct((oy, ox), jnp.int32)
    shapes = (fmap,) * 6 + (imap,) + \
        ((fmap, fmap, fmap, fmap) if with_stats else ())
    outs = pl.pallas_call(
        kernel,
        grid=(gy, gx, gc),
        in_specs=in_specs,
        out_specs=(out_spec,) * len(shapes),
        out_shape=shapes,
        interpret=interpret,
    )(*inputs)
    outs = [a[:ny, :nx] for a in outs]
    s0h, s0l, s1h, s1l, s2h, s2l, cnt = outs[:7]
    cntf = cnt.astype(jnp.float32)
    out_dtype = data.dtype
    if with_stats:
        mn_p, mx_p, qh, ql = outs[7:]
        m0, m1, m2, stats = _finalize_pairs(
            (s0h, s0l, s1h, s1l, s2h, s2l, qh, ql, cntf, mn_p, mx_p),
            xbar, dx, True)
        return (m0.astype(out_dtype), m1.astype(out_dtype),
                m2.astype(out_dtype), stats)
    m0, m1, m2 = _finalize_pairs((s0h, s0l, s1h, s1l, s2h, s2l, cntf),
                                 xbar, dx, False)
    return (m0.astype(out_dtype), m1.astype(out_dtype),
            m2.astype(out_dtype))


def _finalize_pairs(planes, xbar, dx, with_stats):
    """Finalize moments (and optionally statistics) from compensated-pair
    sufficient planes ``(s0h, s0l, s1h, s1l, s2h, s2l[, qh, ql], cntf
    [, mn, mx])`` — the shared pair-space evaluation of the cancelling
    forms mom2 = S2/S0 - (S1/S0)^2 and d2 = Q - S0^2/n (see ops/df32).
    Used by the channel-chunked moments kernel and the whole-pipeline
    fusion (ops/pipeline_fused)."""
    from .df32 import df_sub, df_mul, df_div, df_collapse

    if with_stats:
        s0h, s0l, s1h, s1l, s2h, s2l, qh, ql, cntf, mn, mx = planes
    else:
        s0h, s0l, s1h, s1l, s2h, s2l, cntf = planes
    zero = jnp.zeros_like(s0h)
    s0c = s0h + s0l
    deg = s0c == 0
    S0 = (jnp.where(deg, 1.0, s0h), jnp.where(deg, 0.0, s0l))
    q1 = df_div((s1h, s1l), S0)               # S1/S0 as a pair
    some = cntf > 0
    nan = jnp.asarray(jnp.nan, jnp.float32)
    mom0 = jnp.where(some, s0c * np.float32(dx), nan)
    mom1 = jnp.where(some, np.float32(xbar) + df_collapse(q1), nan)
    # mom2 = S2/S0 - (S1/S0)^2, differenced in pair space: both terms
    # carry ~1e-14 relative error, so the cancellation (up to ~1e4:1 for
    # a narrow line far from xbar) costs nothing
    mom2 = jnp.where(
        some,
        df_collapse(df_sub(df_div((s2h, s2l), S0), df_mul(q1, q1))), nan)
    if not with_stats:
        return mom0, mom1, mom2
    # statistics: per-spaxel centered second moment d2 = Q - S0^2/n in
    # pair space (DC-offset robustness), then the plane-level recombination
    ns = jnp.maximum(cntf, 1.0)
    d2 = df_collapse(df_sub((qh, ql),
                            df_div(df_mul((s0h, s0l), (s0h, s0l)),
                                   (ns, zero))))
    d2 = jnp.where(some, jnp.maximum(d2, 0.0), 0.0)
    stats = _recombine_statistics(s0c, cntf.astype(jnp.int32), mn, mx, d2)
    return mom0, mom1, mom2, stats


def _recombine_statistics(s0, cnt, mn_p, mx_p, d2_p):
    """Global statistics from per-spaxel sufficient planes: the law of
    total variance, s2c = sum d2_i + sum n_i (m_i - M)^2.  Per-spaxel
    centering (d2_i) already removed the DC offset before any squaring —
    the reason masked_statistics needs a second cube pass — and the
    plane-level cross term is second-order in the spaxel-mean spread, so
    f32 keeps the two-pass form's robustness without re-reading the cube.
    The sum-of-squares plane is derived here as ss_i = d2_i + n_i m_i^2
    (exact: s0 = n_i m_i; all terms positive) instead of a w*w pass over
    the block in the kernel.  Matches reductions.masked_statistics' keys
    and npts in {0, 1} semantics."""
    cntf = cnt.astype(jnp.float32)
    npts = jnp.sum(cntf)
    s = jnp.sum(s0)
    nan = jnp.asarray(jnp.nan, dtype=jnp.float32)
    m_i = s0 / jnp.maximum(cntf, 1)
    ss_p = d2_p + cntf * (m_i * m_i)
    # shifted global mean: a raw f32 sum of ~1e3-valued spaxel sums loses
    # ~1e-6 relative, which lands exactly at the spaxel-mean spread on
    # DC-offset data and corrupts the cross term below; summing the
    # deviations from an f32 pilot mean instead is exact to ~1e-10
    pilot = jnp.sum(jnp.where(cnt > 0, m_i, 0.0)) \
        / jnp.maximum(jnp.sum((cnt > 0).astype(jnp.float32)), 1)
    mean_acc = pilot + jnp.sum(cntf * (m_i - pilot)) / jnp.maximum(npts, 1)
    mean = jnp.where(npts > 0, mean_acc, nan)
    s2c = jnp.sum(d2_p) \
        + jnp.sum(cntf * (m_i - jnp.where(npts > 0, mean_acc, 0.0)) ** 2)
    sigma = jnp.where(npts > 1,
                      jnp.sqrt(s2c / jnp.maximum(npts - 1, 1)), nan)
    ss = jnp.sum(ss_p)
    rms = jnp.where(npts > 0, jnp.sqrt(ss / jnp.maximum(npts, 1)), nan)
    mn = jnp.min(jnp.where(cnt > 0, mn_p, jnp.inf))
    mx = jnp.max(jnp.where(cnt > 0, mx_p, -jnp.inf))
    f32 = jnp.float32
    some = npts > 0
    return {"npts": jnp.sum(cnt),
            "min": jnp.where(some, mn, nan).astype(f32),
            "max": jnp.where(some, mx, nan).astype(f32),
            "sum": jnp.where(some, s, nan).astype(f32),
            "sumsq": jnp.where(some, ss, nan).astype(f32),
            "mean": mean.astype(f32),
            "sigma": sigma.astype(f32),
            "rms": rms.astype(f32)}


def statistics_pallas(data, include=None, mask_expr=None, interpret=False):
    """One-HBM-pass global statistics via the fused moments kernel's
    ``with_stats`` machinery (coords all-zero, the moment planes are
    discarded): ``masked_statistics``' two-pass sigma reads the cube
    twice, which at HBM scale is the whole cost (1024^3: 16 ms two-pass
    vs ~7 ms here — the kernel is HBM-bound at ~83% of the line, so the
    wasted zero-coordinate moment VPU work hides under the stream).
    Returns the statistics dict, or None off-TPU / for non-f32 data
    (callers keep the XLA two-pass path).  Reference semantics:
    CASA-style ``statistics()``, dask_spectral_cube.py:769-814."""
    if not (interpret or jax.default_backend() == "tpu"):
        return None
    if data.dtype != jnp.float32:
        return None
    res = moments_012_pallas(data, np.zeros(data.shape[0], np.float64),
                             1.0, mask_expr=mask_expr, include=include,
                             interpret=interpret, with_stats=True)
    return res[3]


# compiled-program cache: eager pallas_call / jnp dispatch re-traces the
# whole kernel on every invocation (~0.5-1 s host time per call); cubes of
# the same shape/coords/mask structure reuse one jitted program
_MOMENTS_JIT_CACHE = {}


def statistics_cached(data, include=None, mask_expr=None):
    """Jit-cached dispatch of :func:`statistics_pallas` (eager pallas
    tracing costs ~0.5-1 s host time per call).  Caller guarantees the
    TPU/f32 gates hold."""
    from ..masks import expr_key
    key = ("stats1p", data.shape, str(data.dtype), expr_key(mask_expr),
           include is not None)
    fn = _MOMENTS_JIT_CACHE.get(key)
    if fn is None:
        if include is None:
            fn = jax.jit(lambda d: statistics_pallas(
                d, mask_expr=mask_expr))
        else:
            fn = jax.jit(lambda d, i: statistics_pallas(
                d, include=i, mask_expr=mask_expr))
        if len(_MOMENTS_JIT_CACHE) > 64:
            _MOMENTS_JIT_CACHE.clear()
        _MOMENTS_JIT_CACHE[key] = fn
    return fn(data) if include is None else fn(data, include)


def moments_012_cached(data, coords, dx, mask_expr=None, include=None,
                       use_pallas=False):
    """Dispatch moments through a jit cache keyed on (shape, dtype,
    coords, dx, mask structure) — repeated analyses of same-shaped cubes
    skip retracing entirely."""
    from ..masks import expr_key
    coords = np.asarray(coords, dtype=np.float64)
    key = (data.shape, str(data.dtype), coords.tobytes(), float(dx),
           expr_key(mask_expr), include is not None, bool(use_pallas))
    fn = _MOMENTS_JIT_CACHE.get(key)
    if fn is None:
        impl = moments_012_pallas if use_pallas else moments_012

        if include is None:
            if use_pallas:
                fn = jax.jit(lambda d: impl(d, coords, dx,
                                            mask_expr=mask_expr))
            else:
                def eval_inc(d):
                    inc = mask_expr._include(data=d) \
                        if mask_expr is not None else None
                    return moments_012(d, coords, dx, include=inc)
                fn = jax.jit(eval_inc)
        else:
            if use_pallas:
                fn = jax.jit(lambda d, i: impl(d, coords, dx,
                                               mask_expr=mask_expr,
                                               include=i))
            else:
                def eval_both(d, i):
                    inc = i
                    if mask_expr is not None:
                        inc = jnp.logical_and(inc,
                                              mask_expr._include(data=d))
                    return moments_012(d, coords, dx, include=inc)
                fn = jax.jit(eval_both)
        if len(_MOMENTS_JIT_CACHE) > 64:  # runaway-shape backstop
            _MOMENTS_JIT_CACHE.clear()
        _MOMENTS_JIT_CACHE[key] = fn
    return fn(data) if include is None else fn(data, include)


def moment_generic(data, coords, dx, order, axis=0, include=None):
    """General moment of arbitrary order along ``axis`` (reference
    ``_moments.py:170-193``): order 0 is the integral, order 1 the centroid,
    order N>=2 the central moment about the order-1 centroid."""
    coords = jnp.asarray(coords, dtype=jnp.result_type(data.dtype,
                                                       jnp.float32))
    if coords.ndim == 1:
        shape = [1] * data.ndim
        shape[axis] = -1
        x = coords.reshape(shape)
    else:
        # per-pixel coordinate plane (spatial axes with rotation/distortion:
        # reference _pix_cen, spectral_cube.py:1455-1508), broadcastable
        x = coords if coords.ndim == data.ndim else coords[None]
    valid = jnp.isfinite(data)
    if include is not None:
        valid = jnp.logical_and(valid, include)
    w = jnp.where(valid, data, 0) * dx
    cnt = jnp.sum(valid, axis=axis)
    s0 = jnp.sum(w, axis=axis)
    if order == 0:
        return jnp.where(cnt > 0, s0, jnp.nan)
    s1 = jnp.sum(w * x, axis=axis)
    mom1 = s1 / s0
    if order == 1:
        return jnp.where(cnt > 0, mom1, jnp.nan)
    m1b = jnp.expand_dims(mom1, axis)
    sN = jnp.sum(w * (x - m1b) ** order, axis=axis)
    return jnp.where(cnt > 0, sN / s0, jnp.nan)
