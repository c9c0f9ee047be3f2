"""Pallas TPU strip kernels for banded spectral/spatial operators.

The hot BASELINE workloads apply *banded* linear operators (composed
smooth+interp along the spectral axis; per-channel separable beam
convolution in the image plane).  Executed as dense matmuls they waste
most MXU FLOPs on structural zeros, and the per-channel path additionally
pays a full HBM round trip gathering per-channel (n, n) matrices.  The
kernels here keep only the nonzero band: each strip of ``m`` output rows
multiplies a static ``(m, K)`` block against the ``K`` input rows its band
touches, entirely in VMEM, and the NaN (normalized-convolution) machinery
runs per-block *inside* the kernel under ``pl.when`` — clean data pays
zero extra HBM passes and no ``lax.cond`` operand materialization.

Measured on v5e (fetch-synchronized chained timing,
benchmarks/probe_banded2.py): composed smooth+interp 512->256 channels of
a 256^2 plane: dense 0.72 ms -> strips 0.37 ms (540 GB/s); 64-group
per-channel separable convolve of a 256^3 cube: einsum-gather 0.846 ms ->
strips 0.43 ms (the workload is MXU-bound at f32 HIGHEST: ~0.29 ms floor).

Numerics match the dense paths they replace (same banded matrices, same
HIGHEST-precision dots, same 1e-6 normalized-convolution den floor):
reference parity anchors are spectral_cube/spectral_cube.py smoothing /
convolution entry points, via ops/interpolate.smooth_interp_cube and
ops/convolve.convolve_per_channel_separable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plan_strips", "strip_blocks", "banded_matmul_strips",
           "smooth_interp_strips", "smooth_interp_strips_3d",
           "per_channel_conv_strips", "per_channel_conv_strips_blocked",
           "per_channel_resample_strips", "per_channel_resample_raw_strips",
           "per_channel_shift_lerp", "per_channel_plain_strips",
           "conv_reproject_raw_strips", "pipeline_fused_raw_strips"]

# normalized-convolution denominator floor shared with every dense path
# (CLAUDE.md: f32 HIGHEST chains reconstruct an exact 0 only to ~1e-7)
_DEN_EPS = 1e-6

# leave headroom under the ~16 MB scoped-VMEM limit for Mosaic's own
# stack (a 48 MB request was observed to abort compilation outright)
_VMEM_BUDGET = 10 * 2 ** 20

# host-side prep cache (strip plans + cut blocks), keyed on the identity
# of the operator arrays.  plan_strips + strip_blocks are O(n^2) host
# scans (~1.3 s for the three operators of an 8192-channel smooth+interp,
# benchmarks/probe_planner_scale.py) and rebuild on every EAGER call;
# op-level caches (ops/interpolate._si_operator_cache) reuse the same
# array objects across calls, so identity — validated by weakref
# liveness so a recycled id() never aliases — is a sound key.
import weakref

_PREP_CACHE = {}


def _cached_prep(arrs, tag, builder):
    key = (tag,) + tuple(id(a) for a in arrs)
    ent = _PREP_CACHE.get(key)
    if ent is not None:
        refs, val = ent
        if all(r() is a for r, a in zip(refs, arrs)):
            return val
    val = builder()
    try:
        refs = tuple(weakref.ref(a) for a in arrs)
    except TypeError:
        return val
    if len(_PREP_CACHE) >= 64:
        dead = [k for k, (rs, _) in _PREP_CACHE.items()
                if any(r() is None for r in rs)]
        for k in dead:
            del _PREP_CACHE[k]
        if len(_PREP_CACHE) >= 64:
            _PREP_CACHE.clear()
    _PREP_CACHE[key] = (refs, val)
    return val


def _si_prep(M, Sm, Im):
    """plan_strips + strip_blocks for the smooth+interp operator triple;
    None when any operator doesn't fit the strip layout."""
    plans = [plan_strips(A != 0.0) for A in (M, Sm, Im)]
    if any(p is None for p in plans):
        return None
    cut = [strip_blocks(A, mK[0], mK[1])
           for A, mK in zip((M, Sm, Im), plans)]
    if any(c is None for c in cut):
        return None
    return plans, cut


def _backend_ok(interpret):
    """Real Mosaic lowering only exists on TPU; every public entry point
    returns None elsewhere (unless interpret=True for tests) so callers
    keep their dense fallbacks."""
    return interpret or jax.default_backend() == "tpu"


def _dot(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def plan_strips(profile, max_m=256):
    """Choose (m, K) so every m-row strip of the banded operator touches
    at most K input columns.  ``profile``: bool (nout, nin) nonzero map.
    MXU cost is ceil(nout/m)*m*K*S (the last strip pads to m rows), so K
    is minimized first, then m minimizes the padded row count
    ceil(nout/m)*m — ties broken by the largest m (fewer strips, fewer
    stores).  The padding matters: nout=256 with a 33-wide band fits
    m=96 (3 strips = 288 padded rows) AND m=64 (4 strips = 256 exact) at
    K=128 — the old largest-m-first choice spent 12.5% of the MXU on
    zero rows.  Returns (m, K) or None."""
    nout, nin = profile.shape
    # band edges via the nonzero COORDINATES, not per-row argmax: banded
    # operators have O(n*band) nonzeros, and the reversed-view argmax the
    # hi edge needs scans the full O(n^2) profile (measured ~55-70 ms at
    # 8192 channels vs <1 ms for the coordinate form; whole plan_strips
    # ~40 ms there, dominated by the (m, K) search —
    # benchmarks/probe_planner_scale.py).  Dense-ish profiles would blow
    # the index arrays up to O(n^2) memory, so they keep the argmax form.
    if np.count_nonzero(profile) <= 4_000_000:
        nz = np.flatnonzero(profile.ravel())
        rows = np.zeros(nout, bool)
        lo = np.zeros(nout, np.int64)
        hi = np.ones(nout, np.int64)
        if nz.size:
            r = nz // nin
            c = nz % nin
            rows[r] = True
            lo_f = np.full(nout, nin, np.int64)
            np.minimum.at(lo_f, r, c)
            hi_f = np.zeros(nout, np.int64)
            np.maximum.at(hi_f, r, c)
            lo = np.where(rows, lo_f, 0)
            hi = np.where(rows, hi_f + 1, 1)
    else:
        rows = np.any(profile, axis=1)
        lo = np.where(rows, profile.argmax(axis=1), 0)
        hi = np.where(rows,
                      nin - np.ascontiguousarray(
                          profile[:, ::-1]).argmax(axis=1), 1)
    for K in (128, 256, 512):
        if K > nin:
            break
        m_start = min(max_m, -(-nout // 8) * 8)
        best = None
        for m in range(m_start, 7, -8):
            ok = True
            for s in range(0, nout, m):
                e = min(s + m, nout)
                span = hi[s:e].max() - lo[s:e].min()
                if span > K:
                    ok = False
                    break
            if ok:
                padded = -(-nout // m) * m
                if best is None or padded < best[0]:
                    best = (padded, m)
                if padded == nout:
                    break   # no smaller m can beat an exact cover
        if best is not None:
            return best[1], K
    return None


def strip_blocks(mats, m, K):
    """Cut banded operators into strip blocks.

    ``mats``: (..., nout, nin) with shared band structure across leading
    dims (the per-strip input window must be common — starts are static).
    Returns (blocks (..., nb, m, K) float32, starts list[int]) or None if
    some strip's band exceeds K.
    """
    mats = np.asarray(mats, dtype=np.float32)
    lead, (nout, nin) = mats.shape[:-2], mats.shape[-2:]
    if nin < K:
        return None
    flat = mats.reshape((-1, nout, nin))
    nb = -(-nout // m)
    blocks = np.zeros((flat.shape[0], nb, m, K), np.float32)
    starts = []
    for i in range(nb):
        s0, e0 = i * m, min(i * m + m, nout)
        nz = np.nonzero(np.any(flat[:, s0:e0, :] != 0.0, axis=(0, 1)))[0]
        if nz.size == 0:
            starts.append(0)
            continue
        if nz[-1] + 1 - nz[0] > K:
            return None
        s = int(np.clip(nz[0], 0, nin - K))
        # sublane-align the window start when the band still fits K:
        # misaligned static slices of the VMEM input materialize as a
        # copy pass per strip (CLAUDE.md), aligned ones are free
        s_al = (s // 8) * 8
        if nz[-1] + 1 - s_al <= K:
            s = s_al
        starts.append(s)
        blocks[:, i, :e0 - s0, :] = flat[:, s0:e0, s:s + K]
    return blocks.reshape(lead + (nb, m, K)), starts


def _pick_xb(per_col_bytes, static_bytes, ncols):
    """Largest XB in {2048..128} dividing ncols that fits the budget."""
    xb = 2048
    while xb >= 128:
        if ncols % xb == 0 and per_col_bytes * xb + static_bytes \
                <= _VMEM_BUDGET:
            return xb
        xb //= 2
    return None


def banded_matmul_strips(M_host, flat, interpret=False):
    """``M_host @ flat`` via strip blocks in one Pallas pass.

    ``M_host``: host (nout, nin) banded float array; ``flat``: device
    (nin, S) float32.  Returns (nout, S) float32 or None if the operator
    or shapes don't fit the strip layout (caller falls back to dense).
    """
    if not _backend_ok(interpret):
        return None
    M = np.asarray(M_host, dtype=np.float32)
    nout, nin = M.shape
    S = flat.shape[1]
    if nout % 8 or nin % 8:
        return None
    plan = plan_strips(M != 0.0)
    if plan is None:
        return None
    m, K = plan
    sb = strip_blocks(M, m, K)
    if sb is None:
        return None
    blocks, starts = sb
    nb = blocks.shape[0]
    xb = _pick_xb((nin + nout) * 4, blocks.size * 4, S)
    if xb is None:
        return None

    def kernel(x_ref, b_ref, o_ref):
        X = x_ref[:]
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = _dot(b_ref[i], X[starts[i]:starts[i] + K, :])
            o_ref[i * m:hi] = part[:hi - i * m]

    fn = pl.pallas_call(
        kernel, grid=(S // xb,),
        in_specs=[pl.BlockSpec((nin, xb), lambda j: (0, j)),
                  pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, xb), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nout, S), jnp.float32),
        interpret=interpret)
    return fn(flat.astype(jnp.float32), jnp.asarray(blocks))


def smooth_interp_strips(flat, M_host, S_host, I_host, interpret=False):
    """Fused spectral smooth+interp with per-block NaN handling in VMEM.

    Clean spaxel blocks apply the composed operator M = I @ S as strip
    matmuls; blocks containing NaN run the exact two-stage chain
    (normalized smoothing with the 1e-6 den floor, then the interp
    operator with NaN poisoning) — the same semantics as
    ops/smoothing.convolve1d_nan + ops/interpolate._interp_by_matmul, but
    decided per (nin, XB) block inside the kernel instead of one global
    lax.cond, so all-finite cubes never pay the has-NaN prepass or the
    cond's operand materialization.

    ``flat``: (nin, S) float32 device; M (nout, nin), S (nin, nin),
    I (nout, nin) host banded operators.  Returns (nout, S) float32 or
    None when infeasible.
    """
    if not _backend_ok(interpret):
        return None
    M = np.asarray(M_host, np.float32)
    Sm = np.asarray(S_host, np.float32)
    Im = np.asarray(I_host, np.float32)
    nout, nin = M.shape
    S_cols = flat.shape[1]
    if nout % 8 or nin % 8:
        return None
    prep = _cached_prep((M, Sm, Im), "si", lambda: _si_prep(M, Sm, Im))
    if prep is None:
        return None
    plans, cut = prep
    (mb, mst), (sb, sst), (ib, ist) = cut
    (m_m, _), (m_s, _), (m_i, _) = plans
    nb_m, nb_s, nb_i = mb.shape[0], sb.shape[0], ib.shape[0]
    nbm_s = nb_s * m_s
    static = (mb.size + sb.size + ib.size) * 4
    # per column: in + out blocks (double-buffered), two smoothing
    # scratches, plus ~4 block-wide temporaries on Mosaic's value stack
    # (the first cut under-counted those and hit the 16 MB scoped-VMEM
    # ceiling at 24 MB on the 512-channel BASELINE shape)
    xb = _pick_xb((6 * nin + 2 * nout + 2 * nbm_s) * 4, static, S_cols)
    if xb is None:
        return None

    def kernel(x_ref, mb_ref, sb_ref, ib_ref, o_ref, tn_ref, td_ref):
        # the composed-operator strips run UNCONDITIONALLY (NaN inputs
        # produce garbage the dirty branch overwrites): keeping the hot
        # path out of pl.when lets Mosaic software-pipeline the MXU work
        # across grid steps (measured 0.635 -> 0.43 ms on the all-finite
        # 512-channel BASELINE config vs the both-branches-conditional
        # form)
        Km = mb_ref.shape[2]
        for i in range(nb_m):
            hi = min((i + 1) * m_m, nout)
            part = _dot(mb_ref[i], x_ref[mst[i]:mst[i] + Km, :])
            o_ref[i * m_m:hi] = part[:hi - i * m_m]
        v = jnp.isfinite(x_ref[:])

        @pl.when(jnp.logical_not(jnp.all(v)))
        def _():
            Ks = sb_ref.shape[2]
            for i in range(nb_s):
                sl = slice(sst[i], sst[i] + Ks)
                vs = v[sl]
                tn_ref[i * m_s:(i + 1) * m_s] = _dot(
                    sb_ref[i], jnp.where(vs, x_ref[sl], 0.0))
                td_ref[i * m_s:(i + 1) * m_s] = _dot(
                    sb_ref[i], 1.0 - vs.astype(jnp.float32))
            den = 1.0 - td_ref[:nin]
            ok = den > _DEN_EPS
            sm = jnp.where(ok, tn_ref[:nin] / jnp.where(ok, den, 1.0),
                           jnp.nan)
            # all-NaN spaxels stay NaN through the smooth
            sm = jnp.where(jnp.any(v, axis=0, keepdims=True), sm, jnp.nan)
            # reuse the scratches: tn <- filled smooth, td <- NaN flags
            tn_ref[:nin] = jnp.where(jnp.isnan(sm), 0.0, sm)
            td_ref[:nin] = jnp.isnan(sm).astype(jnp.float32)
            Ki = ib_ref.shape[2]
            for j in range(nb_i):
                hi = min((j + 1) * m_i, nout)
                orow = _dot(ib_ref[j], tn_ref[ist[j]:ist[j] + Ki, :])
                prow = _dot(ib_ref[j], td_ref[ist[j]:ist[j] + Ki, :]) > 0
                o_ref[j * m_i:hi] = jnp.where(prow, jnp.nan,
                                              orow)[:hi - j * m_i]

    fn = pl.pallas_call(
        kernel, grid=(S_cols // xb,),
        in_specs=[pl.BlockSpec((nin, xb), lambda j: (0, j)),
                  pl.BlockSpec(mb.shape, lambda j: (0, 0, 0)),
                  pl.BlockSpec(sb.shape, lambda j: (0, 0, 0)),
                  pl.BlockSpec(ib.shape, lambda j: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, xb), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nout, S_cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nbm_s, xb), jnp.float32),
                        pltpu.VMEM((nbm_s, xb), jnp.float32)],
        interpret=interpret)
    return fn(flat.astype(jnp.float32), jnp.asarray(mb), jnp.asarray(sb),
              jnp.asarray(ib))


def smooth_interp_strips_3d(data, M_host, S_host, I_host, interpret=False):
    """3-D-native fused smooth+interp: (nin, ny, nx) -> (nout, ny, nx).

    The flat kernel (:func:`smooth_interp_strips`) wants a (nin, ny*nx)
    operand, but on TPU that reshape is a *physical HBM relayout* — the
    (8, 128) tiling applies to the two minor dims, so collapsing (ny, nx)
    re-tiles every element.  Measured on the 512-channel BASELINE config:
    the relayout costs more than the kernel it feeds (0.609 ms end to end
    via the flat kernel vs 0.236 ms for this one).  Here a 2-D grid
    carves (nin, BY, 128) slabs straight out of the cube; with the block
    x-width pinned to one lane tile (BX=128) the VMEM collapse
    (BY, 128) -> (BY*128,) maps sublane y / lane x onto the flat layout
    exactly, so the reshape is a no-op view rather than a copy — measured
    0.236 ms (8x128 blocks) vs 0.330 ms (8x256, where each y row smears
    across two lane tiles and the collapse is a real sublane shuffle).

    NaN (normalized-convolution) semantics are identical to the flat
    kernel: slabs that contain NaN run the exact two-stage chain, one
    y-row at a time (each row is an aligned 128-lane column window of the
    flat view), so the chain scratches stay (strip_rows, 128) no matter
    how tall the slab is.  All-dirty cubes therefore pay BY sequential
    row passes per slab — slower than the flat kernel's dirty path, but
    the dirty path is not the hot one and never leaves VMEM.

    Returns (nout, ny, nx) float32 or None when infeasible (caller falls
    back to the flat kernel + reshape).
    """
    if not _backend_ok(interpret):
        return None
    if data.ndim != 3:
        return None
    nin, ny, nx = data.shape
    BX = 128
    if nx % BX:
        return None
    M = np.asarray(M_host, np.float32)
    Sm = np.asarray(S_host, np.float32)
    Im = np.asarray(I_host, np.float32)
    nout = M.shape[0]
    if nout % 8 or nin % 8:
        return None
    prep = _cached_prep((M, Sm, Im), "si", lambda: _si_prep(M, Sm, Im))
    if prep is None:
        return None
    plans, cut = prep
    (mb, mst), (sb, sst), (ib, ist) = cut
    (m_m, _), (m_s, _), (m_i, _) = plans
    nb_m, nb_s, nb_i = mb.shape[0], sb.shape[0], ib.shape[0]
    nbm_s = nb_s * m_s
    static = (mb.size + sb.size + ib.size) * 4
    # largest tile-aligned slab height that fits VMEM: double-buffered
    # in/out slabs + the whole-slab finite mask + ~1 slab temporary,
    # plus row-chain scratches and ~6 row-wide chain temporaries
    BY = None
    for by in (16, 8):
        if ny % by:
            continue
        need = (2 * (nin + nout) + 2 * nin) * by * BX * 4 \
            + (2 * nbm_s + 6 * nin) * BX * 4 + static
        if need <= 15 * 2 ** 20:
            BY = by
            break
    if BY is None:
        return None

    def kernel(x_ref, mb_ref, sb_ref, ib_ref, o_ref, tn_ref, td_ref):
        X = x_ref[:].reshape(nin, BY * BX)
        Km = mb_ref.shape[2]
        for i in range(nb_m):
            hi = min((i + 1) * m_m, nout)
            part = _dot(mb_ref[i], X[mst[i]:mst[i] + Km, :])
            o_ref[i * m_m:hi] = part[:hi - i * m_m].reshape(
                hi - i * m_m, BY, BX)
        v = jnp.isfinite(X)

        @pl.when(jnp.logical_not(jnp.all(v)))
        def _():
            Ks = sb_ref.shape[2]
            Ki = ib_ref.shape[2]
            for y in range(BY):
                cols = slice(y * BX, (y + 1) * BX)
                vy = v[:, cols]

                @pl.when(jnp.logical_not(jnp.all(vy)))
                def _():
                    Xy = X[:, cols]
                    for i in range(nb_s):
                        sl = slice(sst[i], sst[i] + Ks)
                        vs = vy[sl]
                        tn_ref[i * m_s:(i + 1) * m_s] = _dot(
                            sb_ref[i], jnp.where(vs, Xy[sl], 0.0))
                        td_ref[i * m_s:(i + 1) * m_s] = _dot(
                            sb_ref[i], 1.0 - vs.astype(jnp.float32))
                    den = 1.0 - td_ref[:nin]
                    ok = den > _DEN_EPS
                    sm = jnp.where(ok,
                                   tn_ref[:nin] / jnp.where(ok, den, 1.0),
                                   jnp.nan)
                    # all-NaN spaxels stay NaN through the smooth
                    sm = jnp.where(jnp.any(vy, axis=0, keepdims=True), sm,
                                   jnp.nan)
                    # reuse the scratches: tn <- filled smooth, td <- flags
                    tn_ref[:nin] = jnp.where(jnp.isnan(sm), 0.0, sm)
                    td_ref[:nin] = jnp.isnan(sm).astype(jnp.float32)
                    for j in range(nb_i):
                        hi = min((j + 1) * m_i, nout)
                        orow = _dot(ib_ref[j], tn_ref[ist[j]:ist[j] + Ki, :])
                        prow = _dot(ib_ref[j],
                                    td_ref[ist[j]:ist[j] + Ki, :]) > 0
                        o_ref[j * m_i:hi, y, :] = jnp.where(
                            prow, jnp.nan, orow)[:hi - j * m_i]

    fn = pl.pallas_call(
        kernel, grid=(ny // BY, nx // BX),
        in_specs=[pl.BlockSpec((nin, BY, BX), lambda j, k: (0, j, k)),
                  pl.BlockSpec(mb.shape, lambda j, k: (0, 0, 0)),
                  pl.BlockSpec(sb.shape, lambda j, k: (0, 0, 0)),
                  pl.BlockSpec(ib.shape, lambda j, k: (0, 0, 0))],
        out_specs=pl.BlockSpec((nout, BY, BX), lambda j, k: (0, j, k)),
        out_shape=jax.ShapeDtypeStruct((nout, ny, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nbm_s, BX), jnp.float32),
                        pltpu.VMEM((nbm_s, BX), jnp.float32)],
        interpret=interpret)
    return fn(jnp.asarray(data, jnp.float32), jnp.asarray(mb),
              jnp.asarray(sb), jnp.asarray(ib))


def per_channel_conv_strips(data, my, mx, group_idx, interpret=False,
                            dense_x=None):
    """Per-channel separable 2-D convolution with per-group banded
    operators, channels visited in group-sorted order.

    ``data``: (nchan, ny, nx) float32 (may contain NaN); ``my``/``mx``:
    host (ngroup, r, ny, ny)/(ngroup, r, nx, nx) banded matrices (rank-r
    SVD factors of each group's kernel); ``group_idx``: (nchan,) int.

    out[c] = sum_i My[g,i] @ X[c] @ Mx[g,i]^T with normalized-convolution
    NaN semantics evaluated per channel inside the kernel (``pl.when``):
    clean channels pay one strip pass; NaN channels run the denominator
    pass and the 1e-6-floor divide exactly like the dense einsum path in
    ops/convolve.convolve_per_channel_separable.

    The scalar-prefetch grid sorts channels by group, so consecutive grid
    steps with the same group *reuse* the resident kernel blocks (no
    per-channel HBM gather of (n, n) matrices — the einsum path's main
    cost).  The y pass runs banded strips; the x pass contracts against
    the full Mx^T in one MXU dot when it fits VMEM (``dense_x=None``
    auto; True/False force) — the strips-x scheme needs two VPU
    transposes per rank that cost more than the structural-zero flops
    saved.  Returns (nchan, ny, nx) float32 or None when infeasible.
    """
    if not _backend_ok(interpret):
        return None
    nchan, ny, nx = data.shape
    my = np.asarray(my, np.float32)
    mx = np.asarray(mx, np.float32)
    G, r = my.shape[:2]
    if ny % 8 or nx % 128:
        return None
    pp = _cached_prep((my, mx), "pair", lambda: _plan_pair(my, mx))
    if pp is None:
        return None
    (m_y, K_y), (m_x, K_x), (yb, ys), (xbl, xs) = pp
    nb_y, nb_x = yb.shape[2], xbl.shape[2]
    nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
    # x pass: strips+transposes by default.  The dense-x alternative
    # (one dot against the full Mx^T, no VPU transposes) LOSES here —
    # with the always-on normalized-convolution machinery it measured
    # 0.474/0.542 ms (clean/NaN) vs strips' 0.424/0.479 at robust rep
    # counts (benchmarks/probe_c3_variants4.py); round 4's CB=4 probe
    # settled conv_reproject_raw_strips on strips-x too (0.366 vs 0.469,
    # probe_c4_cb.py).  ``dense_x=True`` remains available for probes.
    need_dense = (2 * ny * nx + nbm_y * nx) * 4 \
        + yb.size * 4 // G + r * nx * nx * 4 + 4 * ny * nx * 4
    if dense_x is None:
        dense_x = False
    elif dense_x and need_dense > _VMEM_BUDGET:
        dense_x = False
    if dense_x:
        xarg = np.ascontiguousarray(
            np.transpose(mx, (0, 1, 3, 2)).astype(np.float32))
        xspec_shape = (1, r, nx, nx)
        scratches = [pltpu.VMEM((nbm_y, nx), jnp.float32)]
    else:
        # per-channel VMEM: in + out + t + u + w + group blocks + values
        need = (2 * ny * nx + nbm_y * nx + nx * ny + nbm_x * ny) * 4 \
            + (yb.size + xbl.size) * 4 // G + 4 * ny * nx * 4
        if need > _VMEM_BUDGET:
            return None
        xarg = xbl
        xspec_shape = (1, r, nb_x, m_x, K_x)
        scratches = [pltpu.VMEM((nbm_y, nx), jnp.float32),
                     pltpu.VMEM((nx, ny), jnp.float32),
                     pltpu.VMEM((nbm_x, ny), jnp.float32)]

    perm = np.argsort(np.asarray(group_idx), kind="stable").astype(np.int32)
    gsorted = np.asarray(group_idx)[perm].astype(np.int32)

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref,
               t_ref, *uw):
        X = x_ref[0]
        v = jnp.isfinite(X)

        def conv(Z):
            acc = None
            for i in range(r):
                for s in range(nb_y):
                    t_ref[s * m_y:(s + 1) * m_y] = _dot(
                        yb_ref[0, i, s], Z[ys[s]:ys[s] + K_y, :])
                if dense_x:
                    term = _dot(t_ref[:ny], xb_ref[0, i])
                else:
                    u_ref, w_ref = uw
                    u_ref[:] = t_ref[:ny].T
                    U = u_ref[:]
                    for s in range(nb_x):
                        w_ref[s * m_x:(s + 1) * m_x] = _dot(
                            xb_ref[0, i, s], U[xs[s]:xs[s] + K_x, :])
                    term = w_ref[:nx].T
                acc = term if acc is None else acc + term
            return acc

        o_ref[0] = conv(jnp.where(v, X, 0.0))

        @pl.when(jnp.logical_not(jnp.all(v)))
        def _():
            num = o_ref[0]
            den = 1.0 - conv(jnp.logical_not(v).astype(jnp.float32))
            ok = den > _DEN_EPS
            o = jnp.where(ok, num / jnp.where(ok, den, 1.0), jnp.nan)
            o_ref[0] = jnp.where(jnp.any(v), o, jnp.nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nchan,),
        in_specs=[
            pl.BlockSpec((1, ny, nx), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec(xspec_shape,
                         lambda c, p, g, _nz=len(xspec_shape) - 1:
                         (g[c],) + (0,) * _nz),
        ],
        out_specs=pl.BlockSpec((1, ny, nx), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=scratches)
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, ny, nx), jnp.float32),
        interpret=interpret)
    return fn(jnp.asarray(perm), jnp.asarray(gsorted),
              jnp.asarray(data, jnp.float32), jnp.asarray(yb),
              jnp.asarray(xarg))


def per_channel_conv_strips_blocked(data, my, mx, group_idx, cb=4,
                                    interpret=False):
    """Channel-blocked variant of :func:`per_channel_conv_strips` for
    CONTIGUOUS beam groups: when every aligned ``cb``-channel block has a
    uniform group (the common monotone-beam-drift VRSC case — real beams
    drift slowly, so same-group channels are consecutive), the grid runs
    nchan/cb steps of (cb, ny, nx) blocks, amortizing the per-grid-step
    pipeline overhead that costs the one-channel kernel ~0.035 ms of its
    0.438 ms on the 64-group 256^3 BASELINE config (bench.py config-3 gap
    attribution; 4-channel blocking measured 0.343 ms there).  Blocks are
    visited in group-sorted order for operator-block reuse.  NaN gating
    is block-level with exact per-channel semantics
    (conv_reproject_raw_strips' scheme): an all-clean block runs ``cb``
    convs with no branches; outputs are bitwise identical to the
    one-channel kernel.  Returns None when channels aren't
    aligned-contiguous by group, the operators don't fit the strip
    layout, or VMEM (callers fall back to the one-channel kernel)."""
    if not _backend_ok(interpret):
        return None
    nchan, ny, nx = data.shape
    cb = int(cb)
    gi = np.asarray(group_idx, dtype=np.int32)
    if cb < 2 or nchan % cb:
        return None
    gb = gi.reshape(-1, cb)
    if not np.all(gb == gb[:, :1]):
        return None         # interleaved groups: the permutation pass
    gb = gb[:, 0]           # per-block group
    my = np.asarray(my, np.float32)
    mx = np.asarray(mx, np.float32)
    G, r = my.shape[:2]
    if ny % 8 or nx % 128:
        return None
    pp = _cached_prep((my, mx), "pair",
                      lambda: _plan_pair(my, mx))
    if pp is None:
        return None
    (m_y, K_y), (m_x, K_x), (yb, ys), (xbl, xs) = pp
    nb_y, nb_x = yb.shape[2], xbl.shape[2]
    nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
    need = (2 * cb * 2 * ny * nx + nbm_y * nx + nx * ny + nbm_x * ny) * 4 \
        + (yb.size + xbl.size) * 8 // G + 4 * ny * nx * 4
    if need > _VMEM_BUDGET:
        return None
    pb = np.argsort(gb, kind="stable").astype(np.int32)
    gsorted = gb[pb]
    dims = ((m_y, K_y, nb_y, ny), (m_x, K_x, nb_x, nx))

    def kernel(pb_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref,
               t_ref, u_ref, w_ref):
        conv = _make_conv(r, dims, (ys, xs), t_ref, u_ref, w_ref)
        valids = [jnp.isfinite(x_ref[j]) for j in range(cb)]
        alls = [jnp.all(v) for v in valids]
        all_clean = alls[0]
        for a in alls[1:]:
            all_clean = jnp.logical_and(all_clean, a)

        @pl.when(all_clean)
        def _():
            for j in range(cb):
                o_ref[j] = conv(yb_ref, xb_ref, x_ref[j])

        @pl.when(jnp.logical_not(all_clean))
        def _():
            # exact per-channel semantics of per_channel_conv_strips
            for j in range(cb):
                v = valids[j]
                num = conv(yb_ref, xb_ref, jnp.where(v, x_ref[j], 0.0))
                o_ref[j] = num

                @pl.when(jnp.logical_not(alls[j]))
                def _(j=j, v=v, num=num):
                    den = 1.0 - conv(yb_ref, xb_ref,
                                     jnp.logical_not(v)
                                     .astype(jnp.float32))
                    ok = den > _DEN_EPS
                    o = jnp.where(ok, num / jnp.where(ok, den, 1.0),
                                  jnp.nan)
                    o_ref[j] = jnp.where(jnp.any(v), o, jnp.nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nchan // cb,),
        in_specs=[
            pl.BlockSpec((cb, ny, nx), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec((1, r, nb_x, m_x, K_x),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((cb, ny, nx), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((nbm_y, nx), jnp.float32),
                        pltpu.VMEM((nx, ny), jnp.float32),
                        pltpu.VMEM((nbm_x, ny), jnp.float32)])
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, ny, nx), jnp.float32),
        interpret=interpret)
    return fn(jnp.asarray(pb), jnp.asarray(gsorted),
              jnp.asarray(data, jnp.float32), jnp.asarray(yb),
              jnp.asarray(xbl))


def _mode_cb_choices(cb, dense_x):
    """(dense_x, CB) candidates by measured preference (strips-x at
    CB=4/2 before dense-x, probe_c4_cb.py); explicit cb/dense_x
    requests are honored EXACTLY — callers' for/else returns None on
    infeasibility, never a silent CB=1 fallback (the round-4 cb=8
    probe silently ran CB=1 through such a fallback and produced an
    unsubstantiated conclusion)."""
    if cb is not None:
        modes = [bool(dense_x)] if dense_x is not None else [False, True]
        return [(m, int(cb)) for m in modes]
    if dense_x is not None:
        return [(bool(dense_x), c) for c in (4, 2, 1)]
    return [(False, 4), (False, 2), (True, 4), (True, 2),
            (False, 1), (True, 1)]


def _plan_pair(my, mx, max_m=128):
    """Shared host-side prep for the per-channel kernels: strip plans and
    blocks for a (G, r, n_out, n_in) matrix pair.  Returns None when the
    operators don't fit the strip layout."""
    my = np.asarray(my, np.float32)
    mx = np.asarray(mx, np.float32)
    plan_y = plan_strips(np.any(my != 0.0, axis=(0, 1)), max_m=max_m)
    plan_x = plan_strips(np.any(mx != 0.0, axis=(0, 1)), max_m=max_m)
    if plan_y is None or plan_x is None:
        return None
    cy = strip_blocks(my, *plan_y)
    cx = strip_blocks(mx, *plan_x)
    if cy is None or cx is None:
        return None
    return plan_y, plan_x, cy, cx


def _rect_gates(ny_in, nx_in, ny_out, nx_out):
    return not (ny_in % 8 or ny_out % 8 or nx_in % 128 or nx_out % 128)


def _make_conv(r, dims, starts, t_ref, u_ref, w_ref):
    """Per-channel rank-r separable apply: sum_i My_i @ Z @ Mx_i^T using
    the three VMEM scratches (y strips -> transpose -> x strips ->
    transpose)."""
    (m_y, K_y, nb_y, ny_out), (m_x, K_x, nb_x, nx_out) = dims
    ys, xs = starts

    def conv(yb_ref, xb_ref, Z):
        acc = None
        for i in range(r):
            for s in range(nb_y):
                t_ref[s * m_y:(s + 1) * m_y] = _dot(
                    yb_ref[0, i, s], Z[ys[s]:ys[s] + K_y, :])
            u_ref[:] = t_ref[:ny_out].T
            U = u_ref[:]
            for s in range(nb_x):
                w_ref[s * m_x:(s + 1) * m_x] = _dot(
                    xb_ref[0, i, s], U[xs[s]:xs[s] + K_x, :])
            term = w_ref[:nx_out].T
            acc = term if acc is None else acc + term
        return acc

    return conv


def _make_conv_dx(r, dims_y, ys, t_ref):
    """Per-channel rank-r apply with a dense x contraction:
    sum_i My_i @ Z @ Mx_i^T as banded y strips into ``t_ref`` followed by
    one MXU dot against the full transposed x operator — no VPU
    transposes (benchmarks/probe_c3_variants2.py: the transposes cost
    more than the dense pass's structural-zero flops)."""
    m_y, K_y, nb_y, ny_out = dims_y

    def conv(yb_ref, xT_ref, Z):
        acc = None
        for i in range(r):
            for s in range(nb_y):
                t_ref[s * m_y:(s + 1) * m_y] = _dot(
                    yb_ref[0, i, s], Z[ys[s]:ys[s] + K_y, :])
            term = _dot(t_ref[:ny_out], xT_ref[0, i])
            acc = term if acc is None else acc + term
        return acc

    return conv


def _dense_xT(mx):
    """Host (G, r, n_out, n_in) x operator -> contiguous (G, r, n_in,
    n_out) transpose for the dense contraction."""
    mx = np.asarray(mx, np.float32)
    return np.ascontiguousarray(np.transpose(mx, (0, 1, 3, 2)))


def per_channel_resample_strips(fz, wz, my, mx, group_idx,
                                interpret=False, dense_x=None):
    """Per-channel rectangular resample with NaN-weight poisoning.

    ``fz``: (nchan, ny_in, nx_in) float32 NaN-FILLED data; ``wz``: same
    shape, the NaN-weight plane (e.g. a spectrally-lerped NaN mask);
    ``my``/``mx``: host (G, r, ny_out, ny_in)/(G, r, nx_out, nx_in)
    operators.  out = sum_i My@fz@Mx^T, NaN where |My|@wz@|Mx|^T > 1e-6 —
    the ops/regrid._separable_resample poisoning contract, evaluated per
    channel in VMEM.  Channels whose weight plane is all-zero (the common
    all-finite case) skip the weight convolution entirely.

    Returns (nchan, ny_out, nx_out) float32 or None when infeasible.
    """
    if not _backend_ok(interpret):
        return None
    nchan, ny_in, nx_in = fz.shape
    my = np.asarray(my, np.float32)
    mx = np.asarray(mx, np.float32)
    G, r, ny_out = my.shape[:3]
    nx_out = mx.shape[2]
    if not _rect_gates(ny_in, nx_in, ny_out, nx_out):
        return None
    pp = _cached_prep((my, mx), "pair",
                      lambda: _plan_pair(my, mx))
    if pp is None:
        return None
    (m_y, K_y), (m_x, K_x), (yb, ys), (xbl, xs) = pp
    nb_y, nb_x = yb.shape[2], xbl.shape[2]
    nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
    # dense x contraction (no VPU transposes) when the full transposed x
    # operator (+ its |.| twin for the poison pass) fits VMEM
    need_dx = (2 * ny_in * nx_in + ny_out * nx_out + nbm_y * nx_in
               + 3 * ny_out * nx_out) * 4 + yb.size * 8 // G \
        + 2 * r * nx_in * nx_out * 4
    # strips-x by default: with the unconditional resample conv the
    # dense-x variant measured 0.479/0.567 ms (clean/NaN) vs strips'
    # 0.426/0.519 at robust rep counts (benchmarks/probe_resample_dense
    # .py); dense_x=True remains available for probes
    if dense_x is None:
        dense_x = False
    elif dense_x and need_dx > _VMEM_BUDGET:
        dense_x = False
    if not dense_x:
        need = (2 * ny_in * nx_in + ny_out * nx_out + nbm_y * nx_in
                + nx_in * ny_out + nbm_x * ny_out
                + 3 * ny_out * nx_out) * 4 + (yb.size + xbl.size) * 8 // G
        if need > _VMEM_BUDGET:
            return None
    xarr = _dense_xT(mx) if dense_x else xbl
    # |T| blocks for the poison pass (bilinear taps are nonnegative, so
    # they often alias the data blocks — jnp dedups identical constants)
    ayb = np.abs(yb) if (yb < 0).any() else yb
    axarr = np.abs(xarr) if (xarr < 0).any() else xarr

    perm = np.argsort(np.asarray(group_idx), kind="stable").astype(np.int32)
    gsorted = np.asarray(group_idx)[perm].astype(np.int32)
    dims = ((m_y, K_y, nb_y, ny_out), (m_x, K_x, nb_x, nx_out))

    def kernel(perm_ref, gs_ref, f_ref, w_ref_in, yb_ref, xb_ref,
               ayb_ref, axb_ref, o_ref, t_ref, *uw):
        if dense_x:
            conv = _make_conv_dx(r, dims[0], ys, t_ref)
        else:
            conv = _make_conv(r, dims, (ys, xs), t_ref, *uw)
        o_ref[0] = conv(yb_ref, xb_ref, f_ref[0])

        @pl.when(jnp.any(w_ref_in[0] != 0.0))
        def _():
            wn = conv(ayb_ref, axb_ref, w_ref_in[0])
            o_ref[0] = jnp.where(wn > _DEN_EPS, jnp.nan, o_ref[0])

    xshape = (1, r, nx_in, nx_out) if dense_x else (1, r, nb_x, m_x, K_x)
    xnz = len(xshape) - 1
    scratches = [pltpu.VMEM((nbm_y, nx_in), jnp.float32)]
    if not dense_x:
        scratches += [pltpu.VMEM((nx_in, ny_out), jnp.float32),
                      pltpu.VMEM((nbm_x, ny_out), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nchan,),
        in_specs=[
            pl.BlockSpec((1, ny_in, nx_in), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, ny_in, nx_in), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec(xshape, lambda c, p, g: (g[c],) + (0,) * xnz),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec(xshape, lambda c, p, g: (g[c],) + (0,) * xnz),
        ],
        out_specs=pl.BlockSpec((1, ny_out, nx_out),
                               lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=scratches)
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, ny_out, nx_out),
                                       jnp.float32),
        interpret=interpret)
    return fn(jnp.asarray(perm), jnp.asarray(gsorted),
              jnp.asarray(fz, jnp.float32), jnp.asarray(wz, jnp.float32),
              jnp.asarray(yb), jnp.asarray(xarr), jnp.asarray(ayb),
              jnp.asarray(axarr))


def per_channel_resample_raw_strips(raw, my, mx, group_idx,
                                    valid_plane=None, zvalid=None,
                                    interpret=False, dense_x=None):
    """Per-channel rectangular resample straight from RAW NaN-carrying
    data: NaN detection, zero-filling, NaN-weight poisoning, and the
    out-of-range validity mask all run in VMEM, so the whole op moves
    exactly cube-in + cube-out over HBM.  The dense equivalent
    (ops/regrid._bilinear_spatial_then_linear_z with an identity spectral
    mapping) pays four extra full-cube passes: isnan + nan_to_num
    materialize before the resample matmuls and the validity ``where``
    re-reads the output (measured 2.29 -> 0.75 ms on the BASELINE
    reproject+Stokes config).

    out = sum_i My_i @ nan_to_num(Z) @ Mx_i^T per channel; NaN where
    |My| @ isnan(Z) @ |Mx|^T > 1e-6 (only for channels that contain NaN,
    under ``pl.when``), where ``valid_plane`` is 0, and where
    ``zvalid[channel]`` is 0.

    ``valid_plane``: optional (ny_out, nx_out) mask of in-range output
    pixels, loaded once (constant index_map) and reused across channels;
    ``zvalid``: optional (nchan,) per-channel in-range flags.
    Returns (nchan, ny_out, nx_out) float32 or None when infeasible.
    """
    if not _backend_ok(interpret):
        return None
    nchan, ny_in, nx_in = raw.shape
    my = np.asarray(my, np.float32)
    mx = np.asarray(mx, np.float32)
    G, r, ny_out = my.shape[:3]
    nx_out = mx.shape[2]
    if not _rect_gates(ny_in, nx_in, ny_out, nx_out):
        return None
    pp = _cached_prep((my, mx), "pair",
                      lambda: _plan_pair(my, mx))
    if pp is None:
        return None
    (m_y, K_y), (m_x, K_x), (yb, ys), (xbl, xs) = pp
    nb_y, nb_x = yb.shape[2], xbl.shape[2]
    nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
    # dense x contraction (no VPU transposes) when the full transposed x
    # operator (+ its |.| twin for the poison pass) fits VMEM
    need_dx = (2 * ny_in * nx_in + 2 * ny_out * nx_out + nbm_y * nx_in
               + 3 * ny_out * nx_out) * 4 + yb.size * 8 // G \
        + 2 * r * nx_in * nx_out * 4
    # strips-x by default: with the unconditional resample conv the
    # dense-x variant measured 0.479/0.567 ms (clean/NaN) vs strips'
    # 0.426/0.519 at robust rep counts (benchmarks/probe_resample_dense
    # .py); dense_x=True remains available for probes
    if dense_x is None:
        dense_x = False
    elif dense_x and need_dx > _VMEM_BUDGET:
        dense_x = False
    if not dense_x:
        need = (2 * ny_in * nx_in + 2 * ny_out * nx_out + nbm_y * nx_in
                + nx_in * ny_out + nbm_x * ny_out
                + 3 * ny_out * nx_out) * 4 + (yb.size + xbl.size) * 8 // G
        if need > _VMEM_BUDGET:
            return None
    xarr = _dense_xT(mx) if dense_x else xbl
    ayb = np.abs(yb) if (yb < 0).any() else yb
    axarr = np.abs(xarr) if (xarr < 0).any() else xarr
    if valid_plane is None:
        valid_plane = np.ones((ny_out, nx_out), np.float32)
    else:
        valid_plane = np.asarray(valid_plane, np.float32)
    if zvalid is None:
        zvalid = np.ones(nchan, np.int32)
    else:
        zvalid = np.asarray(zvalid).astype(np.int32)

    perm = np.argsort(np.asarray(group_idx), kind="stable").astype(np.int32)
    gsorted = np.asarray(group_idx)[perm].astype(np.int32)
    dims = ((m_y, K_y, nb_y, ny_out), (m_x, K_x, nb_x, nx_out))

    def kernel(perm_ref, gs_ref, zv_ref, f_ref, vp_ref, yb_ref, xb_ref,
               ayb_ref, axb_ref, o_ref, t_ref, *uw):
        c = pl.program_id(0)
        if dense_x:
            conv = _make_conv_dx(r, dims[0], ys, t_ref)
        else:
            conv = _make_conv(r, dims, (ys, xs), t_ref, *uw)
        Z = f_ref[0]
        bad = jnp.isnan(Z)
        # nan_to_num for exact parity with the dense path (inf clamps to
        # the finite max there too; only NaN poisons)
        o_ref[0] = conv(yb_ref, xb_ref, jnp.nan_to_num(Z))

        @pl.when(jnp.any(bad))
        def _():
            wn = conv(ayb_ref, axb_ref, bad.astype(jnp.float32))
            o_ref[0] = jnp.where(wn > _DEN_EPS, jnp.nan, o_ref[0])

        ok = jnp.logical_and(vp_ref[...] != 0.0, zv_ref[perm_ref[c]] != 0)
        o_ref[0] = jnp.where(ok, o_ref[0], jnp.nan)

    xshape = (1, r, nx_in, nx_out) if dense_x else (1, r, nb_x, m_x, K_x)
    xnz = len(xshape) - 1
    scratches = [pltpu.VMEM((nbm_y, nx_in), jnp.float32)]
    if not dense_x:
        scratches += [pltpu.VMEM((nx_in, ny_out), jnp.float32),
                      pltpu.VMEM((nbm_x, ny_out), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nchan,),
        in_specs=[
            pl.BlockSpec((1, ny_in, nx_in),
                         lambda c, p, g, z: (p[c], 0, 0)),
            pl.BlockSpec((ny_out, nx_out), lambda c, p, g, z: (0, 0)),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g, z: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec(xshape,
                         lambda c, p, g, z: (g[c],) + (0,) * xnz),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g, z: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec(xshape,
                         lambda c, p, g, z: (g[c],) + (0,) * xnz),
        ],
        out_specs=pl.BlockSpec((1, ny_out, nx_out),
                               lambda c, p, g, z: (p[c], 0, 0)),
        scratch_shapes=scratches)
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, ny_out, nx_out),
                                       jnp.float32),
        interpret=interpret)
    return fn(jnp.asarray(perm), jnp.asarray(gsorted), jnp.asarray(zvalid),
              jnp.asarray(raw, jnp.float32), jnp.asarray(valid_plane),
              jnp.asarray(yb), jnp.asarray(xarr), jnp.asarray(ayb),
              jnp.asarray(axarr))


def conv_reproject_raw_strips(raw, Gy, Gx, My, Mx, Ry, Rx, valid_plane,
                              interpret=False, cb=None, dense_x=None):
    """Fused convolve+reproject with the NaN branch per channel in VMEM.

    Clean channels apply the host-composed operator G = R @ M in one
    rank-r strip pair; channels containing NaN run the exact
    normalized-convolution chain (ops/convolve.convolve2d_separable
    semantics: num = K*filled, den = 1 - K*isnan — zero padding counts
    as valid — NaN where den <= 1e-6 or the channel is all-NaN) followed
    by the 2-tap resample with NaN-weight poisoning, all without leaving
    VMEM.  This replaces an ``lax.cond(has_nan, chain, fused)`` whose
    cube-sized operands materialize on every call plus a separate
    isfinite prepass and validity where — 4 extra HBM passes the kernel
    spends nowhere (ops/regrid.convolve_reproject_separable caller).

    ``Gy``/``Gx``/``My``/``Mx``: (1, r, n_out, n_in) hosts; ``Ry``/``Rx``:
    (1, 1, n_out, n_in) resample taps; ``valid_plane``: in-range output
    mask.  Returns (nchan, ny_out, nx_out) float32 or None.
    """
    if not _backend_ok(interpret):
        return None
    nchan, ny_in, nx_in = raw.shape
    Gy = np.asarray(Gy, np.float32)
    Gx = np.asarray(Gx, np.float32)
    My = np.asarray(My, np.float32)
    Mx = np.asarray(Mx, np.float32)
    Ry = np.asarray(Ry, np.float32)
    Rx = np.asarray(Rx, np.float32)
    r = Gy.shape[1]
    ny_out, nx_out = Gy.shape[2], Gx.shape[2]
    if not (_rect_gates(ny_in, nx_in, ny_out, nx_out)
            and ny_in % 8 == 0 and nx_in % 128 == 0):
        return None
    ppG = _plan_pair(Gy, Gx)
    ppM = _plan_pair(My, Mx)
    ppR = _plan_pair(Ry, Rx)
    if ppG is None or ppM is None or ppR is None:
        return None

    def unpack(pp, n_mid_out, n_x_out):
        (m_y, K_y), (m_x, K_x), (yb, ys), (xb, xs) = pp
        nb_y, nb_x = yb.shape[2], xb.shape[2]
        dims = ((m_y, K_y, nb_y, n_mid_out), (m_x, K_x, nb_x, n_x_out))
        return dims, (ys, xs), yb, xb, nb_y * m_y, nb_x * m_x

    dimsG, startsG, gyb, gxb, nbmG_y, nbmG_x = unpack(ppG, ny_out, nx_out)
    dimsM, startsM, myb, mxb, nbmM_y, nbmM_x = unpack(ppM, ny_in, nx_in)
    dimsR, startsR, ryb, rxb, nbmR_y, nbmR_x = unpack(ppR, ny_out, nx_out)

    # dense x contraction (no VPU transposes) when the three full
    # transposed x operators fit VMEM alongside the y-strip scratches
    gxT, mxT, rxT = _dense_xT(Gx), _dense_xT(Mx), _dense_xT(Rx)
    scr_dx = [
        pltpu.VMEM((nbmG_y, nx_in), jnp.float32),
        pltpu.VMEM((nbmM_y, nx_in), jnp.float32),
        pltpu.VMEM((nbmR_y, nx_in), jnp.float32),
        pltpu.VMEM((ny_in, nx_in), jnp.float32),
    ]
    scr_st = [
        # G trio
        pltpu.VMEM((nbmG_y, nx_in), jnp.float32),
        pltpu.VMEM((nx_in, ny_out), jnp.float32),
        pltpu.VMEM((nbmG_x, ny_out), jnp.float32),
        # M trio (square conv stage)
        pltpu.VMEM((nbmM_y, nx_in), jnp.float32),
        pltpu.VMEM((nx_in, ny_in), jnp.float32),
        pltpu.VMEM((nbmM_x, ny_in), jnp.float32),
        # R trio + the conv-stage plane scratch
        pltpu.VMEM((nbmR_y, nx_in), jnp.float32),
        pltpu.VMEM((nx_in, ny_out), jnp.float32),
        pltpu.VMEM((nbmR_x, ny_out), jnp.float32),
        pltpu.VMEM((ny_in, nx_in), jnp.float32),
    ]
    valid_plane = np.asarray(valid_plane, np.float32)

    def _fits(use_dense, c):
        scr_mode = scr_dx if use_dense else scr_st
        xops = (gxT.size + mxT.size + rxT.size) if use_dense \
            else (gxb.size + mxb.size + rxb.size)
        return (sum(int(np.prod(s.shape)) for s in scr_mode) * 4
                + (gyb.size + myb.size + ryb.size + xops) * 4
                + ny_out * nx_out * 4
                + 2 * c * (ny_in * nx_in + ny_out * nx_out) * 4
                <= _VMEM_BUDGET)

    # mode/CB selection, by measured preference (probe_c4_cb.py /
    # probe_conv_cb.py on v5e, clean 256^3): strips-x cb4 0.366 ms,
    # dense-x cb4 0.469, dense-x cb1 0.523 — at CB=4 the two VPU
    # transposes per rank cost LESS than the dense pass's
    # structural-zero flops (at CB=1 they had measured a wash, which is
    # why dense-x briefly shipped).  Block-level NaN gating is what
    # makes CB>1 viable at all: per-sub-channel pl.when branches
    # measured 0.579 ms (the 8 regions serialize the clean path); one
    # branchless clean region + a dirty region with the exact
    # per-channel semantics keeps outputs bitwise identical to CB=1.
    for dense_x, CB in _mode_cb_choices(cb, dense_x):
        if nchan % CB == 0 and _fits(dense_x, CB):
            break
    else:
        return None
    scr = scr_dx if dense_x else scr_st
    gxa, mxa, rxa = (gxT, mxT, rxT) if dense_x else (gxb, mxb, rxb)

    def kernel(x_ref, gy_ref, gx_ref, my_ref, mx_ref, ry_ref, rx_ref,
               vp_ref, o_ref, *scratch):
        if dense_x:
            tG, tM, tR, c_ref = scratch
            convG = _make_conv_dx(r, dimsG[0], startsG[0], tG)
            convM = _make_conv_dx(r, dimsM[0], startsM[0], tM)
            convR = _make_conv_dx(1, dimsR[0], startsR[0], tR)
        else:
            tG, uG, wG, tM, uM, wM, tR, uR, wR, c_ref = scratch
            convG = _make_conv(r, dimsG, startsG, tG, uG, wG)
            convM = _make_conv(r, dimsM, startsM, tM, uM, wM)
            convR = _make_conv(1, dimsR, startsR, tR, uR, wR)

        bads = [jnp.any(jnp.isnan(x_ref[j])) for j in range(CB)]
        any_bad = bads[0]
        for b in bads[1:]:
            any_bad = jnp.logical_or(any_bad, b)

        @pl.when(jnp.logical_not(any_bad))
        def _():
            for j in range(CB):
                o_ref[j] = convG(gy_ref, gx_ref, x_ref[j])

        @pl.when(any_bad)
        def _():
            for j in range(CB):
                Z = x_ref[j]
                bad = jnp.isnan(Z)

                @pl.when(jnp.logical_not(bads[j]))
                def _(j=j, Z=Z):
                    o_ref[j] = convG(gy_ref, gx_ref, Z)

                @pl.when(bads[j])
                def _(j=j, Z=Z, bad=bad):
                    badf = bad.astype(jnp.float32)
                    num = convM(my_ref, mx_ref, jnp.where(bad, 0.0, Z))
                    den = 1.0 - convM(my_ref, mx_ref, badf)
                    nanc = den <= _DEN_EPS
                    # all-NaN channel: the conv output is NaN everywhere
                    nanc = jnp.logical_or(nanc,
                                          jnp.logical_not(jnp.any(~bad)))
                    c_ref[...] = jnp.where(nanc, 0.0, num
                                           / jnp.where(nanc, 1.0, den))
                    out = convR(ry_ref, rx_ref, c_ref[...])
                    wn = convR(ry_ref, rx_ref, nanc.astype(jnp.float32))
                    o_ref[j] = jnp.where(wn > _DEN_EPS, jnp.nan, out)

        for j in range(CB):
            o_ref[j] = jnp.where(vp_ref[...] != 0.0, o_ref[j], jnp.nan)

    fn = pl.pallas_call(
        kernel, grid=(nchan // CB,),
        in_specs=[
            pl.BlockSpec((CB, ny_in, nx_in), lambda c: (c, 0, 0)),
            pl.BlockSpec(gyb.shape, lambda c: (0,) * gyb.ndim),
            pl.BlockSpec(gxa.shape, lambda c: (0,) * gxa.ndim),
            pl.BlockSpec(myb.shape, lambda c: (0,) * myb.ndim),
            pl.BlockSpec(mxa.shape, lambda c: (0,) * mxa.ndim),
            pl.BlockSpec(ryb.shape, lambda c: (0,) * ryb.ndim),
            pl.BlockSpec(rxa.shape, lambda c: (0,) * rxa.ndim),
            pl.BlockSpec((ny_out, nx_out), lambda c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((CB, ny_out, nx_out), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nchan, ny_out, nx_out),
                                       jnp.float32),
        scratch_shapes=scr,
        interpret=interpret)
    return fn(jnp.asarray(raw, jnp.float32), jnp.asarray(gyb),
              jnp.asarray(gxa), jnp.asarray(myb), jnp.asarray(mxa),
              jnp.asarray(ryb), jnp.asarray(rxa),
              jnp.asarray(valid_plane))


def pipeline_fused_raw_strips(raw, Gy, Gx, My, Mx, Ry, Rx, valid_plane,
                              coords_c, mask_fn=None, interpret=False,
                              dense_x=None, cb=None):
    """Whole-pipeline fusion: masked moments + statistics accumulate in
    VMEM *during* the fused convolve+reproject's read of the cube.

    The pipeline (BASELINE config #5 / pipeline.run_pipeline stages)
    otherwise runs two Pallas programs — moments+stats (one cube read)
    then convolve+reproject (read + write) — so the cube crosses HBM
    three times.  Here the conv kernel's grid already streams every
    channel block through VMEM; the moment sums ride that stream as
    revisited accumulator planes (constant output block index), cutting
    HBM traffic to two passes.  NOT the shipped config-5 path: on v5e
    even the round-5 block-two-pass accumulation (~3.5x fewer VPU
    ops/voxel than the original per-voxel Dekker form) measured
    0.98 ms fused vs 0.51 ms for the chain
    (benchmarks/probe_c5_fused_v2.py) — the cost is structural
    (moment-plane updates serialize against the conv MXU stream), see
    ops/pipeline_fused's module docstring for the full trade-off.  Channels are processed ``CB`` per grid
    step with the NaN normalized-convolution machinery gated at BLOCK
    level: an all-clean block runs the composed-G path with no
    per-channel branches, a block containing NaN falls to the exact
    per-channel semantics of ``conv_reproject_raw_strips`` (that gating
    scheme DID ship — conv_reproject_raw_strips uses it).

    One-pass moment numerics: the per-spaxel sums S0/S1/S2 (about the
    caller-centered ``coords_c``) and the raw data sums for statistics
    are accumulated as compensated float32 pairs with exact Dekker
    products (ops/df32) — sequential channel order forbids the two-pass
    centering moments_012_pallas uses, a plain f32 running sum would
    lose ~n*eps, and plain f32 PRODUCTS alone put ~1e-4 on mom2 for a
    narrow line far from the center; the pairs keep ~1e-14 so the
    caller's pair-space finalization (ops/pipeline_fused) reproduces the
    two-pass results inside 1e-6.  Reference math:
    ``/root/reference/spectral_cube/_moments.py:170-193`` (moments) and
    ``dask_spectral_cube.py:257-333`` (the dask pipeline graph this
    replaces).

    ``coords_c``: (nchan,) float, centered spectral coordinates;
    ``mask_fn``: optional block -> bool include predicate (data-local
    mask), evaluated in VMEM.  Other arguments as
    ``conv_reproject_raw_strips``.  Returns ``(out, planes)`` with
    ``planes = (s0h, s0l, s1h, s1l, s2h, s2l, qh, ql, cnt, mn, mx)``
    per-spaxel (ny_in, nx_in) float32 planes (q = sum of squared masked
    data), or None when infeasible.
    """
    from .df32 import two_sum, two_prod, df_div

    if not _backend_ok(interpret):
        return None
    nchan, ny_in, nx_in = raw.shape
    Gy = np.asarray(Gy, np.float32)
    Gx = np.asarray(Gx, np.float32)
    My = np.asarray(My, np.float32)
    Mx = np.asarray(Mx, np.float32)
    Ry = np.asarray(Ry, np.float32)
    Rx = np.asarray(Rx, np.float32)
    r = Gy.shape[1]
    ny_out, nx_out = Gy.shape[2], Gx.shape[2]
    if not (_rect_gates(ny_in, nx_in, ny_out, nx_out)
            and ny_in % 8 == 0 and nx_in % 128 == 0):
        return None
    ppG = _plan_pair(Gy, Gx)
    ppM = _plan_pair(My, Mx)
    ppR = _plan_pair(Ry, Rx)
    if ppG is None or ppM is None or ppR is None:
        return None

    def unpack(pp, n_mid_out, n_x_out):
        (m_y, K_y), (m_x, K_x), (yb, ys), (xb, xs) = pp
        nb_y, nb_x = yb.shape[2], xb.shape[2]
        dims = ((m_y, K_y, nb_y, n_mid_out), (m_x, K_x, nb_x, n_x_out))
        return dims, (ys, xs), yb, xb, nb_y * m_y, nb_x * m_x

    dimsG, startsG, gyb, gxb, nbmG_y, nbmG_x = unpack(ppG, ny_out, nx_out)
    dimsM, startsM, myb, mxb, nbmM_y, nbmM_x = unpack(ppM, ny_in, nx_in)
    dimsR, startsR, ryb, rxb, nbmR_y, nbmR_x = unpack(ppR, ny_out, nx_out)

    gxT, mxT, rxT = _dense_xT(Gx), _dense_xT(Mx), _dense_xT(Rx)
    scr_dx = [
        pltpu.VMEM((nbmG_y, nx_in), jnp.float32),
        pltpu.VMEM((nbmM_y, nx_in), jnp.float32),
        pltpu.VMEM((nbmR_y, nx_in), jnp.float32),
        pltpu.VMEM((ny_in, nx_in), jnp.float32),
    ]
    scr_st = [
        pltpu.VMEM((nbmG_y, nx_in), jnp.float32),
        pltpu.VMEM((nx_in, ny_out), jnp.float32),
        pltpu.VMEM((nbmG_x, ny_out), jnp.float32),
        pltpu.VMEM((nbmM_y, nx_in), jnp.float32),
        pltpu.VMEM((nx_in, ny_in), jnp.float32),
        pltpu.VMEM((nbmM_x, ny_in), jnp.float32),
        pltpu.VMEM((nbmR_y, nx_in), jnp.float32),
        pltpu.VMEM((nx_in, ny_out), jnp.float32),
        pltpu.VMEM((nbmR_x, ny_out), jnp.float32),
        pltpu.VMEM((ny_in, nx_in), jnp.float32),
    ]
    planes_bytes = 11 * ny_in * nx_in * 4

    def _fits(CB, use_dense):
        scr = scr_dx if use_dense else scr_st
        op_bytes = (gyb.size + myb.size + ryb.size) * 4 \
            + ((gxT.size + mxT.size + rxT.size) * 4 if use_dense
               else (gxb.size + mxb.size + rxb.size) * 4)
        blk = 2 * CB * (ny_in * nx_in + ny_out * nx_out) * 4
        tot = blk + planes_bytes + op_bytes + ny_out * nx_out * 4 \
            + sum(int(np.prod(s.shape)) for s in scr) * 4
        return tot <= _VMEM_BUDGET

    for dense_x, CB in _mode_cb_choices(cb, dense_x):
        if nchan % CB == 0 and _fits(CB, dense_x):
            break
    else:
        return None

    valid_plane = np.asarray(valid_plane, np.float32)
    gxa, mxa, rxa = (gxT, mxT, rxT) if dense_x else (gxb, mxb, rxb)
    nsteps = nchan // CB
    # full-array block (Mosaic requires blocks (8,128)-divisible or
    # equal to the array); per-channel scalars load via dynamic index
    xc = np.asarray(coords_c, np.float32).reshape(nchan, 1)

    def kernel(x_ref, xc_ref, gy_ref, gx_ref, my_ref, mx_ref, ry_ref,
               rx_ref, vp_ref, o_ref, s0h, s0l, s1h, s1l, s2h, s2l,
               qh, ql, cnt, mn, mxp, *scratch):
        c = pl.program_id(0)
        if dense_x:
            tG, tM, tR, c_ref = scratch
            convG = _make_conv_dx(r, dimsG[0], startsG[0], tG)
            convM = _make_conv_dx(r, dimsM[0], startsM[0], tM)
            convR = _make_conv_dx(1, dimsR[0], startsR[0], tR)
        else:
            tG, uG, wG, tM, uM, wM, tR, uR, wR, c_ref = scratch
            convG = _make_conv(r, dimsG, startsG, tG, uG, wG)
            convM = _make_conv(r, dimsM, startsM, tM, uM, wM)
            convR = _make_conv(1, dimsR, startsR, tR, uR, wR)

        @pl.when(c == 0)
        def _():
            for ref in (s0h, s0l, s1h, s1l, s2h, s2l, qh, ql, cnt):
                ref[...] = jnp.zeros_like(ref[...])
            mn[...] = jnp.full_like(mn[...], jnp.inf)
            mxp[...] = jnp.full_like(mxp[...], -jnp.inf)

        def _acc2(h, l, vh, vl):
            # add the exact pair (vh, vl) into the accumulator pair:
            # error-free two_sum on the high parts, low parts ride along
            # (their own rounding is second-order)
            s, e = two_sum(h[...], vh)
            l[...] = l[...] + (e + vl)
            h[...] = s

        # block-two-pass accumulation (the channel-chunked moments
        # scheme, ops/moments._moments_pallas_chunked): the block's own
        # two-pass sums run at ~2 extra VPU ops/voxel, and the EXACT
        # conversion into global-centered pairs (Dekker products on the
        # block sums) happens once per block at PLANE level — vs the
        # round-4 per-VOXEL two_prod form (~70 VPU ops/voxel), which is
        # what made the fused pipeline VPU-bound (1.05-1.12 ms) and kept
        # it off the shipped config-5 path.  Accuracy is the same pair
        # class: the adversarial narrow-line test still holds at ~1e-7.
        bads, ws, valids, ts = [], [], [], []
        s0_i = s1_i = cnt_i = None
        for j in range(CB):
            Z = x_ref[j]
            bads.append(jnp.any(jnp.isnan(Z)))
            fin = jnp.isfinite(Z)
            valid = fin if mask_fn is None \
                else jnp.logical_and(fin, mask_fn(Z))
            w = jnp.where(valid, Z, 0.0).astype(jnp.float32)
            t = xc_ref[c * CB + j, 0]
            ws.append(w)
            valids.append(valid)
            ts.append(t)
            vf = valid.astype(jnp.float32)
            s0_i = w if s0_i is None else s0_i + w
            s1_i = w * t if s1_i is None else s1_i + w * t
            cnt_i = vf if cnt_i is None else cnt_i + vf
            mn[...] = jnp.minimum(mn[...], jnp.where(valid, Z, jnp.inf))
            mxp[...] = jnp.maximum(mxp[...],
                                   jnp.where(valid, Z, -jnp.inf))
        safe = jnp.where(s0_i == 0, 1.0, s0_i)
        m1 = s1_i / safe
        cntf_i = jnp.maximum(cnt_i, 1.0)
        m_i = s0_i / cntf_i
        R1 = s2c = d2_i = None
        for j in range(CB):
            d = ts[j] - m1                      # plane op per channel
            wd = ws[j] * d
            R1 = wd if R1 is None else R1 + wd
            wdd = wd * d
            s2c = wdd if s2c is None else s2c + wdd
            dev = jnp.where(valids[j], ws[j] - m_i, 0.0)
            dd = dev * dev
            d2_i = dd if d2_i is None else d2_i + dd
        p1h, p1l = two_prod(s0_i, m1)
        t2h, t2l = two_prod(p1h, m1)
        zero = jnp.zeros_like(s0_i)
        _acc2(s0h, s0l, s0_i, zero)
        _acc2(s1h, s1l, p1h, p1l + R1)
        _acc2(s2h, s2l, t2h, t2l + p1l * m1 + 2.0 * m1 * R1)
        _acc2(s2h, s2l, s2c, zero)
        # Sum w^2 derived without a w*w pass: d2_i + s0_i^2/cnt_i, the
        # big division as a PAIR so Q keeps pair accuracy through
        # d2 = Q - S0^2/N
        sqh, sql = two_prod(s0_i, s0_i)
        dh, dl = df_div((sqh, sql), (cntf_i, zero))
        _acc2(qh, ql, d2_i, zero)
        _acc2(qh, ql, dh, dl)
        cnt[...] = cnt[...] + cnt_i

        any_bad = bads[0]
        for b in bads[1:]:
            any_bad = jnp.logical_or(any_bad, b)

        # all-clean block: composed-G path, no per-channel branches (the
        # common case; per-sub-channel pl.when was measured 0.579 vs
        # 0.479 ms at CB=4 — block-level gating keeps the clean path at
        # the probe kernel's cost)
        @pl.when(jnp.logical_not(any_bad))
        def _():
            for j in range(CB):
                o_ref[j] = convG(gy_ref, gx_ref, x_ref[j])

        @pl.when(any_bad)
        def _():
            # exact per-channel semantics of conv_reproject_raw_strips
            for j in range(CB):
                Z = x_ref[j]
                bad = jnp.isnan(Z)

                @pl.when(jnp.logical_not(bads[j]))
                def _(j=j, Z=Z):
                    o_ref[j] = convG(gy_ref, gx_ref, Z)

                @pl.when(bads[j])
                def _(j=j, Z=Z, bad=bad):
                    badf = bad.astype(jnp.float32)
                    num = convM(my_ref, mx_ref, jnp.where(bad, 0.0, Z))
                    den = 1.0 - convM(my_ref, mx_ref, badf)
                    nanc = den <= _DEN_EPS
                    nanc = jnp.logical_or(nanc,
                                          jnp.logical_not(jnp.any(~bad)))
                    c_ref[...] = jnp.where(nanc, 0.0, num
                                           / jnp.where(nanc, 1.0, den))
                    out = convR(ry_ref, rx_ref, c_ref[...])
                    wn = convR(ry_ref, rx_ref, nanc.astype(jnp.float32))
                    o_ref[j] = jnp.where(wn > _DEN_EPS, jnp.nan, out)

        for j in range(CB):
            o_ref[j] = jnp.where(vp_ref[...] != 0.0, o_ref[j], jnp.nan)

    plane = jax.ShapeDtypeStruct((ny_in, nx_in), jnp.float32)
    plane_spec = pl.BlockSpec((ny_in, nx_in), lambda c: (0, 0))
    fn = pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CB, ny_in, nx_in), lambda c: (c, 0, 0)),
            pl.BlockSpec((nchan, 1), lambda c: (0, 0)),
            pl.BlockSpec(gyb.shape, lambda c: (0,) * gyb.ndim),
            pl.BlockSpec(gxa.shape, lambda c: (0,) * gxa.ndim),
            pl.BlockSpec(myb.shape, lambda c: (0,) * myb.ndim),
            pl.BlockSpec(mxa.shape, lambda c: (0,) * mxa.ndim),
            pl.BlockSpec(ryb.shape, lambda c: (0,) * ryb.ndim),
            pl.BlockSpec(rxa.shape, lambda c: (0,) * rxa.ndim),
            pl.BlockSpec((ny_out, nx_out), lambda c: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((CB, ny_out, nx_out), lambda c: (c, 0, 0)),)
        + (plane_spec,) * 11,
        out_shape=(jax.ShapeDtypeStruct((nchan, ny_out, nx_out),
                                        jnp.float32),) + (plane,) * 11,
        scratch_shapes=scr_dx if dense_x else scr_st,
        interpret=interpret)
    res = fn(jnp.asarray(raw, jnp.float32), jnp.asarray(xc),
             jnp.asarray(gyb), jnp.asarray(gxa), jnp.asarray(myb),
             jnp.asarray(mxa), jnp.asarray(ryb), jnp.asarray(rxa),
             jnp.asarray(valid_plane))
    return res[0], tuple(res[1:])


def per_channel_shift_lerp(raw, sy, wy, sx, wx, valid_plane,
                           zvalid=None, interpret=False, cb=None):
    """Pure-translation bilinear resample as a VPU shift-lerp in VMEM.

    When the output grid is the input grid translated by a constant
    (sy + wy, sx + wx) — integer shifts ``sy``/``sx``, constant fractional
    weights ``wy``/``wx`` — the 2-tap resample needs no MXU at all:
    out = lerp_y(lerp_x(Z)) built from in-register rolls.  The strip
    matmuls spend ~K/2 of their FLOPs on structural zeros here, and an
    XLA slice+lerp materializes a copy pass per misaligned read
    (CLAUDE.md: measured 1.7x slower than even the tap matmul); the
    in-VMEM roll pays neither.  Rows/columns whose taps wrap around the
    roll are exactly the out-of-range ones — the caller's ``valid_plane``
    must mask them (asserted by ops/regrid gating: |frac| > 1e-3 or 0).

    NaN poisoning matches the 2-tap matmul contract: out is NaN where the
    lerp of isnan(Z) exceeds 1e-6, evaluated only for channels containing
    NaN (``pl.when``); ``zvalid`` masks whole channels.
    Returns (nchan, ny, nx) float32 or None when infeasible.
    """
    if not _backend_ok(interpret):
        return None
    nchan, ny, nx = raw.shape
    if ny % 8 or nx % 128:
        return None
    valid_plane = np.asarray(valid_plane, np.float32)
    if zvalid is None:
        zvalid = np.ones(nchan, np.int32)
    else:
        zvalid = np.asarray(zvalid).astype(np.int32)
    sy, sx = int(sy), int(sx)
    wy, wx = float(wy), float(wx)

    # channel blocking: same block-level NaN gating as
    # conv_reproject_raw_strips — fewer grid steps, bitwise-identical
    # per-channel results.  VMEM residency: double-buffered in+out
    # channel blocks (2*CB planes each) plus ONE copy of the valid plane
    # (constant index map => not double-buffered).  No operator blocks
    # and no scratches, so this kernel gets a 13 MB ceiling instead of
    # the shared 10 MB _VMEM_BUDGET — which also keeps CB=1 at least as
    # permissive as the pre-blocking gate (16*ny*nx <= 10 MB).
    def _fits_cb(c):
        return (2 * c * 2 * ny * nx + ny * nx) * 4 <= 13 * 2 ** 20
    if cb is None:
        CB = next((c for c in (4, 2, 1) if nchan % c == 0
                   and _fits_cb(c)), None)
    else:
        CB = cb if nchan % cb == 0 and _fits_cb(cb) else None
    if CB is None:
        return None

    def _roll(x, shift, axis):
        # out[i] = x[i + shift] == roll by -shift; pltpu.roll requires a
        # non-negative amount, so reduce modulo the axis length
        n = x.shape[axis]
        return x if shift % n == 0 else pltpu.roll(x, (-shift) % n, axis)

    def lerp2(Z):
        a = _roll(Z, sy, 0)
        t = a if wy == 0.0 else (1.0 - wy) * a + wy * _roll(Z, sy + 1, 0)
        b = _roll(t, sx, 1)
        return b if wx == 0.0 else (1.0 - wx) * b + wx * _roll(t, sx + 1, 1)

    def kernel(zv_ref, f_ref, vp_ref, o_ref):
        c = pl.program_id(0)
        bads = [jnp.any(jnp.isnan(f_ref[j])) for j in range(CB)]
        for j in range(CB):
            o_ref[j] = lerp2(jnp.nan_to_num(f_ref[j]))

        any_bad = bads[0]
        for b in bads[1:]:
            any_bad = jnp.logical_or(any_bad, b)

        @pl.when(any_bad)
        def _():
            for j in range(CB):
                @pl.when(bads[j])
                def _(j=j):
                    wn = lerp2(jnp.isnan(f_ref[j]).astype(jnp.float32))
                    o_ref[j] = jnp.where(wn > _DEN_EPS, jnp.nan, o_ref[j])

        for j in range(CB):
            ok = jnp.logical_and(vp_ref[...] != 0.0,
                                 zv_ref[c * CB + j] != 0)
            o_ref[j] = jnp.where(ok, o_ref[j], jnp.nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nchan // CB,),
        in_specs=[pl.BlockSpec((CB, ny, nx), lambda c, z: (c, 0, 0)),
                  pl.BlockSpec((ny, nx), lambda c, z: (0, 0))],
        out_specs=pl.BlockSpec((CB, ny, nx), lambda c, z: (c, 0, 0)))
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, ny, nx), jnp.float32),
        interpret=interpret)
    return fn(jnp.asarray(zvalid), jnp.asarray(raw, jnp.float32),
              jnp.asarray(valid_plane))


def per_channel_plain_strips(data, my, mx, group_idx, interpret=False,
                             dense_x=None):
    """Per-channel rectangular apply out = sum_i My@X@Mx^T with NO NaN
    machinery (callers guarantee finite input — e.g. the all-finite
    branch of the fused convolve+reproject operator).  Same layout and
    group-sorted block reuse as per_channel_resample_strips."""
    if not _backend_ok(interpret):
        return None
    nchan, ny_in, nx_in = data.shape
    my = np.asarray(my, np.float32)
    mx = np.asarray(mx, np.float32)
    G, r, ny_out = my.shape[:3]
    nx_out = mx.shape[2]
    if not _rect_gates(ny_in, nx_in, ny_out, nx_out):
        return None
    pp = _cached_prep((my, mx), "pair",
                      lambda: _plan_pair(my, mx))
    if pp is None:
        return None
    (m_y, K_y), (m_x, K_x), (yb, ys), (xbl, xs) = pp
    nb_y, nb_x = yb.shape[2], xbl.shape[2]
    nbm_y, nbm_x = nb_y * m_y, nb_x * m_x
    # dense x contraction (no VPU transposes) when the full transposed x
    # operator fits VMEM
    need_dx = (ny_in * nx_in + ny_out * nx_out + nbm_y * nx_in
               + 2 * ny_out * nx_out) * 4 + yb.size * 4 // G \
        + r * nx_in * nx_out * 4
    # strips-x by default (see per_channel_resample_strips)
    if dense_x is None:
        dense_x = False
    elif dense_x and need_dx > _VMEM_BUDGET:
        dense_x = False
    if not dense_x:
        need = (ny_in * nx_in + ny_out * nx_out + nbm_y * nx_in
                + nx_in * ny_out + nbm_x * ny_out
                + 2 * ny_out * nx_out) * 4 + (yb.size + xbl.size) * 4 // G
        if need > _VMEM_BUDGET:
            return None
    xarr = _dense_xT(mx) if dense_x else xbl
    perm = np.argsort(np.asarray(group_idx), kind="stable").astype(np.int32)
    gsorted = np.asarray(group_idx)[perm].astype(np.int32)
    dims = ((m_y, K_y, nb_y, ny_out), (m_x, K_x, nb_x, nx_out))

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref,
               t_ref, *uw):
        if dense_x:
            conv = _make_conv_dx(r, dims[0], ys, t_ref)
        else:
            conv = _make_conv(r, dims, (ys, xs), t_ref, *uw)
        o_ref[0] = conv(yb_ref, xb_ref, x_ref[0])

    xshape = (1, r, nx_in, nx_out) if dense_x else (1, r, nb_x, m_x, K_x)
    xnz = len(xshape) - 1
    scratches = [pltpu.VMEM((nbm_y, nx_in), jnp.float32)]
    if not dense_x:
        scratches += [pltpu.VMEM((nx_in, ny_out), jnp.float32),
                      pltpu.VMEM((nbm_x, ny_out), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nchan,),
        in_specs=[
            pl.BlockSpec((1, ny_in, nx_in), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, r, nb_y, m_y, K_y),
                         lambda c, p, g: (g[c], 0, 0, 0, 0)),
            pl.BlockSpec(xshape, lambda c, p, g: (g[c],) + (0,) * xnz),
        ],
        out_specs=pl.BlockSpec((1, ny_out, nx_out),
                               lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=scratches)
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, ny_out, nx_out),
                                       jnp.float32),
        interpret=interpret)
    return fn(jnp.asarray(perm), jnp.asarray(gsorted),
              jnp.asarray(data, jnp.float32), jnp.asarray(yb),
              jnp.asarray(xarr))


def strips_flops(nout, K, ncols, extra=0):
    """f32 MAC-pair FLOPs of one strip pass: ~ceil(nout/m)*m*K*ncols*2.
    Used by bench.py's roofline notes."""
    return 2 * nout * K * ncols * (1 + extra)
