"""Strip-blocked Pallas kernels (ops/banded_pallas.py) vs dense float64
oracles, run in interpret mode on the CPU mesh.

These kernels carry the BASELINE config-2/3 hot paths on TPU; the oracles
here are independent numpy float64 implementations of the same banded
operators (not self-roundtrips), including the normalized-convolution NaN
semantics (1e-6 den floor) pinned by CLAUDE.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spectral_cube_tpu.ops.banded_pallas import (
    plan_strips, strip_blocks, banded_matmul_strips, smooth_interp_strips,
    smooth_interp_strips_3d, per_channel_conv_strips)
from spectral_cube_tpu.ops.smoothing import _banded_conv_matrix
from spectral_cube_tpu.ops.interpolate import interp_weights, _interp_matrix
from spectral_cube_tpu.ops.convolve import separable_factors


def _gauss2d(sig_y, sig_x, theta=0.0, size=15):
    x = np.arange(size) - size // 2
    yy, xx = np.meshgrid(x, x, indexing="ij")
    yr = yy * np.cos(theta) + xx * np.sin(theta)
    xr = -yy * np.sin(theta) + xx * np.cos(theta)
    k = np.exp(-0.5 * ((yr / sig_y) ** 2 + (xr / sig_x) ** 2))
    return k / k.sum()


def test_plan_and_blocks_roundtrip():
    n = 256
    M = _banded_conv_matrix(n, np.ones(9) / 9.0)
    plan = plan_strips(M != 0.0)
    assert plan is not None
    m, K = plan
    assert K == 128 and m % 8 == 0
    blocks, starts = strip_blocks(M, m, K)
    # reassemble the dense operator from the strips and compare exactly
    dense = np.zeros_like(M)
    nb = blocks.shape[0]
    for i in range(nb):
        lo, hi = i * m, min((i + 1) * m, n)
        dense[lo:hi, starts[i]:starts[i] + K] = blocks[i, :hi - lo]
    np.testing.assert_array_equal(dense, M)


def test_plan_infeasible_small_axis():
    # nin < 128 can't host a K=128 strip window
    M = _banded_conv_matrix(64, np.ones(5) / 5.0)
    assert plan_strips(M != 0.0) is None or strip_blocks(M, 8, 128) is None
    assert banded_matmul_strips(M, jnp.zeros((64, 256)),
                                interpret=True) is None


def test_banded_matmul_strips_matches_dense():
    rng = np.random.RandomState(0)
    nin, nout, S = 256, 128, 384
    idx, frac = interp_weights(np.arange(nin, dtype=float),
                               np.arange(nout, dtype=float) * 2.0)
    M = (_interp_matrix(idx, frac, nin).astype(np.float64)
         @ _banded_conv_matrix(nin, np.ones(7) / 7.0).astype(np.float64))
    x = rng.randn(nin, S).astype(np.float32)
    got = jax.jit(lambda d: banded_matmul_strips(M.astype(np.float32), d,
                                                 interpret=True))(x)
    exp = M @ x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-6, atol=1e-6)


def _smooth_interp_oracle(data, kern, inaxis, outaxis):
    """Independent float64 chain: normalized banded smooth (1e-6 floor,
    all-NaN spaxels NaN) then 2-tap interp with NaN poisoning."""
    nin = data.shape[0]
    k = np.asarray(kern, np.float64)
    k = k / k.sum()
    S = _banded_conv_matrix(nin, k).astype(np.float64)
    v = np.isfinite(data)
    Xf = np.where(v, data, 0.0).astype(np.float64)
    num = S @ Xf
    den = 1.0 - S @ (~v).astype(np.float64)
    sm = np.where(den > 1e-6, num / np.where(den > 1e-6, den, 1.0), np.nan)
    sm = np.where(np.any(v, axis=0, keepdims=True), sm, np.nan)
    idx, frac = interp_weights(inaxis, outaxis)
    I = _interp_matrix(idx, frac, nin).astype(np.float64)
    smn = np.isnan(sm)
    out = I @ np.where(smn, 0.0, sm)
    out = np.where(I @ smn.astype(np.float64) > 0, np.nan, out)
    # flag outputs drawing on a small-den (nearly-all-NaN) smooth window:
    # there the f32 den error amplifies as 1/den and only a loose
    # comparison is meaningful (the dense production path conditions
    # identically)
    illcond = (I @ (den < 0.05).astype(np.float64)) > 0
    return out, illcond


@pytest.mark.parametrize("dirty", [False, True])
def test_smooth_interp_strips(dirty):
    rng = np.random.RandomState(1)
    nin = 256
    inaxis = np.arange(nin, dtype=np.float64)
    outaxis = inaxis[::2]
    kern = np.exp(-0.5 * ((np.arange(17) - 8) / 2.0) ** 2)
    kern = kern / kern.sum()
    S_cols = 256
    data = rng.randn(nin, S_cols).astype(np.float32)
    if dirty:
        data[40:60, 3] = np.nan        # NaN hole
        data[:, 7] = np.nan            # all-NaN spaxel
        data[0, 100] = np.nan          # edge NaN
    Sm = _banded_conv_matrix(nin, kern)
    idx, frac = interp_weights(inaxis, outaxis)
    Im = _interp_matrix(idx, frac, nin)
    M = (Im.astype(np.float64) @ Sm.astype(np.float64)).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda d: smooth_interp_strips(d, M, Sm, Im, interpret=True))(
            jnp.asarray(data)))
    exp, illcond = _smooth_interp_oracle(data, kern, inaxis, outaxis)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    ok = np.isfinite(exp) & ~illcond
    np.testing.assert_allclose(got[ok], exp[ok], rtol=3e-5, atol=1e-5)
    loose = np.isfinite(exp) & illcond
    if loose.any():
        np.testing.assert_allclose(got[loose], exp[loose], rtol=5e-3,
                                   atol=1e-3)


@pytest.mark.parametrize("dirty", [False, True])
def test_smooth_interp_strips_3d(dirty):
    """The 3-D-native kernel (BlockSpec slabs straight from the cube, NaN
    chain per y-row in VMEM) against the same independent float64 oracle
    as the flat kernel — including a slab where only SOME rows are dirty
    (the per-row pl.when gate) and an all-NaN spaxel."""
    rng = np.random.RandomState(5)
    nin, ny, nx = 256, 16, 128
    inaxis = np.arange(nin, dtype=np.float64)
    outaxis = inaxis[::2]
    kern = np.exp(-0.5 * ((np.arange(17) - 8) / 2.0) ** 2)
    kern = kern / kern.sum()
    data = rng.randn(nin, ny, nx).astype(np.float32)
    if dirty:
        data[40:60, 3, 5] = np.nan     # NaN hole, row 3 of slab 0
        data[:, 7, 9] = np.nan         # all-NaN spaxel, row 7 of slab 0
        data[0, 12, 100] = np.nan      # edge NaN in the second slab
    Sm = _banded_conv_matrix(nin, kern)
    idx, frac = interp_weights(inaxis, outaxis)
    Im = _interp_matrix(idx, frac, nin)
    M = (Im.astype(np.float64) @ Sm.astype(np.float64)).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda d: smooth_interp_strips_3d(d, M, Sm, Im, interpret=True))(
            jnp.asarray(data)))
    exp, illcond = _smooth_interp_oracle(
        data.reshape(nin, -1), kern, inaxis, outaxis)
    nout = M.shape[0]
    exp = exp.reshape(nout, ny, nx)
    illcond = illcond.reshape(nout, ny, nx)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    ok = np.isfinite(exp) & ~illcond
    np.testing.assert_allclose(got[ok], exp[ok], rtol=3e-5, atol=1e-5)


def test_smooth_interp_strips_3d_gates():
    """Infeasible layouts return None so callers keep the flat fallback:
    2-D input, ny not a slab multiple, nx not lane-aligned."""
    nin = 256
    inaxis = np.arange(nin, dtype=np.float64)
    kern = np.ones(5) / 5.0
    Sm = _banded_conv_matrix(nin, kern)
    idx, frac = interp_weights(inaxis, inaxis[::2])
    Im = _interp_matrix(idx, frac, nin)
    M = (Im.astype(np.float64) @ Sm.astype(np.float64)).astype(np.float32)
    assert smooth_interp_strips_3d(
        jnp.zeros((nin, 256)), M, Sm, Im, interpret=True) is None
    assert smooth_interp_strips_3d(
        jnp.zeros((nin, 12, 128)), M, Sm, Im, interpret=True) is None
    assert smooth_interp_strips_3d(
        jnp.zeros((nin, 16, 96)), M, Sm, Im, interpret=True) is None


def test_smooth_interp_strips_cancellation_blindspot():
    """A negative-tap user kernel can make the composed M = I @ S
    exactly 0 at columns the two-stage chain still consumes (0.5*a +
    0.5*(-a) cancels in the host composition).  The kernel's NaN
    detector scans the whole input block, so it stays complete here —
    this pins that invariant: any future detector that infers dirtiness
    from M's float nonzero pattern (e.g. by scanning only the strip
    windows' matmul outputs) must still renormalize around NaNs in
    cancelled columns, because the dirty chain consumes them via the
    smoothing denominator even where M[j, k] == 0."""
    rng = np.random.RandomState(3)
    nin = 256
    inaxis = np.arange(nin, dtype=np.float64)
    outaxis = inaxis[:248] + 0.5          # frac = 0.5 everywhere
    kern = np.array([1.0, -1.0, 1.0])     # adjacent taps cancel at 0.5
    Sm = _banded_conv_matrix(nin, kern / kern.sum())
    idx, frac = interp_weights(inaxis, outaxis)
    Im = _interp_matrix(idx, frac, nin)
    M = (Im.astype(np.float64) @ Sm.astype(np.float64)).astype(np.float32)
    pat = (np.abs(Im).astype(np.float64)
           @ np.abs(Sm).astype(np.float64)) > 0
    # the scenario is real: influence strictly exceeds M's float pattern
    assert (pat & (M == 0.0)).any()
    data = rng.randn(nin, 256).astype(np.float32)
    # NaNs in several spaxels, covering cancelled columns
    data[50, 0] = np.nan
    data[128:131, 5] = np.nan
    got = np.asarray(jax.jit(
        lambda d: smooth_interp_strips(d, M, Sm, Im, interpret=True))(
            jnp.asarray(data)))
    exp, illcond = _smooth_interp_oracle(data, kern, inaxis, outaxis)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    ok = np.isfinite(exp) & ~illcond
    np.testing.assert_allclose(got[ok], exp[ok], rtol=3e-5, atol=1e-5)


def _per_channel_oracle(data, kernels, group_idx):
    """float64 normalized separable convolution per channel."""
    nchan, ny, nx = data.shape
    out = np.empty_like(data, dtype=np.float64)
    for c in range(nchan):
        yt, xt = separable_factors(kernels[group_idx[c]])
        v = np.isfinite(data[c])
        Xf = np.where(v, data[c], 0.0).astype(np.float64)
        inv = (~v).astype(np.float64)
        num = np.zeros((ny, nx))
        den_c = np.zeros((ny, nx))
        for i in range(yt.shape[1]):
            My_i = _banded_conv_matrix(ny, yt[:, i]).astype(np.float64)
            Mx_i = _banded_conv_matrix(nx, xt[:, i]).astype(np.float64)
            num += My_i @ Xf @ Mx_i.T
            den_c += My_i @ inv @ Mx_i.T
        den = 1.0 - den_c
        o = np.where(den > 1e-6, num / np.where(den > 1e-6, den, 1.0),
                     np.nan)
        out[c] = np.where(v.any(), o, np.nan)
    return out


@pytest.mark.parametrize("dense_x", [True, False])
@pytest.mark.parametrize("dirty", [False, True])
def test_per_channel_conv_strips(dirty, dense_x):
    rng = np.random.RandomState(2)
    nchan, ny, nx = 6, 128, 128
    data = rng.randn(nchan, ny, nx).astype(np.float32)
    if dirty:
        data[1, 30:40, 50:60] = np.nan
        data[4] = np.nan               # all-NaN channel
    # rank-1 circular + rank>1 (5 and 7) rotated elliptical kernels
    kernels = [_gauss2d(2.0, 2.0), _gauss2d(3.0, 1.5, theta=0.15),
               _gauss2d(2.5, 1.8, theta=0.1)]
    group_idx = np.array([0, 1, 2, 1, 0, 2], np.int32)
    rmax = max(separable_factors(k)[0].shape[1] for k in kernels)
    my = np.zeros((3, rmax, ny, ny), np.float32)
    mx = np.zeros((3, rmax, nx, nx), np.float32)
    for g, k in enumerate(kernels):
        yt, xt = separable_factors(k)
        for i in range(yt.shape[1]):
            my[g, i] = _banded_conv_matrix(ny, yt[:, i])
            mx[g, i] = _banded_conv_matrix(nx, xt[:, i])
    got = np.asarray(jax.jit(
        lambda d: per_channel_conv_strips(d, my, mx, group_idx,
                                          interpret=True,
                                          dense_x=dense_x))(
            jnp.asarray(data)))
    exp = _per_channel_oracle(data, kernels, group_idx)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    ok = np.isfinite(exp)
    np.testing.assert_allclose(got[ok], exp[ok], rtol=3e-5, atol=1e-5)


def test_per_channel_conv_strips_gates():
    # nx not a lane multiple -> None (falls back to the einsum path)
    my = np.zeros((1, 1, 128, 128), np.float32)
    mx = np.zeros((1, 1, 120, 120), np.float32)
    my[0, 0] = np.eye(128, dtype=np.float32)
    mx[0, 0] = np.eye(120, dtype=np.float32)
    out = per_channel_conv_strips(np.zeros((2, 128, 120), np.float32),
                                  my, mx, np.zeros(2, np.int32),
                                  interpret=True)
    assert out is None


@pytest.mark.parametrize("dense_x", [True, False])
def test_per_channel_resample_strips_matches_dense(dense_x):
    from spectral_cube_tpu.ops.banded_pallas import (
        per_channel_resample_strips)
    from spectral_cube_tpu.ops.interpolate import _interp_matrix
    rng = np.random.RandomState(5)
    nz, ny_in, nx_in = 3, 136, 128
    ny_out, nx_out = 128, 128
    fz = rng.randn(nz, ny_in, nx_in).astype(np.float32)
    wz = np.zeros_like(fz)
    wz[1, 40, 40] = 1.0   # one poisoned sample in channel 1
    y0 = np.arange(ny_out, dtype=np.int64)
    wy = np.full(ny_out, 0.37)
    x0 = np.clip(np.arange(nx_out, dtype=np.int64), 0, nx_in - 2)
    wx = np.full(nx_out, 0.61)
    my = _interp_matrix(y0, wy, ny_in)
    mx = _interp_matrix(x0, wx, nx_in)
    got = np.asarray(jax.jit(lambda f, w: per_channel_resample_strips(
        f, w, my[None, None], mx[None, None], np.zeros(nz, np.int32),
        interpret=True, dense_x=dense_x))(jnp.asarray(fz),
                                          jnp.asarray(wz)))
    exp = np.einsum("ab,cbx,vx->cav", my.astype(np.float64),
                    fz.astype(np.float64), mx.astype(np.float64))
    wn = np.einsum("ab,cbx,vx->cav", my.astype(np.float64),
                   wz.astype(np.float64), mx.astype(np.float64))
    exp = np.where(wn > 1e-6, np.nan, exp)
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    fin = np.isfinite(exp)
    np.testing.assert_allclose(got[fin], exp[fin], rtol=3e-5, atol=1e-5)
    assert np.isnan(got[1]).any() and not np.isnan(got[0]).any()


@pytest.mark.parametrize("dense_x", [True, False])
def test_per_channel_plain_strips_matches_dense(dense_x):
    from spectral_cube_tpu.ops.banded_pallas import per_channel_plain_strips
    from spectral_cube_tpu.ops.interpolate import _interp_matrix
    from spectral_cube_tpu.ops.convolve import _conv_matrix_1d
    rng = np.random.RandomState(6)
    nz, n = 4, 128
    data = rng.randn(nz, n, n).astype(np.float32)
    # composed convolve+resample operator (rank 2)
    k1 = np.exp(-0.5 * ((np.arange(9) - 4) / 1.5) ** 2)
    k2 = np.exp(-0.5 * ((np.arange(9) - 4) / 2.5) ** 2)
    R = _interp_matrix(np.arange(n, dtype=np.int64).clip(0, n - 2),
                       np.full(n, 0.25), n).astype(np.float64)
    Gy = np.stack([(R @ _conv_matrix_1d(n, k).astype(np.float64))
                   .astype(np.float32) for k in (k1, k2)])[None]
    Gx = np.stack([(R @ _conv_matrix_1d(n, k).astype(np.float64))
                   .astype(np.float32) for k in (k2, k1)])[None]
    got = np.asarray(jax.jit(lambda d: per_channel_plain_strips(
        d, Gy, Gx, np.zeros(nz, np.int32), interpret=True,
        dense_x=dense_x))(jnp.asarray(data)))
    exp = sum(np.einsum("ab,cbx,vx->cav", Gy[0, i].astype(np.float64),
                        data.astype(np.float64),
                        Gx[0, i].astype(np.float64)) for i in range(2))
    np.testing.assert_allclose(got, exp, rtol=3e-5, atol=1e-5)


@pytest.mark.parametrize("dense_x", [True, False])
def test_per_channel_resample_raw_strips_matches_staged(dense_x):
    """Raw-input resample kernel == the staged dense path (isnan +
    nan_to_num + taps + validity where) on NaN-holed data, including a
    whole-NaN channel, an out-of-range validity plane, and zvalid flags."""
    from spectral_cube_tpu.ops.banded_pallas import (
        per_channel_resample_raw_strips)
    rng = np.random.RandomState(11)
    nchan, ny, nx = 4, 128, 128
    data = rng.randn(nchan, ny, nx).astype(np.float32)
    data[1, 3, 40] = np.nan
    data[3, :, :] = np.nan
    y0 = np.clip(np.arange(ny), 0, ny - 2)
    wy = np.full(ny, 0.37)
    x0 = np.clip(np.arange(nx), 0, nx - 2)
    wx = np.full(nx, 0.61)
    my = _interp_matrix(y0.astype(np.int64), wy, ny)
    mx = _interp_matrix(x0.astype(np.int64), wx, nx)
    valid = np.ones((ny, nx), bool)
    valid[-1, :] = False
    valid[:, -1] = False
    zvalid = np.array([1, 1, 0, 1], np.int32)

    out = np.asarray(per_channel_resample_raw_strips(
        data, my[None, None], mx[None, None], np.zeros(nchan, np.int32),
        valid_plane=valid, zvalid=zvalid, interpret=True,
        dense_x=dense_x))

    # staged float64 oracle
    filled = np.nan_to_num(data).astype(np.float64)
    badf = np.isnan(data).astype(np.float64)
    ref = np.einsum("ab,cbx,vx->cav", my.astype(np.float64), filled,
                    mx.astype(np.float64))
    wn = np.einsum("ab,cbx,vx->cav", my.astype(np.float64), badf,
                   mx.astype(np.float64))
    ref[wn > 1e-6] = np.nan
    ref[:, ~valid] = np.nan
    ref[zvalid == 0] = np.nan
    assert np.array_equal(np.isnan(out), np.isnan(ref))
    fin = ~np.isnan(ref)
    np.testing.assert_allclose(out[fin], ref[fin], atol=5e-6)


@pytest.mark.parametrize("ty,tx", [(0.37, 0.61), (-0.4, 2.25),
                                   (3.0, -1.0), (0.0, 0.0)])
def test_per_channel_shift_lerp_matches_staged(ty, tx):
    """VPU shift-lerp kernel == the staged dense bilinear path for pure
    translations, including NaN holes, an all-NaN channel, and the
    out-of-range edges (masked by the validity plane, so roll wrap never
    feeds a valid pixel)."""
    from spectral_cube_tpu.ops.banded_pallas import per_channel_shift_lerp
    from spectral_cube_tpu.ops.regrid import (_bilinear_spatial_then_linear_z,
                                              _translation_params)
    rng = np.random.RandomState(13)
    nchan, ny, nx = 3, 64, 128
    data = rng.randn(nchan, ny, nx).astype(np.float32)
    data[1, 30, 40] = np.nan
    data[2, :, :] = np.nan
    zs = np.arange(nchan, dtype=np.float64)
    ys = (np.arange(ny, dtype=np.float64)[:, None] + ty) * np.ones((1, nx))
    xs = (np.arange(nx, dtype=np.float64)[None, :] + tx) * np.ones((ny, 1))
    ref = np.asarray(_bilinear_spatial_then_linear_z(
        jnp.asarray(data), zs, ys, xs, 1))
    tr = _translation_params(ys, xs, ny, nx)
    assert tr is not None
    sy, wy, sx, wx = tr
    yvalid = np.isfinite(ys) & (ys >= -1e-3) & (ys <= ny - 1 + 1e-3)
    xvalid = np.isfinite(xs) & (xs >= -1e-3) & (xs <= nx - 1 + 1e-3)
    out = np.asarray(per_channel_shift_lerp(
        data, sy, wy, sx, wx, (yvalid & xvalid),
        np.ones(nchan, np.int32), interpret=True))
    assert np.array_equal(np.isnan(out), np.isnan(ref))
    fin = ~np.isnan(ref)
    if fin.any():
        np.testing.assert_allclose(out[fin], ref[fin], atol=5e-6)


def test_translation_params_gates():
    """Non-translations (rotation, scaling, shape change) return None."""
    from spectral_cube_tpu.ops.regrid import _translation_params
    ny, nx = 16, 16
    base_y = np.arange(ny, dtype=np.float64)[:, None] * np.ones((1, nx))
    base_x = np.arange(nx, dtype=np.float64)[None, :] * np.ones((ny, 1))
    assert _translation_params(base_y + 0.25, base_x - 1.5, ny, nx) \
        is not None
    # scaling
    assert _translation_params(base_y * 1.01, base_x, ny, nx) is None
    # rotation (y depends on column)
    rot = base_y + 0.01 * base_x
    assert _translation_params(rot, base_x, ny, nx) is None
    # shape mismatch
    assert _translation_params(base_y, base_x, ny + 8, nx) is None
    # NaN coordinates
    yn = base_y.copy()
    yn[0, 0] = np.nan
    assert _translation_params(yn, base_x, ny, nx) is None


@pytest.mark.parametrize("theta", [0.0, 0.2])
def test_conv_reproject_raw_strips_matches_chain(theta):
    """Fused conv+reproject kernel == the exact staged chain
    (convolve2d_separable then the staged bilinear resample), clean and
    NaN channels, isotropic (rank 1) and rotated (rank > 1) kernels."""
    from spectral_cube_tpu.ops.banded_pallas import conv_reproject_raw_strips
    from spectral_cube_tpu.ops.convolve import (_conv_matrix_1d,
                                                convolve2d_separable)
    from spectral_cube_tpu.ops.regrid import _bilinear_spatial_then_linear_z

    rng = np.random.RandomState(9)
    nchan, ny, nx = 4, 128, 128
    k = _gauss2d(3.0, 1.5, theta=theta, size=15)
    data = rng.randn(nchan, ny, nx).astype(np.float32)
    data[1, 60, 60] = np.nan
    data[2, :, :] = np.nan
    ys = np.broadcast_to(np.arange(ny, dtype=np.float64)[:, None] + 0.37,
                         (ny, nx)).copy()
    xs = np.broadcast_to(np.arange(nx, dtype=np.float64)[None, :] + 0.61,
                         (ny, nx)).copy()

    conv = convolve2d_separable(jnp.asarray(data), k)
    zs = np.arange(nchan, dtype=np.float64)
    ref = np.asarray(_bilinear_spatial_then_linear_z(conv, zs, ys, xs, 1))

    factors = separable_factors(k.astype(np.float64))
    ytaps, xtaps = factors
    r = ytaps.shape[1]
    ycl = np.clip(ys, 0, ny - 1)
    xcl = np.clip(xs, 0, nx - 1)
    y0 = np.clip(ycl.astype(np.int64), 0, ny - 2)
    x0 = np.clip(xcl.astype(np.int64), 0, nx - 2)
    Ry = _interp_matrix(y0[:, 0], (ycl - y0)[:, 0], ny).astype(np.float64)
    Rx = _interp_matrix(x0[0, :], (xcl - x0)[0, :], nx).astype(np.float64)
    Gy = np.stack([(Ry @ _conv_matrix_1d(ny, ytaps[:, i])
                    .astype(np.float64)).astype(np.float32)
                   for i in range(r)])[None]
    Gx = np.stack([(Rx @ _conv_matrix_1d(nx, xtaps[:, i])
                    .astype(np.float64)).astype(np.float32)
                   for i in range(r)])[None]
    My = np.stack([_conv_matrix_1d(ny, ytaps[:, i]).astype(np.float32)
                   for i in range(r)])[None]
    Mx = np.stack([_conv_matrix_1d(nx, xtaps[:, i]).astype(np.float32)
                   for i in range(r)])[None]
    yvalid = (ys >= -1e-3) & (ys <= ny - 1 + 1e-3)
    xvalid = (xs >= -1e-3) & (xs <= nx - 1 + 1e-3)
    out = conv_reproject_raw_strips(
        data, Gy, Gx, My, Mx, Ry.astype(np.float32)[None, None],
        Rx.astype(np.float32)[None, None], (yvalid & xvalid),
        interpret=True)
    out = np.asarray(out)
    assert np.array_equal(np.isnan(out), np.isnan(ref))
    fin = ~np.isnan(ref)
    np.testing.assert_allclose(out[fin], np.asarray(ref)[fin], atol=2e-5)


@pytest.mark.parametrize("cb", [2, 4])
def test_per_channel_shift_lerp_cb_bitwise(cb):
    """Channel blocking (block-level NaN gate) is bitwise-identical to
    CB=1, including NaN-holed and all-NaN channels and zvalid masking."""
    from spectral_cube_tpu.ops.banded_pallas import per_channel_shift_lerp
    rng = np.random.RandomState(5)
    nchan, ny, nx = 8, 64, 128
    data = rng.randn(nchan, ny, nx).astype(np.float32)
    data[1, 10, 20] = np.nan
    data[6, :, :] = np.nan
    valid = np.ones((ny, nx), bool)
    valid[-1, :] = False
    zvalid = np.ones(nchan, np.int32)
    zvalid[3] = 0
    base = np.asarray(per_channel_shift_lerp(
        data, 0, 0.37, 1, 0.61, valid, zvalid, interpret=True, cb=1))
    out = np.asarray(per_channel_shift_lerp(
        data, 0, 0.37, 1, 0.61, valid, zvalid, interpret=True, cb=cb))
    assert np.array_equal(out, base, equal_nan=True)


@pytest.mark.parametrize("dirty", [False, True])
def test_per_channel_conv_strips_blocked_bitwise(dirty):
    """Contiguous-group channel blocking is bitwise-identical to the
    one-channel kernel (incl. NaN-holed and all-NaN channels)."""
    from spectral_cube_tpu.ops.banded_pallas import (
        per_channel_conv_strips_blocked)
    rng = np.random.RandomState(9)
    nchan, ny, nx = 8, 128, 128
    data = rng.randn(nchan, ny, nx).astype(np.float32)
    if dirty:
        data[1, 30:40, 50:60] = np.nan
        data[4] = np.nan
    kernels = [_gauss2d(2.0, 2.0), _gauss2d(3.0, 1.5, theta=0.15)]
    group_idx = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)  # contiguous
    rmax = max(separable_factors(k)[0].shape[1] for k in kernels)
    my = np.zeros((2, rmax, ny, ny), np.float32)
    mx = np.zeros((2, rmax, nx, nx), np.float32)
    for g, k in enumerate(kernels):
        yt, xt = separable_factors(k)
        for i in range(yt.shape[1]):
            my[g, i] = _banded_conv_matrix(ny, yt[:, i])
            mx[g, i] = _banded_conv_matrix(nx, xt[:, i])
    base = np.asarray(jax.jit(
        lambda d: per_channel_conv_strips(d, my, mx, group_idx,
                                          interpret=True,
                                          dense_x=False))(
            jnp.asarray(data)))
    got = np.asarray(jax.jit(
        lambda d: per_channel_conv_strips_blocked(d, my, mx, group_idx,
                                                  interpret=True))(
            jnp.asarray(data)))
    assert np.array_equal(got, base, equal_nan=True)


def test_per_channel_conv_strips_blocked_gates():
    """Interleaved groups (no aligned runs) must return None."""
    from spectral_cube_tpu.ops.banded_pallas import (
        per_channel_conv_strips_blocked)
    my = np.zeros((2, 1, 128, 128), np.float32)
    mx = np.zeros((2, 1, 128, 128), np.float32)
    my[:, 0] = np.eye(128, dtype=np.float32)
    mx[:, 0] = np.eye(128, dtype=np.float32)
    out = per_channel_conv_strips_blocked(
        np.zeros((8, 128, 128), np.float32), my, mx,
        (np.arange(8) % 2).astype(np.int32), interpret=True)
    assert out is None
