"""Whole-pipeline fusion kernel (ops/pipeline_fused + df32).

Oracles: float64 numpy for the moments math (the reference's
``_moments.py:170-193`` algorithm), the existing two-program chain
(moments_012_pallas + conv_reproject_raw_strips, both in interpret mode)
for parity, and numpy float64 for the df32 pair primitives.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spectral_cube_tpu.masks import LazyComparisonMask
from spectral_cube_tpu.ops.moments import moments_012_pallas
from spectral_cube_tpu.ops.pipeline_fused import moments_conv_reproject_fused
from spectral_cube_tpu.ops import df32


# ---------------------------------------------------------------- df32


def test_two_sum_exact():
    rng = np.random.RandomState(0)
    a = (rng.randn(512) * 10.0 ** rng.randint(-6, 6, 512)).astype(np.float32)
    b = (rng.randn(512) * 10.0 ** rng.randint(-6, 6, 512)).astype(np.float32)
    s, e = jax.jit(df32.two_sum)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    exp = a.astype(np.float64) + b.astype(np.float64)
    assert np.array_equal(got, exp)   # error-free: exact in f64


def test_two_prod_exact():
    rng = np.random.RandomState(1)
    a = rng.randn(512).astype(np.float32)
    b = rng.randn(512).astype(np.float32) * 1e3
    p, e = jax.jit(df32.two_prod)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    exp = a.astype(np.float64) * b.astype(np.float64)
    assert np.array_equal(got, exp)   # f32 products are exact in f64


def test_df_div_accuracy():
    rng = np.random.RandomState(2)
    x = rng.randn(256).astype(np.float32) * 100
    y = (rng.rand(256).astype(np.float32) + 0.5) * 40
    q = jax.jit(lambda a, b: df32.df_div(
        (a, jnp.zeros_like(a)), (b, jnp.zeros_like(b))))(
            jnp.asarray(x), jnp.asarray(y))
    got = np.asarray(q[0], np.float64) + np.asarray(q[1], np.float64)
    exp = x.astype(np.float64) / y.astype(np.float64)
    assert np.max(np.abs(got - exp) / np.abs(exp)) < 1e-13


def test_neumaier_accumulation_beats_plain_f32():
    # 4096 terms with alternating magnitudes: plain f32 drifts, the pair
    # stays at ~f64
    rng = np.random.RandomState(3)
    v = (rng.randn(4096) * 10.0 ** rng.randint(-3, 4, 4096)).astype(np.float32)

    def run(vals):
        h = jnp.float32(0)
        l = jnp.float32(0)
        for x in vals:
            h, l = df32.neumaier_add(h, l, jnp.float32(x))
        return h + l

    got = float(run(v))
    exp = float(np.sum(v.astype(np.float64)))
    scale = float(np.sum(np.abs(v.astype(np.float64))))
    assert abs(got - exp) / scale < 1e-9


# ------------------------------------------------- fused pipeline kernel


def _oracle_moments(data, coords, dx, thresh):
    """Reference cubewise algorithm in float64 (bench.py's oracle)."""
    d = data.astype(np.float64)
    valid = np.isfinite(d) & (d > thresh)
    w = np.where(valid, d, 0.0)
    x = coords.astype(np.float64)[:, None, None]
    s0 = w.sum(axis=0)
    cnt = valid.sum(axis=0)
    with np.errstate(all="ignore"):
        m1 = (w * x).sum(axis=0) / s0
        m2 = (w * (x - m1[None]) ** 2).sum(axis=0) / s0
        m0 = np.where(cnt > 0, s0 * dx, np.nan)
        m1 = np.where(cnt > 0, m1, np.nan)
        m2 = np.where(cnt > 0, m2, np.nan)
    return m0, m1, m2, valid


def _mk(nchan=32, ny=128, nx=128, seed=0, line_at=None, width=4.0,
        nan_channels=(), nan_spaxel=False):
    rng = np.random.RandomState(seed)
    v = np.arange(nchan, dtype=np.float64)
    c0 = nchan / 2.0 if line_at is None else float(line_at)
    line = np.exp(-0.5 * ((v - c0) / width) ** 2).astype(np.float32)
    data = (line[:, None, None] * (0.5 + rng.rand(1, ny, nx))
            + 0.05 * rng.randn(nchan, ny, nx)).astype(np.float32)
    for c in nan_channels:
        data[c, ny // 2, : nx // 4] = np.nan
    if nan_spaxel:
        data[:, 1, 5] = np.nan
    ys = np.broadcast_to(np.arange(ny, dtype=np.float64)[:, None] + 0.37,
                         (ny, nx)).copy()
    xs = np.broadcast_to(np.arange(nx, dtype=np.float64)[None, :] + 0.61,
                         (ny, nx)).copy()
    x1 = np.arange(9) - 4
    k = np.exp(-0.5 * np.add.outer(x1 ** 2, x1 ** 2) / 2.0)
    return data, v, ys, xs, k


def _run_fused(data, coords, ys, xs, k, thresh=0.25, **kw):
    mask = LazyComparisonMask(jnp.greater, thresh, shape=data.shape)
    return moments_conv_reproject_fused(
        jnp.asarray(data), k, ys, xs, coords, 1.0, mask_expr=mask,
        interpret=True, **kw)


@pytest.mark.parametrize("case", ["clean", "nan", "nan_spaxel"])
def test_fused_matches_float64_oracle(case):
    nan_channels = (3, 7) if case != "clean" else ()
    data, coords, ys, xs, k = _mk(nan_channels=nan_channels,
                                  nan_spaxel=(case == "nan_spaxel"))
    res = _run_fused(data, coords, ys, xs, k)
    assert res is not None
    out, m0, m1, m2, stats = res
    e0, e1, e2, valid = _oracle_moments(data, coords, 1.0, 0.25)
    for got, exp, tol in ((np.asarray(m0), e0, 1e-6),
                          (np.asarray(m1), e1, 1e-6),
                          (np.asarray(m2), e2, 1e-6)):
        assert np.array_equal(np.isnan(got), np.isnan(exp))
        ok = np.isfinite(exp)
        scale = np.nanmax(np.abs(exp))
        rel = np.abs(got - exp)[ok] / np.maximum(np.abs(exp)[ok],
                                                 1e-3 * scale)
        assert rel.max() < tol, rel.max()
    # statistics vs float64
    d = data.astype(np.float64)
    vals = d[np.asarray(valid)]
    assert np.isclose(float(stats["mean"]), vals.mean(), rtol=1e-6)
    assert np.isclose(float(stats["sigma"]), vals.std(ddof=1), rtol=1e-6)
    assert float(stats["min"]) == vals.min().astype(np.float32)
    assert float(stats["max"]) == vals.max().astype(np.float32)
    assert int(stats["npts"]) == vals.size


@pytest.mark.parametrize("case", ["clean", "nan"])
def test_fused_conv_bitwise_matches_unfused_kernel(case):
    from spectral_cube_tpu.ops.banded_pallas import conv_reproject_raw_strips
    from spectral_cube_tpu.ops.regrid import _conv_reproject_operators
    nan_channels = (2, 9) if case == "nan" else ()
    data, coords, ys, xs, k = _mk(nan_channels=nan_channels)
    res = _run_fused(data, coords, ys, xs, k)
    assert res is not None
    out = np.asarray(res[0])
    Gy, Gx, My, Mx, Ry, Rx, valid_np, _ = _conv_reproject_operators(
        data.shape, k, ys, xs, force=True)
    exp = np.asarray(conv_reproject_raw_strips(
        jnp.asarray(data), Gy, Gx, My, Mx, Ry, Rx, valid_np,
        interpret=True))
    # same dots in the same order -> bitwise equal
    assert np.array_equal(out, exp, equal_nan=True)


def test_fused_matches_two_pass_pallas_moments():
    data, coords, ys, xs, k = _mk(nan_channels=(4,))
    res = _run_fused(data, coords, ys, xs, k)
    assert res is not None
    _, m0, m1, m2, stats = res
    mask = LazyComparisonMask(jnp.greater, 0.25, shape=data.shape)
    em0, em1, em2, estats = moments_012_pallas(
        jnp.asarray(data), coords, 1.0, mask_expr=mask, interpret=True,
        with_stats=True)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(em0),
                               rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(em1),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(em2),
                               rtol=3e-6, atol=2e-5)
    for key in ("mean", "sigma", "min", "max", "sum", "npts"):
        np.testing.assert_allclose(np.asarray(stats[key]),
                                   np.asarray(estats[key]), rtol=3e-6)


def test_fused_mom2_narrow_line_far_from_center():
    """The one-pass killer case: a 1.2-channel-wide line at channel 5 of
    96 — raw f32 sums lose ~3 digits on mom2; the pair accumulation +
    pair finalization must stay at 1e-6."""
    data, coords, ys, xs, k = _mk(nchan=96, line_at=5.0, width=1.2,
                                  seed=7)
    # suppress the noise floor so the mask keeps only the line wings
    res = _run_fused(data, coords, ys, xs, k, thresh=0.3)
    assert res is not None
    _, m0, m1, m2, _ = res
    e0, e1, e2, _ = _oracle_moments(data, coords, 1.0, 0.3)
    ok = np.isfinite(e2)
    scale = np.nanmax(np.abs(e2))
    rel = np.abs(np.asarray(m2) - e2)[ok] \
        / np.maximum(np.abs(e2)[ok], 1e-3 * scale)
    assert rel.max() < 1e-6, rel.max()
    rel1 = np.abs(np.asarray(m1) - e1)[ok] / np.abs(e1)[ok]
    assert rel1.max() < 1e-6


@pytest.mark.parametrize("cb", [1, 2, 4])
def test_fused_cb_variants_identical_moments(cb):
    data, coords, ys, xs, k = _mk(nchan=24)
    res = _run_fused(data, coords, ys, xs, k, cb=cb)
    assert res is not None
    base = _run_fused(data, coords, ys, xs, k, cb=1)
    # conv path: same per-channel dots, but NOT bitwise across CB on
    # real TPU — Mosaic compiles the CB-unrolled dot loop with a
    # different X6 pass structure (observed in the round-5 real-chip
    # run; interpret mode IS bitwise).  NaN patterns must still agree
    # exactly; values to X6 rounding.
    a0, b0 = np.asarray(res[0]), np.asarray(base[0])
    assert np.array_equal(np.isnan(a0), np.isnan(b0))
    np.testing.assert_allclose(a0, b0, rtol=1e-5, atol=1e-6,
                               equal_nan=True)
    # moments: the block-two-pass accumulation centers each CB-channel
    # block at its own first-pass estimate, so different CBs agree to
    # pair precision (~1e-7), not bitwise (the pre-round-5 per-voxel
    # Dekker form was bitwise but cost ~70 VPU ops/voxel); real-TPU
    # reassociation adds the same X6-rounding class of wobble
    for a, b in zip(res[1:4], base[1:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, equal_nan=True)


def test_fused_gates_return_none():
    data, coords, ys, xs, k = _mk()
    # non-axis-aligned mapping
    ys2 = ys + np.linspace(0, 0.5, ys.shape[1])[None, :]
    assert _run_fused(data, coords, ys2, xs, k) is None
    # non-data-local mask
    inc = jnp.ones(data.shape, bool)
    from spectral_cube_tpu.masks import BooleanArrayMask
    res = moments_conv_reproject_fused(
        jnp.asarray(data), k, ys, xs, coords, 1.0,
        mask_expr=BooleanArrayMask(inc, shape=data.shape), interpret=True)
    assert res is None


def test_fused_all_masked_spaxel_nan_moments():
    data, coords, ys, xs, k = _mk()
    data[:, 0, 0] = -1.0   # below threshold everywhere -> cnt == 0
    res = _run_fused(data, coords, ys, xs, k)
    assert res is not None
    _, m0, m1, m2, _ = res
    assert np.isnan(np.asarray(m0)[0, 0])
    assert np.isnan(np.asarray(m1)[0, 0])
    assert np.isnan(np.asarray(m2)[0, 0])
