"""TPU probes for banded-strip Pallas kernels (round-3 perf work).

Hypotheses under test (see VERDICT.md round 2, action item 1):
  - config 3 (per-channel separable convolve) is MXU-bound at X6
    precision, NOT HBM-bound: dense (256,256) band matmuls waste 2x
    FLOPs vs k=128 strip windows, and the per-channel gathered matrix
    batch wastes 134 MB/pass of HBM traffic.
  - a Pallas kernel with a group-sorted grid (scalar-prefetch channel
    permutation) re-fetches each group's matrices once, and strip dots
    (m=96, k=128) halve the MXU work.
  - a VPU stencil (native f32 FMAs over shifted windows) avoids the
    6-pass HIGHEST penalty entirely.

Run: python benchmarks/probe_banded.py [probe ...]
Probes: base p1 p2 p3 p4 p6 (default: all)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _measure
from spectral_cube_tpu import enable_compilation_cache
from spectral_cube_tpu.ops import convolve as cv
from spectral_cube_tpu.ops.smoothing import _banded_conv_matrix

enable_compilation_cache()

INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"

HIGH = jax.lax.Precision.HIGHEST


def dot_h(a, b, dims):
    # dims: ((lhs_contract,), (rhs_contract,))
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=HIGH)


# ---------------------------------------------------------------- workload
N = 256
NGROUPS = 64
rng = np.random.RandomState(2)
data_np = rng.rand(N, N, N).astype(np.float32)
kernels = []
for g in range(NGROUPS):
    sig = 2.0 + 0.05 * g
    x = np.arange(31) - 15
    k = np.exp(-0.5 * (np.add.outer(x ** 2, x ** 2)) / sig ** 2)
    kernels.append(k / k.sum())
group_idx = (np.arange(N) % NGROUPS).astype(np.int32)

# host band matrices per group (rank-1 factors)
my_g = np.zeros((NGROUPS, N, N), np.float32)
mx_g = np.zeros((NGROUPS, N, N), np.float32)
for g, k in enumerate(kernels):
    yt, xt = cv.separable_factors(k)
    assert yt.shape[1] == 1, yt.shape
    my_g[g] = _banded_conv_matrix(N, yt[:, 0])
    mx_g[g] = _banded_conv_matrix(N, xt[:, 0])

perm = np.argsort(group_idx, kind="stable").astype(np.int32)
gsorted = group_idx[perm].astype(np.int32)

data = jnp.asarray(data_np)


def report(name, per, ref=None, bytes_pass=None, flops=None):
    msg = f"{name}: {per*1e3:.3f} ms/pass"
    if bytes_pass:
        msg += f", {bytes_pass/per/1e9:.0f} GB/s"
    if flops:
        msg += f", {flops/per/1e12:.1f} TFLOP/s (nominal)"
    if ref is not None:
        msg += f"  [{ref/per:.2f}x vs base]"
    print(msg, flush=True)
    return per


def accuracy(name, got, exp):
    got = np.asarray(got)
    exp = np.asarray(exp)
    scale = np.abs(exp).max()
    rel = np.abs(got - exp).max() / scale
    print(f"{name}: max rel err {rel:.2e}", flush=True)
    return rel


# XLA dense HIGHEST oracle (per-channel gathered) — also the numerics ref
def oracle(d):
    myc = jnp.asarray(my_g)[jnp.asarray(group_idx)]
    mxc = jnp.asarray(mx_g)[jnp.asarray(group_idx)]
    t = jnp.einsum("cab,cbx->cax", myc, d, precision=HIGH)
    return jnp.einsum("cax,cvx->cav", t, mxc, precision=HIGH)


EXP = None


def get_exp():
    global EXP
    if EXP is None:
        EXP = np.asarray(jax.jit(oracle)(data))
    return EXP


# ------------------------------------------------------------------- base
def probe_base():
    def one(d):
        return cv.convolve_per_channel_separable(d, kernels, group_idx)
    per = _measure(one, (data,), reps=20)
    return report("base convolve_per_channel_separable", per,
                  bytes_pass=data_np.size * 4 * 2)


# -------------------------------------------------- p1: pallas dense sorted
def probe_p1():
    def kernel(perm_ref, gs_ref, x_ref, my_ref, mx_ref, o_ref):
        X = x_ref[0]
        t = dot_h(my_ref[0], X, ((1,), (0,)))
        o_ref[0] = dot_h(t, mx_ref[0], ((1,), (1,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, N, N), lambda c, p, g: (g[c], 0, 0)),
            pl.BlockSpec((1, N, N), lambda c, p, g: (g[c], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        interpret=INTERPRET,
    )

    def one(d, p, g, my, mx):
        return fn(p, g, d, my, mx)

    args = (data, jnp.asarray(perm), jnp.asarray(gsorted),
            jnp.asarray(my_g), jnp.asarray(mx_g))
    got = jax.jit(one)(*args)
    accuracy("p1 dense-sorted pallas", got, get_exp())
    per = _measure(one, args, reps=20)
    return report("p1 dense-sorted pallas", per,
                  bytes_pass=data_np.size * 4 * 2)


# ------------------------------------------- strip plan helpers (host side)
def strip_blocks_left(mats, m=96, K=128):
    """Per-group strip blocks for a LEFT banded multiply out = M @ X.

    Returns (blocks (G, nb, m, K) f32, starts list of ints)."""
    G, nout, nin = mats.shape
    nb = -(-nout // m)
    blocks = np.zeros((G, nb, m, K), np.float32)
    starts = []
    for i in range(nb):
        lo = i * m
        hi = min(lo + m, nout)
        nz = np.nonzero(np.any(mats[:, lo:hi, :] != 0, axis=(0, 1)))[0]
        want_lo = nz[0] if nz.size else 0
        want_hi = (nz[-1] + 1) if nz.size else 1
        assert want_hi - want_lo <= K, (want_hi - want_lo, K)
        s = int(np.clip(want_lo, 0, nin - K))
        starts.append(s)
        blocks[:, i, :hi - lo, :] = mats[:, lo:hi, s:s + K]
    return blocks, starts


def strip_blocks_right(mats, m=96, K=128):
    """Strip blocks for a RIGHT multiply out = T @ M^T, stored already
    transposed: block (K, m) so out[:, cols] = T[:, window] @ block."""
    G, nout, nin = mats.shape
    blocks, starts = strip_blocks_left(mats, m=m, K=K)
    return np.ascontiguousarray(blocks.transpose(0, 1, 3, 2)), starts


# --------------------------------- p2: pallas strips, x-pass n-padded dots
def probe_p2():
    m, K = 96, 128
    yb, ys = strip_blocks_left(my_g, m, K)     # (G, 3, 96, 128)
    xb, xs = strip_blocks_right(mx_g, m, K)    # (G, 3, 128, 96)
    nb = yb.shape[1]

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref, t_ref):
        X = x_ref[0]
        for i in range(nb):
            hi = min((i + 1) * m, N)
            part = dot_h(yb_ref[0, i], X[ys[i]:ys[i] + K, :], ((1,), (0,)))
            t_ref[i * m:hi] = part[:hi - i * m]
        T = t_ref[:]
        for j in range(nb):
            hi = min((j + 1) * m, N)
            part = dot_h(T[:, xs[j]:xs[j] + K], xb_ref[0, j], ((1,), (0,)))
            o_ref[0, :, j * m:hi] = part[:, :hi - j * m]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, nb, m, K), lambda c, p, g: (g[c], 0, 0, 0)),
            pl.BlockSpec((1, nb, K, m), lambda c, p, g: (g[c], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        interpret=INTERPRET,
    )

    def one(d, p, g, ybj, xbj):
        return fn(p, g, d, ybj, xbj)

    args = (data, jnp.asarray(perm), jnp.asarray(gsorted),
            jnp.asarray(yb), jnp.asarray(xb))
    got = jax.jit(one)(*args)
    accuracy("p2 strips npad", got, get_exp())
    per = _measure(one, args, reps=20)
    return report("p2 strips npad", per, bytes_pass=data_np.size * 4 * 2)


# ------------------------------ p3: pallas strips, x-pass via transposes
def probe_p3():
    m, K = 96, 128
    yb, ys = strip_blocks_left(my_g, m, K)
    xbl, xsl = strip_blocks_left(mx_g, m, K)   # x-pass as left mult on T^T
    nb = yb.shape[1]

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref, t_ref, u_ref):
        X = x_ref[0]
        for i in range(nb):
            hi = min((i + 1) * m, N)
            part = dot_h(yb_ref[0, i], X[ys[i]:ys[i] + K, :], ((1,), (0,)))
            t_ref[i * m:hi] = part[:hi - i * m]
        u_ref[:] = t_ref[:].T
        U = u_ref[:]
        for j in range(nb):
            hi = min((j + 1) * m, N)
            part = dot_h(xb_ref[0, j], U[xsl[j]:xsl[j] + K, :],
                         ((1,), (0,)))
            t_ref[j * m:hi] = part[:hi - j * m]
        o_ref[0] = t_ref[:].T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, nb, m, K), lambda c, p, g: (g[c], 0, 0, 0)),
            pl.BlockSpec((1, nb, m, K), lambda c, p, g: (g[c], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32),
                        pltpu.VMEM((N, N), jnp.float32)],
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        interpret=INTERPRET,
    )

    def one(d, p, g, ybj, xbj):
        return fn(p, g, d, ybj, xbj)

    args = (data, jnp.asarray(perm), jnp.asarray(gsorted),
            jnp.asarray(yb), jnp.asarray(xbl))
    got = jax.jit(one)(*args)
    accuracy("p3 strips transpose", got, get_exp())
    per = _measure(one, args, reps=20)
    return report("p3 strips transpose", per, bytes_pass=data_np.size * 4 * 2)


# --------------------------------------------- p4: pallas VPU stencil
def probe_p4():
    taps_y = np.zeros((NGROUPS, 31), np.float32)
    taps_x = np.zeros((NGROUPS, 31), np.float32)
    for g, k in enumerate(kernels):
        yt, xt = cv.separable_factors(k)
        # _banded_conv_matrix flips the kernel; symmetric here so direct
        taps_y[g] = yt[:, 0].astype(np.float32)
        taps_x[g] = xt[:, 0].astype(np.float32)
    H = 15  # half width
    NP = N + 2 * H + 2   # padded rows: 288 (multiple of 8)

    def kernel(perm_ref, gs_ref, x_ref, ty_ref, tx_ref, o_ref, pad_ref,
               acc_ref):
        X = x_ref[0]
        pad_ref[:] = jnp.zeros((NP, N), jnp.float32)
        pad_ref[H:H + N] = X
        acc = jnp.zeros((N, N), jnp.float32)
        for t in range(31):
            acc = acc + ty_ref[0, t] * pad_ref[t:t + N, :]
        # x pass via transpose
        pad_ref[:] = jnp.zeros((NP, N), jnp.float32)
        pad_ref[H:H + N] = acc.T
        acc2 = jnp.zeros((N, N), jnp.float32)
        for t in range(31):
            acc2 = acc2 + tx_ref[0, t] * pad_ref[t:t + N, :]
        o_ref[0] = acc2.T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, 31), lambda c, p, g: (g[c], 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 31), lambda c, p, g: (g[c], 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((NP, N), jnp.float32),
                        pltpu.VMEM((N, N), jnp.float32)],
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        interpret=INTERPRET,
    )

    def one(d, p, g, ty, tx):
        return fn(p, g, d, ty, tx)

    args = (data, jnp.asarray(perm), jnp.asarray(gsorted),
            jnp.asarray(taps_y), jnp.asarray(taps_x))
    got = jax.jit(one)(*args)
    accuracy("p4 vpu stencil", got, get_exp())
    per = _measure(one, args, reps=20)
    return report("p4 vpu stencil", per, bytes_pass=data_np.size * 4 * 2)


# ------------------------- p6: config-2 shaped banded axis-0 strip matmul
def probe_p6():
    from spectral_cube_tpu.ops import smoothing as sm
    from spectral_cube_tpu.ops.interpolate import (_interp_matrix,
                                                   interp_weights,
                                                   smooth_interp_cube)
    nchan, ny, nx = 512, 256, 256
    rng2 = np.random.RandomState(1)
    d2 = rng2.rand(nchan, ny, nx).astype(np.float32)
    coords = np.arange(nchan, dtype=np.float64)
    outaxis = coords[::2]
    kern = sm.gaussian_kernel1d(2.0)
    idx, frac = interp_weights(coords, outaxis)
    S = _banded_conv_matrix(nchan, kern / kern.sum()).astype(np.float64)
    Imat = _interp_matrix(idx, frac, nchan).astype(np.float64)
    M_host = (Imat @ S).astype(np.float32)   # (256, 512), band ~17 wide
    nout = M_host.shape[0]

    dj = jnp.asarray(d2)

    # current fused path for comparison
    def cur(d):
        return smooth_interp_cube(d, kern, coords, outaxis)[0]
    per0 = _measure(cur, (dj,), reps=20)
    report("p6 base smooth_interp (cond+dense)", per0,
           bytes_pass=d2.size * 4 * 1.5)

    # plain dense matmul without the NaN cond (isolates cond+check cost)
    Mj = jnp.asarray(M_host)

    def dense(d):
        flat = d.reshape(nchan, ny * nx)
        return dot_h(Mj, flat, ((1,), (0,)))
    per1 = _measure(dense, (dj,), reps=20)
    report("p6 dense matmul only", per1, ref=per0,
           bytes_pass=d2.size * 4 * 1.5)

    # pallas strip kernel: grid over x blocks, whole channel axis in VMEM
    m, K = 48, 128
    blocks, starts = strip_blocks_left(M_host[None], m, K)
    blocks = blocks[0]              # (nb, m, K)
    nb = blocks.shape[0]
    S_TOT = ny * nx
    XB = 512

    def kernel(x_ref, b_ref, o_ref):
        X = x_ref[:]
        for i in range(nb):
            hi = min((i + 1) * m, nout)
            part = dot_h(b_ref[i], X[starts[i]:starts[i] + K, :],
                         ((1,), (0,)))
            o_ref[i * m:hi] = part[:hi - i * m]

    fnp = pl.pallas_call(
        kernel,
        grid=(S_TOT // XB,),
        in_specs=[
            pl.BlockSpec((nchan, XB), lambda j: (0, j)),
            pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nout, XB), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nout, S_TOT), jnp.float32),
        interpret=INTERPRET,
    )

    def strips(d, b):
        return fnp(d.reshape(nchan, S_TOT), b)

    args = (dj, jnp.asarray(blocks))
    got = jax.jit(strips)(*args)
    exp = np.asarray(jax.jit(dense)(dj))
    accuracy("p6 pallas strips", got, exp)
    per2 = _measure(strips, args, reps=20)
    report("p6 pallas strips", per2, ref=per0, bytes_pass=d2.size * 4 * 1.5)


PROBES = {"base": probe_base, "p1": probe_p1, "p2": probe_p2,
          "p3": probe_p3, "p4": probe_p4, "p6": probe_p6}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for nm in names:
        t0 = time.time()
        try:
            PROBES[nm]()
        except Exception as exc:
            import traceback
            print(f"{nm} FAILED: {type(exc).__name__}: {exc}", flush=True)
            traceback.print_exc()
        print(f"  ({nm} took {time.time()-t0:.0f}s incl. compile)",
              flush=True)
