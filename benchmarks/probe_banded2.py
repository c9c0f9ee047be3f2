"""Round-2 probes: chain-dependence timing (output feeds next input, so
nothing can be hoisted or DCE'd) + higher reps so the tunnel's ~ms RTT
jitter can't swamp sub-ms kernels.  Also fixes p4 (SMEM full-array spec)
and explores p6 block sizes.

Run: python benchmarks/probe_banded2.py [probe ...]
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

from spectral_cube_tpu import enable_compilation_cache
from spectral_cube_tpu.ops import convolve as cv
from spectral_cube_tpu.ops.smoothing import _banded_conv_matrix

enable_compilation_cache()

HIGH = jax.lax.Precision.HIGHEST
INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"


def dot_h(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=HIGH)


def _timed_fetch(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def measure_chain(one_pass, cube, extra, reps):
    """Carry the cube through the loop: c = f(c); return a FULL-sum scalar
    and synchronize by FETCHING it (block_until_ready does not actually
    wait over the axon tunnel — only a fetch does).  Nothing is hoistable
    (each pass consumes the previous) and nothing is DCE-able (the sum
    consumes every element)."""
    @jax.jit
    def looped(c, *a):
        def body(i, carry):
            return one_pass(carry, *a)
        out = jax.lax.fori_loop(0, reps, body, c)
        return jnp.sum(out)

    np.asarray(looped(cube, *extra))  # compile + warm
    tiny = jax.jit(lambda d: d.ravel()[0] * 1.0)
    np.asarray(tiny(cube))
    rtt = min(_timed_fetch(lambda: tiny(cube)) for _ in range(3))
    t = min(_timed_fetch(lambda: looped(cube, *extra)) for _ in range(3))
    return max((t - rtt) / reps, 1e-9)


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

my_g = np.zeros((NGROUPS, N, N), np.float32)
mx_g = np.zeros((NGROUPS, N, N), np.float32)
taps_y = np.zeros((NGROUPS, 31), np.float32)
taps_x = np.zeros((NGROUPS, 31), np.float32)
for g, k in enumerate(kernels):
    yt, xt = cv.separable_factors(k)
    my_g[g] = _banded_conv_matrix(N, yt[:, 0])
    mx_g[g] = _banded_conv_matrix(N, xt[:, 0])
    taps_y[g] = yt[::-1, 0].astype(np.float32)   # band matrix flips
    taps_x[g] = xt[::-1, 0].astype(np.float32)
perm = np.argsort(group_idx, kind="stable").astype(np.int32)
gsorted = group_idx[perm].astype(np.int32)
data = jnp.asarray(data_np)


def report(name, per, bytes_pass=None):
    msg = f"{name}: {per*1e3:.3f} ms/pass"
    if bytes_pass:
        msg += f", {bytes_pass/per/1e9:.0f} GB/s"
    print(msg, flush=True)
    return per


def accuracy(name, got, exp):
    got, exp = np.asarray(got), np.asarray(exp)
    rel = np.abs(got - exp).max() / np.abs(exp).max()
    print(f"{name}: max rel err {rel:.2e}", flush=True)


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


def strip_blocks_left(mats, m=96, K=128):
    G, nout, nin = mats.shape
    nb = -(-nout // m)
    blocks = np.zeros((G, nb, m, K), np.float32)
    starts = []
    for i in range(nb):
        lo, hi = i * m, min(i * m + m, nout)
        nz = np.nonzero(np.any(mats[:, lo:hi, :] != 0, axis=(0, 1)))[0]
        want_lo = nz[0] if nz.size else 0
        assert (nz[-1] + 1 if nz.size else 1) - want_lo <= K
        s = int(np.clip(want_lo, 0, nin - K))
        starts.append(s)
        blocks[:, i, :hi - lo, :] = mats[:, lo:hi, s:s + K]
    return blocks, starts


# ------------------------------------------------------------------- base
def probe_base():
    def one(d):
        return cv.convolve_per_channel_separable(d, kernels, group_idx)
    per = measure_chain(one, data, (), reps=50)
    report("base (chain x50)", per, bytes_pass=data_np.size * 4 * 2)


# --------------------------------------------------------------- p1 dense
def probe_p1():
    def kernel(perm_ref, gs_ref, x_ref, my_ref, mx_ref, o_ref):
        t = dot_h(my_ref[0], x_ref[0], ((1,), (0,)))
        o_ref[0] = dot_h(t, mx_ref[0], ((1,), (1,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, N, N), lambda c, p, g: (g[c], 0, 0)),
            pl.BlockSpec((1, N, N), lambda c, p, g: (g[c], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)))
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((N, N, N),
                                                       jnp.float32),
                        interpret=INTERPRET)
    extra = (jnp.asarray(perm), jnp.asarray(gsorted),
             jnp.asarray(my_g), jnp.asarray(mx_g))

    def one(d, p, g, my, mx):
        return fn(p, g, d, my, mx)
    per = measure_chain(one, data, extra, reps=100)
    report("p1 dense-sorted (chain x100)", per,
           bytes_pass=data_np.size * 4 * 2)


# -------------------------------------------------------------- p3 strips
def probe_p3(reps=200):
    m, K = 96, 128
    yb, ys = strip_blocks_left(my_g, m, K)
    xbl, xsl = strip_blocks_left(mx_g, m, K)
    nb = yb.shape[1]

    def kernel(perm_ref, gs_ref, x_ref, yb_ref, xb_ref, o_ref, t_ref,
               u_ref):
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
        num_scalar_prefetch=2, grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec((1, nb, m, K), lambda c, p, g: (g[c], 0, 0, 0)),
            pl.BlockSpec((1, nb, m, K), lambda c, p, g: (g[c], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32),
                        pltpu.VMEM((N, N), jnp.float32)])
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((N, N, N),
                                                       jnp.float32),
                        interpret=INTERPRET)
    extra = (jnp.asarray(perm), jnp.asarray(gsorted),
             jnp.asarray(yb), jnp.asarray(xbl))

    def one(d, p, g, ybj, xbj):
        return fn(p, g, d, ybj, xbj)
    got = jax.jit(one)(data, *extra)
    accuracy("p3 strips transpose", got, get_exp())
    per = measure_chain(one, data, extra, reps=reps)
    report(f"p3 strips transpose (chain x{reps})", per,
           bytes_pass=data_np.size * 4 * 2)


# ------------------------------------------------------------- p4 stencil
def probe_p4():
    H = 15
    NP = N + 2 * H + 2   # 288

    def kernel(perm_ref, gs_ref, x_ref, ty_ref, tx_ref, o_ref, pad_ref):
        g = gs_ref[pl.program_id(0)]
        pad_ref[:H] = jnp.zeros((H, N), jnp.float32)
        pad_ref[H:H + N] = x_ref[0]
        pad_ref[H + N:] = jnp.zeros((NP - H - N, N), jnp.float32)
        acc = jnp.zeros((N, N), jnp.float32)
        for t in range(31):
            acc = acc + ty_ref[g, t] * pad_ref[t:t + N, :]
        pad_ref[:H] = jnp.zeros((H, N), jnp.float32)
        pad_ref[H:H + N] = acc.T
        pad_ref[H + N:] = jnp.zeros((NP - H - N, N), jnp.float32)
        acc2 = jnp.zeros((N, N), jnp.float32)
        for t in range(31):
            acc2 = acc2 + tx_ref[g, t] * pad_ref[t:t + N, :]
        o_ref[0] = acc2.T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full (G, 31) taps
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda c, p, g: (p[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((NP, N), jnp.float32)])
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((N, N, N),
                                                       jnp.float32),
                        interpret=INTERPRET)
    extra = (jnp.asarray(perm), jnp.asarray(gsorted),
             jnp.asarray(taps_y), jnp.asarray(taps_x))

    def one(d, p, g, ty, tx):
        return fn(p, g, d, ty, tx)
    got = jax.jit(one)(data, *extra)
    accuracy("p4 vpu stencil", got, get_exp())
    per = measure_chain(one, data, extra, reps=100)
    report("p4 vpu stencil (chain x100)", per,
           bytes_pass=data_np.size * 4 * 2)


# ------------------------- p6: config-2 banded axis-0, block-size scan
def probe_p6():
    from spectral_cube_tpu.ops import smoothing as sm
    from spectral_cube_tpu.ops.interpolate import (_interp_matrix,
                                                   interp_weights)
    nchan, ny, nx = 512, 256, 256
    rng2 = np.random.RandomState(1)
    d2 = rng2.rand(nchan, ny, nx).astype(np.float32)
    coords = np.arange(nchan, dtype=np.float64)
    outaxis = coords[::2]
    kern = sm.gaussian_kernel1d(2.0)
    idx, frac = interp_weights(coords, outaxis)
    S = _banded_conv_matrix(nchan, kern / kern.sum()).astype(np.float64)
    Imat = _interp_matrix(idx, frac, nchan).astype(np.float64)
    M_host = (Imat @ S).astype(np.float32)
    nout = M_host.shape[0]
    S_TOT = ny * nx
    dj = jnp.asarray(d2).reshape(nchan, S_TOT)
    Mj = jnp.asarray(M_host)

    def dense(d):
        return dot_h(Mj, d, ((1,), (0,)))
    # chain needs out shape == in shape: pad via stacking twice
    def dense2(d):
        o = dense(d)
        return jnp.concatenate([o, o], axis=0)
    per = measure_chain(dense2, dj, (), reps=100)
    report("p6 dense+concat (chain x100)", per, bytes_pass=d2.size * 4 * 1.5)

    exp = np.asarray(jax.jit(dense)(dj))

    for m, K, XB in ((48, 128, 512), (48, 128, 2048), (104, 256, 1024),
                     (48, 128, 8192)):
        blocks, starts = strip_blocks_left(M_host[None], m, K)
        blocks = blocks[0]
        nb = blocks.shape[0]

        def kernel(x_ref, b_ref, o_ref):
            X = x_ref[:]
            for i in range(nb):
                hi = min((i + 1) * m, nout)
                part = dot_h(b_ref[i], X[starts[i]:starts[i] + K, :],
                             ((1,), (0,)))
                o_ref[i * m:hi] = part[:hi - i * m]

        fnp = pl.pallas_call(
            kernel, grid=(S_TOT // XB,),
            in_specs=[pl.BlockSpec((nchan, XB), lambda j: (0, j)),
                      pl.BlockSpec((nb, m, K), lambda j: (0, 0, 0))],
            out_specs=pl.BlockSpec((nout, XB), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((nout, S_TOT), jnp.float32),
            interpret=INTERPRET)
        bj = jnp.asarray(blocks)

        def strips2(d, b):
            o = fnp(d, b)
            return jnp.concatenate([o, o], axis=0)
        got = jax.jit(lambda d, b: fnp(d, b))(dj, bj)
        accuracy(f"p6 strips m={m} K={K} XB={XB}", got, exp)
        per = measure_chain(strips2, dj, (bj,), reps=100)
        report(f"p6 strips m={m} K={K} XB={XB} (chain x100)", per,
               bytes_pass=d2.size * 4 * 1.5)


PROBES = {"base": probe_base, "p1": probe_p1, "p3": probe_p3,
          "p4": probe_p4, "p6": probe_p6}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for nm in names:
        t0 = time.time()
        try:
            PROBES[nm]()
        except Exception:
            import traceback
            traceback.print_exc()
            print(f"{nm} FAILED", flush=True)
        print(f"  ({nm} took {time.time()-t0:.0f}s)", flush=True)
