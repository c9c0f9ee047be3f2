"""Micro-probe: strip-dot MXU efficiency vs N (rhs columns).

The conv_reproject clean path at CB=4 issues 32 dots of
(64x128)@(128x256) per grid step.  If MXU fill/drain overhead is
material at N=256, concatenating the 4 channels along columns (one VPU
copy) and issuing 8 dots at N=1024 should win.  Every dot reads a
DISTINCT aligned column block of the VMEM input — identical dots get
CSE'd by Mosaic and fake >500% efficiency (first cut of this probe).

Run: python benchmarks/probe_dotn.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure

M, K = 64, 128
NB = 4          # strips
TOT = 8192      # total distinct input columns per step (4 MB block)


def _dot(a, b):
    return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def make_fn(ncols, steps):
    nd = TOT // ncols

    def kernel(x_ref, b_ref, o_ref):
        acc = jnp.zeros((M, ncols), jnp.float32)
        for i in range(nd):
            acc = acc + _dot(b_ref[i % NB],
                             x_ref[:, i * ncols:(i + 1) * ncols])
        o_ref[:, :] = acc

    @jax.jit
    def run(x, b):
        return pl.pallas_call(
            kernel, grid=(steps,),
            in_specs=[pl.BlockSpec((K, TOT), lambda s: (0, 0)),
                      pl.BlockSpec((NB, M, K), lambda s: (0, 0, 0))],
            out_specs=pl.BlockSpec((M, ncols), lambda s: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, ncols), jnp.float32),
        )(x, b)
    return run


rng = np.random.RandomState(0)
b = jnp.asarray(rng.rand(NB, M, K).astype(np.float32))
x = jnp.asarray(rng.rand(K, TOT).astype(np.float32))

for ncols, steps in ((256, 128), (512, 128), (1024, 128)):
    run = make_fn(ncols, steps)
    flops = steps * TOT * M * K * 2
    per = _measure(run, (x, b), reps=30)
    eff = flops / per / (197e12 / 6)
    print(f"N={ncols} dots/step={TOT // ncols} steps={steps}: "
          f"{per * 1e3:.3f} ms/pass, X6-eff {100 * eff:.0f}%", flush=True)
print("done", flush=True)
