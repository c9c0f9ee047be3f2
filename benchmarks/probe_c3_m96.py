"""Round-5 probe: does a larger strip height help the X6 dot
efficiency?  Config 3's gap attribution blames ~0.08 ms on 'X6
efficiency at m=64-row strip dots'; plan_strips picks m=64 (exact row
cover) over m=96 (12.5% padded rows but 50% taller MXU operands).
Force m=96 and measure the config-3 kernel.

Run: python benchmarks/probe_c3_m96.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure
import spectral_cube_tpu.ops.banded_pallas as bp
from spectral_cube_tpu.ops import convolve as cv

n = 256
ngroups = 64
rng = np.random.RandomState(2)
data = jnp.asarray(rng.rand(n, n, n).astype(np.float32))
kernels = []
for g in range(ngroups):
    sig = 2.0 + 0.05 * g
    x = np.arange(31) - 15
    k = np.exp(-0.5 * (np.add.outer(x ** 2, x ** 2)) / sig ** 2)
    kernels.append(k / k.sum())
group_idx = (np.arange(n) % ngroups).astype(np.int32)

ref = None
orig = bp.plan_strips
for m_force in (None, 96):
    if m_force is None:
        bp.plan_strips = orig
        tag = "default(m=64)"
    else:
        def forced(profile, max_m=256, _orig=orig, _m=m_force):
            p = _orig(profile, max_m=max_m)
            if p is not None and profile.shape == (n, n):
                return (_m, p[1])
            return p
        bp.plan_strips = forced
        tag = f"m={m_force}"

    def run(d):
        return cv.convolve_per_channel_separable(d, kernels, group_idx)

    out = np.asarray(jax.jit(run)(data))
    if ref is None:
        ref = out
    else:
        dev = np.nanmax(np.abs(out - ref))
        print(f"{tag}: max dev vs default {dev:.2e}", flush=True)
    per = _measure(run, (data,), reps=80)
    print(f"config3 kernel {tag}: {per * 1e3:.3f} ms", flush=True)
bp.plan_strips = orig
print("done", flush=True)
