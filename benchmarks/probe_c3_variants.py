"""Config-3 kernel variants: strip-plan shapes for the per-channel
separable convolution (the 39% MXU shortfall in BENCH_r03).

Hypotheses:
- (m=64, K=128) half-fills the 128x128 systolic array on the row side;
  (m=128, K=256) doubles the modeled FLOPs but fills the MXU.
- the two in-VMEM transposes per rank cost VPU time the model ignores.

Run: python benchmarks/probe_c3_variants.py
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
from spectral_cube_tpu.ops import convolve as cv
from spectral_cube_tpu.ops import banded_pallas as bp

n = 256
ngroups = 64
rng = np.random.RandomState(2)
data_np = rng.rand(n, n, n).astype(np.float32)
kernels = []
for g in range(ngroups):
    sig = 2.0 + 0.05 * g
    x = np.arange(31) - 15
    k = np.exp(-0.5 * (np.add.outer(x ** 2, x ** 2)) / sig ** 2)
    kernels.append(k / k.sum())
group_idx = (np.arange(n) % ngroups).astype(np.int32)
data = jnp.asarray(data_np)

orig_plan = bp.plan_strips
ref = None


def run(label, plan_override=None):
    global ref
    if plan_override is None:
        bp.plan_strips = orig_plan
    else:
        def forced(profile, max_m=256):
            p = orig_plan(profile, max_m=max_m)
            if p is None:
                return None
            nout, nin = profile.shape
            m, K = plan_override
            if K > nin:
                return p
            # verify feasibility via strip_blocks later; trust caller
            return (m, K)
        bp.plan_strips = forced
    try:
        def one_pass(d):
            return cv.convolve_per_channel_separable(d, kernels, group_idx)
        out = np.asarray(jax.jit(one_pass)(data))
        if ref is None:
            ref = out
        else:
            assert np.allclose(out, ref, rtol=2e-5, atol=1e-6), label
        per = _measure(one_pass, (data,), reps=20)
        print(f"{label}: {per * 1e3:.3f} ms", flush=True)
    except Exception as exc:
        print(f"{label}: FAILED {type(exc).__name__}: {exc}", flush=True)
    finally:
        bp.plan_strips = orig_plan


run("shipped plan (auto m,K)")
run("forced m=128 K=256", (128, 256))
run("forced m=96  K=128", (96, 128))
run("forced m=32  K=128", (32, 128))
