"""Round-5 probe: what does a PURE COPY Pallas kernel achieve on the
config-4 shape?  The config-4 roofline charges in+out at the 819 GB/s
aggregate line; if simultaneous read+write streams sustain less than
that per kernel, the copy number is the honest floor for the shift-lerp
(which adds only ~8 VPU ops/voxel on top).

Run: python benchmarks/probe_c4_floor.py
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
from spectral_cube_tpu.ops.banded_pallas import per_channel_shift_lerp

nplane, ny, nx = 512, 256, 256
rng = np.random.RandomState(3)
planes = jnp.asarray(rng.rand(nplane, ny, nx).astype(np.float32))


def make_copy(cb):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    fn = pl.pallas_call(
        kernel, grid=(nplane // cb,),
        in_specs=[pl.BlockSpec((cb, ny, nx), lambda c: (c, 0, 0))],
        out_specs=pl.BlockSpec((cb, ny, nx), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nplane, ny, nx), jnp.float32))
    return fn


for cb in (4, 8):
    per = _measure(make_copy(cb), (planes,), reps=60)
    gbps = nplane * ny * nx * 4 * 2 / per / 1e9
    print(f"pallas copy cb{cb}: {per * 1e3:.3f} ms ({gbps:.0f} GB/s "
          "in+out)", flush=True)

per = _measure(lambda d: d * jnp.float32(1.0000001), (planes,), reps=60)
gbps = nplane * ny * nx * 4 * 2 / per / 1e9
print(f"xla scale-copy: {per * 1e3:.3f} ms ({gbps:.0f} GB/s in+out)",
      flush=True)

valid = np.ones((ny, nx), bool)
valid[-1, :] = False
valid[:, -1] = False
per = _measure(lambda d: per_channel_shift_lerp(
    d, 0, 0.37, 0, 0.61, valid, cb=4), (planes,), reps=60)
print(f"shift_lerp cb4 (ref): {per * 1e3:.3f} ms", flush=True)
print("done", flush=True)
