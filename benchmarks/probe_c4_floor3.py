"""Round-5 probe: calibrate the ~460 GB/s Pallas copy plateau.

(a) XLA copy FORCED to materialize (optimization_barrier between the
    producer and the consuming sum): read+write+read = 3 passes — if XLA
    sustains the line while Pallas doesn't, the plateau is Mosaic DMA;
    if both sag equally, it's ambient load on the shared chip.
(b) the config-2 fused smooth+interp kernel re-measured NOW (its
    round-4 number was 757 GB/s apparent): an ambient-load control.

Run: python benchmarks/probe_c4_floor3.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure

nplane, ny, nx = 512, 256, 256
rng = np.random.RandomState(3)
planes = jnp.asarray(rng.rand(nplane, ny, nx).astype(np.float32))


def xla_forced_copy(d):
    # barrier forces the scaled cube to materialize in HBM; _measure's
    # full-sum consumption then reads it back: 3 passes total
    return lax.optimization_barrier(d * jnp.float32(1.0000001))


per = _measure(xla_forced_copy, (planes,), reps=60)
b3 = nplane * ny * nx * 4 * 3
print(f"xla forced copy (3 passes): {per * 1e3:.3f} ms "
      f"({b3 / per / 1e9:.0f} GB/s over 3 passes)", flush=True)

# config-2 control (cached program from bench runs if available)
from spectral_cube_tpu.ops import smoothing as sm
from spectral_cube_tpu.ops.interpolate import smooth_interp_cube
nchan = 512
data2 = jnp.asarray(rng.rand(nchan, 256, 256).astype(np.float32))
coords = np.arange(nchan, dtype=np.float64)
outaxis = coords[::2]
kern = sm.gaussian_kernel1d(2.0)
per = _measure(lambda d: smooth_interp_cube(d, kern, coords, outaxis)[0],
               (data2,), reps=120)
b15 = nchan * 256 * 256 * 4 * 1.5
print(f"config2 control: {per * 1e3:.3f} ms "
      f"({b15 / per / 1e9:.0f} GB/s apparent)", flush=True)
print("done", flush=True)
