"""Round-5 probe: which Pallas block/grid layout streams fastest on the
config-4 shape?  probe_c4_floor.py measured a pure copy at 460 GB/s
in+out with (CB, 256, 256) channel-grid blocks, while the config-2
kernel's spatial-tile grid sustains 757 GB/s — so the shift-lerp's gap
is data-movement layout, not VPU work.

Run: python benchmarks/probe_c4_floor2.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_cube_tpu import enable_compilation_cache
enable_compilation_cache()

from bench import _measure

nplane, ny, nx = 512, 256, 256
rng = np.random.RandomState(3)
planes = jnp.asarray(rng.rand(nplane, ny, nx).astype(np.float32))
flat = jnp.asarray(rng.rand(nplane, ny * nx).astype(np.float32))
BYTES = nplane * ny * nx * 4 * 2


def report(tag, per):
    print(f"{tag}: {per * 1e3:.3f} ms ({BYTES / per / 1e9:.0f} GB/s "
          "in+out)", flush=True)


def copy3d(cb, parallel=False):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    params = {}
    if parallel:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        kernel, grid=(nplane // cb,),
        in_specs=[pl.BlockSpec((cb, ny, nx), lambda c: (c, 0, 0))],
        out_specs=pl.BlockSpec((cb, ny, nx), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nplane, ny, nx), jnp.float32),
        **params)


def copy_tile(cc, by, bx):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    return pl.pallas_call(
        kernel, grid=(nplane // cc, ny // by, nx // bx),
        in_specs=[pl.BlockSpec((cc, by, bx),
                               lambda c, i, j: (c, i, j))],
        out_specs=pl.BlockSpec((cc, by, bx), lambda c, i, j: (c, i, j)),
        out_shape=jax.ShapeDtypeStruct((nplane, ny, nx), jnp.float32))


def copy_flat(cb):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    return pl.pallas_call(
        kernel, grid=(nplane // cb,),
        in_specs=[pl.BlockSpec((cb, ny * nx), lambda c: (c, 0))],
        out_specs=pl.BlockSpec((cb, ny * nx), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((nplane, ny * nx), jnp.float32))


for tag, fn, arg in [
        ("copy3d cb8 parallel", copy3d(8, parallel=True), planes),
        ("copy_tile (512,8,128)", copy_tile(512, 8, 128), planes),
        ("copy_tile (128,8,128)", copy_tile(128, 8, 128), planes),
        ("copy_tile (64,32,256)", copy_tile(64, 32, 256), planes),
        ("copy_flat cb8 (preflat)", copy_flat(8), flat),
]:
    try:
        per = _measure(fn, (arg,), reps=60)
        report(tag, per)
    except Exception as exc:
        print(f"{tag} failed: {type(exc).__name__}: {exc}", flush=True)
print("done", flush=True)
