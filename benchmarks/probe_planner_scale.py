"""Host-side build-cost probe for the strip planner at ALMA spectral-line
channel counts (4096 / 8192 channels, round-3 task 10 / round-4 item 7).

Measures, per channel count:
  - operator composition (interp @ banded smooth, the config-2 shape),
  - plan_strips on the composed profile (both the nonzero-coordinate fast
    path and the argmax fallback, to keep the comment at
    ops/banded_pallas.plan_strips honest),
  - strip_blocks cutting.

These run ONCE per (band profile, shape) at operator build time and the
result is keyed only by the band structure, so a cache pays off only if
the build cost is material next to the kernels it feeds (~0.2-0.5 ms per
cube pass on v5e).  Run: python benchmarks/probe_planner_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spectral_cube_tpu.ops.banded_pallas import plan_strips, strip_blocks
from spectral_cube_tpu.ops.smoothing import _banded_conv_matrix
from spectral_cube_tpu.ops.interpolate import interp_weights, _interp_matrix


def _argmax_plan(profile, max_m=256):
    """The pre-round-4 edge scan (per-row argmax over the full profile),
    timed for the comment in plan_strips."""
    nout, nin = profile.shape
    rows = np.any(profile, axis=1)
    lo = np.where(rows, profile.argmax(axis=1), 0)
    hi = np.where(rows,
                  nin - np.ascontiguousarray(
                      profile[:, ::-1]).argmax(axis=1), 1)
    return lo, hi


def main():
    for nchan in (4096, 8192):
        coords = np.arange(nchan, dtype=np.float64)
        outaxis = coords[::2]
        kern = np.exp(-0.5 * ((np.arange(17) - 8) / 2.0) ** 2)
        kern /= kern.sum()

        # the REAL product build path (ops/interpolate.smooth_interp_cube):
        # dense banded conv matrix + the 2-tap gather compose — NOT a
        # dense (nout, nin) @ (nin, nin) matmul (that form measured 28 s
        # at 8192 channels; compose_interp_banded exists to avoid it)
        t0 = time.perf_counter()
        S = _banded_conv_matrix(nchan, kern)
        idx, frac = interp_weights(coords, outaxis)
        from spectral_cube_tpu.ops.interpolate import compose_interp_banded
        M = compose_interp_banded(idx, frac, S, dtype=np.float32)
        t_compose = time.perf_counter() - t0

        profile = M != 0.0
        t0 = time.perf_counter()
        plan = plan_strips(profile)
        t_plan = time.perf_counter() - t0

        t0 = time.perf_counter()
        _argmax_plan(profile)
        t_edges_argmax = time.perf_counter() - t0

        t0 = time.perf_counter()
        blocks = strip_blocks(M, *plan)
        t_blocks = time.perf_counter() - t0

        print(f"nchan={nchan}: compose {t_compose * 1e3:7.1f} ms | "
              f"plan_strips {t_plan * 1e3:7.1f} ms (argmax edge scan "
              f"alone {t_edges_argmax * 1e3:7.1f} ms) | strip_blocks "
              f"{t_blocks * 1e3:7.1f} ms | plan={plan} "
              f"nb={blocks[0].shape[0] if blocks else None}",
              flush=True)


if __name__ == "__main__":
    main()
