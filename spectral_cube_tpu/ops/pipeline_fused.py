"""Whole-pipeline fusion: masked moments + statistics + convolve +
reproject in a single Pallas program (two HBM cube passes total).

The BASELINE config-5 pipeline — the workload the reference runs as a
dask graph (``/root/reference/spectral_cube/dask_spectral_cube.py:
257-333``, one rechunk + one pass per op family) — has three stages on
this side: fused masked moments+statistics (one cube read), fused
convolve+reproject (read + write), and an elementwise combine.  The two
Pallas programs cannot overlap, so the cube crosses HBM three times and
the moments read is pure added wall time.

``moments_conv_reproject_fused`` runs the whole thing as ONE kernel
(banded_pallas.pipeline_fused_raw_strips): the moment/statistics sums
accumulate in VMEM-resident planes while the conv kernel streams each
channel block in.  Because the kernel visits channels sequentially it
cannot use moments_012_pallas's two-pass centering; the sums are
compensated float32 pairs with exact products (ops/df32), and this
module finalizes the cancelling forms (mom2, the per-spaxel centered
second moment) in pair arithmetic, reproducing the two-pass results to
~1e-7 even for a narrow line far from the coordinate center
(tests/test_pipeline_fused).

MEASURED OUTCOME on v5e: the round-4 per-voxel Dekker form measured
1.05-1.12 ms vs the two-program chain's 0.644 ms on the 256^3 config-5
workload (benchmarks/probe_fused_pipeline.py); the round-5 rebuild
with block-two-pass accumulation (~3.5x fewer VPU ops/voxel — the
block's own two-pass sums plus ONE plane-level pair conversion per
CB-channel block, ops/moments._moments_pallas_chunked's scheme) still
measured 0.98 ms vs the chain's 0.51 (probe_c5_fused_v2.py), numerics
matching at ~6e-7.  The residual cost is structural — the revisited
moment-plane updates serialize against the conv's MXU stream — so the
chain REMAINS the default config-5 path; this op is kept as a correct,
tested alternative whose balance flips on parts with a wider VPU:MXU
ratio or narrower HBM.  What DID ship from this work: the block-level
NaN gating + channel blocking (backported to
conv_reproject_raw_strips), the df32 pair layer, and the
block-two-pass accumulation scheme (reused by the channel-chunked
moments kernel that closed the 1024^3 falloff).

Reference math: ``/root/reference/spectral_cube/_moments.py:170-193``
(moments), ``np_compat.py:3-27`` (allbadtonan), and the statistics dict
of ``dask_spectral_cube.statistics``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .moments import _center, _finalize_pairs

__all__ = ["moments_conv_reproject_fused"]


def moments_conv_reproject_fused(data, kernel, ys, xs, coords, dx,
                                 mask_expr=None, interpret=False,
                                 dense_x=None, cb=None):
    """Fused masked moments 0/1/2 + statistics + convolve + reproject.

    Parameters match ``ops.moments.moments_012_pallas`` (``coords``,
    ``dx``, data-local ``mask_expr``) plus
    ``ops.regrid.convolve_reproject_separable`` (2-D ``kernel``, the
    axis-aligned output mapping ``ys``/``xs``).

    Returns ``(reprojected, mom0, mom1, mom2, stats)`` or None when any
    gate fails (non-separable kernel, non-axis-aligned mapping, VMEM,
    non-TPU backend) — callers fall back to the two-program chain.
    """
    from ..masks import is_data_local
    from .regrid import _conv_reproject_operators
    from .banded_pallas import pipeline_fused_raw_strips

    data = jnp.asarray(data)
    if data.ndim != 3:
        return None
    if mask_expr is not None and not is_data_local(mask_expr):
        return None
    ops = _conv_reproject_operators(data.shape, kernel, ys, xs,
                                    force=interpret)
    if ops is None:
        return None
    Gy, Gx, My, Mx, Ry, Rx, valid_np, _r = ops
    coords_c, xbar = _center(coords)
    mask_fn = None if mask_expr is None \
        else (lambda block: mask_expr._include(data=block))
    res = pipeline_fused_raw_strips(
        data, Gy, Gx, My, Mx, Ry, Rx, valid_np, coords_c,
        mask_fn=mask_fn, interpret=interpret, dense_x=dense_x, cb=cb)
    if res is None:
        return None
    out, (s0h, s0l, s1h, s1l, s2h, s2l, qh, ql, cntf, mn, mx) = res

    # pair-space finalization, shared with the channel-chunked moments
    # kernel (ops/moments._finalize_pairs; see module docstring)
    mom0, mom1, mom2, stats = _finalize_pairs(
        (s0h, s0l, s1h, s1l, s2h, s2l, qh, ql, cntf, mn, mx),
        xbar, dx, True)
    odt = data.dtype
    return (out.astype(odt), mom0.astype(odt), mom1.astype(odt),
            mom2.astype(odt), stats)
