"""Profiling, progress, and per-op device-time metrics.

The reference has no tracing subsystem (SURVEY §5: progress via tqdm
callbacks only).  On TPU this is a first-class concern, so this module
provides:

- :func:`trace` — context manager around the JAX profiler (produces
  TensorBoard-compatible traces);
- :class:`OpTimer` — wall-clock device timing of jitted callables with
  dispatch-overhead subtraction (the tunnel RTT on remote-attached chips
  would otherwise swamp sub-millisecond kernels);
- :class:`ProgressCallback` — the analog of the reference's
  ``update_function`` hooks (spectral_cube.py:2984-3012).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np
import jax

__all__ = ["trace", "OpTimer", "ProgressCallback", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir="/tmp/spectral_cube_tpu_trace"):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class OpRecord:
    name: str
    calls: int = 0
    total_s: float = 0.0
    best_s: float = float("inf")

    @property
    def mean_s(self):
        return self.total_s / max(self.calls, 1)


class OpTimer:
    """Measure device time of jitted functions.

    ``loop_reps > 1`` runs the op inside a ``lax.fori_loop`` (with a data
    dependency preventing hoisting) and divides — required on tunneled
    devices where a single dispatch costs tens of milliseconds.
    """

    def __init__(self):
        self.records: dict[str, OpRecord] = {}
        self._rtt = None

    def measure_dispatch_rtt(self):
        x = jax.numpy.zeros(8)
        f = jax.jit(lambda v: v * 1.0)
        np.asarray(f(x))
        t0 = time.perf_counter()
        np.asarray(f(x))
        self._rtt = time.perf_counter() - t0
        return self._rtt

    def time(self, name, fn, *args, loop_reps=1):
        rec = self.records.setdefault(name, OpRecord(name))
        if loop_reps > 1:
            import jax.numpy as jnp

            @jax.jit
            def looped(*a):
                def body(i, acc):
                    pinned, acc = jax.lax.optimization_barrier(
                        (a[0], acc))
                    out = fn(pinned, *a[1:])
                    # consume EVERY output element: summing one element
                    # lets XLA slice through dots and DCE the measured
                    # work (see bench.py _measure and CLAUDE.md)
                    tot = jnp.float32(0)
                    for leaf in jax.tree_util.tree_leaves(out):
                        tot = tot + jnp.sum(
                            jnp.real(jnp.asarray(leaf))).astype(jnp.float32)
                    return acc + tot
                return jax.lax.fori_loop(0, loop_reps, body,
                                         jnp.float32(0))
            np.asarray(looped(*args))  # compile
            t0 = time.perf_counter()
            np.asarray(looped(*args))
            elapsed = time.perf_counter() - t0
            if self._rtt is None:
                self.measure_dispatch_rtt()
            per = max((elapsed - self._rtt) / loop_reps, 0.0)
        else:
            jitted = jax.jit(fn)
            jax.block_until_ready(jitted(*args))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(*args))
            per = time.perf_counter() - t0
        rec.calls += 1
        rec.total_s += per
        rec.best_s = min(rec.best_s, per)
        return per

    def report(self):
        lines = [f"{'op':30s} {'calls':>6s} {'best':>10s} {'mean':>10s}"]
        for rec in self.records.values():
            lines.append(f"{rec.name:30s} {rec.calls:6d} "
                         f"{rec.best_s * 1e3:9.3f}ms "
                         f"{rec.mean_s * 1e3:9.3f}ms")
        return "\n".join(lines)


class ProgressCallback:
    """Simple callable progress reporter (update_function analog)."""

    def __init__(self, total, desc="", stream=None, update_function=None):
        self.total = total
        self.count = 0
        self.desc = desc
        self.update_function = update_function
        self._t0 = time.perf_counter()
        self._stream = stream

    def __call__(self, n=1):
        self.count += n
        if self.update_function is not None:
            self.update_function()
        if self._stream is not None:
            pct = 100.0 * self.count / max(self.total, 1)
            self._stream.write(f"\r{self.desc} {pct:5.1f}%")
            self._stream.flush()

    def close(self):
        if self._stream is not None:
            self._stream.write("\n")


def device_memory_stats(device=None):
    """Per-device memory stats (HBM footprint assertions in tests — the
    analog of the reference's tracemalloc bounds, test_performance.py)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats is None:
        return {}
    return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "bytes_limit") if k in stats}
