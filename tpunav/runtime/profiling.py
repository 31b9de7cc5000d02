"""Tracing / profiling: XLA traces + per-solve timing as first-class.

The reference's only timing instrumentation is a commented-out
std::chrono probe around the MPPI solve
(ref: nuturtle_robot/src/mppi_waypoints_node.cpp:260-273 — the source of
its 50 Hz claim; SURVEY.md §5). Here profiling is built in:

- :func:`trace` wraps ``jax.profiler.trace`` — device traces viewable in
  TensorBoard/XProf (kernel times, HBM traffic, fusion layout).
- :func:`annotate` labels host-side regions inside a trace.
- :class:`SolveProfiler` wraps any jitted callable with a ring-buffer
  wall-clock timer (block_until_ready for honest device timing) and
  reports Hz / p50 / p99 via the Metrics summary.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax

from .metrics import Metrics


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (open with TensorBoard's
    profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


class SolveProfiler:
    """Per-call wall-clock profiler around a (jitted) solve callable.

    >>> prof = SolveProfiler(solve_fn, name="mppi")
    >>> out = prof(*args)          # timed: blocks on the result
    >>> prof.hz(), prof.summary()  # rate + percentiles
    """

    def __init__(self, fn: Callable, name: str = "solve",
                 metrics: Optional[Metrics] = None, maxlen: int = 10_000):
        self.fn = fn
        self.name = name
        self.metrics = metrics if metrics is not None else Metrics(maxlen)

    def __call__(self, *args, **kwargs):
        self.metrics.start(self.name)
        out = self.fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.metrics.stop(self.name)
        return out

    def hz(self) -> float:
        """Mean solve rate over the recorded window."""
        s = self.metrics.summary().get(self.name + "_ms")
        return 0.0 if not s else 1e3 / s["mean"]

    def summary(self):
        return self.metrics.summary().get(self.name + "_ms", {})
