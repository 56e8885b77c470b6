"""Profiling: jax.profiler trace capture + per-step timing.

TPU-native upgrade over the reference's FpsLogger-only observability
(SURVEY.md §5 "Tracing/profiling: no torch.profiler, no traces"):
  * `trace(dir)` context manager captures an XLA/TPU trace viewable in
    TensorBoard or Perfetto;
  * `StepTimer` measures device-synchronized step walltime (forcing a scalar
    fetch — block_until_ready does not block over the axon tunnel);
  * `compile_time` measures trace+lower+compile cost of a jitted fn.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Walltime of device steps, synchronized via scalar fetch."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value: Any = None) -> float:
        if sync_value is not None:
            _ = float(jax.numpy.asarray(sync_value).reshape(-1)[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def compile_time(fn: Callable, *args, **kwargs) -> dict[str, float]:
    """Measure trace/lower/compile phases of a jittable function."""
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jitted.lower(*args, **kwargs)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    cost = {}
    try:
        analysis = compiled.cost_analysis()
        if analysis:
            cost = {k: float(v) for k, v in analysis.items()
                    if k in ("flops", "bytes accessed")}
    except Exception:
        pass
    return {"trace_lower_s": t1 - t0, "compile_s": t2 - t1, **cost}
