"""Tracing / profiling subsystem.

The reference's only observability is manual wall-clock deltas through a
``MovingAverage`` window (util/functions.py:4-40, used at
trainval_model.py:78-79,118-120) and a per-sample average inference-time
print (trainval_model.py:205,260,287).  Here profiling is a first-class
module (SURVEY.md section 5.1):

* :class:`StepTimer` — per-step wall-clock stats with warmup exclusion and
  a MovingAverage window, for train/eval loop hot-path timing.
* :func:`trace` — context manager around ``jax.profiler`` emitting an XPlane
  trace viewable in TensorBoard / Perfetto (device + host timelines, one
  directory per capture).
* :func:`annotate` — named ``TraceAnnotation`` scope so host-side phases
  (input pipeline, checkpoint, eval) show up in the captured timeline.
* :func:`device_memory_stats` — live per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

from cmpc_refseg_tpu.utils.moving_average import MovingAverage


class StepTimer:
    """Wall-clock step timing with compile-step exclusion.

    The first ``warmup`` laps (XLA compiles) are recorded separately so the
    steady-state rate is not polluted by compilation.
    """

    def __init__(self, window_size: int = 100, warmup: int = 1):
        self.window = MovingAverage(window_size)
        self.warmup = warmup
        self.laps = 0
        self.warmup_time = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.lap()
        return False

    def start(self):
        self._t0 = time.perf_counter()

    def lap(self) -> float:
        """Record one step; returns its duration in seconds."""
        if self._t0 is None:
            raise RuntimeError("StepTimer.lap() before start()")
        dt = time.perf_counter() - self._t0
        self._t0 = time.perf_counter()
        if self.laps < self.warmup:
            self.warmup_time += dt
        else:
            self.window.add(dt)
        self.laps += 1
        return dt

    @property
    def mean_step_time(self) -> float:
        return self.window.get() if len(self.window) else 0.0

    @property
    def steps_per_sec(self) -> float:
        t = self.mean_step_time
        return 1.0 / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.laps,
            "mean_step_time_s": self.mean_step_time,
            "steps_per_sec": self.steps_per_sec,
            "warmup_steps": min(self.laps, self.warmup),
            "warmup_time_s": self.warmup_time,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace of the enclosed block into *log_dir*
    (TensorBoard 'profile' plugin / Perfetto format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side annotation scope appearing in captured traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """{device: {bytes_in_use, bytes_limit, ...}} for devices exposing
    memory_stats (TPU does; CPU backend returns {})."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = dict(stats)
    return out
