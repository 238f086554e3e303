"""Profiling: ``jax.profiler`` trace context + steps/s accounting.

New capability per SURVEY §5 (the reference records only per-run wall-clock
seconds, ``run_experiments.py:198``). ``trace`` wraps a block in a
``jax.profiler`` trace whose output loads in XProf/TensorBoard;
:class:`StepTimer` provides the steps/s counters every trainer logs.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/profile"):`` — device + host trace of the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step-rate meter with warmup skip (compile steps excluded).

    >>> timer = StepTimer(skip=1)
    >>> for _ in range(n): step(); timer.tick()
    >>> timer.steps_per_s
    """

    def __init__(self, skip: int = 1) -> None:
        self.skip = skip
        self.count = 0
        self._t0: float | None = None

    def tick(self) -> None:
        self.count += 1
        if self.count == self.skip:
            self._t0 = time.perf_counter()

    @property
    def measured_steps(self) -> int:
        return max(0, self.count - self.skip)

    @property
    def elapsed(self) -> float:
        return 0.0 if self._t0 is None else time.perf_counter() - self._t0

    @property
    def steps_per_s(self) -> float:
        if self.measured_steps == 0 or self.elapsed == 0:
            return 0.0
        return self.measured_steps / self.elapsed
