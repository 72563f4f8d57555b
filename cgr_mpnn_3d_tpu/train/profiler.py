"""Tracing / profiling utilities (SURVEY.md §5: the reference has none —
only tqdm bars).

* :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard/Perfetto trace of the wrapped steps.
* :class:`StepTimer` — lightweight wall-clock step statistics (mean/p50/p99,
  steps/s) for the metrics log; zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """Profile the enclosed block: ``with trace('/tmp/t'): step(...)``."""
    if not enabled:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
    print(f"[profiler] trace written to {log_dir}")


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._last: float | None = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    def reset_epoch(self) -> None:
        self._last = None

    def tick_many(self, n: int, elapsed: float) -> None:
        """Record n equal step intervals covering ``elapsed`` seconds (the
        device-epoch path runs a whole epoch in one dispatch, so per-step
        host timestamps do not exist).  Replaces any prior intervals: the
        stats describe THIS epoch alone (epoch 0 includes the compile)."""
        if n <= 0:
            return
        self._times = [elapsed / n] * n
        self._count = n
        self._last = None

    def stats(self) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "step_time_mean_s": float(t.mean()),
            "step_time_p50_s": float(np.percentile(t, 50)),
            "step_time_p99_s": float(np.percentile(t, 99)),
            "steps_per_s": float(1.0 / t.mean()),
        }
