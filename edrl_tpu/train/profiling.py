"""Tracing / profiling hooks (SURVEY.md section 5.1 — absent in the
reference, which only had wall-clock prints in ``test_ensemble``).

- ``trace(logdir)``: context manager around ``jax.profiler`` for device
  traces viewable in TensorBoard/XProf.
- ``StepTimer``: lightweight per-step wall-clock stats (mean/p50/p90) with
  explicit ``block_until_ready`` so async dispatch doesn't hide device time.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        self.durations.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        d = np.asarray(self.durations)
        if len(d) == 0:
            return {}
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "total_s": float(d.sum()),
        }
