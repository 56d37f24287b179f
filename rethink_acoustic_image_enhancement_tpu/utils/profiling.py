"""Tracing / profiling hooks.

The reference's only observability is wall-clock iter/data timing in the
train loop (train.py:241,364) plus `cudnn.benchmark` autotuning. Here:
first-class jax.profiler traces (viewable in TensorBoard / Perfetto) and a
step timer whose readings flow into MessageLogger fields.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with profiling.trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def aggregate_trace(log_dir: str) -> dict[str, float]:
    """Sum device-op durations (ms) by hlo_category from the newest
    captured trace under ``log_dir`` (plugins/profile/*/...trace.json.gz).

    This is the summary that drove the round-1 perf work: e.g. the 512px
    teacher profile splits into convolution fusions / data formatting /
    loop fusions (docs/perf_plan.md)."""
    import glob
    import gzip
    import json
    import os
    from collections import defaultdict

    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*trace.json.gz")))
    if not paths:
        return {}
    totals: dict[str, float] = defaultdict(float)
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if cat and ev.get("dur"):
            totals[cat] += ev["dur"] / 1e3  # us -> ms
    return dict(sorted(totals.items(), key=lambda kv: -kv[1]))


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks iter/data times and an exponential moving average."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.iter_time = 0.0
        self.data_time = 0.0
        self._avg_iter = None
        self._mark = time.perf_counter()

    def data_ready(self) -> None:
        now = time.perf_counter()
        self.data_time = now - self._mark
        self._mark = now

    def step_done(self) -> None:
        now = time.perf_counter()
        self.iter_time = now - self._mark
        self._mark = now
        if self._avg_iter is None:
            self._avg_iter = self.iter_time
        else:
            self._avg_iter = (self.momentum * self._avg_iter
                              + (1 - self.momentum) * self.iter_time)

    @property
    def avg_iter_time(self) -> float:
        return self._avg_iter or 0.0

    def eta_seconds(self, remaining_steps: int) -> float:
        return self.avg_iter_time * remaining_steps
