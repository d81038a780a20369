"""Observability: progress bar, logging tee, and TPU profiler hooks.

The reference's observability surface is a console progress bar
(ref: utils.py:2088-2101), a ``log.log`` capturing subprocess output
(ref: utils.py:112-122) and wall-clock chunk timings. Here we add
native ``jax.profiler`` tracing on top: set
``PKC_PROFILE_DIR=/path`` (or pass profile_dir) and every traced scope
lands in TensorBoard-compatible trace files.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Optional


def progress(count: int, total: int, status: str = "") -> None:
    """Console progress bar (ref: utils.py:2088-2101)."""
    bar_len = 40
    filled = int(round(bar_len * count / float(max(total, 1))))
    bar = "=" * filled + "-" * (bar_len - filled)
    pct = round(100.0 * count / float(max(total, 1)), 1)
    sys.stdout.write("[%s] %s%% ...%s\r" % (bar, pct, status))
    sys.stdout.flush()
    if count >= total - 1:
        sys.stdout.write("\n")


@contextlib.contextmanager
def profile_trace(profile_dir: Optional[str] = None, name: str = "chunk"):
    """jax.profiler trace scope; enabled when a directory is configured
    (arg or $PKC_PROFILE_DIR). No-op otherwise."""
    profile_dir = profile_dir or os.environ.get("PKC_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax
    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


class StepTimer:
    """Accumulates per-step wall times; reports mean/p50/p95."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {"steps": n,
                "mean_s": sum(ts) / n,
                "p50_s": ts[n // 2],
                "p95_s": ts[min(int(n * 0.95), n - 1)],
                "total_s": sum(ts)}


class Tee:
    """Mirror writes to a log file (the reference's log.log role)."""

    def __init__(self, stream, path: str):
        self.stream = stream
        self.f = open(path, "a")

    def write(self, data):
        self.stream.write(data)
        self.f.write(data)

    def flush(self):
        self.stream.flush()
        self.f.flush()
