"""Profiling and step-timing utilities (SURVEY.md §5: the reference has no
tracing at all — only tqdm bars and an unread start_time,
/root/reference/trainer.py:245,258).

Provides jax.profiler trace capture around training regions and a
low-overhead step timer whose summaries are first-class metrics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside an active trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with percentile summaries.

    Blocks on the step outputs before stopping the clock only when
    `blocking=True` (cheap summary mode measures dispatch cadence).
    """

    def __init__(self, blocking: bool = True):
        self.blocking = blocking
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if self.blocking and outputs is not None:
            jax.block_until_ready(outputs)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.samples.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, outputs_fn=None):
        self.start()
        yield
        self.stop()

    def summary(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self.samples:
            return {}
        xs = sorted(self.samples)
        n = len(xs)
        out = {
            "steps": float(n),
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p95_s": xs[min(n - 1, int(n * 0.95))],
            "max_s": xs[-1],
        }
        if batch_size:
            out["frames_per_sec"] = batch_size / out["mean_s"]
        return out
