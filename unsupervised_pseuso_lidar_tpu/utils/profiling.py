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
import jax.numpy as jnp


@jax.jit
def _probe(leaves):
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jax.lax.convert_element_type(
            jnp.ravel(leaf)[0], jnp.float32
        )
    return acc


def hard_sync(tree) -> float:
    """Force REAL device completion of everything `tree` depends on.

    On some experimental backends ``jax.block_until_ready`` returns before
    the device has executed the program (measured on the axon-tunneled TPU:
    a chained 4096x4096 matmul scan "completes" in 0.2 ms under
    block_until_ready but takes 1.05 s to produce a value — 125 PFLOP/s
    vs the honest 21 TFLOP/s). The only reliable completion barrier is a
    host readback of a value that is data-dependent on the final buffers.

    This launches one tiny jitted program consuming a scalar probe from
    every array leaf of ``tree`` (reshape + 1-element gather: free), then
    reads the result back with ``float(...)``. The probe program cannot run
    until all its input buffers exist, and its value cannot reach the host
    until it ran — a true barrier for the whole dependency chain.

    Use this (never bare block_until_ready) to bound timed regions in
    benchmarks. Returns the probe value (unused; returning it prevents
    dead-code elimination at the caller).
    """
    leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(tree)
        if isinstance(leaf, jax.Array)
    ]
    if not leaves:
        return 0.0
    return float(_probe(leaves))


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
            hard_sync(outputs)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.samples.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, outputs_fn=None):
        """Time one step; `outputs_fn` (called AFTER the body) must return
        the step outputs so blocking mode can sync on them:

            with timer.step(lambda: out):
                out = step(state, batch)
        """
        self.start()
        yield
        self.stop(outputs_fn() if outputs_fn is not None else None)

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
