"""Profiling / timing harness.

Rebuild of the observability gap in the reference (SURVEY.md §5 "Tracing /
profiling": absent beyond Keras progress bars): a ``block_until_ready``
timing harness for utterances/sec/chip and latency percentiles, plus a
``jax.profiler`` trace context for TensorBoard/Perfetto (the ``--profile``
flag on the experiment CLIs routes here).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Dict, Iterable, Optional

import jax


def time_fn(
    fn: Callable,
    *args,
    iters: int = 30,
    warmup: int = 5,
    **kw,
) -> Dict[str, float]:
    """Steady-state timing of a (jitted) fn: mean/p50/p95 seconds per call."""
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return {
        "mean_s": sum(samples) / len(samples),
        "p50_s": statistics.median(samples),
        "p95_s": samples[min(len(samples) - 1, int(0.95 * len(samples)))],
        "min_s": samples[0],
    }


def throughput(
    fn: Callable, *args, items_per_call: int, iters: int = 30, warmup: int = 5, **kw
) -> Dict[str, float]:
    """items/sec of a (jitted) fn, amortized over ``iters`` back-to-back calls."""
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "items_per_sec": items_per_call * iters / dt,
        "sec_per_call": dt / iters,
    }


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Rolling step-time tracker for train loops (host-side, cheap)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.samples: list = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
            if len(self.samples) > self.window:
                self.samples.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        return {
            "step_p50_s": statistics.median(s),
            "step_p95_s": s[min(len(s) - 1, int(0.95 * len(s)))],
            "steps_per_sec": 1.0 / (sum(s) / len(s)),
        }
