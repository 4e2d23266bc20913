"""Profiling / timing harness.

Rebuild of the observability gap in the reference (SURVEY.md §5 "Tracing /
profiling": absent beyond Keras progress bars): steady-state timing for
utterances/sec/chip and latency percentiles, plus a ``jax.profiler`` trace
context for TensorBoard/Perfetto (the ``--profile`` flag on the experiment
CLIs routes here).

**Synchronization (measured on the axon remote-TPU platform, round 2):**
``jax.block_until_ready`` does NOT await device execution there — a
dispatch-only loop "measures" 16 PFLOP/s on a single v5e. The only true
barrier is a device→host VALUE fetch, which costs a tunnel round-trip
(~25–40 ms). TPU programs complete in order (verified: fetching only the
last of N independent dispatches scales linearly in N), so the correct
recipe is: dispatch N iterations, fetch one tiny value, and subtract the
1-iteration baseline — ``time_fn``/``throughput`` below implement exactly
that and stay correct on backends where ``block_until_ready`` works.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np


def device_fetch_sync(out) -> None:
    """True synchronization barrier: D2H-fetch one element of ``out``.

    Works on any pytree; prefers a scalar-sized transfer. On the axon
    platform this is the only call that actually awaits execution.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    if not leaves:
        return
    leaf = leaves[0]
    flat = leaf.reshape(-1)[:1] if getattr(leaf, "ndim", 0) else leaf
    np.asarray(jax.device_get(flat))


def _timed_pass(fn, args, kw, iters: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    device_fetch_sync(out)
    return time.perf_counter() - t0


def time_fn(
    fn: Callable,
    *args,
    iters: int = 30,
    warmup: int = 5,
    passes: int = 3,
    **kw,
) -> Dict[str, float]:
    """Steady-state seconds/call of a (jitted) fn.

    Slope method: (T(iters) − T(1)) / (iters − 1) cancels the fetch
    round-trip; min over ``passes`` repetitions of each endpoint. The
    per-sample percentiles use repeated single-shot fetch-synced calls minus
    the measured fetch baseline (floored at the slope mean), so p50/p95
    remain meaningful for latency reporting.
    """
    out = fn(*args, **kw)
    device_fetch_sync(out)
    for _ in range(warmup):
        out = fn(*args, **kw)
    device_fetch_sync(out)
    t1 = min(_timed_pass(fn, args, kw, 1) for _ in range(passes))
    tn = min(_timed_pass(fn, args, kw, max(iters, 2)) for _ in range(passes))
    mean = max((tn - t1) / (max(iters, 2) - 1), 1e-9)
    # Latency samples: single-shot incl. the synchronization fetch; report
    # percentiles of max(sample − fetch_overhead, mean).
    fetch_overhead = max(t1 - mean, 0.0)
    samples = []
    for _ in range(min(iters, 10)):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        device_fetch_sync(out)
        samples.append(max(time.perf_counter() - t0 - fetch_overhead, mean))
    samples.sort()
    return {
        "mean_s": mean,
        "p50_s": statistics.median(samples),
        "p95_s": samples[min(len(samples) - 1, int(0.95 * len(samples)))],
        "min_s": samples[0],
    }


def single_request_latency(
    fn: Callable, *args, samples: int = 20, warmup: int = 3, **kw
) -> Dict[str, float]:
    """TRUE single-request latency: dispatch → result-in-host-memory.

    Each sample times one call INCLUDING the D2H value fetch — what a real
    client waits for one request. On the axon remote platform this is
    dominated by the ~25–40 ms tunnel round-trip; report it alongside (not
    instead of) the amortized steady-state slope, which measures device
    occupancy per call under pipelined dispatch.
    """
    out = fn(*args, **kw)
    device_fetch_sync(out)
    for _ in range(warmup):
        out = fn(*args, **kw)
        device_fetch_sync(out)
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        device_fetch_sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {
        "p50_s": statistics.median(ts),
        "p95_s": ts[min(len(ts) - 1, int(0.95 * len(ts)))],
        "min_s": ts[0],
        "mean_s": sum(ts) / len(ts),
    }


def null_fetch_rtt(samples: int = 20, warmup: int = 3) -> Dict[str, float]:
    """Distribution of a bare tiny D2H fetch with NO device work queued.

    On the axon remote platform every single-request latency includes one
    tunnel round-trip; this measures that transport component in isolation,
    so callers can decompose request latency into device time + transport
    RTT and a p95 swing in the tunnel is distinguishable from an on-device
    regression.

    Each sample fetches a FRESH 1-element result of a trivial jitted op:
    jax.Array caches its host copy after the first access, so repeatedly
    fetching the same array measures a host memcpy (~0.01 ms), not the
    tunnel. A new output buffer per sample forces a real D2H round trip;
    the +1 executes in ~µs, so the fetch time ≈ transport RTT.
    """
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.zeros((1,), jnp.float32))
    for _ in range(warmup):
        np.asarray(f(x))
    ts = []
    for _ in range(samples):
        y = f(x)  # async dispatch; fresh (uncached) device buffer
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {
        "p50_s": statistics.median(ts),
        "p95_s": ts[min(len(ts) - 1, int(0.95 * len(ts)))],
        "min_s": ts[0],
        "mean_s": sum(ts) / len(ts),
    }


def throughput(
    fn: Callable, *args, items_per_call: int, iters: int = 30, warmup: int = 5, **kw
) -> Dict[str, float]:
    """items/sec of a (jitted) fn, amortized over ``iters`` back-to-back
    calls with a true fetch barrier and the 1-call baseline subtracted.

    CAVEAT for fns with large outputs (≳100 MB): pipelined dispatch keeps
    every queued call's output buffer live, so ``iters`` × output-size of
    HBM fills up and allocator backpressure inflates the measurement (block
    0's 786 MB int8 output measured 7.98 ms raw vs 6.58 ms with the output
    consumed to a scalar inside the jit — see BASELINE.md round-5). When
    the real pipeline consumes the output on-device, time
    ``jit(lambda *a: fn(*a).sum())`` instead.
    """
    out = fn(*args, **kw)
    device_fetch_sync(out)
    for _ in range(warmup):
        out = fn(*args, **kw)
    device_fetch_sync(out)
    n = max(iters, 2)
    t1 = min(_timed_pass(fn, args, kw, 1) for _ in range(3))
    tn = min(_timed_pass(fn, args, kw, n) for _ in range(3))
    sec_per_call = max((tn - t1) / (n - 1), 1e-9)
    return {
        "items_per_sec": items_per_call / sec_per_call,
        "sec_per_call": sec_per_call,
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
