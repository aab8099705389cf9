"""Profiling and throughput observability (SURVEY.md §5).

The reference has only coarse wall-clock timers (finetune.py:305,343). Here:

  * ``trace`` — context manager around ``jax.profiler`` for on-demand device
    traces (view with TensorBoard / xprof);
  * ``ThroughputMeter`` — first-class edges/s accounting: accumulate the real
    edge count each step, read edges/s over a window (the BASELINE.json
    kernel metric at training granularity);
  * ``slope_time`` — relay-safe timing: fixed per-call costs (RPC, host
    transfers) are eliminated by differencing two in-jit iteration counts.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True):
    """``with trace('outputs/profile'): step(...)`` captures a device trace."""
    if not enabled:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sliding accounting of processed edges (and steps) per second."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._edges = 0
        self._steps = 0

    def update(self, num_edges: int, num_spmm_calls: int = 1) -> None:
        """Record one step that aggregated ``num_edges`` real edges through
        ``num_spmm_calls`` SpMM invocations (layers × forwards)."""
        self._edges += num_edges * num_spmm_calls
        self._steps += 1

    @property
    def edges_per_s(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._edges / dt

    @property
    def steps_per_s(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._steps / dt

    def metrics(self, prefix: str = "train/system") -> dict:
        return {f"{prefix}/edges_per_s": self.edges_per_s,
                f"{prefix}/steps_per_s": self.steps_per_s}


def _slope_once(make_run: Callable[[int], Callable[[], object]],
                n1: int, n2: int, reps: int) -> float:
    r1, r2 = make_run(n1), make_run(n2)
    float(r1())
    float(r2())
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(r2())
        t2s.append(time.perf_counter() - t0)
    return min(t2s) - min(t1s)


def slope_time(make_run: Callable[[int], Callable[[], object]],
               n1: int = 50, n2: int = 400, reps: int = 2,
               min_delta_s: float = 0.03, max_iters: int = 102_400) -> float:
    """Marginal per-iteration wall time of a jitted loop.

    ``make_run(iters)`` must return a 0-arg callable whose result forces full
    device completion when converted (e.g. returns a scalar that the caller
    ``float()``s). The per-call fixed cost — which over a TPU relay tunnel can
    be hundreds of ms of RPC and host-transfer — cancels in the difference.

    The relay's per-call jitter is tens of ms, so a fast op (µs/iter) can
    produce a delta indistinguishable from noise at the default spread —
    which once silently reported an XLA NT-Xent baseline as ~0 s/iter
    (``vs_baseline: 0.0`` in a bench line). When the measured delta is below
    ``min_delta_s``, first add reps (tighter min), then widen the iteration
    spread ×8 (one extra compile per widening) until the delta clears the
    floor or ``max_iters`` is reached.
    """
    delta = _slope_once(make_run, n1, n2, reps)
    if delta < min_delta_s:
        delta = _slope_once(make_run, n1, n2, reps=4)
    while delta < min_delta_s and n2 * 8 <= max_iters:
        n1, n2 = n2, n2 * 8
        delta = _slope_once(make_run, n1, n2, reps=3)
    return max(delta / (n2 - n1), 1e-12)


def enable_nan_checks(enabled: bool = True) -> None:
    """Debug-mode NaN detection (jit-compatible via jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enabled)
