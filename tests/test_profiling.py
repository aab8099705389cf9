"""slope_time noise handling (utils/profiling.py).

The relay's per-call fixed cost has tens-of-ms jitter; a fast op measured at
the default iteration spread once yielded a ~0 slope and a ``vs_baseline:
0.0`` bench line. slope_time must widen its spread until the delta clears the
noise floor, and still return the true marginal per-iteration time.
"""

import time

import pytest

from gnn_pretraining_tpu.utils import profiling


def _fake_run_factory(per_iter_s: float, fixed_s: float, calls: list):
    """make_run whose call sleeps fixed + iters * per_iter (deterministic)."""

    def make_run(iters: int):
        def run():
            calls.append(iters)
            time.sleep(fixed_s + iters * per_iter_s)
            return 0.0

        return run

    return make_run


def test_slope_time_recovers_true_slope_for_fast_op():
    # 2 µs/iter: the default (50, 400) spread gives a 0.7 ms delta — far
    # below the 30 ms floor — so slope_time must widen the spread until the
    # delta is measurable, then report ~2 µs/iter.
    calls: list = []
    per_iter = 2e-6
    t = profiling.slope_time(_fake_run_factory(per_iter, 1e-4, calls),
                             min_delta_s=0.03)
    assert t == pytest.approx(per_iter, rel=0.25)
    assert max(calls) > 400  # the spread actually widened


def test_slope_time_no_escalation_for_slow_op():
    # 200 µs/iter: delta at the default spread is 70 ms > floor — a single
    # two-point measurement, no widening (keeps tune/bench scripts cheap).
    calls: list = []
    per_iter = 2e-4
    t = profiling.slope_time(_fake_run_factory(per_iter, 1e-4, calls),
                             min_delta_s=0.03)
    assert t == pytest.approx(per_iter, rel=0.25)
    assert max(calls) == 400


def test_slope_time_never_returns_nonpositive():
    # Pure fixed cost (zero marginal time): clamps at the tiny positive
    # floor instead of 0/negative, after exhausting max_iters widenings.
    calls: list = []
    t = profiling.slope_time(_fake_run_factory(0.0, 1e-4, calls),
                             min_delta_s=0.005, max_iters=3200)
    assert 0 < t <= 1e-8
