"""Unit tests for bench.py's trial-contamination gates.

The published medians in BENCH_FULL.json are filtered through
_clean_secs / _is_dirty (hypervisor steal + DRAM canary); these tests pin
the estimator semantics without running any Spark work.
"""
import importlib.util
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)       # __main__ guard keeps this inert
    return mod


def _t(sec, steal=0.0, canary=None):
    return (sec, steal, canary)


def test_clean_secs_drops_steal_contaminated(bench):
    base = bench._CANARY_BEST[0] = 0.01
    trials = [_t(1.0, 0.0, base), _t(1.1, 0.0, base), _t(0.9, 0.0, base),
              _t(5.0, 2.0, base)]   # steal storm trial
    assert bench._clean_secs(trials) == [1.0, 1.1, 0.9]


def test_clean_secs_drops_canary_contaminated(bench):
    base = bench._CANARY_BEST[0] = 0.01
    dirty = base * (bench.CANARY_FACTOR + 0.5)
    trials = [_t(1.0, 0.0, base), _t(1.1, 0.0, base), _t(0.9, 0.0, base),
              _t(3.0, 0.0, dirty)]  # zero steal, slow canary (DRAM storm)
    assert bench._clean_secs(trials) == [1.0, 1.1, 0.9]


def test_clean_secs_fallback_when_storm_never_lifts(bench):
    """A storm spanning every trial must not leave an empty estimator."""
    bench._CANARY_BEST[0] = 0.01
    trials = [_t(5.0, 2.0, 0.01), _t(5.2, 2.1, 0.01), _t(4.9, 1.9, 0.01)]
    assert bench._clean_secs(trials) == [5.0, 5.2, 4.9]


def test_canary_rejudged_against_later_best(bench):
    """A trial recorded during an early storm flips to dirty once a
    quieter baseline is observed (raw seconds stored, ratio lazy)."""
    bench._CANARY_BEST[0] = 0.03            # best-so-far during the storm
    early = _t(2.0, 0.0, 0.03)              # ratio 1.0 at record time
    assert not bench._is_dirty(early[1], early[2])
    bench._CANARY_BEST[0] = 0.01            # quiet window refines the best
    assert bench._is_dirty(early[1], early[2])   # 3x the true baseline


def test_canary_secs_refines_best_and_ratio_is_relative(bench):
    bench._CANARY_BEST[0] = float("inf")
    dt1 = bench._canary_secs()
    assert bench._CANARY_BEST[0] == dt1
    r = bench._canary_ratio()
    assert r >= 1.0 or bench._CANARY_BEST[0] < dt1


def test_paired_efficiency_is_window_matched(bench):
    """The paired estimator takes the median of per-round N/4N ratios over
    rounds where BOTH legs are clean: a contended round inflates both its
    legs together, so its ratio barely moves, and a storm round is dropped
    entirely — unlike the ratio-of-medians, which collapses when sustained
    contention inflates the wide leg's median more than the narrow leg's."""
    base = bench._CANARY_BEST[0] = 0.01
    # three pristine rounds at true ratio 3.6 (eff 0.9) + one storm round
    # (both legs dirty, ratio 5.0) that must be dropped
    n_leg = [_t(72.0, 0.0, base), _t(70.0, 0.0, base),
             _t(74.0, 0.0, base), _t(150.0, 2.0, base)]
    w_leg = [_t(20.0, 0.0, base), _t(19.444, 0.0, base),
             _t(20.556, 0.0, base), _t(30.0, 2.0, base)]
    eff, used = bench._paired_efficiency(n_leg, w_leg)
    assert used == 3 and eff == pytest.approx(0.9, abs=0.001)
    # fallback: fewer than 3 clean pairs -> all pairs count
    eff_all, used_all = bench._paired_efficiency(n_leg[:2] + n_leg[3:],
                                                 w_leg[:2] + w_leg[3:])
    assert used_all == 3 and eff_all > 0


def test_trimmed_spread_centers_on_decisive_trials(bench):
    # n=5 -> one dropped per side; the 10x outlier cannot widen the spread
    assert bench._trimmed_spread([1.0, 1.0, 1.1, 1.2, 10.0]) == \
        pytest.approx((1.2 - 1.0) / 1.1)
