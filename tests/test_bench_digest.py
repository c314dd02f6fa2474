"""Unit tests for bench.py's regression digest (VERDICT r5 item 5):
median-of-recent-history baseline + the 2-consecutive-records rule,
so same-box jitter (1.12-1.56s bounces on an unchanged plan) never
surfaces as a headline regression while a genuine step regression
confirms on its second run.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _write_log(tmp_path, records):
    p = tmp_path / "BENCH_LOCAL.jsonl"
    with open(p, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_recent_benches_filters_sf_and_orders(tmp_path, monkeypatch):
    recs = [
        {"queries": {"q": 1.0}, "sf": 0.1, "ts": "t1"},
        {"queries": {"q": 9.0}, "sf": 0.01, "ts": "t2"},  # other sf: skipped
        {"queries": {"q": 2.0}, "sf": 0.1, "ts": "t3"},
    ]
    monkeypatch.setattr(bench, "_LOCAL_LOG", _write_log(tmp_path, recs))
    got = bench._recent_benches(0.1)
    assert [r["ts"] for r in got] == ["t1", "t3"]  # oldest first


def test_median_baseline_resists_one_low_bounce():
    """ngram-style jitter: history 1.38, 1.12 (low bounce), 1.40 —
    the median baseline is 1.38, so a normal 1.39 run is 1.01x, NOT
    the 1.24x a last-record-only delta would report vs the bounce."""
    recent = [
        {"queries": {"q": 1.38}},
        {"queries": {"q": 1.12}},
        {"queries": {"q": 1.40}},
    ]
    base = bench._median_baseline(recent)
    assert base == {"q": 1.38}
    assert 1.39 / base["q"] < bench.REGRESSION_THRESH


def test_step_regression_confirms_on_second_run():
    """A genuine plan regression (1.0s -> 2.0s) is flagged on run N
    (vs the old-history median) and CONFIRMED on run N+1, because the
    5-record median is still dominated by pre-regression times."""
    history = [{"queries": {"q": 1.0}, "flagged_vs_median": {}}] * 4
    base = bench._median_baseline(history)
    flag_n = 2.0 / base["q"] > bench.REGRESSION_THRESH
    assert flag_n  # run N flags (unconfirmed: prev record clean)
    history_n1 = history[1:] + [
        {"queries": {"q": 2.0}, "flagged_vs_median": {"q": 2.0}}
    ]
    base_n1 = bench._median_baseline(history_n1)
    assert base_n1["q"] == 1.0  # median still pre-regression
    flagged_n1 = {"q"} if 2.0 / base_n1["q"] > bench.REGRESSION_THRESH else set()
    confirmed = flagged_n1 & set(history_n1[-1]["flagged_vs_median"])
    assert confirmed == {"q"}


def test_one_noisy_record_never_confirms():
    """A single noisy-slow record flags once; the next normal run is
    within threshold of the median, so nothing is confirmed."""
    history = [{"queries": {"q": 1.0}, "flagged_vs_median": {}}] * 4 + [
        {"queries": {"q": 1.9}, "flagged_vs_median": {"q": 1.9}}
    ]
    base = bench._median_baseline(history[-5:])
    assert base["q"] == 1.0
    flagged_next = 1.05 / base["q"] > bench.REGRESSION_THRESH
    assert not flagged_next  # normal run: no flag, so no confirmation
