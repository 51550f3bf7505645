#!/usr/bin/env python3
"""Tests for bench_delta.py's flagging rules (run: python3 this_file).

Covers:
  1. single-round flag mechanics (bar + noise-window + noise-floor guards)
  2. the cumulative two-round rule (sub-bar moves that compound past 25%)
  3. A/B verdict merge: downgraded rows land in ab_downgraded, not dropped
  4. end-to-end main() on temp files, including --prior-delta plumbing
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_delta import compute_deltas, merge_ab_verdicts, main  # noqa: E402


def stats(med, spread=0.01):
    return {"min": med - spread, "med": med, "max": med + spread}


def test_single_round_flags():
    cur = {"q_reg": stats(2.0), "q_ok": stats(1.05), "q_imp": stats(0.5)}
    prior = {"q_reg": stats(1.0), "q_ok": stats(1.0), "q_imp": stats(1.0)}
    deltas, flagged, cum = compute_deltas(cur, 0.0, prior, 0.0)
    assert deltas["q_reg"]["flag"] == "regression", deltas["q_reg"]
    assert deltas["q_imp"]["flag"] == "improvement"
    assert "flag" not in deltas["q_ok"]
    assert sorted(flagged) == ["q_imp", "q_reg"] and cum == []
    # noise-floor guard: a >25% move smaller than the floor is ignored
    deltas, flagged, _ = compute_deltas(
        {"q": stats(0.14, 0.001)}, 0.2, {"q": stats(0.1, 0.001)}, 0.0)
    assert "flag" not in deltas["q"] and flagged == []
    # noise-window guard: overlapping [min, med] windows are ignored
    deltas, flagged, _ = compute_deltas(
        {"q": stats(1.4, 0.6)}, 0.0, {"q": stats(1.0, 0.1)}, 0.0)
    assert "flag" not in deltas["q"] and flagged == []


def test_cumulative_rule():
    # +15% this round on top of +15% last round = +32% cumulative: each
    # leg under the bar, the compound over it
    cur = {"q_creep": stats(1.15), "q_flat": stats(1.0),
           "q_bounce": stats(0.9)}
    prior = {"q_creep": stats(1.0), "q_flat": stats(1.0),
             "q_bounce": stats(1.0)}
    prior_deltas = {"q_creep": {"pct": 15.0}, "q_flat": {"pct": 2.0},
                    "q_bounce": {"pct": -10.0}}  # -10 then -10: -19%, under
    deltas, flagged, cum = compute_deltas(cur, 0.0, prior, 0.0,
                                          prior_deltas)
    assert flagged == []
    assert cum == ["q_creep"], cum
    assert deltas["q_creep"]["flag"] == "cumulative-regression"
    assert abs(deltas["q_creep"]["cum_pct"] - 32.2) < 0.2
    # -10% then -20% = -28% compound: cumulative improvement, also flagged
    deltas, _, cum = compute_deltas(
        {"q": stats(0.8)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": -10.0}})
    assert cum == ["q"] and deltas["q"]["flag"] == "cumulative-improvement"
    # a row already flagged THIS round is not double-flagged cumulatively
    deltas, flagged, cum = compute_deltas(
        {"q": stats(1.5)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 15.0}})
    assert flagged == ["q"] and cum == []
    # prior delta rows without pct (new/gone) are skipped, not crashed on
    deltas, _, cum = compute_deltas(
        {"q": stats(1.1)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"status": "new"}})
    assert cum == []
    # an over-bar prior leg was already flagged and adjudicated in its
    # own round: a flat current round must not re-flag it cumulatively
    deltas, _, cum = compute_deltas(
        {"q": stats(1.0)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 30.0}})
    assert cum == [], "settled regression re-flagged"
    # opposite-direction legs are a bounce, not a creep
    deltas, _, cum = compute_deltas(
        {"q": stats(2.0)}, 0.0, {"q": stats(1.64)}, 0.0,
        {"q": {"pct": -20.0}})
    assert cum == []  # +22% after -20% nets under the bar anyway; and
    # even a compounding-looking opposite pair must stay unflagged:
    deltas, _, cum = compute_deltas(
        {"q": stats(0.9)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 24.0}})
    assert cum == []
    # two sub-noise-floor drifts compounding past the bar stay unflagged
    deltas, _, cum = compute_deltas(
        {"q": stats(0.115, 0.001)}, 0.2, {"q": stats(0.1, 0.001)}, 0.0,
        {"q": {"pct": 15.0}})
    assert cum == [], "sub-floor creep flagged"


def test_cumulative_after_host_drift_downgrade():
    # a prior host-drift downgrade's RAW pct (over-bar, refuted) is
    # replaced by its A/B in-window ratio as the prior leg, so a real
    # creep that hid under host drift still compounds into a flag...
    deltas, _, cum = compute_deltas(
        {"q": stats(1.15)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 40.0, "flag": "host-drift", "ab_ratio": 1.18}})
    assert cum == ["q"], "creep under a host-drift downgrade vanished"
    assert abs(deltas["q"]["cum_pct"] - 35.7) < 0.2
    # ...while a CLEAN downgrade (ratio ≈ 1) does not re-flag: the raw
    # over-bar pct was window noise, not a prior leg to compound
    deltas, _, cum = compute_deltas(
        {"q": stats(1.15)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 40.0, "flag": "host-drift", "ab_ratio": 1.02}})
    assert cum == []
    # an A/B ratio under 1 is an opposite-direction leg — a bounce
    deltas, _, cum = compute_deltas(
        {"q": stats(1.2)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 40.0, "flag": "host-drift", "ab_ratio": 0.93}})
    assert cum == []
    # a downgraded row with no recorded ratio keeps the settled-raw-pct
    # exclusion (nothing credible to compound)
    deltas, _, cum = compute_deltas(
        {"q": stats(1.15)}, 0.0, {"q": stats(1.0)}, 0.0,
        {"q": {"pct": 40.0, "flag": "host-drift"}})
    assert cum == []


def test_ab_downgrade_kept_visible():
    deltas = {"q1": {"pct": 40.0, "flag": "regression"},
              "q2": {"pct": 30.0, "flag": "regression"}}
    verdicts = {"q1": {"ratio": 1.4, "verdict": "real-regression"},
                "q2": {"ratio": 1.02, "verdict": "host-drift"}}
    downgraded = merge_ab_verdicts(deltas, verdicts)
    assert downgraded == ["q2"]
    assert deltas["q1"]["flag"] == "regression"
    assert deltas["q2"]["flag"] == "host-drift"
    assert deltas["q2"]["ab_ratio"] == 1.02  # evidence stays on the row


def test_main_end_to_end():
    with tempfile.TemporaryDirectory() as d:
        def dump(name, obj):
            p = os.path.join(d, name)
            with open(p, "w") as f:
                json.dump(obj, f)
            return p
        cur = dump("cur.json", {"stats": {
            "q_creep": stats(1.15), "q_new": stats(0.3)},
            "noise_floor": 0.0})
        prior = dump("prior.json", {"stats": {
            "q_creep": stats(1.0), "q_gone": stats(0.2)},
            "noise_floor": 0.0})
        pdelta = dump("pdelta.json", {"queries": {
            "q_creep": {"pct": 15.0}}})
        out = os.path.join(d, "out.json")
        main(cur, prior, out, prior_delta=pdelta)
        with open(out) as f:
            o = json.load(f)
        assert o["cumulative_flagged"] == ["q_creep"]
        assert o["flagged"] == [] and o["ab_downgraded"] == []
        assert o["queries"]["q_new"]["status"] == "new"
        assert o["queries"]["q_gone"]["status"] == "gone"


if __name__ == "__main__":
    test_single_round_flags()
    test_cumulative_rule()
    test_cumulative_after_host_drift_downgrade()
    test_ab_downgrade_kept_visible()
    test_main_end_to_end()
    print("bench_delta tests: OK")
