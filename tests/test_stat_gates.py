"""Regression gates for the rows-only (randomized/approximate)
queries: tools/stat_gates.py records their statistical assertions per
round; this test recomputes them at sf0.001 speed-scale and asserts
the GATES bounds, so a deliberate recall/accuracy/sketch-error
regression trips the suite instead of drifting silently."""

import sys

sys.path.insert(0, "/root/repo")


def test_stat_gates_within_bounds(spark, sf_dir):
    from tools.stat_gates import GATES, check, compute

    stats = compute(spark, sf_dir)
    problems = check(stats)
    assert problems == [], f"stat gates tripped: {problems}; stats={stats}"
    # the harness itself must catch regressions: degrade each metric
    # past its bound and confirm the gate trips
    degraded = dict(stats)
    for metric, (direction, bound) in GATES.items():
        degraded[metric] = bound - 0.01 if direction == "min" else bound + 0.01
    assert len(check(degraded)) == len(GATES)


def test_slope_gate_logic():
    # the timing itself runs per-round in stat_gates.main() (sf0.01 vs
    # sf0.1 fixtures); here we pin the gate LOGIC: a linear-looking
    # ratio passes, a quadratic-looking one trips, a missing metric
    # reports as missing
    from tools.stat_gates import SLOPE_GATES, SLOPE_QUERIES, check

    linear = {f"slope_{q}": 8.0 for q in SLOPE_QUERIES}
    assert check(linear, SLOPE_GATES) == []
    quadratic = dict(linear, **{f"slope_{SLOPE_QUERIES[0]}": 60.0})
    assert len(check(quadratic, SLOPE_GATES)) == 1
    assert any("missing" in p for p in check({}, SLOPE_GATES))


def test_decade2_expected_slope_notes_complete():
    """VERDICT r12 #7: every decade-2 gated family carries a written
    analytic slope expectation, so near-gate readings are
    interpretable (constant-factor machinery vs approaching
    quadratic). Notes must name a numeric band."""
    import re

    from tools.stat_gates import DECADE2_QUERIES, EXPECTED_SLOPE_NOTES

    missing = [q for q in DECADE2_QUERIES if q not in EXPECTED_SLOPE_NOTES]
    assert not missing, f"gated families without slope expectation: {missing}"
    stale = [q for q in EXPECTED_SLOPE_NOTES if q not in DECADE2_QUERIES]
    assert not stale, f"notes for un-gated families: {stale}"
    for q, note in EXPECTED_SLOPE_NOTES.items():
        assert re.search(r"~[\d.]+", note), f"no numeric band in note for {q}"
