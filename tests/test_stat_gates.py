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
