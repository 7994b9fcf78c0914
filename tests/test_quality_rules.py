"""Data-quality rule suite (quality_rules.py): one-pass verdicts +
row-level violation worklists."""

import pytest
from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import quality_rules as QR


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        (1, "a@x.com", 10.0, "red"),
        (2, "b@y.org", 20.0, "green"),
        (3, None, 30.0, "blue"),
        (4, "not-an-email", -5.0, "red"),
        (5, "c@z.net", 250.0, "purple"),
    ]
    return spark.createDataFrame(rows, "id bigint, email string, amount double, color string")


def _verdicts(df):
    return {r["rule"]: r.asDict() for r in df.collect()}


def test_one_row_per_rule_and_passes(tbl):
    rules = [
        {"kind": "completeness", "col": "email", "min_ratio": 0.9},
        {"kind": "uniqueness", "col": "id"},
        {"kind": "min", "col": "amount", "low": 0.0},
        {"kind": "max", "col": "amount", "high": 100.0},
        {"kind": "mean", "col": "amount", "low": 0.0, "high": 100.0},
        {"kind": "pattern", "col": "email", "regex": r"^[^@]+@[^@]+\.[a-z]+$", "min_ratio": 0.9},
        {"kind": "in_set", "col": "color", "allowed": ["red", "green", "blue"]},
        {"kind": "row_count", "low": 1.0, "high": 10.0},
    ]
    out = QR.check_rules(tbl, rules)
    v = _verdicts(out)
    assert len(v) == 8
    assert v["completeness_email"]["value"] == 0.8
    assert v["completeness_email"]["passed"] is False
    assert v["uniqueness_id"]["value"] == 1.0 and v["uniqueness_id"]["passed"] is True
    assert v["min_amount"]["value"] == -5.0 and v["min_amount"]["passed"] is False
    assert v["max_amount"]["value"] == 250.0 and v["max_amount"]["passed"] is False
    assert v["mean_amount"]["value"] == 61.0 and v["mean_amount"]["passed"] is True
    assert v["pattern_email"]["value"] == 0.75 and v["pattern_email"]["passed"] is False
    assert v["in_set_color"]["value"] == 0.8 and v["in_set_color"]["passed"] is False
    assert v["row_count_table"]["value"] == 5.0 and v["row_count_table"]["passed"] is True


def test_null_metric_fails(spark):
    empty = spark.createDataFrame([], "x double")
    v = _verdicts(QR.check_rules(empty, [{"kind": "min", "col": "x", "low": 0.0}]))
    assert v["min_x"]["value"] is None
    assert v["min_x"]["passed"] is False


def test_named_rule_and_unknown_kind(tbl):
    v = _verdicts(QR.check_rules(tbl, [{"name": "amt_ok", "kind": "min", "col": "amount", "low": -10.0}]))
    assert v["amt_ok"]["passed"] is True
    with pytest.raises(ValueError):
        QR.check_rules(tbl, [{"kind": "nope", "col": "amount"}])
    with pytest.raises(ValueError):
        QR.check_rules(tbl, [])


def test_violations_worklists(tbl):
    nulls = QR.rule_violations(tbl, {"kind": "completeness", "col": "email"})
    assert [r["id"] for r in nulls.collect()] == [3]
    bad_pat = QR.rule_violations(
        tbl, {"kind": "pattern", "col": "email", "regex": r"^[^@]+@[^@]+\.[a-z]+$"}
    )
    assert [r["id"] for r in bad_pat.collect()] == [4]
    out_of_set = QR.rule_violations(tbl, {"kind": "in_set", "col": "color", "allowed": ["red", "green", "blue"]})
    assert [r["id"] for r in out_of_set.collect()] == [5]
    out_of_range = QR.rule_violations(tbl, {"kind": "min", "col": "amount", "low": 0.0, "high": 100.0})
    assert sorted(r["id"] for r in out_of_range.collect()) == [4, 5]
    with pytest.raises(ValueError):
        QR.rule_violations(tbl, {"kind": "uniqueness", "col": "id"})


def test_single_scan_plan(tbl):
    # the whole suite must stay one aggregate pass: exactly one scan
    # of the input in the physical plan
    rules = [
        {"kind": "completeness", "col": "email"},
        {"kind": "min", "col": "amount", "low": 0.0},
        {"kind": "row_count", "low": 1.0},
    ]
    plan = QR.check_rules(tbl, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ") <= 2
