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


def test_check_rules_by_groups(spark):
    rows = [
        ("a", 1.0, "x"), ("a", 3.0, "y"), ("a", None, "x"),
        ("b", 10.0, "x"), ("b", 20.0, "x"),
    ]
    df = spark.createDataFrame(rows, "src string, v double, tag string")
    rules = [
        {"kind": "completeness", "col": "v", "min_ratio": 0.9},
        {"kind": "mean", "col": "v", "low": 0.0, "high": 5.0},
        {"kind": "row_count", "low": 3.0},
    ]
    out = QR.check_rules_by(df, ["src"], rules)
    v = {(r["src"], r["rule"]): r.asDict() for r in out.collect()}
    assert len(v) == 6  # 2 groups x 3 rules
    assert v[("a", "completeness_v")]["passed"] is False  # 2/3 < 0.9
    assert v[("b", "completeness_v")]["passed"] is True
    assert v[("a", "mean_v")]["value"] == 2.0 and v[("a", "mean_v")]["passed"] is True
    assert v[("b", "mean_v")]["value"] == 15.0 and v[("b", "mean_v")]["passed"] is False
    assert v[("a", "row_count_table")]["passed"] is True   # 3 rows
    assert v[("b", "row_count_table")]["passed"] is False  # 2 rows
    with pytest.raises(ValueError):
        QR.check_rules_by(df, [], rules)


def test_referential_integrity(spark):
    parent = spark.createDataFrame([(1,), (2,), (2,), (3,)], "pk bigint")
    child = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 9), (4, None), (5, 3)], "id bigint, fk bigint"
    )
    out = QR.referential_integrity(child, parent, {"fk": "pk"}).collect()[0]
    assert out["n_child"] == 5
    assert out["n_null_keys"] == 1   # fk NULL doesn't violate
    assert out["n_orphans"] == 1     # fk=9
    assert out["orphan_ratio"] == 0.2
    assert out["ri_ok"] is False
    clean = QR.referential_integrity(
        child.where("fk IS NULL OR fk <= 3"), parent, {"fk": "pk"}
    ).collect()[0]
    assert clean["ri_ok"] is True
    with pytest.raises(ValueError):
        QR.referential_integrity(child, parent, {})


def test_audit_report_renders_quality_rules(tbl, tmp_path):
    from safedata_pipeline_spark.reporting import save_audit_report

    verdicts = QR.check_rules(tbl, [{"kind": "uniqueness", "col": "id"}])
    path = save_audit_report(str(tmp_path / "audit.html"), {"run": "t"}, quality_rules_df=verdicts)
    html = open(path).read()
    assert "Data-Quality Rules" in html and "uniqueness_id" in html


def test_audit_report_renders_outlier_and_completeness_sections(spark, tmp_path):
    from datetime import datetime

    from safedata_pipeline_spark.operators.profile import (
        completeness_timeline,
        iqr_outlier_report,
    )
    from safedata_pipeline_spark.reporting import save_audit_report

    df = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    ev = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0), 1.0), (datetime(2024, 1, 1, 0), None)],
        "ts timestamp, v double",
    )
    path = save_audit_report(
        str(tmp_path / "audit2.html"),
        {"run": "t"},
        iqr_outliers_df=iqr_outlier_report(df, ["v"]),
        completeness_timeline_df=completeness_timeline(ev, ["v"]),
    )
    html = open(path).read()
    assert "Outlier Fences (IQR)" in html and "Completeness Timeline" in html
