"""CDC compaction (cdc.py): latest-wins per key and upsert/delete merge."""

import pytest

from safedata_pipeline_spark.operators import cdc as CDC


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # key 1: three versions, latest wins
        (101, "2024-01-01 10:00:00", 1, "v1", False),
        (102, "2024-01-01 11:00:00", 1, "v2", False),
        (103, "2024-01-01 12:00:00", 1, "v3", False),
        # key 2: tie on ts -> larger offset wins
        (201, "2024-01-02 09:00:00", 2, "old", False),
        (202, "2024-01-02 09:00:00", 2, "new", False),
        # key 3: single version
        (301, "2024-01-03 08:00:00", 3, "only", False),
    ]
    return spark.createDataFrame(
        rows, "offset bigint, ts string, k bigint, payload string, deleted boolean"
    ).selectExpr("offset", "CAST(ts AS TIMESTAMP) AS ts", "k", "payload", "deleted")


def test_latest_by_key(log):
    out = CDC.latest_by_key(log, ["k"], "ts", "offset")
    assert out.columns == log.columns
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {1: "v3", 2: "new", 3: "only"}


def test_merge_upserts_with_tombstones(spark, log):
    base = CDC.latest_by_key(log, ["k"], "ts", "offset")
    updates = spark.createDataFrame(
        [
            (401, "2024-01-05 00:00:00", 1, "v4", False),   # update key 1
            (402, "2024-01-05 00:00:00", 2, "gone", True),  # delete key 2
            (403, "2024-01-05 00:00:00", 4, "born", False), # insert key 4
            (404, "2024-01-01 00:00:00", 3, "stale", False),# older than base -> ignored
        ],
        "offset bigint, ts string, k bigint, payload string, deleted boolean",
    ).selectExpr("offset", "CAST(ts AS TIMESTAMP) AS ts", "k", "payload", "deleted")
    out = CDC.merge_upserts(base, updates, ["k"], "ts", "offset", delete_col="deleted")
    assert "deleted" not in out.columns
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {1: "v4", 3: "only", 4: "born"}


def test_merge_without_delete_col(spark, log):
    updates = spark.createDataFrame(
        [(401, "2024-01-05 00:00:00", 1, "v4", False)],
        "offset bigint, ts string, k bigint, payload string, deleted boolean",
    ).selectExpr("offset", "CAST(ts AS TIMESTAMP) AS ts", "k", "payload", "deleted")
    out = CDC.merge_upserts(log, updates, ["k"], "ts", "offset")
    assert {r["k"]: r["payload"] for r in out.collect()} == {1: "v4", 2: "new", 3: "only"}


def test_no_window_in_plan(log):
    # the compaction must be a hash aggregate (map-side combinable),
    # never a per-key sort window
    plan = CDC.latest_by_key(log, ["k"], "ts", "offset")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan
