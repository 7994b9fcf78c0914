from datetime import datetime

from safedata_pipeline_spark.operators import rollup as RU
from safedata_pipeline_spark.operators import sketch as SK


def _events(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), "click", 1.25),
        (2, datetime(2024, 1, 1, 0, 50), "click", 2.75),
        (3, datetime(2024, 1, 1, 5, 0), "click", 4.00),
        (4, datetime(2024, 1, 2, 0, 0), "click", 8.00),
        (5, datetime(2024, 2, 1, 0, 0), "view", 0.50),
    ]
    return spark.createDataFrame(rows, "event_id bigint, ts timestamp, event_type string, value double")


def test_rollup_hierarchy_consistency(spark):
    out = RU.hypertable_rollup(_events(spark)).collect()
    by = {}
    for r in out:
        by[(r.resolution, str(r.bucket_start), r.event_type)] = r
    h0 = by[("hour", "2024-01-01 00:00:00", "click")]
    assert h0.n_events == 2 and h0.sum_value == 4.0 and h0.avg_value == 2.0
    d0 = by[("day", "2024-01-01 00:00:00", "click")]
    assert d0.n_events == 3 and d0.sum_value == 8.0
    m0 = by[("month", "2024-01-01 00:00:00", "click")]
    assert m0.n_events == 4 and m0.sum_value == 16.0
    assert m0.min_value == 1.25 and m0.max_value == 8.0
    assert by[("month", "2024-02-01 00:00:00", "view")].n_events == 1
    # day aggregates re-derive from hourly partials: totals must equal
    # a direct groupBy from raw (decimal sums make this exact)
    assert sum(r.n_events for r in out if r.resolution == "hour") == 5
    assert sum(r.n_events for r in out if r.resolution == "day") == 5


def test_kmv_exact_below_k_and_estimate_above(spark):
    df = spark.createDataFrame([(i, i % 7, f"v{i}") for i in range(500)], "a bigint, b bigint, c string")
    got = {r.column: r for r in SK.kmv_distinct(df, ["a", "b", "c"], k=64).collect()}
    # 7 distinct < k=64 -> exact
    assert got["b"].k_used == 7 and got["b"].kmv_estimate == 7.0
    # 500 distinct > k -> estimate in a sane band (k=64 => ~12% rel err)
    for col in ("a", "c"):
        assert got[col].k_used == 64
        assert 300 < got[col].kmv_estimate < 800


def test_kmv_prefilter_preserves_sketch(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(f"v{i}",) for i in range(5000)], "c string")
    full = SK.kmv_distinct(df, ["c"], k=64).collect()[0]
    # a generous prefilter keeps the k minima -> identical sketch
    filtered = SK.kmv_distinct(df, ["c"], k=64, prefilter=0.2).collect()[0]
    assert filtered.kmv_estimate == full.kmv_estimate and filtered.k_used == 64
    # an aggressive prefilter scales the surviving count instead
    tiny = SK.kmv_distinct(df, ["c"], k=64, prefilter=0.001).collect()[0]
    if tiny.k_used < 64:
        assert 1000 < tiny.kmv_estimate < 25000


def test_hll_rollup_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    # 5000 events over 3 hours in one day: per-hour estimates within
    # ~2% of exact; merging hour sketches to the day must agree with a
    # direct day-level sketch (the mergeability contract)
    ev = spark.range(5000).select(
        F.col("id").alias("event_id"),
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 3 AS INT),0,0)").alias("ts"),
        (F.col("id") % 1000).alias("user_id"),
    )
    hourly = SK.hll_rollup(ev, F.date_trunc("hour", F.col("ts")), "user_id")
    rows = {r["grp"]: r["ndv_estimate"] for r in hourly.collect()}
    assert len(rows) == 3
    for est in rows.values():
        assert abs(est - 1000) / 1000 < 0.05
    daily = SK.hll_rollup_merge(hourly, F.date_trunc("day", F.col("grp")))
    direct = SK.hll_rollup(ev, F.date_trunc("day", F.col("ts")), "user_id")
    merged_est = daily.collect()[0]["ndv_estimate"]
    direct_est = direct.collect()[0]["ndv_estimate"]
    assert merged_est == direct_est  # identical sketch state, not just close
    assert abs(merged_est - 1000) / 1000 < 0.05


def test_count_min_never_undercounts_and_is_exactish_at_low_load(spark):
    """CM guarantees estimate >= true count; at load factor
    n_distinct/width << 1 the estimate is exact for most values."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators import sketch as SK

    rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [(f"x{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "w string")
    state = SK.count_min_state(df, "w", depth=4, width=256)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("absent",)], "value string")
    est = {r.value: r.cm_estimate for r in SK.count_min_query(state, probes, depth=4, width=256).collect()}
    true = {"a": 50, "b": 20, "c": 5, "absent": 0}
    for k, t in true.items():
        assert est[k] >= t
    # 33 distinct into 4x256 cells: collisions are overwhelmingly unlikely
    assert est["a"] == 50 and est["absent"] == 0


def test_count_min_merge_equals_direct(spark):
    """Monoid law: merge(state(A), state(B)) == state(A ∪ B) exactly."""
    from safedata_pipeline_spark.operators import sketch as SK

    a = spark.createDataFrame([("a",), ("b",), ("a",)], "w string")
    b = spark.createDataFrame([("b",), ("c",)], "w string")
    both = a.union(b)
    merged = {
        (r.d, r.slot): r.n
        for r in SK.count_min_merge(
            SK.count_min_state(a, "w", 4, 64), SK.count_min_state(b, "w", 4, 64)
        ).collect()
    }
    direct = {(r.d, r.slot): r.n for r in SK.count_min_state(both, "w", 4, 64).collect()}
    assert merged == direct
