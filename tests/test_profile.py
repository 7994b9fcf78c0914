import datetime

import pytest

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import profile as P


def _df(spark):
    rows = [
        (1, 10.0, "a", datetime.datetime(2020, 1, 1)),
        (2, 20.0, "b", datetime.datetime(2020, 6, 1)),
        (3, None, "a", None),
        (4, 40.0, None, datetime.datetime(2021, 1, 1)),
        (5, 50.0, "c", datetime.datetime(2019, 1, 1)),
    ]
    return spark.createDataFrame(rows, "id bigint, x double, s string, ts timestamp")


def test_row_count(spark):
    assert P.row_count(_df(spark)).collect()[0].n_rows == 5


def test_group_count_includes_null_group(spark):
    got = {r[0]: r[1] for r in P.group_count(_df(spark), "s").collect()}
    assert got == {"a": 2, "b": 1, "c": 1, None: 1}


def test_group_freq_norm_sums_to_one(spark):
    rows = P.group_freq_norm(_df(spark), "s").collect()
    assert abs(sum(r.freq for r in rows) - 1.0) < 1e-9


def test_null_profile(spark):
    got = {r.column: (r.n_missing, r.missing_pct) for r in P.null_profile(_df(spark)).collect()}
    assert got["x"] == (1, 20.0)
    assert got["s"] == (1, 20.0)
    assert got["id"] == (0, 0.0)


def test_distinct_counts_drops_null(spark):
    got = {r.column: r.n_unique for r in P.distinct_counts(_df(spark), ["s", "x"]).collect()}
    assert got == {"s": 3, "x": 4}


def test_numeric_profile_matches_pandas_semantics(spark):
    # pandas: mean 30, std ddof=1, exact interpolated quantiles of [10,20,40,50]
    row = P.numeric_profile(_df(spark), ["x"]).collect()[0]
    assert row.mean == 30.0
    assert abs(row.std - 18.257419) < 1e-6
    assert (row.min_num, row.max_num) == (10.0, 50.0)
    assert row.p25 == 17.5 and row.median == 30.0 and row.p75 == 42.5


def test_top_freq_tiebreak_ascending(spark):
    df = spark.createDataFrame([("b",), ("b",), ("a",), ("a",), ("c",), (None,)], "s string")
    row = P.top_freq(df, ["s"]).collect()[0]
    assert (row.column, row.top, row.freq) == ("s", "a", 2)


def test_top_freq_multi_column_single_pass(spark):
    df = spark.createDataFrame([("a", "x"), ("a", "y"), ("b", "y")], "s string, t string")
    got = {r.column: (r.top, r.freq) for r in P.top_freq(df, ["s", "t"]).collect()}
    assert got == {"s": ("a", 2), "t": ("y", 2)}


def test_basic_stats_shape_and_branches(spark):
    rows = {r.column: r for r in P.basic_stats(_df(spark)).collect()}
    assert set(rows) == {"id", "x", "s", "ts"}
    assert rows["x"].dtype == "double" and rows["x"].missing == 1
    assert rows["s"].top == "a" and rows["s"].freq == 2
    assert rows["s"].mean is None
    assert rows["ts"].dtype == "timestamp"
    assert rows["ts"].min_ts == datetime.datetime(2019, 1, 1)
    assert rows["id"].nunique == 5


def test_basic_stats_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    row = P.basic_stats(df).collect()[0]
    assert row.missing == 2 and row.missing_pct == 100.0
    assert row.mean is None and row.nunique == 0


def test_limit_preview_deterministic(spark):
    df = _df(spark)
    got = [r.id for r in P.limit_preview(df, ["id"], 3).collect()]
    assert got == [1, 2, 3]


def test_projection_prunes_scan(spark, sf_dir):
    from safedata_pipeline_spark.sources.tables import load_table

    df = P.project(load_table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_quantity"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "l_extendedprice" not in plan  # column pruning reached the scan


def test_value_counts_cnt_and_freq(spark):
    got = {r[0]: (r[1], r[2]) for r in P.value_counts(_df(spark), "s").collect()}
    total = sum(c for c, _ in got.values())
    assert all(abs(f - c / total) < 1e-6 for c, f in got.values())


def test_correlation_matrix_exact(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 200)
    y = 2 * x + rng.normal(0, 0.5, 200)
    z = rng.normal(5, 2, 200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {(r.col_a, r.col_b): r.corr for r in P.correlation_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == pytest.approx(float(np.corrcoef(x, y)[0, 1]), abs=1e-6)
    assert got[("x", "z")] == pytest.approx(float(np.corrcoef(x, z)[0, 1]), abs=1e-6)
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}


def test_correlation_matrix_constant_column_null(spark):
    df = spark.createDataFrame([(float(i), 7.0) for i in range(20)], "x double, k double")
    got = P.correlation_matrix(df, ["x", "k"]).collect()
    assert len(got) == 1 and got[0].corr is None


def test_correlation_matrix_null_rows_listwise(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (None, 9.0), (3.0, 6.0)], "x double, y double"
    )
    got = P.correlation_matrix(df, ["x", "y"]).collect()[0]
    assert got.corr == 1.0  # the null row is excluded; remaining is exact


def test_robust_stats_known_values(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    r = {row.column: row for row in P.robust_stats(df, ["x"]).collect()}["x"]
    assert r.median == 50.0 and r.p25 == 25.0 and r.p75 == 75.0
    assert r.iqr == 50.0 and r.mad == 25.0


def test_robust_stats_rejects_non_numeric_and_unknown_columns(spark):
    # loud-failure contract (ADVICE r10): the shared counts frame only
    # carries val_num for schema-numeric columns, so without the
    # up-front check a string or misspelled column silently vanished
    import pytest

    df = spark.createDataFrame([(1.0, "a")], "x double, s string")
    with pytest.raises(ValueError, match="s"):
        P.robust_stats(df, ["x", "s"])
    with pytest.raises(ValueError, match="nope"):
        P.robust_stats(df, ["nope"])


def test_robust_stats_outlier_resistant(spark):
    base = [(float(i),) for i in range(1, 100)]
    with_outlier = base + [(1e9,)]
    a = {r.column: r for r in P.robust_stats(spark.createDataFrame(base, "x double"), ["x"]).collect()}
    b = {r.column: r for r in P.robust_stats(spark.createDataFrame(with_outlier, "x double"), ["x"]).collect()}
    # one extreme outlier barely moves median/MAD
    assert abs(a["x"].median - b["x"].median) <= 1.0
    assert abs(a["x"].mad - b["x"].mad) <= 1.0


def test_robust_stats_all_null_column_skipped(spark):
    df = spark.createDataFrame([(1.0, None), (3.0, None)], "a double, b double")
    out = {r.column for r in P.robust_stats(df, ["a", "b"]).collect()}
    assert out == {"a"}


def test_correlation_matrix_single_column_empty(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    out = P.correlation_matrix(df, ["x"])
    assert out.count() == 0
    assert out.columns == ["col_a", "col_b", "corr"]


def test_skew_report(spark):
    rows = [(1,)] * 90 + [(2,)] * 9 + [(3,)] * 1
    df = spark.createDataFrame(rows, "k bigint")
    r = P.skew_report(df, "k").collect()[0]
    assert r.n_rows == 100 and r.n_keys == 3
    assert r.max_key_count == 90
    assert r.p50_count == 9.0
    assert abs(r.skew_ratio - 90 / (100 / 3)) < 1e-6
    # null keys form their own group
    df2 = spark.createDataFrame([(1,), (None,), (None,)], "k bigint")
    r2 = P.skew_report(df2, "k").collect()[0]
    assert r2.n_keys == 2


def test_column_entropy(spark):
    import math

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "u string, v string"
    )
    got = {r.column: r for r in P.column_entropy(df, ["u", "v"]).collect()}
    # uniform over 2 categories -> ln 2
    assert got["u"].entropy == round(math.log(2), 6)
    assert got["u"].n_categories == 2
    # constant column -> zero entropy
    const = spark.createDataFrame([("k",)] * 10, "c string")
    r = P.column_entropy(const, ["c"]).collect()[0]
    assert r.entropy == 0.0 and r.n_categories == 1
    # nulls count as a category
    with_null = spark.createDataFrame([("a",), (None,)], "c string")
    r2 = P.column_entropy(with_null, ["c"]).collect()[0]
    assert r2.n_categories == 2 and r2.entropy == round(math.log(2), 6)


def test_table_diff_multiset_semantics(spark):
    a = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "k bigint, v string")
    b = spark.createDataFrame([(1, "x"), (3, "z")], "k bigint, v string")
    r = P.table_diff(a, b).collect()[0]
    # duplicate (1, x): one instance matches, the second is only-in-a
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.n_only_a == 2 and r.n_only_b == 1
    assert r.n_common == 1
    same = P.table_diff(a, a).collect()[0]
    assert same.n_only_a == 0 and same.n_only_b == 0 and same.n_common == 3


def test_mutual_information_independent_and_dependent(spark):
    from safedata_pipeline_spark.operators import profile as P

    # x == y: MI equals the (shared) entropy ln 2 for a 50-50 binary
    dep = spark.createDataFrame(
        [("a", "a"), ("b", "b")] * 50, "x string, y string"
    )
    mi_dep = P.mutual_information(dep, "x", "y").collect()[0]
    import math

    assert abs(mi_dep.mi - round(math.log(2), 6)) < 1e-6
    assert mi_dep.n_x_categories == 2 and mi_dep.n_y_categories == 2

    # independent uniform pair: MI = 0
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd"] * 25, "x string, y string"
    )
    assert P.mutual_information(ind, "x", "y").collect()[0].mi == 0.0

    # nulls form a category, not a drop
    withnull = spark.createDataFrame(
        [("a", None), ("b", "y")] * 30, "x string, y string"
    )
    r = P.mutual_information(withnull, "x", "y").collect()[0]
    assert r.n_y_categories == 2 and abs(r.mi - round(math.log(2), 6)) < 1e-6


def test_quantile_rank_matches_cume_dist(spark):
    """The two-phase rank equals a global cume_dist window exactly,
    and NULL values get NULL rank."""
    from pyspark.sql import Window, functions as F

    from safedata_pipeline_spark.operators import profile as P

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 3, 3, 9, 1, 7])]
        + [(99, None)],
        "id bigint, x double",
    )
    got = {r.id: r.q_rank for r in P.quantile_rank(df, "x").collect()}
    w = Window.orderBy("x")
    expected = {
        r.id: round(r.cd, 6)
        for r in df.where(F.col("x").isNotNull())
        .select("id", F.cume_dist().over(w).alias("cd"))
        .collect()
    }
    assert {k: v for k, v in got.items() if k != 99} == expected
    assert got[99] is None
    # uniform by construction: max rank is 1.0, ties share a rank
    assert max(v for v in got.values() if v is not None) == 1.0


def test_group_quantiles(spark):
    from safedata_pipeline_spark.operators import profile as P

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 15.0)],
        "g string, x double",
    )
    rows = {r.g: r for r in P.group_quantiles(df, "g", "x").collect()}
    assert rows["a"].p50 == 50.5 and rows["a"].p25 == 25.75
    assert rows["b"].p50 == 10.0  # linear interpolation between 5 and 15


def test_join_cardinality_exact_counts(spark):
    from safedata_pipeline_spark.operators.profile import join_cardinality

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k bigint"
    )
    b = spark.createDataFrame([(1,), (2,), (2,), (9,), (None,)], "j bigint")
    out = join_cardinality(a, b, "k", "j").collect()[0]
    assert out["n_a"] == 4 and out["n_b"] == 4          # nulls excluded
    assert out["n_keys_a"] == 3 and out["n_keys_b"] == 3
    assert out["n_keys_common"] == 2                     # keys 1 and 2
    # exact join size: key1 -> 2*1, key2 -> 1*2
    assert out["n_out"] == 4
    assert out["max_fanout"] == 2
    assert out["top_key"] == "1"                         # tie 2 vs 2 -> smaller key
    # agrees with the actual join
    assert a.join(b, a["k"] == b["j"]).count() == out["n_out"]


def test_join_cardinality_disjoint_keys(spark):
    from safedata_pipeline_spark.operators.profile import join_cardinality

    a = spark.createDataFrame([(1,)], "k bigint")
    b = spark.createDataFrame([(2,)], "k bigint")
    out = join_cardinality(a, b, "k").collect()[0]
    assert out["n_keys_common"] == 0 and out["n_out"] == 0
    assert out["max_fanout"] is None and out["top_key"] is None


def test_iqr_outlier_report_fences_and_counts(spark):
    from safedata_pipeline_spark.operators.profile import iqr_outlier_report

    # 1..100 plus two planted extremes
    rows = [(float(i),) for i in range(1, 101)] + [(-1000.0,), (1000.0,)]
    df = spark.createDataFrame(rows, "v double")
    out = iqr_outlier_report(df, ["v"]).collect()[0]
    assert out["q1"] < out["q3"]
    assert out["iqr"] == round(out["q3"] - out["q1"], 6)
    assert out["n_low"] == 1 and out["n_high"] == 1
    assert out["outlier_pct"] == round(2 * 100.0 / 102, 2)
    # all-null column -> NULL fences, NULL counts
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    r = iqr_outlier_report(nulls, ["v"]).collect()[0]
    assert r["q1"] is None and r["n_low"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        iqr_outlier_report(df, [])


def test_completeness_timeline_tracks_nulls(spark):
    from datetime import datetime

    from safedata_pipeline_spark.operators.profile import completeness_timeline

    h0, h1 = datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 1)
    rows = [(h0, 1.0), (h0, None), (h1, 2.0), (h1, 3.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {
        (r["period_start"].hour, r["column"]): (r["n_rows"], r["n_null"], r["completeness"])
        for r in completeness_timeline(df, ["v"]).collect()
    }
    assert out[(0, "v")] == (2, 1, 0.5)
    assert out[(1, "v")] == (2, 0, 1.0)


def test_schema_diff_statuses(spark):
    from safedata_pipeline_spark.operators.profile import schema_diff

    a = spark.createDataFrame([], "id bigint, v double, gone string")
    b = spark.createDataFrame([], "id bigint, v string, fresh int")
    out = {r["column"]: (r["dtype_a"], r["dtype_b"], r["status"]) for r in schema_diff(a, b).collect()}
    assert out["id"] == ("bigint", "bigint", "unchanged")
    assert out["v"] == ("double", "string", "retyped")
    assert out["gone"] == ("string", None, "removed")
    assert out["fresh"] == (None, "int", "added")


def test_weighted_quantiles_matches_sequential_reference(spark):
    from safedata_pipeline_spark.operators.profile import weighted_quantiles

    rows = [(1.0, 1.0), (2.0, 10.0), (3.0, 1.0), (4.0, 0.0), (5.0, -2.0), (None, 5.0), (2.0, 2.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    out = weighted_quantiles(df, "v", "w", probs=(0.25, 0.5, 0.75)).collect()[0]
    # masses: 1→1, 2→12, 3→1; W=14; cum: 1:1, 2:13, 3:14
    assert out.total_weight == 14.0
    assert out.p25 == 2.0   # 0.25*14=3.5 → first v with cum≥3.5
    assert out.p50 == 2.0
    assert out.p75 == 2.0   # 10.5 ≤ 13
    # equal weights degenerate to the unweighted lower quantile
    df2 = spark.createDataFrame([(float(i), 1.0) for i in range(1, 101)], "v double, w double")
    o2 = weighted_quantiles(df2, "v", "w").collect()[0]
    assert (o2.p25, o2.p50, o2.p75) == (25.0, 50.0, 75.0)


def test_group_scale_zscore_and_robust(spark):
    """Per-group scaling: each group normalizes against its OWN stats;
    zero-spread groups and NULLs scale to NULL."""
    import pytest

    from safedata_pipeline_spark.operators.profile import group_scale

    df = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 100.0), ("b", 200.0), ("b", 300.0),
            ("c", 5.0), ("c", 5.0),              # zero spread
            ("a", None),
        ],
        "src string, v double",
    )
    z = group_scale(df, ["v"], ["src"], method="zscore").collect()
    by = {}
    for r in z:
        by.setdefault(r.src, []).append((r.v, r.v_scaled))
    # group a: mean 2, std 1 -> scaled -1, 0, 1; group b identical shape
    assert sorted(s for v, s in by["a"] if v is not None) == [-1.0, 0.0, 1.0]
    assert sorted(s for v, s in by["b"]) == [-1.0, 0.0, 1.0]
    assert all(s is None for _, s in by["c"])           # zero spread
    assert [s for v, s in by["a"] if v is None] == [None]
    r = group_scale(df, ["v"], ["src"], method="robust").collect()
    med = {x.src: x.v_scaled for x in r if x.v in (2.0, 200.0)}
    assert med == {"a": 0.0, "b": 0.0}                  # median maps to 0
    with pytest.raises(ValueError):
        group_scale(df, ["v"], ["src"], method="minmax")


def test_percentiles_from_tagged_bit_match_builtin(spark):
    """The counts-based percentile replay (basic_stats' shared-exchange
    path) is BIT-identical to F.percentile — including duplicate-heavy,
    adversarial-double, and integer-position inputs — so the oracle SQL
    needs no change."""
    import random

    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators.profile import (
        _grouping_sets_tagged,
        _percentiles_from_tagged,
    )

    random.seed(13)
    rows = (
        [(random.random() * 3.14159 * 10 ** random.randint(-2, 2),) for _ in range(997)]
        + [(7.25,)] * 40            # heavy duplicate run
        + [(None,)] * 13            # nulls excluded from order stats
    )
    df = spark.createDataFrame(rows, "x double")
    pcts = [0.25, 0.5, 0.75, 0.1, 1 / 3]
    truth = df.agg(
        F.percentile("x", F.array(*[F.lit(p) for p in pcts])).alias("t")
    ).collect()[0]["t"]
    tagged = _grouping_sets_tagged(df, ["x"], with_num=True)
    got = _percentiles_from_tagged(tagged, ["x"], pcts).collect()[0]
    for i, t in enumerate(truth):
        assert got[f"__pq{i}"] == t, (i, got[f"__pq{i}"], t)


def test_basic_stats_exact_vs_numeric_profile_consistency(spark, sf_dir):
    """basic_stats' shared-exchange percentiles equal numeric_profile's
    F.percentile values on the fixture (same 6dp rounds)."""
    from safedata_pipeline_spark.operators import profile as P
    from safedata_pipeline_spark.sources.tables import load_table

    ords = load_table(spark, sf_dir, "orders")
    num_cols = [f.name for f in ords.schema.fields if P._is_numeric(f.dataType)]
    bs = {r["column"]: r for r in P.basic_stats(ords).collect()}
    np_ = {r["column"]: r for r in P.numeric_profile(ords, num_cols).collect()}
    for c in num_cols:
        for k in ("p25", "median", "p75"):
            assert bs[c][k] == np_[c][k], (c, k, bs[c][k], np_[c][k])
