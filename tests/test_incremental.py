"""Mergeable profile state (incremental.py): batching-invariance is
the whole contract — incremental == from-scratch, bit for bit."""

import pytest
from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import incremental as INC
from safedata_pipeline_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: str(t[0])
    )


def test_merge_of_splits_equals_whole(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    whole = INC.profile_partials(li, cols)
    a = INC.profile_partials(li.where(F.col("l_orderkey") % 2 == 0), cols)
    b = INC.profile_partials(li.where(F.col("l_orderkey") % 2 == 1), cols)
    merged = INC.merge_partials(a, b)
    assert _rows(merged) == _rows(whole)
    # and the finalized profiles agree bit-for-bit too
    assert _rows(INC.finalize_profile(merged)) == _rows(INC.finalize_profile(whole))


def test_merge_is_batching_invariant(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity"]
    thirds = [
        INC.profile_partials(li.where(F.col("l_orderkey") % 3 == i), cols)
        for i in range(3)
    ]
    m_all = INC.merge_partials(*thirds)
    m_nested = INC.merge_partials(INC.merge_partials(thirds[0], thirds[1]), thirds[2])
    assert _rows(m_all) == _rows(m_nested)


def test_finalize_values_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "v double"
    )
    out = INC.finalize_profile(INC.profile_partials(df, ["v"])).collect()[0]
    assert out["n"] == 3 and out["n_null"] == 1
    assert out["completeness"] == 0.75
    assert out["mean"] == 2.0
    assert abs(out["std_pop"] - 0.816497) < 1e-6  # population std of 1,2,3
    assert out["min"] == 1.0 and out["max"] == 3.0


def test_all_null_and_empty_columns(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = INC.finalize_profile(INC.profile_partials(df, ["v"])).collect()[0]
    assert out["n"] == 0 and out["n_null"] == 2
    assert out["mean"] is None and out["std_pop"] is None
    empty = spark.createDataFrame([], "v double")
    m = INC.merge_partials(
        INC.profile_partials(empty, ["v"]), INC.profile_partials(df, ["v"])
    )
    assert INC.finalize_profile(m).collect()[0]["n_null"] == 2
    with pytest.raises(ValueError):
        INC.profile_partials(df, [])
    with pytest.raises(ValueError):
        INC.merge_partials()


def test_histogram_partials_merge_and_percentiles(spark, sf_dir):
    from safedata_pipeline_spark.operators import incremental as INC

    li = load_table(spark, sf_dir, "lineitem")
    lohi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    lo, hi = float(lohi[0]), float(lohi[1])
    width = (hi - lo) / 100 or 1.0
    whole = INC.histogram_partials(li, "l_extendedprice", lo, width, 100)
    a = INC.histogram_partials(li.where(F.col("l_orderkey") % 2 == 0), "l_extendedprice", lo, width, 100)
    b = INC.histogram_partials(li.where(F.col("l_orderkey") % 2 == 1), "l_extendedprice", lo, width, 100)
    merged = INC.merge_histograms(a, b)
    assert _rows(merged) == _rows(whole)

    inc_p = INC.percentiles_from_histogram(merged, lo, width).collect()[0]
    scratch_p = INC.percentiles_from_histogram(whole, lo, width).collect()[0]
    assert tuple(inc_p) == tuple(scratch_p)  # incremental == from-scratch exactly
    # and each estimate is within one bin width of the exact percentile
    exact = li.agg(
        F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    ).collect()[0][0]
    for est, ex in zip((inc_p["p25"], inc_p["p50"], inc_p["p75"]), exact):
        assert abs(est - float(ex)) <= width + 1e-9


def test_histogram_validates_grid(spark):
    from safedata_pipeline_spark.operators import incremental as INC

    df = spark.createDataFrame([(1.0,)], "v double")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        INC.histogram_partials(df, "v", 0.0, 0.0, 10)
    with _pytest.raises(ValueError):
        INC.merge_histograms()
