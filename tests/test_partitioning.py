"""spread_small gate behavior: raise-only repartition, job-free probe,
structural (not textual) exchange detection — ADVICE r10."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.partitioning import (
    _has_shuffle_exchange,
    spread_small,
)


def test_spread_small_raises_partitions_on_narrow_input(spark):
    df = spark.range(0, 1000, 1, 2).withColumn("s", F.lit("x"))
    out = spread_small(df)
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


def test_spread_small_noop_when_plan_already_shuffles(spark):
    df = (
        spark.range(0, 1000, 1, 2)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    out = spread_small(df)
    assert out is df  # downstream width governed by shuffle.partitions


def test_spread_small_noop_when_already_wide(spark):
    wide = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, 1000, 1, wide)
    out = spread_small(df)
    assert out is df


def test_shuffle_detection_is_structural(spark):
    # broadcast-join plan: contains BroadcastExchange but NO shuffle —
    # must NOT short-circuit (the old text regex was one "Reused"
    # prefix away from matching it)
    big = spark.range(0, 1000, 1, 2).withColumnRenamed("id", "k")
    small = spark.range(0, 10).withColumnRenamed("id", "k")
    joined = big.join(F.broadcast(small), "k")
    jplan = joined._jdf.queryExecution().sparkPlan()
    assert not _has_shuffle_exchange(jplan)

    shuffled = spark.range(0, 100, 1, 2).repartition(4)
    assert _has_shuffle_exchange(
        shuffled._jdf.queryExecution().sparkPlan()
    )


def test_spread_small_broadcast_join_still_spreads_narrow_scan(spark):
    big = spark.range(0, 1000, 1, 2).withColumnRenamed("id", "k")
    small = spark.range(0, 10).withColumnRenamed("id", "k")
    joined = big.join(F.broadcast(small), "k")
    out = spread_small(joined)
    # no shuffle in the plan and only 2 scan splits -> repartition up
    assert out is not joined
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


def test_spread_small_pinned_floors_post_shuffle_width(spark):
    """A tiny post-distinct frame AQE-coalesces to ~1 partition and
    spread_small (correctly) no-ops on it; spread_small_pinned must
    floor the width at defaultParallelism — the r11 decade-2 gates
    measured the gram explode going single-core exactly here."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.partitioning import spread_small_pinned

    d = (
        spark.range(0, 5000, 1, 4)
        .select((F.col("id") % 2000).alias("v"))
        .distinct()
    )
    out = spread_small_pinned(d)
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    # values survive the pin + repartition intact
    assert out.count() == 2000
