"""Hypertable-style multi-resolution time rollups (SURVEY §2.8
extension surface; no reference counterpart).

``hypertable_rollup`` computes hour/day/month aggregates the way a
time-series store maintains continuous aggregates: raw rows are
scanned ONCE into hourly partials; daily re-aggregates the hourly
partials; monthly re-aggregates daily. At 100 TB the coarser
resolutions read tiny partial tables instead of rescanning the raw
data (here the hourly/daily frames are persisted; in a deployment they
are materialized tables the next resolution reads).

Exactness across the hierarchy: the re-aggregated sums must equal a
direct GROUP BY from raw — double addition is not associative, so sums
ride DECIMAL(38,12) (exact, order-free) and convert to double only in
the final projection. The DuckDB oracle aggregates straight from raw
at every resolution and hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUM_ROUND = 4
AVG_ROUND = 6


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Hour/day/month rollup of count/sum/min/max/avg per ``key_col``.
    Output: (resolution, bucket_start, <key>, n_events, sum_value,
    min_value, max_value, avg_value)."""
    v = F.col(val_col).cast("decimal(38,12)")
    hourly = (
        events.groupBy(F.date_trunc("hour", ts_col).alias("bucket"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("s"),
            F.min(val_col).alias("mn"),
            F.max(val_col).alias("mx"),
        )
        .persist()
    )

    def coarsen(df: DataFrame, unit: str) -> DataFrame:
        return df.groupBy(F.date_trunc(unit, "bucket").alias("bucket"), key_col).agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )

    daily = coarsen(hourly, "day").persist()
    monthly = coarsen(daily, "month")

    def finish(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.col("bucket").cast("timestamp_ntz").alias("bucket_start"),
            key_col,
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("s").cast("double"), SUM_ROUND).alias("sum_value"),
            F.col("mn").alias("min_value"),
            F.col("mx").alias("max_value"),
            # divide as doubles AFTER the exact decimal sum: decimal
            # division scale rules differ across engines, double IEEE
            # division does not
            F.round(F.col("s").cast("double") / F.col("n"), AVG_ROUND).alias("avg_value"),
        )

    return (
        finish(hourly, "hour")
        .unionByName(finish(daily, "day"))
        .unionByName(finish(monthly, "month"))
    )
