"""Structured Streaming over the ``events`` table (SURVEY §2.8: no
reference counterpart — pure Spark Structured Streaming idioms for the
fixture stream).

``hourly_event_profile`` is written once and used twice:
  * batch: the oracle-checkable ``events_hourly`` query;
  * streaming: ``stream_hourly_event_profile`` applies the same
    aggregation to a file stream with a watermark, so late events
    older than the watermark are dropped instead of growing state
    forever — the 100 TB streaming posture (bounded state, append to
    sink per closed window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_profile(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + value stats.
    Written with ``window()`` so the identical expression runs in the
    streaming job."""
    # sums/avgs ride DECIMAL: double addition across shuffle partitions
    # is order-dependent and diverged from the oracle by 1e-6 at sf0.1
    v = F.col("value").cast("decimal(38,12)")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(v).cast("double") / F.count(F.lit(1)), 6).alias("avg_value"),
            F.round(F.sum(v).cast("double"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            "n_events",
            "avg_value",
            "sum_value",
        )
    )


def stream_hourly_event_profile(
    spark: SparkSession, path_glob: str, watermark: str = "2 hours"
) -> DataFrame:
    """The same hourly profile as an unbounded stream with bounded
    state: watermark closes windows once event time passes, so state
    for old hours is dropped (late data beyond the watermark is
    discarded, matching the batch result for on-time data)."""
    # streams need an explicit schema; take it from a batch footer read.
    # ``ts`` has shipped as nanosecond parquet timestamps (readable only
    # as long via the legacy conf) and as plain µs naive timestamps —
    # normalize either to TimestampType in-plan, mirroring
    # sources.tables.load_table (watermarks reject TIMESTAMP_NTZ).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path_glob).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path_glob)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return hourly_event_profile(stream.withWatermark("ts", watermark))


def run_stream_once(spark: SparkSession, path_glob: str, table: str = "events_hourly_stream"):
    """Drain everything currently in the source into an in-memory table
    (availableNow trigger) — used by tests to compare stream vs batch."""
    q = (
        stream_hourly_event_profile(spark, path_glob)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def sliding_event_profile(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window per-type profile (2 h windows every 1 h by
    default): each event lands in window/slide overlapping windows, so
    the dashboard sees smoothed hour-over-hour trends instead of
    tumbling-bucket cliffs. Identical expression runs on a stream (with
    a watermark upstream, state = open windows only). DECIMAL value
    sums for cross-engine determinism, like ``hourly_event_profile``.
    """
    v = F.col("value").cast("decimal(38,12)")
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(v).cast("double") / F.count(F.lit(1)), 6).alias("avg_value"),
            F.round(F.sum(v).cast("double"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "avg_value",
            "sum_value",
        )
    )


def stream_sliding_event_profile(
    spark: SparkSession,
    path_glob: str,
    watermark: str = "2 hours",
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """``sliding_event_profile`` over a file stream: the watermark
    closes each overlapping window once event time passes its end +
    delay, so state holds only the open windows (window/slide per key
    group). Same expression as the batch twin — the stream/batch pair
    is the correctness check."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path_glob).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path_glob)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return sliding_event_profile(
        stream.withWatermark("ts", watermark), window=window, slide=slide
    )


def run_sliding_stream_once(
    spark: SparkSession, path_glob: str, table: str = "events_sliding_stream"
):
    """Drain the source through the sliding profile into a memory table
    (availableNow) — stream-vs-batch twin harness."""
    q = (
        stream_sliding_event_profile(spark, path_glob)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
