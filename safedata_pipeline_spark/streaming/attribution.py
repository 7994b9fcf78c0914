"""Stream–stream event-time join twin of the batch conversion
attribution (``operators/timeseries.attribute_conversions``, X179):
click/view touches and purchase conversions arrive as TWO unbounded
streams and are joined on user inside the lookback window — the
canonical Structured Streaming ad-attribution join (public Spark
stream-stream join semantics; no reference counterpart).

Split of work, mirroring the drift twin's stream→finish shape:
  * ``attribution_pairs`` — the shared INNER join expression; runs
    identically on batch frames and on watermarked streams.
  * ``stream_attribution_pairs`` — the same join over two file
    streams with watermarks on BOTH event-time columns plus the
    time-range predicate, which is exactly what lets Spark bound the
    join state: touch-side rows are dropped once the conversion-side
    watermark passes ``touch_ts + lookback``, conversion-side rows
    once the touch-side watermark passes ``conversion_ts``. State ≈
    one lookback window of touches per user — NOT the full history.
  * ``finish_attribution`` — first/last/count per conversion over the
    (streamed or batch) pairs, left-joined back to conversions so
    zero-touch conversions keep their NULL row; bit-equal to
    ``attribute_conversions`` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    """File stream over the events fixture with the same ts
    normalization as ``streaming.events`` (nanos-as-long legacy
    footers and TIMESTAMP_NTZ both become TimestampType)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path_glob).schema
    stream = spark.readStream.schema(schema).parquet(path_glob)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def attribution_pairs(
    convs: DataFrame, touches: DataFrame, lookback_hours: float = 24.0
) -> DataFrame:
    """INNER user-keyed join with the half-open event-time window
    ``conv_ts − lookback < touch_ts ≤ conv_ts`` riding it. The same
    expression serves batch parity checks and the stream-stream join
    (where the range predicate is what bounds state)."""
    win = F.make_interval(secs=F.lit(float(lookback_hours) * 3600.0))
    return convs.join(
        touches,
        on=[
            convs["user_id"] == touches["user_id"],
            touches["touch_ts"] <= convs["conversion_ts"],
            touches["touch_ts"] > convs["conversion_ts"] - win,
        ],
        how="inner",
    ).select(
        "conversion_id",
        convs["user_id"].alias("user_id"),
        "conversion_ts",
        "touch_id",
        "touch_ts",
    )


def stream_attribution_pairs(
    spark: SparkSession,
    path_glob: str,
    conversion_type: str = "purchase",
    touch_types: list[str] | None = None,
    lookback_hours: float = 24.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Two watermarked streams over the same source, joined on user +
    event-time range. Per stream-stream join semantics the watermark
    delay adds to the state horizon: touches live for
    ``lookback + watermark`` of event time, conversions for
    ``watermark`` — both bounded, independent of stream length."""
    touch_types = touch_types or ["click", "view"]
    ev1 = _event_stream(spark, path_glob)
    ev2 = _event_stream(spark, path_glob)
    convs = (
        ev1.where(F.col("event_type") == conversion_type)
        .select(
            F.col("event_id").alias("conversion_id"),
            F.col("user_id"),
            F.col("ts").alias("conversion_ts"),
        )
        .withWatermark("conversion_ts", watermark)
    )
    touches = (
        ev2.where(F.col("event_type").isin(touch_types))
        .select(
            F.col("user_id"),
            F.col("event_id").alias("touch_id"),
            F.col("ts").alias("touch_ts"),
        )
        .withWatermark("touch_ts", watermark)
    )
    return attribution_pairs(convs, touches, lookback_hours)


def finish_attribution(pairs: DataFrame, convs: DataFrame) -> DataFrame:
    """First/last/count per conversion over (possibly streamed) inner
    pairs, then a left join from ALL conversions so the unattributable
    share keeps its NULL row — output bit-equal to
    ``attribute_conversions``. ``convs`` columns: (conversion_id,
    user_id, conversion_ts)."""
    first = F.min(F.struct("touch_ts", "touch_id"))
    last = F.max(F.struct("touch_ts", "touch_id"))
    agg = pairs.groupBy("conversion_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        first.getField("touch_id").alias("first_touch_id"),
        first.getField("touch_ts").alias("first_touch_ts"),
        last.getField("touch_id").alias("last_touch_id"),
        last.getField("touch_ts").alias("last_touch_ts"),
    )
    return convs.join(agg, "conversion_id", "left").select(
        "conversion_id",
        "user_id",
        "conversion_ts",
        F.coalesce("n_touches", F.lit(0)).cast("bigint").alias("n_touches"),
        "first_touch_id",
        "first_touch_ts",
        "last_touch_id",
        "last_touch_ts",
    )


def run_attribution_stream_once(
    spark: SparkSession,
    path_glob: str,
    table: str = "attribution_pairs_stream",
    **kwargs,
) -> DataFrame:
    """Drain the stream-stream join into an in-memory table. No
    maxFilesPerTrigger: the fixture's files are NOT ordered by event
    time, so a multi-batch drain would advance the watermark past
    later-arriving old files and (correctly, per late-data semantics)
    drop their rows — one micro-batch keeps the drain deterministic
    for the stream==batch equality test. Production streams keep the
    multi-batch behavior and rely on sources being roughly time-
    ordered within the watermark delay, like every watermarked twin
    in this package."""
    q = (
        stream_attribution_pairs(spark, path_glob, **kwargs)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
