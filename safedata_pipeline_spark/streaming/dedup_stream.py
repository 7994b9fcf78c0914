"""Streaming exact dedup — drop repeated documents as they arrive.

``dropDuplicatesWithinWatermark`` on the content digest keeps ONE
state entry per distinct digest seen within the watermark horizon, so
state is bounded by the dedup window, not the stream's lifetime — the
standard Spark idiom for exactly-once-ish ingest dedup at 100 TB/day
rates. A duplicate arriving after the watermark expired its original
is NOT caught (that's the bounded-state trade; the batch
``dedup_exact`` pass over the landed corpus is the backstop).

The digest is md5 (functions/hashing contract): 16 bytes of state per
document instead of the document itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct text within the watermark
    horizon; later copies are dropped. Works on any streaming (or
    batch) DataFrame with an event-time column."""
    digested = stream.withColumn("content_md5", F.md5(F.col(text_col).cast("binary")))
    if digested.isStreaming:
        return digested.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_md5"]
        )
    # batch twin: same keep-first-per-digest semantics
    from pyspark.sql import Window

    w = Window.partitionBy("content_md5").orderBy(ts_col)
    return (
        digested.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def run_dedup_stream_once(
    spark: SparkSession, path_glob: str, table: str = "dedup_stream_out"
) -> DataFrame:
    """Drain the current source content through the streaming dedup
    into an in-memory table (availableNow) — test/demo harness."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path_glob).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 4).parquet(path_glob)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
