"""Bucketed-table writer/reader — the co-location mechanism for
repeated large joins.

A bucketed table is hash-partitioned BY FILE LAYOUT on its bucket
columns: two tables bucketed the same way join with ZERO exchanges
(asserted in ``tests/test_bucketing.py``). At 100 TB this is the
difference between shuffling both fact tables on every join and
shuffling them once at write time — use for the dimensions/facts a
pipeline joins repeatedly (e.g. documents ⋈ embeddings on doc id).

Bucket count trades file count against parallelism: pick so each
bucket is 100 MB–1 GB at the target scale; it must MATCH across
tables meant to co-join (Spark only elides the shuffle when bucket
counts are equal or integer multiples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table registered as ``name``
    (external, at ``path``). ``sort_cols`` additionally sorts within
    each bucket file, which upgrades co-located joins to merge joins
    without a sort step."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (the bucketing metadata only survives via
    the catalog — reading the parquet path directly loses it)."""
    return spark.table(name)
