"""Partitioned corpus sink — hive-style directory partitioning for
training-data layouts (``lang=en/quality_tier=high/part-*.parquet``).

Partition columns become directory names, which downstream reads turn
into FREE partition pruning: ``read_corpus(...).where(lang='en')``
never opens non-English files. Rules of thumb encoded here:

  * partition on LOW-cardinality columns only (lang, tier, date);
    high-cardinality partitioning creates millions of tiny files —
    the classic small-files failure at 100 TB;
  * ``target_files_per_partition`` repartitions by the partition key
    first so each output directory gets a bounded number of part
    files instead of one per upstream task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    target_files_per_partition: int | None = 1,
    compression: str = "zstd",
) -> None:
    """Write a hive-partitioned parquet corpus."""
    out = df
    if target_files_per_partition:
        out = df.repartition(
            *[F.col(c) for c in partition_by]
        ) if target_files_per_partition == 1 else df.repartition(
            target_files_per_partition, *[F.col(c) for c in partition_by]
        )
    (
        out.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned corpus; partition-column filters prune at the
    directory level (check ``PartitionFilters`` in the scan node)."""
    return spark.read.parquet(path)
