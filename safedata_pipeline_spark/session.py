"""SparkSession factory tuned for the safedata engine.

Scale notes:
  * AQE on: runtime partition coalescing + skew-join splitting means we
    don't hand-tune ``spark.sql.shuffle.partitions`` per query; the
    local default (env ``SPARK_GRAFT_CPUS`` or 32) only sets the
    pre-AQE upper bound.
  * Session timezone pinned to UTC so timestamp semantics match the
    naive timestamps in the parquet fixtures (and the DuckDB oracle).
  * Arrow enabled for the few driver-side collections (report tables)
    and for pandas-UDF batches (multimodal decode path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "safedata-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SAFEDATA_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SAFEDATA_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
