"""ORC source/sink (extension surface — the reference reads only CSV;
ORC is the other columnar format Spark ships a vectorized reader for,
common where corpora arrive from Hive/Trino pipelines).

Same scale posture as parquet: columnar, splittable, predicate
pushdown and column pruning reach the scan (Spark's OrcScan reports
``PushedFilters``/``ReadSchema`` exactly like parquet), so every plan
guarantee in PLANS.md transfers. Prefer parquet for new data; this
exists so a user with ORC inputs doesn't need a conversion pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
