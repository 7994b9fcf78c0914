"""CSV source/sink (SURVEY §2.1 S1/S2).

Mirrors the reference's bare ``pd.read_csv`` (app.py:116-119): header
row, schema inferred. For production-scale ingest callers should pass
an explicit ``schema`` — ``inferSchema`` costs an extra pass over the
data, which is fine for a 200-row demo CSV and wrong for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export of a protected table (reference app.py:200)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
