"""JSONL source/sink — the de-facto interchange format for LLM
training corpora (one JSON document per line).

Spark's JSON reader is line-delimited by default (``multiLine=False``),
which is exactly JSONL and keeps files SPLITTABLE: a 100 TB corpus of
uncompressed or bzip2/zstd-framed JSONL fans out across executors by
byte range. Always pass an explicit schema in production — schema
inference is a full extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read line-delimited JSON. ``schema`` (StructType or DDL string)
    skips the inference pass; corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """Write line-delimited JSON, one part file per partition
    (repartition upstream to control file count/size)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
