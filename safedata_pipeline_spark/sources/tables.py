"""Parquet fixture tables (TESTDATA.md star schema).

Parquet is the engine's canonical columnar source: Catalyst pushes
filters and prunes columns into the scan for free, which is the entire
100 TB story for the profiling operators (a 2-column projection must
read 2 columns, verified in tests via ``explain``/``ReadSchema``).
"""

from __future__ import annotations

import os

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# per-SESSION memo of the lazy DataFrame handle for each (dir, table):
# ``spark.read.parquet`` re-lists the directory and re-reads the
# parquet footer for schema inference on EVERY call — measured
# 80-230 ms per table — and every query build of every bench rep pays
# it (~0.1-0.4 s per query median across the whole registry). The
# memoized object is an immutable LAZY plan: no rows are cached, every
# action on it still scans the parquet files, so this is plan-metadata
# reuse (the same class as Spark's own session-scoped FileStatusCache),
# not result caching. WeakKeyDictionary per session — the
# checkpoint.py flag-cache pattern — so test sessions never leak
# entries into each other.
_TABLE_CACHE: "WeakKeyDictionary" = WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped as both nanosecond parquet timestamps
    (which Spark's reader rejects outright — readable only as long via
    the legacy conf) and plain microsecond timestamps; normalize either
    form to a microsecond TimestampType column.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    per_session = _TABLE_CACHE.get(spark)
    if per_session is None:
        per_session = {}
        _TABLE_CACHE[spark] = per_session
    key = (os.path.abspath(sf_dir), name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    df = _load_table_uncached(spark, sf_dir, name)
    per_session[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # integer div, not /1000.0: nano epochs (~1.7e18) exceed
            # double's 2^53 exact range — float division shifts
            # timestamps by ±1 µs
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for spark.sql access."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
