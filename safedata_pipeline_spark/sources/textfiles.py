"""Raw text-file corpus ingestion (extension surface: the ingestion
path for corpora that arrive as plain .txt/.md files rather than
parquet/JSONL — the first step of a crawl-dump curation run).

Two granularities:
  * ``read_text_lines``  — one document per LINE (the common dump
    format: one doc per line, newline-escaped). ``spark.read.text`` is
    splittable: big files divide into many input partitions, so a
    single 100 GB dump file doesn't serialize into one task.
  * ``read_text_files``  — one document per FILE (``wholetext``).
    NOT splittable (each file is one record read by one task) — the
    right tool for many small files; pair it with an upstream
    compaction for huge ones.

Both emit the engine's canonical document shape: a deterministic
``doc_id`` (md5 of provenance — stable across runs and engines),
``source`` (the file path), and ``text`` — so every downstream text
operator (quality, dedup, packing) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _md5_id(*cols) -> "F.Column":
    """Stable 63-bit id from provenance columns: first 15 hex digits of
    md5 (60 bits) — positive bigint, engine-reproducible."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *cols).cast("binary")), 1, 15), 16, 10
    ).cast("bigint")


def read_text_lines(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """One document per line across all matched files. Output:
    (doc_id, source, line_no, text). Blank/short lines are dropped
    before anything downstream pays for them (predicate runs in the
    same scan stage). ``line_no`` is per-file over the KEPT lines, in
    true file order: the window orders by (block start offset, within-
    block monotonic id). Block starts sort a file's byte ranges by
    offset and rows within one block are scanned in file order, so the
    ordering — and therefore ``line_no`` and ``doc_id = md5(source,
    line_no)`` — is identical under ANY split layout
    (maxPartitionBytes, cluster size, bin-packing order). The r3 form
    hashed the raw monotonic id, which IS layout-dependent; ids minted
    then do not match ids minted now."""
    from pyspark.sql import Window

    df = (
        spark.read.text(path)
        .select(
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
            F.input_file_block_start().alias("__blk"),
            F.monotonically_increasing_id().alias("__mid"),
        )
        .where(F.length(F.trim("text")) >= min_chars)
    )
    w = Window.partitionBy("source").orderBy("__blk", "__mid")
    lines = df.select(
        "source",
        F.row_number().over(w).cast("bigint").alias("line_no"),
        "text",
    )
    return lines.select(
        _md5_id(F.col("source"), F.col("line_no").cast("string")).alias("doc_id"),
        "source",
        "line_no",
        "text",
    )


def read_text_files(spark: SparkSession, path: str) -> DataFrame:
    """One document per file (``wholetext``). Output:
    (doc_id, source, text); doc_id = md5(path) — stable across runs.
    NOTE: pass ``wholetext`` as the reader KEYWORD — the string
    ``.option("wholetext", "true")`` form is silently ignored by the
    text source in Spark 4."""
    df = spark.read.text(path, wholetext=True)
    return df.select(
        _md5_id(F.input_file_name()).alias("doc_id"),
        F.input_file_name().alias("source"),
        F.col("value").alias("text"),
    )
