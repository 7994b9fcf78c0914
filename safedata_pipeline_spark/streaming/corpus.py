"""Streaming corpus ingest (SURVEY §2.8 extension surface; no
reference counterpart): the text-analysis operators are pure per-row
Column expressions, so the SAME functions run unmodified over a file
stream — score/filter documents as they land instead of re-profiling
the corpus per batch drop.

Stateless ops only: quality scoring, token counts, language ID,
fingerprints, threshold filtering — one map-only projection, no
state, no watermark, ingest-rate bound. Anything needing a global
aggregate (exact quantile thresholds, TF-IDF idf, LSH pair joins)
belongs in the batch layer — here thresholds arrive as fixed config
(e.g. from the last batch ``quality_filter`` run), the standard
lambda-architecture split for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import text as TX


def scored_documents(docs: DataFrame) -> DataFrame:
    """text_profile ∪ quality as ONE projection — works identically on
    batch and streaming frames (a join between two scored streams
    would demand watermarks; a single select needs nothing)."""
    return TX.text_profile(docs, include_quality=True)


def stream_scored_documents(
    spark: SparkSession,
    path_glob: str,
    min_quality: float | None = None,
) -> DataFrame:
    """File-stream documents → per-document score columns, optionally
    filtered by a fixed quality threshold."""
    schema = spark.read.parquet(path_glob).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 4).parquet(path_glob)
    )
    scored = scored_documents(stream)
    if min_quality is not None:
        scored = scored.where(F.col("quality") >= min_quality)
    return scored


def run_scored_stream_once(
    spark: SparkSession,
    path_glob: str,
    table: str = "scored_docs_stream",
    min_quality: float | None = None,
):
    """Drain the current source into an in-memory table (availableNow)
    — test harness for stream-vs-batch equality."""
    q = (
        stream_scored_documents(spark, path_glob, min_quality)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def stream_extract_html(
    spark: SparkSession,
    path_glob: str,
    html_col: str = "html",
    min_words: int = 3,
    max_link_density: float = 0.5,
):
    """Streaming HTML → text extraction: ``extract_html_text`` is a
    pure map-only projection (zero aggregates, zero state), so the
    SAME operator runs unmodified over a file stream — extract crawl
    snapshots as they land, feeding the stateless scorer above.
    Documents whose every line is boilerplate (empty extraction) drop
    in-stream."""
    schema = spark.read.parquet(path_glob).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 4).parquet(path_glob)
    )
    out = TX.extract_html_text(
        stream, html_col=html_col, min_words=min_words,
        max_link_density=max_link_density,
    )
    return out.where(F.col("text") != "")


def run_extract_stream_once(
    spark: SparkSession,
    path_glob: str,
    table: str = "extracted_docs_stream",
    html_col: str = "html",
):
    """Drain the current source into an in-memory table (availableNow)
    — test harness for stream-vs-batch equality."""
    q = (
        stream_extract_html(spark, path_glob, html_col=html_col)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
