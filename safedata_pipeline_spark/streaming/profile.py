"""Streaming twin of ``operators.incremental`` profiling — a live
data-quality profile over an unbounded stream (SURVEY §2.8; no
reference counterpart: the reference profiles static snapshots only).

Spark-first design: sufficient statistics (count / null count /
DECIMAL sum / sumsq / min / max) are a BUILT-IN streaming aggregation
— no custom state kernel, no Python in the loop. The stream
aggregates with the *identical* expression list the batch operator
uses (``incremental.partial_agg_exprs``), in ``complete`` output
mode: each micro-batch updates the single wide state row, and the
sink always holds the profile-of-everything-so-far. Because the sums
are DECIMAL (exact, associative — the monoid the batch module pins
with bit-equality tests), the streaming result after draining a
bounded source equals the batch ``profile_partials`` of the same
rows BIT-FOR-BIT, regardless of micro-batch boundaries.

Reshaping (melt to per-column rows) and ``finalize_profile`` are
map-only finishes over O(columns) rows — run them on the sink table,
not inside the streaming plan (generators after a streaming
aggregate are restricted; the state that matters is the wide row).

At 100 TB/day: state is ONE row × O(columns) accumulators; the
shuffle is the standard partial→final streaming agg exchange. No
watermark needed — the aggregate is global and order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from safedata_pipeline_spark.operators.incremental import (
    finalize_profile,
    melt_partials,
    partial_agg_exprs,
)


def stream_profile_partials(stream: DataFrame, cols: list[str]) -> DataFrame:
    """Streaming sufficient-statistics aggregate (wide 1-row form).
    Write with ``outputMode("complete")``; the latest sink row is the
    running profile state."""
    if not cols:
        raise ValueError("no columns")
    return stream.agg(*partial_agg_exprs(cols))


def profile_from_sink(row: DataFrame, cols: list[str]) -> DataFrame:
    """Finish on the sink side: melt the wide state row into the
    per-column state table and finalize to the human-facing profile —
    the same code path as the batch operator."""
    return finalize_profile(melt_partials(row, cols))
