"""Streaming twin of the Count-Min sketch — a live heavy-hitter /
watchlist counter over an unbounded stream (SURVEY §2.8; no
reference counterpart).

Spark-first: the CM state table (d, slot, n) is a BUILT-IN streaming
aggregation — the same md5-seeded cell fan-out as the batch
``sketch.count_min_state``, grouped in ``complete`` output mode, so
the sink always holds the sketch-of-everything-so-far. Cell counts
are integers and the cell function is deterministic, so draining a
bounded source equals the batch state BIT-FOR-BIT regardless of
micro-batch boundaries (the monoid the batch ``count_min_merge``
pins). Point queries (``sketch.count_min_query``) run against the
sink table — they are batch-side finishes, like the profile twin's
melt+finalize.

State size is ≤ depth·width rows regardless of stream length — the
sketch IS the bounded-state guarantee, which is why CM (not exact
counts) is the streaming-native heavy-hitter screen at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_pipeline_spark.functions.hashing import md5_slot32 as _slot32


def stream_count_min_state(
    stream: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Streaming CM state aggregate. Write with
    ``outputMode("complete")``; the sink rows are the (d, slot, n)
    state table, mergeable with any batch-side state."""
    if depth < 1 or width < 1:
        raise ValueError("need depth >= 1 and width >= 1")
    v = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), (_slot32(v, d) % F.lit(width)).alias("slot"))
            for d in range(depth)
        ]
    )
    return (
        stream.where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.slot").alias("slot"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def stream_hll_registers(
    stream: DataFrame,
    value_col: str,
    group_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """Streaming twin of the md5-register HLL (X201): the register
    table (group, bucket, max rank) is a BUILT-IN streaming aggregation
    — max() is the HLL merge operator, so micro-batch boundaries cannot
    change the state, and draining a bounded source equals the batch
    register table bit for bit. Write with ``outputMode("complete")``;
    finish estimates batch-side with ``sketch.hll_md5_estimate`` on the
    sink (the CM twin's point-query discipline). State is ≤ 2^b rows
    per group forever — a live distinct-users-today dashboard at any
    stream rate."""
    from safedata_pipeline_spark.operators.sketch import hll_md5_registers

    return hll_md5_registers(stream, value_col, group_cols, b)
