"""Partition-count hygiene helpers.

``spread_small`` exists for one plan shape: an operator is about to
EXPLODE (shingles, char n-grams, band rows) and the input arrived from
a scan whose split count is far below the cluster's core count — at
fixture scale a parquet table is often 1–8 splits on a 32-core
local[.] — so the len-fold explode work would pile onto those few
cores. The old fix (`df.repartition(defaultParallelism)` everywhere)
was tuned to that small case and WRONG at scale: on a real corpus the
scan already yields far more splits than ``defaultParallelism``, and
an unconditional repartition would (a) add a full shuffle of raw text
and (b) actively COALESCE parallelism down to the core count.

``spread_small`` therefore only ever raises the partition count:
it is a no-op whenever the plan already has ≥ defaultParallelism
partitions, so large-corpus plans keep their scan-granted parallelism
and skip the raw-text shuffle entirely. The trade-off it keeps from
the old form: on a genuinely small input it still pays one narrow
shuffle to unlock all cores for the explode — that is the intended
purchase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` UP to ``min_factor ×
    defaultParallelism`` partitions — never down.

    Reads the compiled plan's current partition count (plan-time
    metadata — no job runs) and returns ``df`` unchanged when it
    already meets the target, so at scale this is free.
    """
    target = min_factor * df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
