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

    Two-step gate, both steps job-free:

    1. If the plan already contains an Exchange (checked on the INITIAL
       physical plan, ``queryExecution().sparkPlan()`` — compiled but
       never executed, so under AQE no upstream shuffle stage runs),
       return ``df`` unchanged: downstream width is already governed by
       ``spark.sql.shuffle.partitions``, and a second repartition would
       only add a shuffle of the very rows we're about to explode.
       (The old form asked ``df.rdd.getNumPartitions()`` first, which
       on an AQE plan forces ``getFinalPhysicalPlan`` and EXECUTES the
       upstream shuffle stages once at plan-build time and again in the
       real action — duplicated computation at exactly the scale this
       helper protects.)
    2. Only on a shuffle-FREE (pure scan-stage) plan read the partition
       count — with no exchanges there is no query stage to
       materialize, so this is genuine plan-time metadata — and
       repartition up only when the scan yields fewer splits than the
       target. Both steps run on a column-pruned ``select(lit(1))``
       twin of ``df`` (same split count, trivial codegen), so the probe
       never compiles the real plan's expression trees.
    """
    import re

    from pyspark.sql import functions as F

    target = min_factor * df.sparkSession.sparkContext.defaultParallelism
    # Probe a column-PRUNED twin, not df itself: partition count is
    # column-independent, so select(lit(1)) sees the same splits while
    # Catalyst prunes every projection expression away — the probe's
    # codegen is a constant projection instead of the real plan's
    # (possibly huge) expression trees, which .rdd would otherwise
    # Janino-compile once here and again at the real action.
    probe = df.select(F.lit(1).alias("__spread_probe"))
    try:
        plan = probe._jdf.queryExecution().sparkPlan().toString()
        # a SHUFFLE exchange sets downstream width; a BroadcastExchange
        # does not (the probe side keeps its scan splits), so only the
        # former short-circuits
        if re.search(r"(?<!Broadcast)Exchange", plan):
            return df
    except Exception:  # pragma: no cover - connect/classic API drift
        pass
    if probe.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
