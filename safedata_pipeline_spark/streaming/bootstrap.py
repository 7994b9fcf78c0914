"""Streaming twin of the one-pass Poisson bootstrap (X224/X225) — live
error bars on a streamed metric (SURVEY §2.8; no reference
counterpart).

Spark-first: the bootstrap's sufficient statistics
(b, Σ round(w·x, 9) as DECIMAL, Σ w) form a pure SUM MONOID, so the
replicate state table is a BUILT-IN streaming aggregation in
``complete`` output mode — micro-batch boundaries cannot change the
state (DECIMAL sums are associative and order-free), which is exactly
the merge==direct property the batch ``bootstrap_replicate_state``
pins. State is ≤ replicates+1 rows FOREVER regardless of stream
length (the b = −1 sentinel row carries the point estimate), and the
CI finish (``sampling.bootstrap_finish``) runs batch-side on the sink
— the profile twin's melt+finalize discipline.

Why this matters at 100 TB/day: a streaming dashboard metric without
an uncertainty band invites over-reaction to noise; the Poisson
bootstrap (Chamandy et al. 2012 — built for exactly this streaming
setting at Google) prices the band at one extra ≤ B+1-row aggregate,
with no second pass and no stored sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from safedata_pipeline_spark.operators.sampling import bootstrap_replicate_state


def stream_bootstrap_state(
    stream: DataFrame,
    value_col: str,
    id_col: str,
    replicates: int = 64,
    seed_tag: str = "boot",
) -> DataFrame:
    """Streaming bootstrap state aggregate. Write with
    ``outputMode("complete")``; the sink rows merge bit-for-bit with
    any batch-side state, and ``sampling.bootstrap_finish`` over the
    sink yields (n_rows, n_replicates, mean, ci_lo, ci_hi)."""
    return bootstrap_replicate_state(
        stream, value_col, id_col, replicates, seed_tag, spread=False
    )
