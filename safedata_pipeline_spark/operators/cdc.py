"""Change-data-capture compaction — latest-record-wins per key.

Extension surface: the reference pipeline reads static CSV snapshots
(/root/reference/app.py upload path); a production feed arrives as an
append log of upserts/deletes, and every downstream operator in this
engine wants the *current* snapshot. These operators compact the log.

Semantics (the public Delta/Hudi/Iceberg "merge latest" model):
  * ``latest_by_key(df, keys, ts_col, tiebreak)`` — one row per key:
    the row with the greatest (ts, tiebreak). ``tiebreak`` must be
    unique within a key at a given ts (an event id / log offset) for
    the result to be well-defined; with that, output is deterministic.
  * ``merge_upserts(base, updates, keys, ts_col, tiebreak,
    delete_col=None)`` — union the snapshot with the update log, keep
    the latest version of every key, then drop rows whose winning
    version is flagged deleted (tombstone semantics).

Scale shape: ONE groupBy on the key — the winner is
``max(struct(ts, tiebreak, payload...))``, a hash aggregation with
map-side partial reduce, so the shuffle carries one candidate row per
(key × map partition), never the full log. No window, no sort of more
than the agg's own hash table. This is the shape that survives a
100 TB event log; a row_number() window over the key would sort every
key's full history in one task instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """Latest-wins compaction: one row per ``keys`` group, ordered by
    (``ts_col`` DESC, ``tiebreak`` DESC). Returns the original columns
    in their original order."""
    payload = [c for c in df.columns if c not in keys]
    ordered = [ts_col, tiebreak] + [
        c for c in payload if c not in (ts_col, tiebreak)
    ]
    best = df.groupBy(*keys).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("__b")
    )
    return best.select(
        *[
            F.col(c) if c in keys else F.col(f"__b.{c}").alias(c)
            for c in df.columns
        ]
    )


def merge_upserts(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply an upsert/delete log to a snapshot: the newest version of
    each key wins across both inputs; if ``delete_col`` is given, keys
    whose winning row has it true disappear from the output (and the
    flag column is dropped — the output is a plain snapshot)."""
    merged = latest_by_key(
        base.unionByName(updates), keys, ts_col, tiebreak
    )
    if delete_col is not None:
        merged = merged.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return merged
