"""Ordered time-series analytics over the events stream (SURVEY §2.8
extension surface; no reference counterpart — the reference has no
event-time data at all, so these are pure Spark analytic-window
idioms).

Scale shape: every window here partitions by ``user_id`` — millions of
small per-user partitions spread across executors; no global ordered
window anywhere. The ordering key is (ts, event_id): (user_id, ts) is
unique in the fixtures, but event_id breaks any tie deterministically,
so the rolling frames are a total order and the results are
engine-exact (the oracle runs the identical ROWS BETWEEN frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_N = 6


def rolling_user_stats(
    events: DataFrame,
    n: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event rolling statistics over each user's last ``n`` events
    (inclusive): mean, max, and the actual frame size — the
    feature-engineering / anomaly-baseline query ("is this event far
    from this user's recent behavior?").

    One analytic window, ROWS-framed (never RANGE: row frames are
    O(1) memory per step and deterministic under the total order).
    The rolling mean sums DECIMAL and divides by the frame count so
    the float result is frame-order independent. Output: one row per
    event — (event_id, user_id, ts, value, roll_mean, roll_max,
    roll_n).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    v_dec = F.col(val_col).cast("decimal(38,12)")
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col).cast("timestamp_ntz").alias(ts_col),
        F.col(val_col),
        # exact DECIMAL sum → double ONCE, then double/bigint divide:
        # decimal÷int result scales differ between engines, double
        # division does not
        F.round(
            F.sum(v_dec).over(w).cast("double") / F.count(F.lit(1)).over(w),
            ROUND_N,
        ).alias("roll_mean"),
        F.max(F.col(val_col)).over(w).alias("roll_max"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("roll_n"),
    )


def hourly_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Hour-over-hour user retention: for each hour, how many distinct
    users were active, and how many of them return in the NEXT hour —
    the cohort-retention dashboard shape. Output one row per hour:
    ``(hour_start, n_users, n_retained, retention_rate)``.

    Shape: distinct (user, hour) pairs (one groupBy — the only shuffle
    touching event rows), a per-user ``lead`` over their ordered hour
    list (per-user partitions, total order: hours are distinct within
    a user), then a per-hour count. Retained = the user's next active
    hour is exactly +1h. The last hour has no next hour to look into
    and still reports its (possibly zero) retention honestly.
    """
    uh = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("hour", F.col(ts_col)).cast("timestamp_ntz").alias("h"),
        )
        .groupBy("u", "h")
        .agg(F.lit(1).alias("__one"))
    )
    w = Window.partitionBy("u").orderBy("h")
    flagged = uh.select(
        "u",
        "h",
        (
            F.lead("h").over(w) == F.col("h") + F.expr("INTERVAL 1 HOUR")
        ).cast("bigint").alias("ret"),
    )
    return flagged.groupBy(F.col("h").alias("hour_start")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.coalesce(F.sum("ret"), F.lit(0)).cast("bigint").alias("n_retained"),
        F.round(
            F.coalesce(F.sum("ret"), F.lit(0)) / F.count(F.lit(1)), ROUND_N
        ).alias("retention_rate"),
    )


def rolling_anomalies(
    events: DataFrame,
    n: int = 5,
    factor: float = 3.0,
    min_baseline_n: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Events whose value exceeds ``factor ×`` the mean of the user's
    PREVIOUS ``n`` events — the per-entity anomaly monitor. The frame
    is strictly preceding (``[-n, -1]``): the current row never
    contaminates its own baseline. Events with fewer than
    ``min_baseline_n`` prior events are skipped — no evidence is not
    an anomaly. Output: (event_id, user_id, ts, value, baseline_mean,
    baseline_n), anomalies only.

    Same scale shape as ``rolling_user_stats``: one per-user ROWS
    window under a total order, DECIMAL-exact baseline sums.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-n, -1)
    )
    v_dec = F.col(val_col).cast("decimal(38,12)")
    staged = events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col).cast("timestamp_ntz").alias(ts_col),
        F.col(val_col),
        F.round(
            F.sum(v_dec).over(w).cast("double") / F.count(F.lit(1)).over(w),
            ROUND_N,
        ).alias("baseline_mean"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("baseline_n"),
    )
    return staged.where(
        (F.col("baseline_n") >= min_baseline_n)
        & (F.col(val_col) > F.lit(float(factor)) * F.col("baseline_mean"))
    )
