"""User sessionization over the events stream — the custom stateful
operator showcase (SURVEY §2.8: streaming constructs have no reference
counterpart; built on pure Structured Streaming idioms).

``user_sessions`` (batch): gap-based sessions via lag + running sum —
one window partitioned by user (parallel across users, no global
sort). Fully SQL-expressible → oracle-checked.

``user_sessions_native`` / ``stream_user_sessions_native``: the same
gap-based sessions through Spark's BUILT-IN ``session_window``
aggregate — fully JVM-side (no Python in the loop), one shuffle, and
on streams the state store handles merge/expiry natively. Preferred
whenever plain gap sessions are all that's needed; boundary semantics
verified identical to the window twin (an event exactly ``gap`` after
the previous one MERGES on both paths).

``stream_user_sessions``: the same semantics as an unbounded stateful
stream via ``applyInPandasWithState`` — per-user state holds only the
open session (bounded state); closed sessions emit downstream. This is
the (b)-tier custom operator from the build rules kept for CUSTOM
state the built-in can't express: the globally-unique per-user session
NUMBERING it carries across batches (a stream can't row_number), and
any richer open-session payload a derived pipeline needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_GAP_MIN = 30

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def user_sessions(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``. Gap
    arithmetic is µs-exact (integer) so engines agree on boundaries.
    Output one row per session."""
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    tagged = events.select(
        "user_id",
        "ts",
        "value",
        (
            F.coalesce(
                (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
                > F.lit(gap_us),
                F.lit(True),
            )
        )
        .cast("long")
        .alias("new_s"),
    )
    sess = tagged.withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def _native_session_agg(events: DataFrame, gap_minutes: int) -> DataFrame:
    """One ``session_window`` hash aggregate: the JVM state-merge form
    of gap sessionization, shared by the batch and stream native
    paths (and by consumers like ``session_concurrency`` that don't
    need the per-user numbering)."""
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("__w")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("__w")
    )


def user_sessions_native(
    events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN
) -> DataFrame:
    """Batch sessionization via the built-in ``session_window``
    aggregate — same output contract as ``user_sessions`` (verified
    equal row-for-row, including the exactly-at-gap merge boundary),
    but the session merge runs inside one JVM hash aggregate instead
    of a per-user sort window + second aggregate. The per-user
    ``session_id`` numbering is restored with one window over the
    SESSION rows (a few per user — dashboard-sized), keyed by
    session_start with the same total order the event-time numbering
    produces."""
    agg = _native_session_agg(events, gap_minutes)
    w = Window.partitionBy("user_id").orderBy("session_start")
    return agg.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
        "sum_value",
    )


def stream_user_sessions_native(
    events_stream: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MIN,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization on the built-in ``session_window``
    state: the state store merges/extends sessions and emits each one
    when the watermark passes its close — no Python in the loop, no
    custom state schema. Emits WITHOUT the per-user session counter
    (a stream has no total order to number by; use the
    ``applyInPandasWithState`` kernel when numbering matters)."""
    return _native_session_agg(
        events_stream.select("user_id", "ts", "value").withWatermark(
            "ts", watermark_delay
        ),
        gap_minutes,
    )


def session_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    gap_minutes: int = DEFAULT_GAP_MIN,
) -> DataFrame:
    """Session funnel analysis: how many sessions reach each step of
    an ordered event-type chain (first-occurrence semantics: a session
    reaches stage k iff the first occurrences of steps 1..k appear in
    strictly increasing time order). Output: one row per step —
    ``(stage, step, n_sessions)`` with n_sessions = sessions reaching
    AT LEAST that stage.

    Shape: the ``user_sessions`` gap tagging (per-user window, µs-
    exact integer arithmetic) → ONE groupBy per (user, session) with
    conditional min-ts per step → a scalar aggregate → k output rows.
    No joins; the funnel chain is a pure column expression over the
    per-session step times, so engines agree exactly.
    """
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    tagged = events.select(
        "user_id",
        "ts",
        "event_type",
        (
            F.coalesce(
                (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
                > F.lit(gap_us),
                F.lit(True),
            )
        )
        .cast("long")
        .alias("new_s"),
    )
    sess = tagged.withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    mins = sess.groupBy("user_id", "session_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"__t{i}")
            for i in range(len(steps))
            for s in [steps[i]]
        ]
    )
    # reached-stage indicators: each includes its whole prefix chain
    indicators = []
    chain = None
    for i in range(len(steps)):
        ci = F.col(f"__t{i}").isNotNull()
        if i > 0:
            ci = ci & (F.col(f"__t{i}") > F.col(f"__t{i-1}"))
        chain = ci if chain is None else (chain & ci)
        indicators.append(chain.cast("bigint"))
    counts = mins.agg(
        *[F.sum(ind).alias(f"__c{i}") for i, ind in enumerate(indicators)]
    )
    stages = [
        F.struct(
            F.lit(i + 1).alias("stage"),
            F.lit(s).alias("step"),
            F.coalesce(F.col(f"__c{i}"), F.lit(0)).cast("bigint").alias("n_sessions"),
        )
        for i, s in enumerate(steps)
    ]
    return counts.select(F.inline(F.array(*stages)))


def _sessions_frame(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [c[0] for c in rows],
            "session_id": [c[1] for c in rows],
            "session_start": [pd.Timestamp(c[2], unit="us") for c in rows],
            "session_end": [pd.Timestamp(c[3], unit="us") for c in rows],
            "n_events": [c[4] for c in rows],
            "sum_value": [round(c[5], 4) for c in rows],
        }
    )


def _sessionize_batches(
    key: tuple, pdfs: Iterator[pd.DataFrame], state, gap_us: int
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: folds event batches into the open session,
    emitting each session as soon as a later event closes it — or when
    the event-time timeout fires (watermark passed session_end + gap),
    which flushes the final open session instead of losing it.

    Out-of-order events across micro-batches (t ≤ last seen, but above
    the watermark) merge into the open session without moving its
    boundaries backwards: start = min(start, t), end = max(end, t)."""
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed end+gap: no event can extend this session.
        # Keep the session COUNTER (null boundaries = no open session,
        # no timeout armed) instead of removing state: a removed
        # counter would restart a returning user at session 1,
        # emitting duplicate (user_id, session_id) keys and breaking
        # the batch twin's cumulative numbering. Residual state is 5
        # scalars per ever-seen user — the unavoidable cost of
        # globally-unique per-user session numbers.
        sid, start_us, last_us, n, sv = state.get
        state.update((sid, None, None, 0, 0.0))
        yield _sessions_frame([(user_id, sid, start_us, last_us, n, sv)])
        return
    if state.exists:
        sid, start_us, last_us, n, sv = state.get
    else:
        sid, start_us, last_us, n, sv = 0, None, None, 0, 0.0
    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                sid, start_us, last_us, n, sv = sid + 1, t_us, t_us, 1, float(value)
            elif t_us - last_us > gap_us:
                closed.append((user_id, sid, start_us, last_us, n, sv))
                sid, start_us, last_us, n, sv = sid + 1, t_us, t_us, 1, float(value)
            else:
                start_us = min(start_us, t_us)
                last_us = max(last_us, t_us)
                n, sv = n + 1, sv + float(value)
    if start_us is not None:
        state.update((sid, start_us, last_us, n, sv))
        # flush when the watermark passes session_end + gap; must be
        # strictly above the current watermark or Spark rejects it
        timeout_ms = max(last_us // 1000 + gap_us // 1000 + 1, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield _sessions_frame(closed)


def stream_user_sessions(
    events_stream: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MIN,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization with bounded per-user state (the open
    session only). Sessions emit when closed by a later event OR when
    the event-time watermark passes session_end + gap (EventTimeTimeout)
    — so the final open session per user is flushed, not lost, and
    state for idle users is reclaimed. ``watermark_delay`` bounds how
    late an event may arrive and still merge into its session."""
    gap_us = gap_minutes * 60_000_000

    def fn(key, pdfs, state):
        yield from _sessionize_batches(key, pdfs, state, gap_us)

    return (
        events_stream.select("user_id", "ts", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def session_concurrency(
    events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN
) -> DataFrame:
    """Concurrent-session timeline by sweep-line: +1 at each session's
    start hour, −1 the hour AFTER its end hour, cumulative-summed over
    the hour grid — "how many sessions were open during hour h?"
    (capacity-planning / load dashboard). Output: one row per
    change-point hour — (hour_start, n_concurrent); between change
    points the level is constant (the standard sweep-line encoding).

    Shape: sessions themselves are the one event-row pass
    (the native ``session_window`` aggregate — numbering isn't needed
    here, so the row_number window is skipped entirely); the delta
    union + groupBy + cumulative window all run on the HOUR GRID
    (≤ thousands of rows at any horizon) — same dashboard-sized-window
    discipline as ``value_counts``. All-integer deltas, engine-exact.
    """
    s = _native_session_agg(events, gap_minutes)
    start_h = F.date_trunc("hour", F.col("session_start"))
    end_h = F.date_trunc("hour", F.col("session_end")) + F.expr("INTERVAL 1 HOUR")
    deltas = s.select(start_h.alias("h"), F.lit(1).alias("d")).unionByName(
        s.select(end_h.alias("h"), F.lit(-1).alias("d"))
    )
    g = deltas.groupBy("h").agg(F.sum("d").alias("dd"))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        F.col("h").cast("timestamp_ntz").alias("hour_start"),
        F.sum("dd").over(w).cast("bigint").alias("n_concurrent"),
    )
