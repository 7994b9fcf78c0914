"""Streaming twin of ``operators.timeseries.rolling_anomalies``
(SURVEY §2.8; no reference counterpart): per-user rolling-baseline
anomaly flagging as a custom stateful operator.

State per user is EXACTLY the last ``n`` (ts, event_id, value)
triples — bounded regardless of stream length, the
``applyInPandasWithState`` analog of the sessionizer's one-open-
session struct. Each micro-batch's events are processed in event-time
order merged against that tail, so for in-order streams (and for any
stream drained in one batch) the flags equal the batch operator's
bit-for-bit: the baseline mean uses ``math.fsum`` (correctly-rounded,
= the batch DECIMAL-sum→double) and the half-up 6-decimal snap, the
same float discipline as everywhere else in the engine.

Ordering caveat (documented, not hidden): an event that arrives in a
LATER micro-batch than a newer event of the same user sees the state
tail as its baseline — i.e. late data degrades to
"last n seen so far", the standard streaming trade. The stream==batch
equivalence test drains the source with availableNow, where all rows
of a user share one batch and the results match exactly.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

ANOM_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "baseline_mean double, baseline_n long"
)
STATE_SCHEMA = "ts_us array<long>, ids array<long>, vals array<double>"


def _snap6(x: float) -> float:
    """Half-up rounding to 6 decimals — matches Spark/DuckDB round."""
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def _anomaly_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state,
    n: int,
    factor: float,
    min_n: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        return
    ts_us, ids, vals = state.get if state.exists else ([], [], [])
    ts_us, ids, vals = list(ts_us), list(ids), list(vals)
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid, value in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            if pd.isna(value):
                continue
            t_us = int(pd.Timestamp(ts).value // 1000)
            bn = len(vals)
            if bn >= min_n:
                mean = _snap6(math.fsum(vals) / bn)
                if float(value) > factor * mean:
                    out.append((int(eid), user_id, t_us, float(value), mean, bn))
            ts_us.append(t_us)
            ids.append(int(eid))
            vals.append(float(value))
            if len(vals) > n:
                ts_us, ids, vals = ts_us[-n:], ids[-n:], vals[-n:]
    state.update((ts_us, ids, vals))
    if out:
        yield pd.DataFrame(
            {
                "event_id": [r[0] for r in out],
                "user_id": [r[1] for r in out],
                "ts": [pd.Timestamp(r[2], unit="us") for r in out],
                "value": [r[3] for r in out],
                "baseline_mean": [r[4] for r in out],
                "baseline_n": [r[5] for r in out],
            }
        )


def stream_rolling_anomalies(
    events_stream: DataFrame,
    n: int = 5,
    factor: float = 3.0,
    min_baseline_n: int = 3,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Anomalies over an unbounded event stream with bounded per-user
    state (the last ``n`` events). Flags emit as soon as the batch
    containing the event processes — the monitoring latency is one
    micro-batch, not one window close."""

    def fn(key, pdfs, state):
        yield from _anomaly_batches(key, pdfs, state, n, factor, min_baseline_n)

    return (
        events_stream.select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ANOM_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
