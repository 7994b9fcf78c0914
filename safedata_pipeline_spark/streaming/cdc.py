"""Streaming twin of ``operators.cdc.latest_by_key`` — CDC compaction
over an unbounded upsert log (SURVEY §2.8; no reference counterpart:
the reference reads static snapshots only).

Semantics: per key, keep the winner under (ts, tiebreak) ordering —
the same contract as the batch operator (tiebreak unique per key at a
given ts). Each micro-batch emits the key's CURRENT winner row for
every key the batch touched, so the output is an upsert changelog:
the latest emission per key IS the snapshot. Draining a bounded
source with ``availableNow`` puts each key's full history in one
batch, and the emitted rows equal ``cdc.latest_by_key`` exactly (the
stream==batch equivalence test).

State per key is ONE row — (ts_us, tiebreak, pickled payload) —
bounded regardless of log length. The payload pickles the row's
column values verbatim (binary state column), so doubles/timestamps
round-trip bit-exactly; no JSON re-parse drift. A later batch whose
rows all lose to the state's winner emits nothing (no-op update).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

STATE_SCHEMA = "ts_us long, tb long, payload binary"


def _latest_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
    out_cols: list[str],
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        return
    best = None  # (ts_us, tb, {col: value})
    if state.exists:
        ts_us, tb, payload = state.get
        best = (ts_us, tb, pickle.loads(bytes(payload)))
    changed = False
    for pdf in pdfs:
        # null-ts rows can never win under batch latest_by_key (NULL
        # loses every max(struct) comparison); pandas would sort NaT
        # last and pick one, so drop them before the winner pick
        pdf = pdf.dropna(subset=[ts_col])
        if pdf.empty:
            continue
        # vectorized per micro-batch: the batch's winner is the last
        # row under (ts, tiebreak) sort — one candidate per batch
        row = pdf.sort_values([ts_col, tiebreak]).iloc[-1]
        t_us = int(pd.Timestamp(row[ts_col]).value // 1000)
        tb = int(row[tiebreak])
        if best is None or (t_us, tb) > (best[0], best[1]):
            best = (t_us, tb, {c: row[c] for c in out_cols})
            changed = True
    if best is None:
        return
    if changed:
        state.update((best[0], best[1], pickle.dumps(best[2])))
        vals = dict(best[2])
        for i, k in enumerate(keys):
            vals[k] = key[i]
        yield pd.DataFrame({c: [vals[c]] for c in (keys + out_cols)})


def stream_latest_by_key(
    log_stream: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Latest-wins compaction over a streaming upsert log: one state
    row per key, an upsert-changelog output (append mode — sinks that
    want the snapshot keep the last row per key, e.g. with the batch
    ``latest_by_key`` over the sink table)."""
    out_cols = [c for c in log_stream.columns if c not in keys]
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in log_stream.schema.fields
        if f.name in keys
    ) + ", " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in log_stream.schema.fields
        if f.name not in keys
    )

    def fn(key, pdfs, state):
        yield from _latest_batches(key, pdfs, state, keys, ts_col, tiebreak, out_cols)

    return (
        log_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=ddl,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
