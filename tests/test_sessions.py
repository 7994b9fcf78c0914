import datetime

from pyspark.sql import functions as F

from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import sessions as SS


def _events(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: two sessions (gap 45 > 30 between minute 20 and 65)
        (1, ts(0), 1.0),
        (1, ts(10), 2.0),
        (1, ts(20), 3.0),
        (1, ts(65), 4.0),
        (1, ts(70), 5.0),
        # user 2: one session
        (2, ts(5), 10.0),
        (2, ts(25), 10.0),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


def test_batch_sessions(spark):
    out = SS.user_sessions(_events(spark), gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1
    s1, s2 = sorted(by_user[1], key=lambda r: r.session_id)
    assert s1.n_events == 3 and s1.sum_value == 6.0
    assert s2.n_events == 2 and s2.sum_value == 9.0
    assert s1.session_end < s2.session_start


def test_gap_boundary_exclusive(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + datetime.timedelta(minutes=30), 1.0),  # exactly 30 → same session
        (1, t0 + datetime.timedelta(minutes=60, seconds=1), 1.0),  # 30:01 → new
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = SS.user_sessions(df, gap_minutes=30).collect()
    assert len(out) == 2


class _FakeState:
    """Minimal GroupState stand-in for driving the kernel directly."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def test_kernel_out_of_order_across_batches_keeps_end_monotonic():
    import pandas as pd

    from safedata_pipeline_spark.streaming.sessions import _sessionize_batches

    gap_us = 30 * 60_000_000
    t0 = pd.Timestamp("2024-01-01")

    def batch(*minutes):
        return pd.DataFrame(
            {"ts": [t0 + pd.Timedelta(minutes=m) for m in minutes], "value": [1.0] * len(minutes)}
        )

    # batch 1 reaches minute 20; batch 2 delivers a LATE minute-15 event
    state = _FakeState()
    list(_sessionize_batches((7,), iter([batch(0, 10, 20)]), state, gap_us))
    list(_sessionize_batches((7,), iter([batch(15)]), state, gap_us))
    sid, start_us, last_us, n, sv = state.get
    assert last_us == int((t0 + pd.Timedelta(minutes=20)).value // 1000)  # end did NOT move back
    assert start_us == int(t0.value // 1000)
    assert n == 4 and sv == 4.0

    # timeout call flushes the open session and clears state
    out = list(_sessionize_batches((7,), iter([]), _FakeState(state.get, timed_out=True), gap_us))
    assert len(out) == 1 and out[0].iloc[0]["n_events"] == 4


def test_stream_sessions_match_batch_exactly(spark, sf_dir, tmp_path):
    """Stream/batch twin: with EventTimeTimeout, the stream emits EVERY
    session — closed ones as later events arrive, and each user's final
    open session once the watermark passes its end + gap. A far-future
    sentinel event (user -1) drives the watermark past everything."""
    batch = SS.user_sessions(load_table(spark, sf_dir, "events")).collect()
    expected = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in batch
    }

    # load_table normalizes ts to TimestampType whatever the fixture
    # vintage (nanos-as-long or µs-naive); re-write that normalized form
    # so the stream source needs no per-vintage conversion
    raw = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    max_ts = raw.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts + datetime.timedelta(days=10), 0.0)],
        "user_id bigint, ts timestamp, value double",
    )
    src = str(tmp_path / "ev")
    raw.unionByName(sentinel).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    if dict(stream.dtypes).get("ts") != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        SS.stream_user_sessions(stream)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_sessions").collect()
        if r.user_id != -1
    }
    assert got == expected
    assert len(got) > 0


def test_native_batch_matches_window_twin(spark, sf_dir):
    """The built-in session_window path must reproduce the lag+cumsum
    twin row for row — session numbering, boundaries, exact sums."""
    key = lambda r: (  # noqa: E731
        r.user_id, r.session_id, r.session_start, r.session_end, r.n_events, r.sum_value,
    )
    ev = load_table(spark, sf_dir, "events")
    a = sorted(map(key, SS.user_sessions(ev).collect()))
    b = sorted(map(key, SS.user_sessions_native(ev).collect()))
    assert a == b and len(a) > 0


def test_native_gap_boundary_matches_twin(spark):
    # exactly-at-gap merges on BOTH paths; one microsecond past splits
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + datetime.timedelta(minutes=30), 1.0),  # == gap → merge
        (1, t0 + datetime.timedelta(minutes=60, microseconds=1), 1.0),  # > gap → new
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = SS.user_sessions_native(df, gap_minutes=30).collect()
    assert len(out) == 2
    assert sorted(r.n_events for r in out) == [1, 2]


def test_native_stream_matches_batch(spark, sf_dir, tmp_path):
    """Built-in session_window state on a stream == the batch native
    path (no session numbering on the stream — a stream has no total
    order to number by)."""
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in SS.user_sessions_native(load_table(spark, sf_dir, "events")).collect()
    }
    raw = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    max_ts = raw.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts + datetime.timedelta(days=10), 0.0)],
        "user_id bigint, ts timestamp, value double",
    )
    src = str(tmp_path / "ev_native")
    raw.unionByName(sentinel).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    if dict(stream.dtypes).get("ts") != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        SS.stream_user_sessions_native(stream)
        .writeStream.format("memory")
        .queryName("t_sessions_native")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.table("t_sessions_native").collect()
        if r.user_id != -1
    }
    assert got == batch and len(got) > 0


def test_kernel_timeout_flush_preserves_session_counter():
    import pandas as pd

    from safedata_pipeline_spark.streaming.sessions import _sessionize_batches

    gap_us = 30 * 60_000_000
    t0 = pd.Timestamp("2024-01-01")

    def batch(*minutes):
        return pd.DataFrame(
            {"ts": [t0 + pd.Timedelta(minutes=m) for m in minutes], "value": [1.0] * len(minutes)}
        )

    # two sessions close in-stream, the third flushes via timeout
    state = _FakeState()
    list(_sessionize_batches((7,), iter([batch(0, 40, 80)]), state, gap_us))
    sid = state.get[0]
    assert sid == 3
    # watermark passes end+gap: timeout fires with no new events
    state.hasTimedOut = True
    out = list(_sessionize_batches((7,), iter([]), state, gap_us))
    assert out and out[0]["session_id"].tolist() == [3]
    # state must keep the counter (not be removed) with no open session
    assert not state.removed and state.get[0] == 3 and state.get[1] is None
    # the user returns: the new session continues the numbering at 4
    state.hasTimedOut = False
    list(_sessionize_batches((7,), iter([batch(200)]), state, gap_us))
    assert state.get[0] == 4


def test_session_funnel_chain_semantics(spark):
    import datetime

    from safedata_pipeline_spark.streaming import sessions as SS

    t0 = datetime.datetime(2026, 1, 1)

    def ev(i, user, minutes, typ):
        return (i, t0 + datetime.timedelta(minutes=minutes), user, typ, 1.0)

    rows = [
        # user 1, one session: full funnel in order
        ev(1, 1, 0, "view"), ev(2, 1, 1, "click"), ev(3, 1, 2, "purchase"),
        # user 2: click BEFORE view -> only stage 1 (view exists)
        ev(4, 2, 0, "click"), ev(5, 2, 1, "view"),
        # user 3: view then click, purchase in a LATER session (gap > 30min)
        ev(6, 3, 0, "view"), ev(7, 3, 1, "click"), ev(8, 3, 120, "purchase"),
        # user 4: no funnel events at all
        ev(9, 4, 0, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    got = {r.step: (r.stage, r.n_sessions) for r in
           SS.session_funnel(df, ("view", "click", "purchase"), 30).collect()}
    # sessions reaching view: u1, u2, u3-first = 3; click-after-view: u1, u3-first = 2;
    # purchase-after-click: u1 only (u3's purchase is its own session)
    assert got == {"view": (1, 3), "click": (2, 2), "purchase": (3, 1)}


def test_session_concurrency_sweep_line(spark):
    from datetime import datetime

    from safedata_pipeline_spark.streaming.sessions import session_concurrency

    d = datetime
    # u1: one session 10:05-10:10; u2: 10:20-11:40 (spans hours 10,11);
    # u3: 13:00 single-event session
    rows = [
        (1, 1, d(2024, 1, 1, 10, 5), 1.0), (2, 1, d(2024, 1, 1, 10, 10), 1.0),
        (3, 2, d(2024, 1, 1, 10, 20), 1.0), (4, 2, d(2024, 1, 1, 10, 40), 1.0),
        (5, 2, d(2024, 1, 1, 11, 0), 1.0), (6, 2, d(2024, 1, 1, 11, 40), 1.0),
        (7, 3, d(2024, 1, 1, 13, 0), 1.0),
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp, value double")
    out = {r["hour_start"].hour: r["n_concurrent"] for r in session_concurrency(ev, 60).collect()}
    # hour 10: both sessions open; 11: only u2; 12: none; 13: u3; 14: none
    assert out[10] == 2
    assert out[11] == 1
    assert out[12] == 0
    assert out[13] == 1
    assert out[14] == 0
