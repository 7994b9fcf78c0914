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


def test_stream_sessions_match_batch_closed_ones(spark, sf_dir, tmp_path):
    batch = SS.user_sessions(load_table(spark, sf_dir, "events")).collect()
    # every session except each user's last is 'closed' by a later event
    last_per_user = {}
    for r in batch:
        if r.user_id not in last_per_user or r.session_id > last_per_user[r.user_id]:
            last_per_user[r.user_id] = r.session_id
    expected = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in batch
        if r.session_id != last_per_user[r.user_id]
    }

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events*.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
    }
    assert got == expected
    assert len(got) > 0
