import datetime

from safedata_pipeline_spark.operators import timeseries as TS


def test_rolling_user_stats_frames(spark):
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 7, float(v))
        for i, v in enumerate([10, 20, 60, 4])
    ] + [(99, t0, 8, 100.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    got = {r.event_id: r for r in TS.rolling_user_stats(df, n=3).collect()}
    # user 7: frames grow to 3 then slide
    assert got[0].roll_n == 1 and got[0].roll_mean == 10.0 and got[0].roll_max == 10.0
    assert got[1].roll_n == 2 and got[1].roll_mean == 15.0
    assert got[2].roll_n == 3 and got[2].roll_mean == 30.0 and got[2].roll_max == 60.0
    assert got[3].roll_n == 3 and got[3].roll_mean == 28.0 and got[3].roll_max == 60.0
    # user 8 is independent
    assert got[99].roll_n == 1 and got[99].roll_mean == 100.0


def test_rolling_user_stats_tie_break_deterministic(spark):
    t0 = datetime.datetime(2026, 1, 1)
    # two events at the SAME ts: event_id orders them
    df = spark.createDataFrame(
        [(2, t0, 1, 5.0), (1, t0, 1, 1.0)],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )
    got = {r.event_id: r for r in TS.rolling_user_stats(df, n=2).collect()}
    assert got[1].roll_n == 1 and got[2].roll_n == 2 and got[2].roll_mean == 3.0
