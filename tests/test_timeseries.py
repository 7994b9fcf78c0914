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


def test_rolling_anomalies_baseline_excludes_current(spark):
    t0 = datetime.datetime(2026, 1, 1)
    vals = [10.0, 10.0, 10.0, 100.0, 10.0]
    df = spark.createDataFrame(
        [(i, t0 + datetime.timedelta(minutes=i), 1, v) for i, v in enumerate(vals)],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )
    got = TS.rolling_anomalies(df, n=5, factor=3.0, min_baseline_n=3).collect()
    # only the 100.0 spike is flagged (baseline mean 10 from 3 priors);
    # the event after the spike has an inflated baseline, still no flag
    assert [r.event_id for r in got] == [3]
    assert got[0].baseline_mean == 10.0 and got[0].baseline_n == 3
    # first events lack evidence -> never flagged even if large
    df2 = spark.createDataFrame(
        [(0, t0, 2, 1000.0)],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )
    assert TS.rolling_anomalies(df2).count() == 0


def test_hourly_retention(spark):
    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

    def ev(i, user, minutes):
        return (i, t0 + datetime.timedelta(minutes=minutes), user, 1.0)

    rows = [
        ev(1, 1, 0), ev(2, 1, 61),    # user 1: hour 10 and 11 -> retained at 10
        ev(3, 2, 5),                  # user 2: hour 10 only
        ev(4, 3, 10), ev(5, 3, 130),  # user 3: hour 10 then 12 -> NOT retained
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    got = {r.hour_start.hour: r for r in TS.hourly_retention(df).collect()}
    assert got[10].n_users == 3 and got[10].n_retained == 1
    assert abs(got[10].retention_rate - round(1 / 3, 6)) < 1e-9
    # hour 11: only user 1, does not return in hour 12
    assert got[11].n_users == 1 and got[11].n_retained == 0
    # hour 12: user 3, last hour -> zero retention reported honestly
    assert got[12].n_users == 1 and got[12].n_retained == 0


def test_per_key_trend_recovers_known_slope(spark):
    from datetime import datetime, timedelta

    from safedata_pipeline_spark.operators.timeseries import per_key_trend

    base = datetime(2024, 1, 1)
    rows = []
    # key 1: exact line value = 10 + 2.5 * hours
    for h in range(6):
        rows.append((1, base + timedelta(hours=h), 10.0 + 2.5 * h))
    # key 2: single point -> NULL fit
    rows.append((2, base, 99.0))
    # key 3: two points at the SAME x -> degenerate, NULL fit
    rows.append((3, base, 1.0))
    rows.append((3, base, 2.0))
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, value double")
    out = {r["key"]: r for r in per_key_trend(df, "k", "ts", "value").collect()}
    assert out[1]["slope_per_hour"] == 2.5
    assert out[1]["intercept"] == 10.0
    assert out[2]["slope_per_hour"] is None and out[2]["n_points"] == 1
    assert out[3]["slope_per_hour"] is None  # zero-variance x
    # no window, hash-agg shape
    plan = per_key_trend(df, "k", "ts", "value")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_hourly_percentiles_values_and_approx_switch(spark):
    from datetime import datetime, timedelta

    from safedata_pipeline_spark.operators.timeseries import hourly_percentiles

    base = datetime(2024, 1, 1, 5)
    rows = [(base + timedelta(minutes=i), float(i)) for i in range(11)]   # hour A: 0..10
    rows += [(base + timedelta(hours=1, minutes=i), 100.0) for i in range(4)]  # hour B: constant
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["hour_start"]: r for r in hourly_percentiles(df, "ts", "value").collect()}
    a = out[base]
    assert a["n"] == 11 and a["p50"] == 5.0 and a["p95"] == 9.5
    b = out[base + timedelta(hours=1)]
    assert b["p50"] == b["p99"] == 100.0
    approx = hourly_percentiles(df, "ts", "value", exact=False).collect()
    assert {r["hour_start"] for r in approx} == set(out)


def test_growth_accounting_decomposition(spark):
    from datetime import datetime

    from safedata_pipeline_spark.operators.timeseries import growth_accounting

    d = datetime
    rows = [
        # u1 active days 1,2,4: new, retained, resurrected
        (1, d(2024, 1, 1, 5)), (1, d(2024, 1, 2, 6)), (1, d(2024, 1, 4, 7)),
        # u2 active day 2 only: new
        (2, d(2024, 1, 2, 9)),
        # duplicate activity in one day collapses
        (1, d(2024, 1, 1, 22)),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {r["period_start"].day: r for r in growth_accounting(ev).collect()}
    assert (out[1]["n_active"], out[1]["n_new"]) == (1, 1)
    assert (out[2]["n_active"], out[2]["n_new"], out[2]["n_retained"]) == (2, 1, 1)
    assert (out[4]["n_active"], out[4]["n_resurrected"]) == (1, 1)
    for r in out.values():
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        growth_accounting(ev, period="week")


def test_trending_per_period_ranks_and_ties(spark):
    from datetime import datetime

    from safedata_pipeline_spark.operators.timeseries import trending_per_period

    d = datetime(2024, 1, 1, 10)
    rows = [(d, "b")] * 3 + [(d, "a")] * 3 + [(d, "c")] * 1 + [(d, "d")] * 2
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = trending_per_period(ev, top_k=3).collect()
    ranked = sorted((r["rank"], r["key"], r["n"]) for r in out)
    # tie between a and b at 3 -> a first (key asc); c drops out of top-3
    assert ranked == [(1, "a", 3), (2, "b", 3), (3, "d", 2)]


def test_cohort_retention_triangle(spark):
    from datetime import datetime

    from safedata_pipeline_spark.operators.timeseries import cohort_retention

    d = datetime
    rows = [
        # cohort day1: u1 (returns day2), u2 (returns day3)
        (1, d(2024, 1, 1, 8)), (1, d(2024, 1, 2, 8)),
        (2, d(2024, 1, 1, 9)), (2, d(2024, 1, 3, 9)),
        # cohort day2: u3 only
        (3, d(2024, 1, 2, 10)),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {
        (r["cohort_day"].day, r["day_offset"]): (r["n_users"], r["retention_rate"])
        for r in cohort_retention(ev).collect()
    }
    assert out[(1, 0)] == (2, 1.0)
    assert out[(1, 1)] == (1, 0.5)   # u1 back on day 2
    assert out[(1, 2)] == (1, 0.5)   # u2 back on day 3
    assert out[(2, 0)] == (1, 1.0)
    assert (2, 1) not in out


def test_conversion_attribution_first_last_and_nulls(spark):
    """X179: first/last touch within the lookback; out-of-window and
    post-conversion touches never attribute; no-touch conversions keep
    a NULL row; simultaneous touches tiebreak by id."""
    from datetime import datetime

    from safedata_pipeline_spark.operators.timeseries import attribute_conversions

    t0 = datetime(2024, 1, 10, 12, 0, 0)

    def ts(h):
        return datetime(2024, 1, 10 + (12 + h) // 24, (12 + h) % 24)

    rows = [
        # user A: touches at -30h (out), -5h, -1h; conversion at 0
        (1, "u_a", ts(-30), "click"),
        (2, "u_a", ts(-5), "view"),
        (3, "u_a", ts(-1), "click"),
        (4, "u_a", t0, "purchase"),
        (5, "u_a", ts(1), "click"),          # after conversion: ignored
        # user B: conversion with no touches
        (6, "u_b", t0, "purchase"),
        # user C: two touches at the SAME ts -> id tiebreak
        (7, "u_c", ts(-2), "click"),
        (8, "u_c", ts(-2), "view"),
        (9, "u_c", t0, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, user_id string, ts timestamp, event_type string")
    got = {
        r.conversion_id: r
        for r in attribute_conversions(
            ev, "purchase", ["click", "view"], lookback_hours=24.0
        ).collect()
    }
    a = got[4]
    assert (a.n_touches, a.first_touch_id, a.last_touch_id) == (2, 2, 3)
    b = got[6]
    assert b.n_touches == 0 and b.first_touch_id is None and b.last_touch_ts is None
    c = got[9]
    assert (c.first_touch_id, c.last_touch_id) == (7, 8)  # same ts, id breaks
