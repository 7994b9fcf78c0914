from datetime import datetime

from safedata_pipeline_spark.operators import joins as J


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_outer(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:10:00")),  # after clicks a,b -> b
            (2, 10, _ts("2024-01-01 00:05:00")),  # exactly at b -> b (inclusive)
            (3, 10, _ts("2024-01-01 00:00:30")),  # after a only -> a
            (4, 20, _ts("2024-01-01 00:01:00")),  # user with no clicks -> null
            (5, 10, _ts("2023-12-31 23:00:00")),  # before all clicks -> null
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:00"), 1.0),  # a
            (101, 10, _ts("2024-01-01 00:05:00"), 2.0),  # b
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    got = {
        r.event_id: r
        for r in J.asof_join(
            left, right, key="user_id", right_cols=["event_id", "ts", "value"], prefix="click_"
        ).collect()
    }
    assert got[1].click_event_id == 101
    assert got[2].click_event_id == 101
    assert got[3].click_event_id == 100
    assert got[4].click_event_id is None
    assert got[5].click_event_id is None
    # left columns intact
    assert got[1].user_id == 10 and got[1].ts == _ts("2024-01-01 00:10:00")


def test_asof_right_row_atomicity(spark):
    # a null value in the newest right row must NOT inherit the older
    # row's value — the whole struct is carried, not per-column last()
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:10:00"))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:00"), 5.0),
            (101, 10, _ts("2024-01-01 00:05:00"), None),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    row = J.asof_join(left, right, key="user_id", right_cols=["event_id", "value"]).collect()[0]
    assert row.r_event_id == 101 and row.r_value is None


def test_range_join_bucketed(spark):
    left = spark.createDataFrame(
        [(1, 0.5), (2, 5.0), (3, 19.99), (4, 20.0), (5, 999.0), (6, None)],
        "id bigint, v double",
    )
    ranges = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 100.0)],
        "tier string, lo double, hi double",
    )
    got = {r.id: r.tier for r in J.range_join_bucketed(left, ranges, "v", bucket_width=7.0).collect()}
    assert got[1] == "low"
    assert got[2] == "mid"  # lo inclusive
    assert got[3] == "mid"
    assert got[4] == "high"  # hi exclusive / boundary bucket handoff
    assert got[5] is None  # out of every range, still present (left outer)
    assert got[6] is None  # null value


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    # heavy skew: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(i, 1 if i % 10 else 2) for i in range(200)], "row_id bigint, k bigint"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k bigint, label string"
    )
    from safedata_pipeline_spark.operators.joins import salted_join

    salted = salted_join(left, right, "k", salt=4)
    plain = left.join(right, "k")
    assert salted.count() == plain.count()
    a = sorted((r.row_id, r.label) for r in salted.collect())
    b = sorted((r.row_id, r.label) for r in plain.collect())
    assert a == b
    # the join key set includes the salt -> hot key spreads across tasks
    assert "__salt" not in salted.columns


def test_sole_late_supplier_shape(spark):
    """Q21 shape on planted data: only the sole-late supplier in a
    multi-supplier order is counted; solo-supplier orders and orders
    with two late suppliers are excluded."""
    import __spark_entry__ as entry
    import datetime as dt
    import os, tempfile, shutil

    d = tempfile.mkdtemp()
    try:
        od = dt.datetime(1996, 1, 1)
        late, ok = od + dt.timedelta(days=90), od + dt.timedelta(days=5)
        spark.createDataFrame(
            [(1, 10, "F", 1.0, od, "P"), (2, 10, "F", 1.0, od, "P"),
             (3, 10, "F", 1.0, od, "P"), (4, 10, "O", 1.0, od, "P")],
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.parquet(f"{d}/orders.parquet")
        li = [
            # order 1: supp 100 late, supp 200 on time -> supp 100 counted
            (1, 1, 100, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (1, 1, 200, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ok),
            # order 2: both supps late -> nobody counted
            (2, 1, 100, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (2, 1, 200, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            # order 3: single supplier late -> excluded (no other supplier)
            (3, 1, 300, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            # order 4: status 'O' -> excluded even though late + multi
            (4, 1, 100, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (4, 1, 200, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ok),
        ]
        spark.createDataFrame(
            li,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
            "l_returnflag string, l_linestatus string, l_shipdate timestamp",
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            [(100, "SUPP_100", 0, 1.0), (200, "SUPP_200", 0, 1.0), (300, "SUPP_300", 0, 1.0)],
            "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double",
        ).write.parquet(f"{d}/supplier.parquet")
        out = {r.s_name: r.numwait for r in entry._q_sole_late_supplier(spark, d).collect()}
        assert out == {"SUPP_100": 1}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_transition_matrix_counts_and_probs(spark):
    import datetime as dt

    from safedata_pipeline_spark.operators.timeseries import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> buy ; user 2: view -> view -> click
        (1, t0, "view", 1), (1, t0 + dt.timedelta(minutes=1), "click", 2),
        (1, t0 + dt.timedelta(minutes=2), "buy", 3),
        (2, t0, "view", 4), (2, t0 + dt.timedelta(minutes=1), "view", 5),
        (2, t0 + dt.timedelta(minutes=2), "click", 6),
        # same-timestamp tie broken by event_id: view(7) then click(8)
        (3, t0, "view", 7), (3, t0, "click", 8),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string, event_id bigint")
    out = {(r.prev_type, r.next_type): r for r in transition_matrix(df).collect()}
    assert out[("view", "click")].n == 3   # users 1, 2, 3
    assert out[("view", "view")].n == 1
    assert out[("click", "buy")].n == 1
    assert out[("view", "click")].prob == 0.75  # 3 of 4 view-exits
    assert out[("click", "buy")].prob == 1.0
    assert ("buy", "view") not in out  # no cross-user transitions


def test_interval_overlap_join_exact_vs_brute(spark):
    """Grid-bucketed overlap join == brute-force inequality join, with
    NO duplicate pairs (single-emission bucket rule), across spans
    smaller, equal to and larger than the bucket width."""
    from safedata_pipeline_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 9.0, 11.0), (3, 10.0, 40.0), (4, 3.0, 3.0), (5, 7.0, 2.0)],
        "aid bigint, s double, e double",
    )
    b = spark.createDataFrame(
        [(10, 4.0, 10.0), (11, 10.0, 12.0), (12, 0.0, 100.0), (13, 39.0, 41.0)],
        "bid bigint, lo double, hi double",
    )
    for w in (1.0, 5.0, 32.0):
        got = sorted(
            (r.aid, r.bid)
            for r in interval_overlap_join(a, b, "s", "e", "lo", "hi", w).collect()
        )
        brute = sorted(
            (ra.aid, rb.bid)
            for ra in a.collect()
            for rb in b.collect()
            if ra.s < rb.hi and rb.lo < ra.e and ra.s < ra.e and rb.lo < rb.hi
        )
        assert got == brute, f"w={w}"
        assert len(got) == len(set(got))  # no duplicate emissions
    # half-open: empty (4) and inverted (5) intervals never match;
    # touching endpoints (2 ends at 11, 11 starts at 10 -> overlap 10..11)
    pairs = set(
        (r.aid, r.bid)
        for r in interval_overlap_join(a, b, "s", "e", "lo", "hi", 5.0).collect()
    )
    assert (2, 11) in pairs and (1, 11) not in pairs  # 1 ends at 5 < lo 10
    assert not any(x in (4, 5) for x, _ in pairs)
