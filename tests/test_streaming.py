from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import events as SE


def test_stream_matches_batch(spark, sf_dir):
    batch = SE.hourly_event_profile(load_table(spark, sf_dir, "events"))
    expected = {(r.hour_start, r.event_type): (r.n_events, r.avg_value) for r in batch.collect()}

    # file-stream sources want a directory or glob, not a single file
    streamed = SE.run_stream_once(spark, f"{sf_dir}/events*.parquet", "t_stream_hourly")
    got = {(r.hour_start, r.event_type): (r.n_events, r.avg_value) for r in streamed.collect()}
    assert got == expected
    assert len(got) > 0


def test_sliding_profile_overlap(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    tumbling = SE.hourly_event_profile(ev)
    sliding = SE.sliding_event_profile(ev, window="2 hours", slide="1 hour")
    n_events = ev.count()
    # every event lands in exactly window/slide = 2 sliding windows
    assert sliding.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events
    assert tumbling.agg(F.sum("n_events")).collect()[0][0] == n_events
    # a sliding window [t, t+2h) covers the two tumbling hours inside it
    t = {(r.hour_start, r.event_type): r.n_events for r in tumbling.collect()}
    for r in sliding.limit(50).collect():
        import datetime

        h0 = t.get((r.window_start, r.event_type), 0)
        h1 = t.get((r.window_start + datetime.timedelta(hours=1), r.event_type), 0)
        assert r.n_events == h0 + h1


def test_sliding_stream_matches_batch(spark, sf_dir):
    batch = SE.sliding_event_profile(load_table(spark, sf_dir, "events"))
    expected = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    streamed = SE.run_sliding_stream_once(spark, f"{sf_dir}/events*.parquet", "t_stream_sliding")
    got = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in streamed.collect()
    }
    assert got == expected and len(got) > 0


def test_drift_timeline_stream_matches_batch(spark, sf_dir):
    """The streaming drift monitor (per-(hour,bin) counts under a
    watermark + KS finish vs a fixed reference CDF) reproduces the
    batch drift_timeline exactly when the reference is fit on the same
    data the stream consumed."""
    from safedata_pipeline_spark.operators import drift as DR
    from safedata_pipeline_spark.streaming import drift as SD

    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r.hour_start,): (r.n_rows, r.ks_stat)
        for r in DR.drift_timeline(ev, "ts", "value", bins=100).collect()
    }
    ref = SD.fit_reference(ev, "value", bins=100)
    streamed = SD.run_drift_stream_once(
        spark, f"{sf_dir}/events*.parquet", ref, "t_stream_drift"
    )
    got = {(r.hour_start,): (r.n_rows, r.ks_stat) for r in streamed.collect()}
    assert got == batch and len(got) > 0

    # the finishing step over BATCH counts is the same number too
    counts = SD.hourly_bin_counts(ev, ref["lo"], ref["width"], ref["bins"])
    finished = {
        (r.hour_start,): (r.n_rows, r.ks_stat)
        for r in SD.finish_timeline(counts, ref).collect()
    }
    assert finished == batch


def test_drift_timeline_psi_stream_matches_batch(spark, sf_dir):
    """The PSI finish over streamed per-(hour,bin) counts equals the
    batch finish, and a planted shifted hour scores high PSI while an
    in-distribution hour scores low."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.streaming import drift as SD

    ev = load_table(spark, sf_dir, "events")
    ref = SD.fit_reference(ev, "value", bins=50)
    batch = {
        r.hour_start: (r.n_rows, r.psi)
        for r in SD.finish_timeline_psi(
            SD.hourly_bin_counts(ev, ref["lo"], ref["width"], ref["bins"]), ref
        ).collect()
    }
    q = (
        SD.stream_hourly_bin_counts(spark, f"{sf_dir}/events*.parquet", ref)
        .writeStream.format("memory")
        .queryName("t_stream_psi")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.hour_start: (r.n_rows, r.psi)
        for r in SD.finish_timeline_psi(spark.table("t_stream_psi"), ref).collect()
    }
    assert got == batch and len(got) > 0

    # sanity on the metric itself: synthetic shifted hour scores high
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    # nine uniform hours dominate the reference; hour 9 is all-9s
    rows = [
        (t0 + datetime.timedelta(hours=h), float(v % 10))
        for h in range(9)
        for v in range(200)
    ] + [(t0 + datetime.timedelta(hours=9), 9.0)] * 200
    syn = spark.createDataFrame(rows, "ts timestamp, value double")
    ref2 = SD.fit_reference(syn, "value", bins=10)
    psis = {
        r.hour_start.hour: r.psi
        for r in SD.finish_timeline_psi(
            SD.hourly_bin_counts(syn, ref2["lo"], ref2["width"], ref2["bins"]), ref2
        ).collect()
    }
    assert psis[9] > 0.25 > psis[0]


def test_percentile_bands_stream_matches_batch(spark, sf_dir):
    """The binned percentile-band finish over streamed (hour,bin)
    counts equals the batch finish exactly, and every band brackets
    the true rank to within one bin width."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.streaming import drift as SD

    ev = load_table(spark, sf_dir, "events")
    ref = SD.fit_reference(ev, "value", bins=100)
    counts = SD.hourly_bin_counts(ev, ref["lo"], ref["width"], ref["bins"])
    batch = {
        r.hour_start: (r.n, r.p50, r.p95, r.p99)
        for r in SD.finish_bands(counts, ref["lo"], ref["width"]).collect()
    }
    q = (
        SD.stream_hourly_bin_counts(spark, f"{sf_dir}/events*.parquet", ref)
        .writeStream.format("memory")
        .queryName("t_stream_bands")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.hour_start: (r.n, r.p50, r.p95, r.p99)
        for r in SD.finish_bands(
            spark.table("t_stream_bands"), ref["lo"], ref["width"]
        ).collect()
    }
    assert got == batch and len(got) > 0

    # the binned guarantee is a RANK bracket, not closeness to the
    # interpolated percentile (sparse hours put adjacent order stats
    # bins apart): at least p*n values sit at or below the band's bin
    # right edge, and fewer than p*n strictly below its left edge
    import collections

    vals = collections.defaultdict(list)
    for r in ev.select(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"), "value"
    ).collect():
        if r["value"] is not None:
            vals[r["h"]].append(r["value"])
    width = ref["width"]
    checked = 0
    for h, (n, b50, b95, b99) in batch.items():
        xs = sorted(vals[h])
        assert n == len(xs)
        for p, band in ((0.5, b50), (0.95, b95), (0.99, b99)):
            below_right = sum(1 for x in xs if x <= band + width + 1e-9)
            below_left = sum(1 for x in xs if x < band - width - 1e-9)
            assert below_right >= p * n - 1e-9
            assert below_left < p * n
        checked += 1
    assert checked > 0
