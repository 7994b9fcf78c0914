"""Stream–stream event-time join twin (streaming/attribution.py):
the watermarked click/view×purchase join over two file streams must
reproduce the batch attribution pairs exactly, and the finish step
over streamed pairs must equal attribute_conversions bit for bit."""

import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from safedata_pipeline_spark.operators import timeseries as TS
from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import attribution as SA


def _batch_sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    convs = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conversion_id"),
        "user_id",
        F.col("ts").alias("conversion_ts"),
    )
    touches = ev.where(F.col("event_type").isin(["click", "view"])).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
    )
    return convs, touches


def test_stream_pairs_match_batch(spark, sf_dir):
    convs, touches = _batch_sides(spark, sf_dir)
    batch = {
        (r.conversion_id, r.touch_id)
        for r in SA.attribution_pairs(convs, touches).collect()
    }
    streamed = SA.run_attribution_stream_once(
        spark, f"{sf_dir}/events*.parquet", "t_attr_pairs"
    )
    got = {(r.conversion_id, r.touch_id) for r in streamed.collect()}
    assert got == batch
    assert len(got) > 0


def test_finish_over_streamed_pairs_equals_batch_operator(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    expected = {
        r.conversion_id: (
            r.n_touches,
            r.first_touch_id,
            r.first_touch_ts,
            r.last_touch_id,
            r.last_touch_ts,
        )
        for r in TS.attribute_conversions(
            ev, "purchase", ["click", "view"], 24.0
        ).collect()
    }
    convs, _ = _batch_sides(spark, sf_dir)
    streamed = SA.run_attribution_stream_once(
        spark, f"{sf_dir}/events*.parquet", "t_attr_pairs2"
    )
    got = {
        r.conversion_id: (
            r.n_touches,
            r.first_touch_id,
            r.first_touch_ts,
            r.last_touch_id,
            r.last_touch_ts,
        )
        for r in SA.finish_attribution(streamed, convs).collect()
    }
    assert got == expected
    assert len(got) > 0
    # zero-touch conversions must survive as NULL rows, not vanish
    assert any(v[0] == 0 for v in expected.values()) == any(
        v[0] == 0 for v in got.values()
    )


def test_stream_join_state_is_watermark_bounded(spark, sf_dir):
    # the physical plan must carry watermarks on both sides of the
    # stream-stream join — that is what bounds the join state
    sdf = SA.stream_attribution_pairs(spark, f"{sf_dir}/events*.parquet")
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
    assert sdf.isStreaming
