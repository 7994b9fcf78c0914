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
