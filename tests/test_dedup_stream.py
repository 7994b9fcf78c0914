from datetime import datetime

from safedata_pipeline_spark.streaming import dedup_stream as DS


def _docs(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0), "alpha"),
        (2, datetime(2024, 1, 1, 0, 1), "beta"),
        (3, datetime(2024, 1, 1, 0, 2), "alpha"),  # dup of 1
        (4, datetime(2024, 1, 1, 0, 3), "gamma"),
        (5, datetime(2024, 1, 1, 0, 4), "beta"),  # dup of 2
    ]
    return spark.createDataFrame(rows, "doc_id bigint, ts timestamp, text string")


def test_stream_dedup_drops_copies(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    _docs(spark).repartition(1).write.parquet(src)
    out = DS.run_dedup_stream_once(spark, src, table="dedup_out_t1")
    texts = sorted(r.text for r in out.collect())
    assert texts == ["alpha", "beta", "gamma"]


def test_batch_twin_keeps_first_by_ts(spark):
    out = {r.text: r.doc_id for r in DS.dedup_stream(_docs(spark)).collect()}
    assert out == {"alpha": 1, "beta": 2, "gamma": 4}
