"""Stream/batch twin for CDC latest-wins compaction."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import cdc as CDC
from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import cdc as SCDC


def test_stream_latest_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    batch = {
        (r.user_id, r.event_type): (r.event_id, r.value)
        for r in CDC.latest_by_key(ev, ["user_id", "event_type"], "ts", "event_id").collect()
    }

    src = str(tmp_path / "log")
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    if dict(stream.dtypes).get("ts") != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        SCDC.stream_latest_by_key(stream, ["user_id", "event_type"], "ts", "event_id")
        .writeStream.format("memory")
        .queryName("t_cdc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_type): (r.event_id, r.value)
        for r in spark.table("t_cdc").collect()
    }
    assert got == batch
    assert len(got) > 0


def test_kernel_state_carries_across_batches():
    """A batch-2 row older than the state winner emits nothing; a
    newer one replaces it and re-emits."""
    import pandas as pd

    from safedata_pipeline_spark.streaming.cdc import _latest_batches

    class FakeState:
        def __init__(self):
            self._v = None

        hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    state = FakeState()

    def run(rows):
        pdf = pd.DataFrame(rows, columns=["k", "ts", "event_id", "payload"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        return list(
            _latest_batches(
                (1,), iter([pdf]), state, ["k"], "ts", "event_id",
                ["ts", "event_id", "payload"],
            )
        )

    out1 = run([(1, "2024-01-01 10:00", 7, "new"), (1, "2024-01-01 09:00", 3, "old")])
    assert len(out1) == 1 and out1[0]["payload"].iloc[0] == "new"
    # older-only batch: state unchanged, nothing emitted
    out2 = run([(1, "2024-01-01 08:00", 1, "stale")])
    assert out2 == []
    # newer batch: replaces and re-emits
    out3 = run([(1, "2024-01-02 00:00", 9, "newest")])
    assert len(out3) == 1 and out3[0]["payload"].iloc[0] == "newest"
    assert state.get[1] == 9

    # null-timestamp rows never win (batch latest_by_key: NULL ts
    # loses every comparison; pandas sorts NaT last, so without the
    # dropna guard the NaT row would be picked as the batch winner)
    out4 = run([(1, None, 99, "null-ts")])
    assert out4 == []
    assert state.get[1] == 9
    # mixed batch: the non-null row wins even when the NaT row would
    # sort after it
    out5 = run([(1, None, 100, "null-ts-2"), (1, "2024-01-03 00:00", 11, "real")])
    assert len(out5) == 1 and out5[0]["payload"].iloc[0] == "real"
