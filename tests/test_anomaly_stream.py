"""Stream/batch twin for the rolling-baseline anomaly monitor."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import timeseries as TS
from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import anomalies as SA


def test_stream_anomalies_match_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r.event_id: (r.value, r.baseline_mean, r.baseline_n)
        for r in TS.rolling_anomalies(ev, n=5, factor=3.0, min_baseline_n=3).collect()
    }

    raw = ev.select("event_id", "user_id", "ts", "value")
    src = str(tmp_path / "ev")
    raw.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    if dict(stream.dtypes).get("ts") != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        SA.stream_rolling_anomalies(stream, n=5, factor=3.0, min_baseline_n=3)
        .writeStream.format("memory")
        .queryName("t_anoms")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: (r.value, r.baseline_mean, r.baseline_n)
        for r in spark.table("t_anoms").collect()
    }
    assert got == batch
    assert len(got) > 0


def test_anomaly_kernel_state_carries_across_batches():
    """The state tail carries the last n events between micro-batches:
    a spike in batch 2 is judged against batch 1's baseline."""
    import pandas as pd

    from safedata_pipeline_spark.streaming.anomalies import _anomaly_batches

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        hasTimedOut = False

    st = FakeState()
    t0 = pd.Timestamp("2026-01-01")

    def pdf(rows):
        return pd.DataFrame(
            {
                "ts": [t0 + pd.Timedelta(minutes=m) for m, _, _ in rows],
                "event_id": [e for _, e, _ in rows],
                "value": [v for _, _, v in rows],
            }
        )

    # batch 1: three calm events, no flags (min evidence not met early)
    out1 = list(
        _anomaly_batches((7,), iter([pdf([(0, 1, 10.0), (1, 2, 10.0), (2, 3, 10.0)])]), st, 5, 3.0, 3)
    )
    assert out1 == []
    # batch 2: spike is flagged against the carried baseline of 10.0
    out2 = list(_anomaly_batches((7,), iter([pdf([(3, 4, 100.0)])]), st, 5, 3.0, 3))
    assert len(out2) == 1 and out2[0].iloc[0]["baseline_mean"] == 10.0
    assert out2[0].iloc[0]["baseline_n"] == 3
    # state stays bounded at n
    ts_us, ids, vals = st.get
    assert len(vals) == 4 <= 5
