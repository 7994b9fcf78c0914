"""Stream/batch twin for the Count-Min state: draining a bounded
source equals the batch sketch bit-for-bit; point queries run
against the sink."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import sketch as SK
from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import sketch as SSK

D, W = 4, 256


def test_stream_count_min_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type")
    batch = {(r.d, r.slot): r.n for r in SK.count_min_state(ev, "event_type", D, W).collect()}

    src = str(tmp_path / "ev")
    ev.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        SSK.stream_count_min_state(stream, "event_type", D, W)
        .writeStream.format("memory")
        .queryName("t_cm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.d, r.slot): r.n for r in spark.table("t_cm").collect()}
    assert got == batch and len(got) > 0
    # batch-side point query over the sink state: exact at this load
    true = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    probes = spark.createDataFrame([(k,) for k in true], "value string")
    est = {r.value: r.cm_estimate
           for r in SK.count_min_query(spark.table("t_cm"), probes, depth=D, width=W).collect()}
    for k, t in true.items():
        assert est[k] >= t


def test_heavy_hitters_exact_vs_groupby(spark):
    rows = [("a",)] * 40 + [("b",)] * 25 + [("c",)] * 10 + [(f"x{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "w string")
    got = {r.value: r.n for r in SK.heavy_hitters(df, "w", min_count=10, depth=4, width=64).collect()}
    assert got == {"a": 40, "b": 25, "c": 10}
    # threshold above everything → empty, never a false positive
    assert SK.heavy_hitters(df, "w", min_count=100, depth=4, width=64).count() == 0


def test_stream_hll_registers_equal_batch(spark, sf_dir, tmp_path):
    """Draining the events fixture through the streaming HLL register
    aggregate must equal the batch register table bit for bit, and the
    finished estimates must match exactly."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators.sketch import (
        hll_md5_estimate,
        hll_md5_registers,
    )
    from safedata_pipeline_spark.sources.tables import load_table
    from safedata_pipeline_spark.streaming.sketch import stream_hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day_start"), "user_id"
    )
    batch = hll_md5_registers(ev, "user_id", ["day_start"])
    src = str(tmp_path / "ev_hll")
    ev.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        stream_hll_registers(stream, "user_id", ["day_start"])
        .writeStream.format("memory")
        .queryName("t_hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.day_start, r.bucket, r.r) for r in spark.table("t_hll_regs").collect()
    }
    want = {(r.day_start, r.bucket, r.r) for r in batch.collect()}
    assert got == want and len(got) > 0
    est_b = {
        (r.day_start, r.ndv_estimate)
        for r in hll_md5_estimate(batch, ["day_start"]).collect()
    }
    est_s = {
        (r.day_start, r.ndv_estimate)
        for r in hll_md5_estimate(spark.table("t_hll_regs"), ["day_start"]).collect()
    }
    assert est_s == est_b


def test_stream_bootstrap_matches_batch(spark, sf_dir, tmp_path):
    """Draining a bounded stream equals the batch bootstrap state
    bit-for-bit (DECIMAL sum monoid), and the finished CI row is
    identical."""
    from safedata_pipeline_spark.operators.sampling import (
        bootstrap_finish,
        bootstrap_replicate_state,
    )
    from safedata_pipeline_spark.streaming.bootstrap import stream_bootstrap_state
    from safedata_pipeline_spark.sources.tables import load_table as _lt

    docs = _lt(spark, sf_dir, "documents").select("doc_id", "n_chars")
    B = 16
    batch_state = {
        r.b: (str(r.s), r.wsum)
        for r in bootstrap_replicate_state(docs, "n_chars", "doc_id", B).collect()
    }
    batch_fin = bootstrap_finish(
        bootstrap_replicate_state(docs, "n_chars", "doc_id", B)
    ).collect()[0]

    src = str(tmp_path / "docs")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_bootstrap_state(stream, "n_chars", "doc_id", B)
        .writeStream.format("memory")
        .queryName("t_boot")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.b: (str(r.s), r.wsum) for r in spark.table("t_boot").collect()}
    assert got == batch_state and len(got) == B + 1
    fin = bootstrap_finish(spark.table("t_boot")).collect()[0]
    assert fin == batch_fin
