"""Stream/batch twin for incremental profiling: draining a bounded
source through the streaming aggregate must equal the batch
profile bit-for-bit (DECIMAL-sum monoid)."""

from safedata_pipeline_spark.operators import incremental as INC
from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import profile as SP

COLS = ["value", "user_id"]


def test_stream_profile_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    batch = {
        r.column: r.asDict()
        for r in INC.finalize_profile(INC.profile_partials(ev, COLS)).collect()
    }

    src = str(tmp_path / "ev")
    # force several micro-batches: one input file per partition chunk
    ev.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        SP.stream_profile_partials(stream, COLS)
        .writeStream.format("memory")
        .queryName("t_prof")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.column: r.asDict()
        for r in SP.profile_from_sink(spark.table("t_prof"), COLS).collect()
    }
    assert got == batch
    assert set(got) == set(COLS)


def test_stream_profile_rejects_empty_cols(spark):
    import pytest

    with pytest.raises(ValueError):
        SP.stream_profile_partials(spark.range(1), [])
