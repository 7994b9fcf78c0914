from pyspark.sql import functions as F

from safedata_pipeline_spark.sources import orc as ORC


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", 1.5), (2, "deux", None)],
        "id bigint, text string, score double",
    )
    path = str(tmp_path / "docs_orc")
    ORC.write_orc(df, path)
    back = ORC.read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_scan_pushes_filters_and_prunes(spark, tmp_path):
    from safedata_pipeline_spark import plans

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit("pad").alias("junk")
    )
    path = str(tmp_path / "orc_push")
    ORC.write_orc(df, path)
    q = ORC.read_orc(spark, path).where(F.col("k") > 3).select("id")
    plan = plans.formatted_plan(q)
    assert "Scan orc" in plan
    pushed = plans.pushed_filters(q)
    assert any("k" in p for p in pushed)
    cols = plans.read_schema_columns(q)
    assert "junk" not in cols
