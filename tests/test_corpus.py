import os

from pyspark.sql import functions as F

from safedata_pipeline_spark.sources import corpus as CO


def _docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de", f"doc {i}") for i in range(30)],
        "doc_id bigint, lang string, text string",
    )


def test_partitioned_write_layout_and_roundtrip(spark, tmp_path):
    path = str(tmp_path / "corpus")
    CO.write_corpus(_docs(spark), path, partition_by=["lang"])
    assert sorted(d for d in os.listdir(path) if d.startswith("lang=")) == ["lang=de", "lang=en"]
    back = CO.read_corpus(spark, path)
    assert back.count() == 30
    assert back.where(F.col("lang") == "de").count() == 10
    # one part file per partition directory (target_files_per_partition=1)
    en_files = [f for f in os.listdir(f"{path}/lang=en") if f.endswith(".parquet")]
    assert len(en_files) == 1


def test_partition_filter_prunes_scan(spark, tmp_path):
    from safedata_pipeline_spark import plans

    path = str(tmp_path / "corpus2")
    CO.write_corpus(_docs(spark), path, partition_by=["lang"])
    pruned = CO.read_corpus(spark, path).where(F.col("lang") == "en")
    plan = plans.formatted_plan(pruned)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:120]
