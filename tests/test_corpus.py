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


def test_content_defined_chunks_shift_robust_and_lossless(spark):
    from safedata_pipeline_spark.operators.text import content_defined_chunks

    base = ("the quick brown fox jumps over the lazy dog and runs through fields "
            "of golden wheat toward the river bank where ducks swim quietly ") * 4
    shifted = "PREFIX INSERTED WORDS HERE " + base
    df = spark.createDataFrame(
        [(1, base.strip()), (2, shifted.strip()), (3, ""), (4, "short text")],
        "doc_id bigint, text string",
    )
    rows = content_defined_chunks(df, target_words=16, min_words=4).collect()
    # lossless: chunks reassemble the original in chunk_idx order
    for d, txt in ((1, base.strip()), (2, shifted.strip()), (4, "short text")):
        ordered = sorted((r for r in rows if r.doc_id == d), key=lambda r: r.chunk_idx)
        assert " ".join(r.chunk_text for r in ordered) == txt
        assert sum(r.n_words for r in ordered) == len(txt.split())
    # blank doc vanishes
    assert not any(r.doc_id == 3 for r in rows)
    # shift robustness: a prefix insertion must NOT invalidate every
    # chunk hash (fixed-size chunking would share zero)
    c1 = {r.chunk_md5 for r in rows if r.doc_id == 1}
    c2 = {r.chunk_md5 for r in rows if r.doc_id == 2}
    assert len(c1 & c2) >= 3
    # min_words floor: no chunk shorter than the floor except a doc's
    # trailing remainder chunk
    for d in (1, 2):
        ordered = sorted((r for r in rows if r.doc_id == d), key=lambda r: r.chunk_idx)
        assert all(r.n_words >= 4 for r in ordered[:-1])
