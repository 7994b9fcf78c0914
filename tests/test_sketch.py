

def test_bloom_no_false_negatives_and_low_fp(spark):
    from safedata_pipeline_spark.operators.sketch import bloom_build, bloom_probe

    members = [(i, f"member-{i}") for i in range(300)]
    absent = [(1000 + i, f"absent-{i}") for i in range(300)]
    ref = spark.createDataFrame(members, "doc_id bigint, v string")
    bloom = bloom_build(ref, "v")
    probe = spark.createDataFrame(members + absent, "doc_id bigint, v string")
    got = {r.doc_id: r.maybe_present for r in bloom_probe(probe, "v", bloom, "doc_id").collect()}
    # Bloom guarantee: every member flags present
    assert all(got[i] for i, _ in members)
    # false positives stay small at m=4096, k=3, n=300 (~5% regime)
    fp = sum(got[i] for i, _ in absent) / len(absent)
    assert fp < 0.15


def test_bloom_state_is_mergeable(spark):
    import pyspark.sql.functions as F
    from safedata_pipeline_spark.operators.sketch import bloom_build

    a = spark.createDataFrame([(i, f"a{i}") for i in range(50)], "doc_id bigint, v string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(50)], "doc_id bigint, v string")
    both = a.union(b)
    merged = (
        bloom_build(a, "v").union(bloom_build(b, "v"))
        .groupBy("word_idx").agg(F.bit_or("bits").cast("bigint").alias("bits"))
    )
    direct = bloom_build(both, "v")
    assert {(r.word_idx, r.bits) for r in merged.collect()} == {
        (r.word_idx, r.bits) for r in direct.collect()
    }


def test_bloom_null_values_ignored(spark):
    from safedata_pipeline_spark.operators.sketch import bloom_build

    df = spark.createDataFrame([(1, "x"), (2, None)], "doc_id bigint, v string")
    assert bloom_build(df, "v").count() <= 3  # only doc 1's k positions
