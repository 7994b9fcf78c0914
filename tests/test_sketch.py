

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


def test_hll_md5_registers_accuracy_and_merge(spark):
    """X201: md5-register HLL — estimate within HLL's error envelope
    on a known cardinality, and max()-merged partials equal the
    direct register table bit for bit."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators import sketch as SK

    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 2).alias("part"), F.col("id").alias("v")
    )
    direct = SK.hll_md5_registers(df.select(F.lit(1).alias("g"), "v"), "v", ["g"])
    est = SK.hll_md5_estimate(direct, ["g"]).collect()[0]
    # 256 registers -> ~6.5% std error; allow 4 sigma
    assert abs(est.ndv_estimate - n) / n < 0.26
    assert est.n_registers <= 256

    # mergeability: per-part registers max-merged == direct registers
    parts = SK.hll_md5_registers(df.select("part", "v"), "v", ["part"])
    merged = parts.groupBy("bucket").agg(F.max("r").alias("r"))
    d = {(r.bucket, r.r) for r in direct.select("bucket", "r").collect()}
    m = {(r.bucket, r.r) for r in merged.collect()}
    assert d == m

    # estimate from merged partials == estimate from direct
    est_m = SK.hll_md5_estimate(
        merged.select(F.lit(1).alias("g"), "bucket", "r"), ["g"]
    ).collect()[0]
    assert est_m.ndv_estimate == est.ndv_estimate


def test_hll_md5_linear_counting_small_range(spark):
    """Small cardinalities ride the linear-counting branch and stay
    tight (HLL raw would be biased here)."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators import sketch as SK

    df = spark.range(40).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    regs = SK.hll_md5_registers(df, "v", ["g"])
    est = SK.hll_md5_estimate(regs, ["g"]).collect()[0]
    assert abs(est.ndv_estimate - 40) / 40 < 0.15
