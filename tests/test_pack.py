"""Sequence packing: deterministic bucket/offset assignment."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators.pack import pack_sequences


def _docs(spark):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(40)],
        "doc_id bigint, text string",
    )


def test_pack_offsets_are_contiguous_per_bucket(spark):
    rows = pack_sequences(_docs(spark), budget=32, buckets=4).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(len(v) for v in by_bucket.values()) and len(rows) == 40
    for b, docs in by_bucket.items():
        docs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in docs:
            assert r.start_offset == run  # cumulative, gap-free
            assert r.pack_no == run // 32
            run += r.n_tokens


def test_pack_deterministic_across_partitionings(spark):
    df = _docs(spark)
    a = sorted(map(tuple, pack_sequences(df, budget=32, buckets=4).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(7), budget=32, buckets=4).collect())
    )
    assert a == b


def test_pack_no_global_sort(spark, sf_dir):
    from safedata_pipeline_spark import plans
    from safedata_pipeline_spark.sources.tables import load_table

    out = pack_sequences(load_table(spark, sf_dir, "documents"), budget=256, buckets=8)
    plan = plans.formatted_plan(out)
    # the cumsum window partitions by bucket — no single-partition sort
    assert "hashpartitioning(bucket" in plan
    assert "SinglePartition" not in plan


def test_pack_stats_accounts_every_token(spark):
    from safedata_pipeline_spark.operators.pack import pack_stats

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(40)],
        "doc_id bigint, text string",
    )
    r = pack_stats(docs, budget=64, buckets=4).collect()[0]
    total = sum(10 + i % 7 for i in range(40))
    assert r.n_docs == 40 and r.total_tokens == total
    assert r.n_buckets <= 4 and r.n_windows >= total // 64
    assert 0.0 < r.avg_window_fill <= 1.0
    assert abs(r.avg_window_fill + r.wasted_fraction - 1.0) < 1e-9
    # a single huge budget -> one window per bucket, fill = total/(buckets*budget)
    r2 = pack_stats(docs, budget=100000, buckets=2).collect()[0]
    assert r2.n_windows == r2.n_buckets
