"""Degenerate-input behavior: empty tables, single rows, unicode —
the inputs a 100 TB pipeline inevitably contains somewhere."""

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_text_operators_on_empty_table(spark):
    from safedata_pipeline_spark.operators import text as T

    empty = _empty_docs(spark)
    assert T.token_count(empty).count() == 0
    assert T.quality_score(empty).count() == 0
    assert T.repetition_stats(empty).count() == 0
    assert T.text_profile(empty).count() == 0


def test_dedup_operators_on_empty_table(spark):
    from safedata_pipeline_spark.operators import dedup as D

    empty = _empty_docs(spark)
    assert D.dedup_exact(empty).count() == 0
    assert D.ngram_jaccard_pairs(empty).count() == 0
    assert D.minhash_lsh_pairs(empty).count() == 0
    assert D.simhash_pairs(empty).count() == 0
    assert D.paragraph_dedup(empty).count() == 0


def test_pack_on_empty_and_single(spark):
    from safedata_pipeline_spark.operators.pack import pack_sequences

    assert pack_sequences(_empty_docs(spark)).count() == 0
    one = spark.createDataFrame([(7, "a b c")], "doc_id bigint, text string")
    r = pack_sequences(one, budget=2).collect()[0]
    assert (r.n_tokens, r.start_offset, r.pack_no) == (3, 0, 0)


def test_unicode_text_survives_text_ops(spark):
    from safedata_pipeline_spark.operators import dedup as D
    from safedata_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "héllo wörld héllo"), (2, "日本語 テスト 日本語"), (3, "emoji 🙂 emoji 🙂")],
        "doc_id bigint, text string",
    )
    rep = {r.doc_id: r for r in T.repetition_stats(df).collect()}
    assert rep[1].n_words == 3 and rep[1].n_distinct_words == 2
    assert rep[2].n_words == 3 and rep[2].n_distinct_words == 2
    assert rep[3].n_distinct_words == 2
    ded = {r.doc_id: r for r in D.paragraph_dedup(df, sep=" ").collect()}
    assert ded[1].text_dedup == "héllo wörld"
    assert ded[2].n_kept == 2
    prof = T.text_profile(df)
    assert prof.count() == 3 and prof.where(F.col("content_md5").isNull()).count() == 0


def test_centroids_on_empty_and_null_labels(spark):
    from safedata_pipeline_spark.operators.similarity import embedding_centroids

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>, label string")
    assert embedding_centroids(empty).count() == 0
    with_null = spark.createDataFrame(
        [(1, [1.0, 3.0], None), (2, [3.0, 5.0], None), (3, [0.0, 0.0], "a")],
        "vec_id bigint, embedding array<double>, label string",
    )
    got = {r.label: r for r in embedding_centroids(with_null).collect()}
    assert list(got["a"].centroid) == [0.0, 0.0]
    assert list(got[None].centroid) == [2.0, 4.0]  # null label is a group
