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


def test_round4_operators_on_empty_inputs(spark):
    """Every round-4 operator returns an empty (or well-formed) result
    on an empty input instead of raising."""
    from safedata_pipeline_spark.operators import anonymity as AN
    from safedata_pipeline_spark.operators import dedup as DD
    from safedata_pipeline_spark.operators import pack as PK
    from safedata_pipeline_spark.operators import profile as P
    from safedata_pipeline_spark.operators import sampling as SMP
    from safedata_pipeline_spark.operators import text as T
    from safedata_pipeline_spark.operators import timeseries as TS
    from safedata_pipeline_spark.streaming import sessions as SS

    docs = spark.createDataFrame([], "doc_id bigint, text string, source string")
    ev = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, value double, event_type string"
    )
    assert T.decontaminate(docs, ["p"], method="substring").count() == 0
    assert T.decontaminate(docs, ["p q r"], method="ngram").count() == 0
    assert T.decontaminate(docs, ["p"], method="aho").count() == 0
    assert PK.pack_windows(docs, budget=8).count() == 0
    assert SMP.weighted_sample(docs.withColumn("w", F.lit(0.5)), "w").count() == 0
    assert SMP.source_share(docs).count() == 0
    assert TS.rolling_user_stats(ev).count() == 0
    assert TS.rolling_anomalies(ev).count() == 0
    assert TS.hourly_retention(ev).count() == 0
    assert SS.session_funnel(ev).collect()[0].n_sessions == 0  # stages still emit
    assert P.quantile_rank(docs.withColumn("x", F.lit(None).cast("double")), "x").count() == 0
    assert P.group_quantiles(docs.withColumn("x", F.lit(1.0)), "source", "x").count() == 0
    assert P.mutual_information(docs, "source", "text").collect()[0].mi is None
    r = AN.t_closeness(docs, ["source"], "text").collect()[0]
    assert r.n_classes == 0
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert DD.cluster_size_histogram(docs, pairs).count() == 0


def test_decontaminate_no_probes_keeps_everything(spark):
    from safedata_pipeline_spark.operators import text as T

    docs = spark.createDataFrame([(1, "some text")], "doc_id bigint, text string")
    assert T.decontaminate(docs, [], method="substring").count() == 1


def test_round4b_operators_on_empty_tables(spark):
    """The second-wave round-4 operators on empty inputs: verdicts/
    summaries still typed and well-formed, never a crash."""
    from safedata_pipeline_spark.operators import cdc as CDC
    from safedata_pipeline_spark.operators import quality_rules as QR
    from safedata_pipeline_spark.operators.profile import join_cardinality
    from safedata_pipeline_spark.operators.text import chunk_documents
    from safedata_pipeline_spark.operators.timeseries import (
        growth_accounting,
        hourly_percentiles,
        per_key_trend,
        trending_per_period,
    )

    empty_ev = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    empty_docs = _empty_docs(spark)

    # rule suite on an empty table: one verdict row per rule, ratio
    # metrics NULL -> failed, row_count 0.0
    v = {r["rule"]: r for r in QR.check_rules(
        empty_docs, [{"kind": "completeness", "col": "text"}, {"kind": "row_count", "low": 1.0}]
    ).collect()}
    assert v["row_count_table"]["value"] == 0.0 and v["row_count_table"]["passed"] is False
    assert v["completeness_text"]["passed"] is False
    assert QR.check_rules_by(empty_docs, ["doc_id"], [{"kind": "row_count"}]).count() == 0
    ri = QR.referential_integrity(empty_ev, empty_ev, {"event_id": "event_id"}).collect()[0]
    assert (ri["n_child"], ri["n_orphans"], ri["ri_ok"]) == (0, 0, True)

    assert CDC.latest_by_key(empty_ev, ["user_id"], "ts", "event_id").count() == 0
    assert join_cardinality(empty_ev, empty_ev, "user_id").collect()[0]["n_out"] == 0
    assert chunk_documents(empty_docs).count() == 0
    assert per_key_trend(empty_ev, "user_id", "ts", "value").count() == 0
    assert hourly_percentiles(empty_ev, "ts", "value").count() == 0
    assert growth_accounting(empty_ev).count() == 0
    assert trending_per_period(empty_ev).count() == 0


def test_incremental_partials_empty_merge_identity(spark):
    from safedata_pipeline_spark.operators import incremental as INC

    empty = spark.createDataFrame([], "v double")
    data = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    merged = INC.merge_partials(
        INC.profile_partials(empty, ["v"]), INC.profile_partials(data, ["v"])
    )
    out = INC.finalize_profile(merged).collect()[0]
    assert (out["n"], out["mean"], out["min"], out["max"]) == (2, 2.0, 1.0, 3.0)
