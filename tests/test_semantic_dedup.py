"""Semantic (embedding-cluster) dedup — SemDeDup composition (X166)."""

import math

from safedata_pipeline_spark.operators import dedup as D


def _emb(spark):
    # two tight planted groups far apart + a loner; 4-dim for clarity
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.01, 0.999, 0.0, 0.0]),   # near-dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),      # loner
        (6, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_planted_neardups_found(spark):
    pairs = {
        (r.id_a, r.id_b)
        for r in D.semantic_pairs(_emb(spark), k=3, iterations=2, threshold=0.99).collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    assert all(a < b for a, b in pairs)


def test_pairs_subset_of_brute(spark):
    emb = _emb(spark)
    sem = {
        (r.id_a, r.id_b, r.cosine)
        for r in D.semantic_pairs(emb, k=2, iterations=2, threshold=0.5).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.cosine)
        for r in D.embedding_cosine_pairs(emb, threshold=0.5).collect()
    }
    assert sem <= brute  # cell confinement only ever removes pairs


def test_cosine_values_exact(spark):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in D.semantic_pairs(_emb(spark), k=3, iterations=2, threshold=0.99).collect()
    }
    expected = (1.0 * 0.999 + 0.0 * 0.01) / (1.0 * math.sqrt(0.999**2 + 0.01**2))
    assert abs(got[(1, 2)] - round(expected, 6)) < 1e-9


def test_semantic_dedup_labels(spark):
    labels = {
        r.vec_id: r
        for r in D.semantic_dedup(_emb(spark), k=3, iterations=2, threshold=0.99).collect()
    }
    assert len(labels) == 6  # every vector labeled
    assert labels[1].is_canonical and not labels[2].is_canonical
    assert labels[1].comp_id == labels[2].comp_id
    assert labels[3].is_canonical and not labels[4].is_canonical
    assert labels[5].is_canonical  # loner is its own component


def test_pipeline_dedup_semantic_step(spark):
    from safedata_pipeline_spark.corpus_pipeline import CorpusPipeline

    docs = spark.createDataFrame(
        [(i, f"doc {i} text body", "web") for i in range(1, 8)],
        "doc_id bigint, text string, source string",
    )
    pipe = CorpusPipeline(docs).dedup_semantic(
        _emb(spark), k=3, iterations=2, threshold=0.99
    )
    kept = {r.doc_id for r in pipe.df.collect()}
    # 2 and 4 drop (non-canonical near-dups); doc 7 has no embedding -> kept
    assert kept == {1, 3, 5, 6, 7}
    assert pipe.funnel["semantic_dedup"] == 5


def test_pipeline_dedup_semantic_keep_best(spark):
    """keep='best' keeps the highest-QUALITY member of each semantic
    cluster instead of the lowest id."""
    from safedata_pipeline_spark.corpus_pipeline import CorpusPipeline

    # doc 2 has much richer text than its semantic twin doc 1
    docs = spark.createDataFrame(
        [
            (1, "short txt"),
            (2, "the quick brown fox jumps over the lazy dog and keeps going with many fine words"),
            (3, "unrelated readable content about something else entirely here"),
        ],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    best = CorpusPipeline(docs).dedup_semantic(emb, k=2, iterations=2, threshold=0.99, keep="best")
    assert {r.doc_id for r in best.df.collect()} == {2, 3}
    minid = CorpusPipeline(docs).dedup_semantic(emb, k=2, iterations=2, threshold=0.99)
    assert {r.doc_id for r in minid.df.collect()} == {1, 3}
    import pytest

    with pytest.raises(ValueError):
        CorpusPipeline(docs).dedup_semantic(emb, keep="worst")
