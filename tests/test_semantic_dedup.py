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

def _skewed_emb(spark, n=240):
    # pathological for unguarded SemDeDup: every vector in one dense
    # blob, so KMeans collapses (almost) everything into one cell and
    # the intra-cell join degenerates toward n^2
    rows = [(i, [1.0, i * 1e-6, 0.0, 0.0]) for i in range(1, n + 1)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_cell_cap_bounds_pair_groups(spark):
    """The cell_cap skew guard: even when one cell swallows the whole
    input, no (cell, sub-bucket) join group may hold more than a few×
    ``cap`` members — the property that keeps SemDeDup alive at 100 TB
    under skewed cells. At threshold=0.0 every within-group pair
    emits, so each join group is a clique in the output pair graph and
    its size is reconstructible as max per-id degree + 1."""
    emb = _skewed_emb(spark)
    cap = 40
    capped = D.semantic_pairs(emb, k=4, iterations=2, threshold=0.0, cell_cap=cap)
    rows = capped.collect()
    assert rows, "planted blob must produce pairs"
    from collections import Counter

    deg: Counter = Counter()
    for r in rows:
        deg[r.id_a] += 1
        deg[r.id_b] += 1
    max_group = max(deg.values()) + 1
    # expected group size ≈ cap; allow 3x for md5-bucket variance.
    # without the cap the single blob cell would make this ~240.
    assert max_group <= 3 * cap


def test_cell_cap_pairs_subset_and_total_reduction(spark):
    """Capped pairs ⊆ uncapped pairs (slicing only removes), and the
    total pair count drops materially on the skewed blob."""
    emb = _skewed_emb(spark)
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.semantic_pairs(emb, k=4, iterations=2, threshold=0.0).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in D.semantic_pairs(
            emb, k=4, iterations=2, threshold=0.0, cell_cap=40
        ).collect()
    }
    assert capped <= uncapped
    # 240 in ~one cell: uncapped ~ C(240,2) = 28k; capped ~ 6 buckets
    # of ~40 -> ~6*C(40,2) = 4.7k. Assert at least a 3x reduction.
    assert len(capped) * 3 <= len(uncapped)
    # small cells (<= cap) are untouched: cap larger than n == exact
    assert {
        (r.id_a, r.id_b)
        for r in D.semantic_pairs(
            emb, k=4, iterations=2, threshold=0.0, cell_cap=10_000
        ).collect()
    } == uncapped


def test_pipeline_dedup_semantic_ignores_dropped_docs(spark):
    """Embeddings computed on the RAW corpus must not elect a canonical
    member that an earlier pipeline step already dropped — the
    surviving twin would be anti-joined away and the content would
    vanish entirely (advisor finding, r6)."""
    from safedata_pipeline_spark.corpus_pipeline import CorpusPipeline

    docs = spark.createDataFrame(
        [
            (1, "x"),  # will be dropped by the length filter below
            (2, "the quick brown fox jumps over the lazy dog repeatedly"),
            (3, "unrelated readable content about something else entirely"),
        ],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),      # raw-corpus embedding of doc 1
            (2, [0.999, 0.01, 0.0, 0.0]),   # semantic twin of doc 1
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    from pyspark.sql import functions as F

    pipe = CorpusPipeline(docs)
    # simulate any earlier drop step taking doc 1 out of the pipeline
    pipe._keep("length_filter", pipe.df.where(F.length("text") > 3))
    pipe = pipe.dedup_semantic(emb, k=2, iterations=2, threshold=0.99)
    kept = {r.doc_id for r in pipe.df.collect()}
    # doc 1 is out of the pipeline; doc 2 must survive as the cluster's
    # canonical member among LIVE docs (pre-fix it vanished: 1 was
    # elected canonical, 2 anti-joined away)
    assert kept == {2, 3}
