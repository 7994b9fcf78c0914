import numpy as np

from safedata_pipeline_spark.operators import dedup as DD


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = "the quick brown fox jumps over the lazy dog near the old river bank yesterday"
    other = "completely unrelated text about spark catalyst optimizer and shuffle exchange plans"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)],
        "doc_id bigint, text string",
    )


def test_dedup_exact_groups(spark):
    out = {r.keep_id: r.n_copies for r in DD.dedup_exact(_docs(spark)).collect()}
    assert out[1] == 2  # docs 1,2 identical, doc 1 kept
    assert out[3] == 1 and out[4] == 1


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in DD.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0          # identical
    assert 0.5 < pairs[(1, 3)] < 1.0     # one-word edit
    assert (1, 4) not in pairs           # unrelated


def test_ngram_jaccard_max_df_caps_candidate_pairs(spark):
    # 6 docs share ONE stop-shingle ("aaa bbb ccc"); docs 1,2 also share
    # their full text. With max_df=3 the stop-shingle's posting list
    # (df=6 > 3) is dropped, so the only surviving candidate pair is the
    # genuine near-dup — not the 15 stop-shingle-only pairs.
    stop = "aaa bbb ccc"
    rows = [(1, f"{stop} xxx yyy zzz www"), (2, f"{stop} xxx yyy zzz www")] + [
        (i, f"{stop} unique{i} only{i} text{i} here{i}") for i in range(3, 7)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    capped = DD.ngram_jaccard_pairs(df, n=3, threshold=0.1, max_df=3).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(1, 2)}
    # the shared stop-shingle is excluded from the intersection but the
    # denominators stay exact: 4 of 5 shingles counted common
    assert abs(capped[0].jaccard - 4 / 6) < 1e-6  # values round to 6dp

    # cap above every df → identical to the uncapped exact verifier
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(df, n=3, threshold=0.1, max_df=None).collect()
    }
    high_cap = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(df, n=3, threshold=0.1, max_df=100).collect()
    }
    assert uncapped == high_cap


def test_minhash_estimates_jaccard(spark):
    sigs = {r.doc_id: [r[f"mh_{i}"] for i in range(16)] for r in DD.minhash_signatures(_docs(spark)).collect()}
    assert sigs[1] == sigs[2]
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 16
    agree_14 = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 16
    assert agree_13 > 0.5 > agree_14


def test_minhash_lsh_pairs(spark):
    # 8 bands × 2 rows: P(candidate) = 1-(1-j²)^8 ≈ 1 for j ≈ 0.8
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in DD.minhash_lsh_pairs(_docs(spark), bands=8, threshold=0.4).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs               # near-dup lands in a shared band
    assert (1, 4) not in pairs


def test_simhash_hamming_ordering(spark):
    sigs = {r.doc_id: r.simhash for r in DD.simhash_signatures(_docs(spark)).collect()}
    assert sigs[1] == sigs[2]

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])


def test_embedding_cosine_pairs(spark):
    rng = np.random.default_rng(5)
    v1 = rng.normal(size=8)
    v2 = v1 + rng.normal(scale=0.01, size=8)  # near-dup
    v3 = rng.normal(size=8)
    rows = [(1, [float(x) for x in v1]), (2, [float(x) for x in v2]), (3, [float(x) for x in v3])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = {(r.id_a, r.id_b): r.cosine for r in DD.embedding_cosine_pairs(df, threshold=0.95).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_star_components_equal_propagation_on_deep_chain(spark):
    import random

    rng = random.Random(11)
    ids = list(range(1, 16))
    rng.shuffle(ids)
    # planted deep chain (diameter 14) + pair + isolated node
    chain = [(min(a, b), max(a, b), 0.9) for a, b in zip(ids, ids[1:])]
    extra = [(20, 21, 0.8)]
    docs = spark.createDataFrame([(i,) for i in ids + [20, 21, 22]], "doc_id bigint")
    pairs = spark.createDataFrame(chain + extra, "id_a bigint, id_b bigint, jaccard double")

    prop = {r.doc_id: (r.comp_id, r.is_canonical) for r in DD.dedup_components(docs, pairs).collect()}
    star = {r.doc_id: (r.comp_id, r.is_canonical) for r in DD.dedup_components_star(docs, pairs).collect()}
    assert star == prop
    assert star[22] == (22, True)
    assert all(star[i][0] == 1 for i in ids)


def test_star_components_converge_on_long_chain(spark):
    # 60-node chain: plain propagation would need 59 rounds; the star
    # alternation contracts it within its default budget
    n = 60
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(1, n)], "id_a bigint, id_b bigint, jaccard double"
    )
    out = DD.dedup_components_star(docs, pairs).collect()
    assert all(r.comp_id == 1 for r in out)
    assert sum(r.is_canonical for r in out) == 1


def test_embedding_cosine_zero_vector_yields_no_pair(spark):
    # all-zero vector: cosine undefined → explicit NULL → never passes
    # the threshold (and no divide-by-zero inf/nan on either engine)
    rows = [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.0]), (3, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = {(r.id_a, r.id_b) for r in DD.embedding_cosine_pairs(df, threshold=0.0).collect()}
    assert pairs == {(1, 2)}


def test_dedup_components_chain_and_isolated(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id bigint")
    # chain 1-2-3 (diameter 2, needs >1 propagation round), pair 4-5, isolated 6
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (4, 5, 0.7)], "id_a bigint, id_b bigint, jaccard double"
    )
    got = {r.doc_id: r for r in DD.dedup_components(docs, pairs).collect()}
    assert [got[i].comp_id for i in range(1, 7)] == [1, 1, 1, 4, 4, 6]
    assert [got[i].is_canonical for i in range(1, 7)] == [True, False, False, True, False, True]


def test_dedup_components_ignores_foreign_edge_ids(spark):
    # an edge endpoint absent from docs (id 0, lower than every doc id)
    # must NOT win the min-label election: without the semi-join guard,
    # comp_id 0 would leave component {1,2} with no canonical doc row
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (0, 1, 0.8)], "id_a bigint, id_b bigint, jaccard double"
    )
    got = {r.doc_id: r for r in DD.dedup_components(docs, pairs).collect()}
    assert [got[i].comp_id for i in (1, 2, 3)] == [1, 1, 3]
    assert [got[i].is_canonical for i in (1, 2, 3)] == [True, False, True]


def test_paragraph_dedup_global_first_occurrence(spark):
    from safedata_pipeline_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha"),   # in-doc repeat of alpha
            (2, "beta\ngamma"),          # beta already seen in doc 1
            (3, "beta"),                 # everything dropped
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in paragraph_dedup(df, sep="\n").collect()}
    assert got[1].text_dedup == "alpha\nbeta" and got[1].n_units == 3 and got[1].n_kept == 2
    assert got[2].text_dedup == "gamma" and got[2].n_kept == 1
    assert got[3].text_dedup == "" and got[3].n_kept == 0  # row survives empty


def test_paragraph_dedup_window_is_partitioned_by_unit(spark, sf_dir):
    from safedata_pipeline_spark import plans
    from safedata_pipeline_spark.operators.dedup import paragraph_dedup
    from safedata_pipeline_spark.sources.tables import load_table

    out = paragraph_dedup(load_table(spark, sf_dir, "documents"), sep=" ")
    plan = plans.formatted_plan(out)
    # the first-occurrence window must shuffle on the unit key, never
    # collapse to a single unpartitioned sort
    assert "Window" in plan
    assert "hashpartitioning(unit" in plan


def test_simhash_pairs_finds_near_dups(spark):
    from safedata_pipeline_spark.operators.dedup import simhash_pairs, simhash_signatures

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and once"),  # 1-word edit
            (3, "completely different content about spark shuffles and parquet files"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(df, bands=16, max_hamming=8).collect()
    }
    assert (1, 2) in pairs
    # hamming in the output must equal the true signature distance
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert pairs[(1, 2)] == bin(sigs[1] ^ sigs[2]).count("1")


def test_simhash_pairs_band_join_is_exact_vs_brute_force(spark):
    from safedata_pipeline_spark.operators.dedup import simhash_pairs, simhash_signatures

    rows = [(i, f"token{i % 5} alpha beta gamma delta word{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.id_a, r.id_b) for r in simhash_pairs(df, bands=4, max_hamming=3).collect()}
    sigs = simhash_signatures(df).collect()
    want = {
        (a.doc_id, b.doc_id)
        for a in sigs
        for b in sigs
        if a.doc_id < b.doc_id and bin(a.simhash ^ b.simhash).count("1") <= 3
    }
    assert got == want  # pigeonhole: bands > max_hamming -> exact


def test_simhash_pairs_rejects_insufficient_bands(spark):
    import pytest

    from safedata_pipeline_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        simhash_pairs(df, bands=3, max_hamming=3)


def test_dedup_incremental_against_reference(spark):
    ref = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "seen before"),   # dup of ref -> dropped
            (11, "brand new"),
            (12, "brand new"),     # in-batch dup -> min id kept
            (13, "also seen"),     # dup of ref -> dropped
            (14, "another fresh"),
        ],
        "doc_id bigint, text string",
    )
    got = sorted(r.doc_id for r in DD.dedup_incremental(new, ref).collect())
    assert got == [11, 14]
    # empty reference: only in-batch collapse applies
    empty_ref = spark.createDataFrame([], "doc_id bigint, text string")
    got2 = sorted(r.doc_id for r in DD.dedup_incremental(new, empty_ref).collect())
    assert got2 == [10, 11, 13, 14]


def test_dedup_components_best_keeps_highest_quality(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id bigint")
    # clusters: {1,2,3} and {4,5}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a bigint, id_b bigint"
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.7)],
        "doc_id bigint, quality double",
    )
    rows = {r.doc_id: r for r in DD.dedup_components_best(docs, pairs, quality).collect()}
    kept = {i for i, r in rows.items() if r.is_kept}
    # cluster 1: doc 2 wins on quality; cluster 2: tie -> min id 4
    assert kept == {2, 4}
    assert rows[1].comp_id == rows[2].comp_id == rows[3].comp_id
    # every cluster keeps exactly one doc
    from collections import Counter

    comps = Counter(r.comp_id for r in rows.values() if r.is_kept)
    assert all(v == 1 for v in comps.values())


def test_dedup_incremental_null_text_dropped_both_sides(spark):
    """NULL-text docs are dropped before digesting (ADVICE r3: Spark's
    null digest never anti-joins while SQL NOT IN drops them — both
    engines must agree, so neither keeps them)."""
    ref = spark.createDataFrame(
        [(1, "seen"), (2, None)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(10, None), (11, "fresh"), (12, "seen")], "doc_id bigint, text string"
    )
    got = sorted(r.doc_id for r in DD.dedup_incremental(new, ref).collect())
    assert got == [11]


def test_cluster_size_histogram(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a bigint, id_b bigint"
    )
    got = {r.cluster_size: r.n_clusters for r in
           DD.cluster_size_histogram(docs, pairs).collect()}
    # {0,1,2} size 3; {3,4} size 2; {5} singleton
    assert got == {3: 1, 2: 1, 1: 1}


def test_minhash_threshold_curve_counts_all_candidates(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
            (3, "the quick brown fox leaps over the lazy dog"),   # near dup
            (4, "completely different text about spark plans here"),
        ],
        "doc_id bigint, text string",
    )
    curve = DD.minhash_threshold_curve(docs, buckets=10).collect()
    total_pairs = sum(r.n_pairs for r in curve)
    all_pairs = DD.minhash_lsh_pairs(docs, threshold=0.0)
    assert total_pairs == all_pairs.count()
    # the exact dup pair lands in the top bucket (est = 1.0)
    top = {r.bucket_lo: r.n_pairs for r in curve}
    assert top.get(0.9, 0) >= 1
    assert all(0.0 <= r.bucket_lo <= 0.9 for r in curve)


def test_split_leakage_pairs_and_summary(spark):
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators.dedup import (
        split_leakage_pairs,
        split_leakage_summary,
    )

    asg = spark.createDataFrame(
        [(1, "train"), (2, "eval"), (3, "train"), (4, "train")],
        "doc_id bigint, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "id_a bigint, id_b bigint"
    )
    crossing = split_leakage_pairs(asg, pairs)
    got = sorted((r["id_a"], r["id_b"]) for r in crossing.collect())
    assert got == [(1, 2), (2, 4)]  # 1-3 is train-train, not leakage
    summ = {
        (r["split_a"], r["split_b"]): (r["n_pairs"], r["n_leaked_docs"])
        for r in split_leakage_summary(asg, pairs).collect()
    }
    assert summ == {("train", "eval"): (1, 1), ("eval", "train"): (1, 1)}


def test_dedup_rate_by_source(spark):
    from safedata_pipeline_spark.operators.dedup import dedup_rate_by_source

    docs = spark.createDataFrame(
        [
            (1, "a", "dup"), (2, "a", "dup"), (3, "a", "solo"), (4, "a", None),
            (5, "b", "x"), (6, "b", "y"),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {r["grp"]: (r["n_docs"], r["n_unique"], r["dup_rate"]) for r in dedup_rate_by_source(docs).collect()}
    # source a: 4 docs, uniques = {dup, solo} + 1 null doc = 3 -> rate 0.25
    assert out["a"] == (4, 3, 0.25)
    assert out["b"] == (2, 2, 0.0)


def test_substring_dedup_strips_repeated_runs(spark):
    """Planted boilerplate: an 8-word run shared by three docs
    survives only in the first (doc_id, start) occurrence; repeats
    shorter than k words survive everywhere."""
    from safedata_pipeline_spark.operators.dedup import substring_dedup

    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique one"),
            (2, "prefix words " + boiler + " suffix tail"),
            (3, "totally different content with no repeats at all"),
            (4, boiler),  # exactly the duplicated window
            (5, "short repeat short repeat"),  # < k words repeated: kept
            (6, ""),
            (7, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs, k=8).collect()}
    assert out[1]["clean_text"] == boiler + " unique one"  # first occurrence keeps
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "prefix words suffix tail"
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 8
    assert out[5]["n_removed"] == 0  # sub-k repeats survive
    assert 6 not in out and 7 not in out  # blank/null dropped
    # conservation: n_words - n_removed == words in clean_text
    for r in out.values():
        kept = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert r["n_words"] - r["n_removed"] == kept


def test_substring_dedup_same_doc_repeats_and_overlap(spark):
    """A window repeated INSIDE one document is also stripped (global
    occurrence count, not distinct-doc count); overlapping marked
    windows union their positions rather than double-count."""
    from safedata_pipeline_spark.operators.dedup import substring_dedup

    run = "one two three four"  # k=4 window
    docs = spark.createDataFrame(
        [(1, run + " " + run + " " + run)],  # 12 words, window repeated at 4 and 8
        "doc_id bigint, text string",
    )
    out = substring_dedup(docs, k=4).collect()[0]
    # first occurrence (pos 0..3) kept; positions 4..11 marked, but the
    # intermediate bridging windows ("four one two three" etc.) also
    # repeat at distance 4, so only the very first window survives
    assert out["n_words"] == 12
    assert out["clean_text"].startswith("one two three four")
    kept = len(out["clean_text"].split())
    assert out["n_removed"] == 12 - kept and kept >= 4
    import pytest

    with pytest.raises(ValueError):
        substring_dedup(docs, k=1)


def test_leakage_free_split_zero_crossing_edges(spark):
    """The guarantee: split assigned per component means NO near-dup
    pair crosses train/eval; singletons still split by their own coin;
    the assignment is deterministic across invocations."""
    from safedata_pipeline_spark.operators.dedup import (
        leakage_free_split, split_leakage_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id bigint, text string"
    )
    # two clusters (0-1-2 chained, 10-11) + singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    asg = leakage_free_split(docs, pairs, train_fraction=0.8)
    rows = {r["doc_id"]: r for r in asg.collect()}
    assert len(rows) == 40
    # cluster members share comp_id and split
    assert rows[0]["comp_id"] == rows[1]["comp_id"] == rows[2]["comp_id"] == 0
    assert len({rows[i]["split"] for i in (0, 1, 2)}) == 1
    assert len({rows[i]["split"] for i in (10, 11)}) == 1
    # the audit over this assignment is empty by construction
    assert split_leakage_pairs(asg, pairs).count() == 0
    # both sides populated at this fraction, deterministic replay
    splits = {r["split"] for r in rows.values()}
    assert splits == {"train", "eval"}
    again = {r["doc_id"]: r["split"] for r in
             leakage_free_split(docs, pairs, train_fraction=0.8).collect()}
    assert again == {d: r["split"] for d, r in rows.items()}
    import pytest

    with pytest.raises(ValueError):
        leakage_free_split(docs, pairs, train_fraction=1.5)


def test_dedup_incremental_near_drops_boilerplate_rewrites(spark):
    """A new doc that is a light edit of an accepted doc (most
    shingles shared) is dropped; a genuinely new doc survives; null
    texts drop on both sides."""
    from safedata_pipeline_spark.operators.dedup import dedup_incremental_near

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref = spark.createDataFrame(
        [(1, base), (2, None)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [
            (10, base + " lambda"),      # near-dup of ref 1
            (11, "completely different words with no shared shingles here"),
            (12, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"] for r in dedup_incremental_near(new, ref, threshold=0.5).collect()}
    assert out == {11}
    # at threshold 1.0 only byte-identical signatures match -> the
    # light edit survives too
    loose = {r["doc_id"] for r in dedup_incremental_near(new, ref, threshold=1.0).collect()}
    assert loose == {10, 11}
    import pytest

    with pytest.raises(ValueError):
        dedup_incremental_near(new, ref, num_hashes=16, bands=5)


def test_cross_source_dup_matrix(spark):
    """Syndication matrix: within-feed pairs land on the diagonal,
    cross-feed pairs on one canonical (least, greatest) row."""
    from safedata_pipeline_spark.operators.dedup import cross_source_dup_matrix

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "a")],
        "doc_id bigint, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 1), (4, 1), (3, 4)], "id_a bigint, id_b bigint"
    )
    out = {(r["source_a"], r["source_b"]): r for r in
           cross_source_dup_matrix(docs, pairs).collect()}
    assert out[("a", "a")]["n_pairs"] == 1
    assert out[("b", "b")]["n_pairs"] == 1
    ab = out[("a", "b")]
    assert ab["n_pairs"] == 2          # (3,1) and (4,1) both cross
    assert ab["n_docs_a"] == 1         # doc 1 on the 'a' side of both
    assert ab["n_docs_b"] == 2         # docs 3 and 4 on the 'b' side


def test_jaccard_prefix_join_matches_brute_force(spark):
    """Prefix filtering must be EXACT: same pair set + values as the
    uncapped inverted-index verifier on a corpus with mixed sizes,
    a hot boilerplate shingle, and cross-length near-dups."""
    boiler = "subscribe to our newsletter for updates"
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta {boiler}"),
        (2, f"alpha beta gamma delta epsilon eta {boiler}"),      # near-dup of 1
        (3, f"alpha beta gamma delta epsilon zeta {boiler}"),     # exact dup of 1
        (4, f"totally different words in this row {boiler}"),     # only boilerplate shared
        (5, "short text"),                                         # below shingle width edge
        (6, f"alpha beta gamma delta epsilon zeta {boiler} plus extra tail words here"),  # longer superset
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for n, thr in [(3, 0.3), (3, 0.7), (2, 0.5)]:
        brute = sorted(
            map(tuple, DD.ngram_jaccard_pairs(df, n=n, threshold=thr, max_df=None).collect())
        )
        pp = sorted(map(tuple, DD.jaccard_prefix_join(df, n=n, threshold=thr).collect()))
        assert pp == brute, f"n={n} thr={thr}"
    # sanity on content: the exact dup pair survives at every threshold
    high = {(r.id_a, r.id_b) for r in DD.jaccard_prefix_join(df, n=3, threshold=0.99).collect()}
    assert (1, 3) in high


def test_jaccard_prefix_join_empty_and_blank(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "one two")], "doc_id bigint, text string")
    assert DD.jaccard_prefix_join(df, n=3, threshold=0.5).count() == 0


def test_containment_prefix_join_finds_subset_dup(spark):
    """A short doc quoted wholesale in a long one: containment 1.0 in
    the contained direction only; Jaccard would miss the pair."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "intro words here alpha beta gamma delta epsilon zeta eta theta "
            "plus a very long tail of unrelated extra content words"),
        (3, "totally different content in this document body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.id_a, r.id_b): r.containment for r in
           DD.containment_prefix_join(df, n=3, threshold=0.8).collect()}
    assert got == {(1, 2): 1.0}
    # ... while symmetric Jaccard at the same bar sees nothing
    assert DD.jaccard_prefix_join(df, n=3, threshold=0.8).count() == 0


def test_containment_prefix_join_matches_brute(spark):
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate([
        "a b c d e f g h", "x a b c d e f g h y", "a b c d e f", "p q r s t u v w",
        "p q r s t u v w extra tail", "m n o p q r",
    ])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for thr in (0.5, 0.8, 1.0):
        got = sorted(map(tuple, DD.containment_prefix_join(df, n=3, threshold=thr).collect()))
        sh = df.select(F.col("doc_id").alias("id"),
                       F.explode(DD._word_shingles(F.col("text"), 3)).alias("s"))
        common = (sh.alias("a").join(sh.alias("b"), ["s"])
                  .where(F.col("a.id") != F.col("b.id"))
                  .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                  .agg(F.count("*").alias("c")))
        sz = sh.groupBy("id").agg(F.count("*").alias("n"))
        brute = sorted(map(tuple, common
            .join(sz.select(F.col("id").alias("id_a"), "n"), "id_a")
            .select("id_a", "id_b", F.round(F.col("c") / F.col("n"), 6).alias("ct"))
            .where(F.col("ct") >= thr).collect()))
        assert got == brute, f"thr={thr}"


def test_substring_dedup_exact_boundaries_vs_sequential_twin(spark):
    """Planted-boilerplate exactness: removal boundaries are WORD-EXACT
    for repeats >= k — an independent sequential twin computes, for
    every word position, whether its covering k-window occurs at any
    strictly-earlier (doc_id, pos), and the operator must agree on
    every document (no adjacent-word clipping in either direction)."""
    import itertools

    from safedata_pipeline_spark.operators.dedup import substring_dedup

    k = 4
    boiler = "subscribe to our newsletter for updates"  # 6 words
    docs_py = {
        1: f"alpha beta {boiler} gamma delta epsilon",
        2: f"{boiler} unrelated words in the middle {boiler}",
        3: f"prefix one two {boiler}",          # repeat flush at the end
        4: f"{boiler} suffix three four",        # repeat flush at the start
        5: "alpha beta gamma delta epsilon zeta",  # overlaps doc 1 (< k run at edges)
        6: "short doc only",                      # < k words: no windows
    }

    def twin(texts: dict[int, str]) -> dict[int, str]:
        words = {i: t.split() for i, t in texts.items()}
        occ: dict[str, list[tuple[int, int]]] = {}
        for i, ws in sorted(words.items()):
            for p in range(len(ws) - k + 1):
                occ.setdefault(" ".join(ws[p : p + k]), []).append((i, p))
        out = {}
        for i, ws in words.items():
            marked = set()
            for p in range(len(ws) - k + 1):
                g = " ".join(ws[p : p + k])
                if min(occ[g]) < (i, p):
                    marked.update(range(p, p + k))
            out[i] = " ".join(w for j, w in enumerate(ws) if j not in marked)
        return out

    docs = spark.createDataFrame(list(docs_py.items()), "doc_id bigint, text string")
    got = {r.doc_id: r.clean_text for r in substring_dedup(docs, k=k).collect()}
    expected = twin(docs_py)
    assert got == expected
    # the planted boilerplate itself is stripped exactly where repeated:
    assert boiler not in got[2] and boiler not in got[3] and boiler not in got[4]
    assert boiler in got[1]  # doc 1 is the first occurrence — kept intact
    # word-exact boundaries: doc 3/4 context words survive untouched
    assert got[3] == "prefix one two"
    assert got[4] == "suffix three four"


def test_substring_dedup_chars_vs_sequential_twin(spark):
    """Char-granular ExactSubstr: an independent sequential twin marks,
    for every char position, whether its covering k-char window occurs
    at any strictly-earlier (doc_id, pos); the operator must agree on
    every document in BOTH removal modes — including a repeat that
    starts mid-word (invisible to the word-window form)."""
    from safedata_pipeline_spark.operators.dedup import substring_dedup_chars

    k = 12
    boiler = "click here to unsubscribe"
    docs_py = {
        1: f"alpha beta {boiler} gamma",
        2: f"intro text {boiler} outro",
        # mid-word-start repeat: 'scribe now please join' repeats the
        # tail of 'unsubscribe' — word windows can't see this
        3: "unsubscribe now please join us today",
        4: "resubscribe now please join us tomorrow",
        5: "tiny",
    }
    norm = {i: " ".join(t.split()) for i, t in docs_py.items()}

    def twin_marked(texts):
        occ = {}
        for i, t in sorted(texts.items()):
            for p in range(len(t) - k + 1):
                occ.setdefault(t[p : p + k], []).append((i, p))
        out = {}
        for i, t in texts.items():
            m = set()
            for p in range(len(t) - k + 1):
                if min(occ[t[p : p + k]]) < (i, p):
                    m.update(range(p, p + k))
            out[i] = m
        return out

    tm = twin_marked(norm)
    df = spark.createDataFrame(list(docs_py.items()), "doc_id bigint, text string")

    # snap='none': exact char splice
    got = {r.doc_id: r for r in substring_dedup_chars(df, k=k, snap="none").collect()}
    for i, t in norm.items():
        expected = "".join(c for j, c in enumerate(t) if j not in tm[i])
        assert got[i].clean_text == expected, i
        assert got[i].n_marked_chars == len(tm[i])
        assert got[i].n_chars == len(t)

    # snap='word': a word goes iff ALL its chars are marked
    got_w = {
        r.doc_id: r.clean_text
        for r in substring_dedup_chars(df, k=k, snap="word").collect()
    }
    for i, t in norm.items():
        words, out, pos = t.split(" "), [], 0
        for w in words:
            span = range(pos, pos + len(w))
            if not all(j in tm[i] for j in span):
                out.append(w)
            pos += len(w) + 1
        assert got_w[i] == " ".join(out), i
    # the mid-word repeat was detected (doc 4 lost its shared tail run)
    assert got_w[3] != norm[3] or got_w[4] != norm[4]


def test_corpus_overlap_scalars(spark):
    """X175: corpus-level shingle overlap — exact counts on planted
    shared/unique content; asymmetric containment."""
    from safedata_pipeline_spark.operators.dedup import corpus_overlap

    shared = "alpha beta gamma delta epsilon"        # 3 trigrams
    a = spark.createDataFrame(
        [(1, shared), (2, "one two three four")],     # +2 unique trigrams
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(10, shared), (11, "five six seven eight nine ten")],  # +4 unique
        "doc_id bigint, text string",
    )
    r = corpus_overlap(a, b, n=3).collect()[0]
    assert (r.n_shingles_a, r.n_shingles_b, r.n_common) == (5, 7, 3)
    assert r.containment_a_in_b == round(3 / 5, 6)
    assert r.containment_b_in_a == round(3 / 7, 6)
    assert r.jaccard == round(3 / 9, 6)


def test_corpus_overlap_disjoint_and_empty(spark):
    from safedata_pipeline_spark.operators.dedup import corpus_overlap

    a = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    b = spark.createDataFrame([(2, "x y z")], "doc_id bigint, text string")
    r = corpus_overlap(a, b, n=3).collect()[0]
    assert r.n_common == 0 and r.jaccard == 0.0
    empty = spark.createDataFrame([(3, "")], "doc_id bigint, text string")
    r2 = corpus_overlap(a, empty, n=3).collect()[0]
    assert r2.n_shingles_b == 0
    assert r2.containment_b_in_a is None  # 0-denominator -> NULL, not a crash


def test_winnowing_guarantee_shared_run(spark):
    # two docs share a 10-word run; w+k-1 = 8 <= 10 => they MUST share
    # at least one fingerprint (the winnowing guarantee)
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, "prefix words here " + shared + " alpha beta"),
        (2, "totally different opening " + shared + " omega"),
        (3, "no overlap with anything else at all whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = DD.winnowing_fingerprints(df, k=5, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared 10-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_density_and_positions(spark):
    # ~2/(w+1) of k-gram hashes selected; positions within [1, m]
    words = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame([(1, words)], "doc_id bigint, text string")
    rows = DD.winnowing_fingerprints(df, k=5, w=4).collect()
    m = 200 - 4
    assert all(1 <= r.pos <= m for r in rows)
    # window count m-w+1=193; selected distinct fingerprints should be
    # far fewer (winnowing keeps ~2/(w+1) ~ 40% here) but more than m/w
    assert m / 4 <= len(rows) <= 0.6 * m


def test_winnowing_short_doc_single_window(spark):
    # 6 words, k=5 -> m=2 grams < w=4: one truncated window, one fp
    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id bigint, text string"
    )
    rows = DD.winnowing_fingerprints(df, k=5, w=4).collect()
    assert len(rows) == 1
    # and sub-k docs yield nothing
    df2 = spark.createDataFrame([(2, "a b c")], "doc_id bigint, text string")
    assert DD.winnowing_fingerprints(df2, k=5, w=4).count() == 0


def test_winnowing_rightmost_min_tiebreak(spark):
    # identical repeated text => all gram hashes equal => every window's
    # min ties and the RIGHTMOST position must win: selected positions
    # are the window ends, i.e. pos = start + w - 1
    df = spark.createDataFrame(
        [(1, " ".join(["same"] * 12))], "doc_id bigint, text string"
    )
    rows = DD.winnowing_fingerprints(df, k=5, w=4).collect()
    m = 12 - 4  # 8 grams, all identical
    starts = m - 4 + 1  # 5 windows
    assert sorted(r.pos for r in rows) == [s + 3 for s in range(1, starts + 1)]


def test_winnowing_overlap_join_finds_shared_runs(spark):
    shared = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, "intro passage " + shared + " closing alpha"),
        (2, "other beginning words " + shared + " tail omega"),
        (3, "entirely different content with no common run anywhere here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r.id_a, r.id_b): r.n_shared for r in DD.winnowing_overlap_join(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)


def test_winnowing_overlap_max_df_drops_stop_fingerprints(spark):
    # six IDENTICAL docs: every selected fingerprint has df=6, so with
    # max_df=3 the posting lists all drop and NO pairs emerge; without
    # the cap the full 15-pair clique comes back
    text = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(i, text) for i in range(1, 7)], "doc_id bigint, text string"
    )
    capped = DD.winnowing_overlap_join(df, min_shared=1, max_df=3).collect()
    assert capped == []
    full = DD.winnowing_overlap_join(df, min_shared=1, max_df=None).collect()
    assert len(full) == 15
