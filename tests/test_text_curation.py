"""Gopher-style quality screen (text.gopher_quality_filters): metric
math on planted docs, threshold verdicts, degenerate-input edges."""

import sys

sys.path.insert(0, "/root/repo")

from safedata_pipeline_spark.operators.text import (
    GOPHER_BOUNDS,
    gopher_quality_filters,
)


def _gq(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r.doc_id: r for r in gopher_quality_filters(df).collect()}


def _clean_doc() -> str:
    # 60 DISTINCT-ish words (no repeated lines), two stopword types,
    # 3-10 mean word length, no plants
    words = ["the", "and"] + [f"word{i:03d}" for i in range(58)]
    return "\n".join(" ".join(words[i : i + 8]) for i in range(0, len(words), 8))


def test_gopher_clean_doc_passes(spark):
    got = _gq(spark, [(1, _clean_doc())])[1]
    assert got.passes
    assert got.n_words == 60
    assert got.frac_chars_dup_lines == 0.0  # every line distinct
    assert got.n_stop_types == 2


def test_gopher_duplicate_lines_fraction(spark):
    text = "alpha beta\nalpha beta\ngamma delta"
    got = _gq(spark, [(2, text)])[2]
    # two dup lines of 10 chars each over 31 total line chars
    assert got.n_lines == 3
    assert abs(got.frac_chars_dup_lines - round(20 / 31, 6)) < 2e-6
    assert not got.passes  # dup fraction 0.645 > 0.2 (and word count < 50)


def test_gopher_bullet_and_ellipsis_lines(spark):
    text = "- one two\n* three four\nfive six...\nseven eight"
    got = _gq(spark, [(3, text)])[3]
    assert got.frac_bullet_lines == 0.5
    assert got.frac_ellipsis_lines == 0.25


def test_gopher_symbol_ratio_and_stopwords(spark):
    text = "# # # the of cat"
    got = _gq(spark, [(4, text)])[4]
    assert got.n_words == 6
    assert got.symbol_word_ratio == 0.5
    assert got.n_stop_types == 2


def test_gopher_empty_and_blank_text(spark):
    got = _gq(spark, [(5, ""), (6, "   ")])
    assert got[5].n_lines == 0
    assert got[6].n_lines == 1  # a whitespace-only line still counts as a line
    for i in (5, 6):
        assert got[i].n_words == 0
        assert got[i].mean_word_len == 0.0
        assert got[i].frac_chars_dup_lines == 0.0
        assert not got[i].passes


def test_gopher_word_count_bounds(spark):
    few = "the of " * 10  # 20 words < 50
    got = _gq(spark, [(7, few.strip())])[7]
    assert not got.passes
    ok = ("the of cat dog " * 15).strip()  # 60 words
    got = _gq(spark, [(8, ok)])[8]
    assert got.n_words == 60
    assert got.passes == (
        got.mean_word_len >= GOPHER_BOUNDS["min_mean_word_len"]
        and got.frac_chars_dup_lines <= GOPHER_BOUNDS["max_frac_chars_dup_lines"]
    )


def test_gopher_single_scan_no_shuffle(spark):
    # the whole screen must stay map-only: no Exchange in the plan
    df = spark.createDataFrame([(1, _clean_doc())], "doc_id bigint, text string")
    plan = gopher_quality_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonicalize_url_rewrites(spark):
    from safedata_pipeline_spark.operators.text import canonicalize_url
    import pyspark.sql.functions as F

    cases = [
        # (input, expected canonical)
        ("https://WWW.Ex.COM:443/a/?utm_source=x&id=7#frag", "https://www.ex.com/a?id=7"),
        ("http://ex.com:80/path/", "http://ex.com/path"),
        ("https://ex.com/p?gclid=z", "https://ex.com/p"),
        ("https://ex.com/p?a=1&fbclid=q&b=2", "https://ex.com/p?a=1&b=2"),
        ("https://ex.com/CaseSensitive/Path", "https://ex.com/CaseSensitive/Path"),
        ("not a url at all", "not a url at all"),
        ("https://ex.com", "https://ex.com"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i int, url string")
    got = {r.i: r.c for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_groups_variants(spark):
    from safedata_pipeline_spark.operators.text import url_dedup

    rows = [
        (1, "https://ex.com/a"),
        (2, "https://EX.com/a/"),
        (3, "https://ex.com/a?utm_source=m"),
        (4, "https://ex.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r.doc_id: r for r in url_dedup(df).collect()}
    assert all(got[i].canon_url == "https://ex.com/a" for i in (1, 2, 3))
    assert [got[i].is_canonical for i in (1, 2, 3, 4)] == [True, False, False, True]
    assert got[1].n_variants == 3 and got[4].n_variants == 1


def test_canonicalize_url_idempotent_property(spark):
    # canonicalization must be a projection: applying it twice equals
    # applying it once, over a fuzzed URL corpus (hypothesis strategies
    # drive the generator; evaluation is one batched Spark pass)
    import pyspark.sql.functions as F
    from hypothesis import strategies as st
    from safedata_pipeline_spark.operators.text import canonicalize_url

    seg = st.text(
        alphabet="abcXYZ019-._~%", min_size=0, max_size=8
    )
    urls = st.builds(
        lambda h, p, q, f: f"https://{h}.example.com/{p}?{q}#{f}",
        seg, seg, seg, seg
    )
    sample = [urls.example() for _ in range(60)] + [
        "http://A.B:80/", "https://x.y:443", "", "   ", "no scheme here",
        "https://ex.com/p?utm_a=1&utm_b=2&gclid=3", "https://ex.com/////",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(sample)], "i int, url string")
    once = canonicalize_url(F.col("url"))
    got = df.select(
        "i",
        once.alias("c1"),
    ).select("i", "c1", canonicalize_url(F.col("c1")).alias("c2")).collect()
    for r in got:
        assert r.c1 == r.c2, (r.i, r.c1, r.c2)


def test_repeated_ngram_fractions_math(spark):
    from safedata_pipeline_spark.operators.text import repeated_ngram_fractions

    # "a b a b c": charsum=5; top 2-gram "a b" (c=2, chars 2) -> 0.8;
    # top 3-gram ties at c=1 -> lex smallest "a b a" (chars 3) -> 0.6;
    # no word 5-gram repeats -> dup fractions 0
    df = spark.createDataFrame([(1, "a b a b c")], "doc_id bigint, text string")
    r = repeated_ngram_fractions(df).collect()[0]
    assert (r.top_2gram_frac, r.top_3gram_frac, r.top_4gram_frac) == (0.8, 0.6, 0.8)
    assert r.dup_5gram_frac == 0.0


def test_repeated_ngram_dup_fraction_and_cap(spark):
    from safedata_pipeline_spark.operators.text import repeated_ngram_fractions

    # a 5-word phrase repeated 3 times: every 5-gram inside the repeats
    # duplicates; overlap over-counting must clamp at 1.0
    phrase = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [(1, " ".join([phrase] * 3)), (2, "unique words only here now")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in repeated_ngram_fractions(df).collect()}
    assert got[1].dup_5gram_frac == 1.0  # clamped
    assert got[2].dup_5gram_frac == 0.0
    assert got[2].top_2gram_frac > 0  # ties still produce a top gram


def test_repeated_ngram_short_and_empty_docs(spark):
    from safedata_pipeline_spark.operators.text import repeated_ngram_fractions

    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in repeated_ngram_fractions(df).collect()}
    assert got[1].top_2gram_frac == 0.0  # no 2-gram exists
    assert got[2].top_2gram_frac == 0.0 and got[2].dup_10gram_frac == 0.0
    assert got[3].top_2gram_frac == 1.0  # the only 2-gram covers all chars


def test_pmi_ranks_planted_collocation_first(spark):
    from safedata_pipeline_spark.operators.text import pmi_top_pairs

    # "kuala lumpur" only ever occur together; filler words co-occur
    # with everything -> the planted collocation tops the PMI ranking
    filler = "the a of and data table row value"
    rows = [(i, f"{filler} kuala lumpur {filler}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    top = pmi_top_pairs(df, min_count=5, topk=3).collect()
    assert (top[0].w1, top[0].w2) == ("kuala", "lumpur")
    assert top[0].c_pair == 6 and top[0].c_w1 == 6
    assert top[0].pmi > top[-1].pmi or len(top) == 1


def test_pmi_min_count_floor(spark):
    from safedata_pipeline_spark.operators.text import pmi_top_pairs

    df = spark.createDataFrame(
        [(1, "rare pair rare pair unique once")], "doc_id bigint, text string"
    )
    got = {(r.w1, r.w2) for r in pmi_top_pairs(df, min_count=2, topk=10).collect()}
    assert ("rare", "pair") in got
    assert ("unique", "once") not in got  # below the floor


def test_contamination_fraction_graded_signal(spark):
    from safedata_pipeline_spark.operators.text import contamination_fraction

    probe = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, probe),                                   # IS the benchmark
        (2, "intro words then " + probe + " and an original closing thought here"),
        (3, "entirely unrelated text about gardening and astronomy topics"),
        (4, "too short"),                             # < n words -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in contamination_fraction(df, [probe], n=3).collect()}
    assert got[1].contaminated_frac == 1.0
    assert 0.0 < got[2].contaminated_frac < 1.0
    assert got[3].contaminated_frac == 0.0
    assert got[4].contaminated_frac is None and got[4].n_shingles == 0
    # the graded ordering a threshold would use
    assert got[1].contaminated_frac > got[2].contaminated_frac > got[3].contaminated_frac
