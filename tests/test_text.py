from safedata_pipeline_spark.operators import text as T


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog sat on the mat"),
            (2, "ab1 cd2!"),
            (3, ""),
            (4, "der hund und die katze ist nicht da"),
        ],
        "doc_id bigint, text string",
    )


def test_token_count(spark):
    got = {r.doc_id: r for r in T.token_count(_docs(spark)).collect()}
    assert got[1].n_ws_tokens == 9
    assert got[2].n_ws_tokens == 2
    assert got[2].n_regex_tokens == 5  # ab,1,cd,2,!
    assert got[3].n_ws_tokens == 0


def test_quality_score_components(spark):
    got = {r.doc_id: r for r in T.quality_score(_docs(spark)).collect()}
    assert got[1].stopword_ratio > 0.3  # the/and/the/on?->the,and,the = 4/9
    assert got[2].punct_ratio > 0.1
    assert got[3].quality == 0.2  # len 0: 0.4*0 + 0.4*0 + 0.2*(1-0)
    assert all(0.0 <= r.quality <= 1.0 for r in got.values())


def test_lang_id(spark):
    got = {r.doc_id: r.lang_guess for r in T.lang_id(_docs(spark)).collect()}
    assert got[1] == "en"
    assert got[4] == "de"
    assert got[3] == "unknown"


def test_tfidf_top_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark query"),
            (2, "spark query engine"),
            (3, "engine engine tuning"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    rows = T.tfidf_top_terms(df, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # empty doc yields no terms
    assert 4 not in by_doc
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 1: 'spark' tf=3 appears in 2 docs; 'query' tf=1 in 2 docs -> spark ranks 1st
    d1 = {r.term: r for r in by_doc[1]}
    assert d1["spark"].rank == 1 and d1["spark"].tf == 3
    # rarer term with equal tf outranks common term: doc 3 'tuning' (df=1)
    # vs 'engine' (df=2, tf=2): engine tfidf = 2*idf2, tuning = 1*idf1
    import math

    idf = lambda dfreq: math.log(5.0 / (dfreq + 1.0)) + 1.0
    d3 = {r.term: r for r in by_doc[3]}
    assert d3["engine"].tfidf == round(2 * idf(2), 6)
    assert d3["tuning"].tfidf == round(1 * idf(1), 6)
    assert d3["engine"].rank == 1


def test_doc_fingerprint_detects_identity_and_near_dup(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world this is a document about spark"),
            (2, "hello world this is a document about spark"),
            (3, "XXhello world this is a document about spark"),  # prefix edit
            (4, "completely different content here entirely"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in T.doc_fingerprint(df).collect()}
    assert got[1].content_md5 == got[2].content_md5
    assert got[1].content_md5 != got[3].content_md5
    # min shingle survives a prefix edit (1-perm minhash)
    assert got[1].min_shingle_md5 == got[3].min_shingle_md5
    assert got[1].min_shingle_md5 != got[4].min_shingle_md5


def test_quality_filter_keeps_top_fraction(spark):
    df = spark.createDataFrame(
        [(i, "the and of is it " * (i + 1)) for i in range(10)],
        "doc_id bigint, text string",
    )
    kept = T.quality_filter(df, keep_fraction=0.5).collect()
    # scores are monotone in doc length here; >= threshold keeps at least half
    assert 5 <= len(kept) <= 6
    kept_ids = {r.doc_id for r in kept}
    assert all(i in kept_ids for i in range(6, 10))
    assert all(r.quality >= r.threshold for r in kept)


def test_contamination_scan(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "quick brown dog"),
            (3, "nothing shared here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.probe: r for r in T.contamination_scan(df, ["quick brown", "fox", "zzz"]).collect()}
    assert got["quick brown"].n_docs == 2 and got["quick brown"].example_doc_id == 1
    assert got["fox"].n_docs == 1
    assert got["zzz"].n_docs == 0 and got["zzz"].example_doc_id is None


def test_repetition_stats_word_and_bigram(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # heavy bigram repetition
            (2, "x y z"),             # all distinct
            (3, ""),                  # degenerate
            (4, "solo"),              # one word -> no bigrams
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in T.repetition_stats(df).collect()}
    r1 = got[1]
    assert r1.n_words == 6 and r1.n_distinct_words == 2
    assert abs(r1.dup_word_fraction - (1 - 2 / 6)) < 1e-6
    # bigrams: "a b" x3, "b a" x2 -> top = "a b", 3/5
    assert r1.top_bigram == "a b" and r1.top_bigram_count == 3
    assert abs(r1.top_bigram_fraction - 0.6) < 1e-6
    r2 = got[2]
    assert r2.dup_word_fraction == 0.0 and r2.top_bigram_count == 1
    # tiebreak: all bigrams count 1 -> lexicographically smallest
    assert r2.top_bigram == "x y"
    r3 = got[3]
    assert r3.n_words == 0 and r3.dup_word_fraction is None
    assert r3.top_bigram is None
    r4 = got[4]
    assert r4.n_words == 1 and r4.top_bigram is None
    assert r4.mean_word_length == 4.0


def test_repetition_stats_lines(spark):
    df = spark.createDataFrame(
        [(1, "hello world\nhello world\nbye\n\n")], "doc_id bigint, text string"
    )
    r = T.repetition_stats(df).collect()[0]
    assert r.n_lines == 3 and r.n_distinct_lines == 2
    assert abs(r.dup_line_fraction - (1 - 2 / 3)) < 1e-6


def test_text_profile_matches_individual_operators(spark):
    df = _docs(spark)
    fused = {r.doc_id: r for r in T.text_profile(df).collect()}
    tc = {r.doc_id: r for r in T.token_count(df).collect()}
    li = {r.doc_id: r for r in T.lang_id(df).collect()}
    fp = {r.doc_id: r for r in T.doc_fingerprint(df).collect()}
    for d in fused:
        assert fused[d].n_ws_tokens == tc[d].n_ws_tokens
        assert fused[d].n_regex_tokens == tc[d].n_regex_tokens
        assert fused[d].lang_guess == li[d].lang_guess
        assert fused[d].content_md5 == fp[d].content_md5
        assert fused[d].min_shingle_md5 == fp[d].min_shingle_md5


def test_text_profile_is_single_scan_no_shuffle(spark, sf_dir):
    from safedata_pipeline_spark import plans
    from safedata_pipeline_spark.sources.tables import load_table

    out = T.text_profile(load_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(out)
    assert "Exchange" not in plan and "Join" not in plan


def test_corpus_stats_aggregates(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog", "en", "web"),
            (2, "one two three", "en", "web"),
            (3, "der hund", "de", "books"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    got = {r.source: r for r in T.corpus_stats(df, group_col="source").collect()}
    assert got["web"].n_docs == 2 and got["web"].total_ws_tokens == 8
    assert got["web"].n_langs == 1
    assert got["books"].n_docs == 1 and got["books"].total_ws_tokens == 2
    assert 0.0 <= got["web"].avg_quality <= 1.0


def test_contamination_ngram_overlap(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "lazy dogs sleep all day long"),
        ],
        "doc_id bigint, text string",
    )
    probes = [
        "the quick brown fox",   # fully contained: 2/2 shingles
        "quick brown wolf",      # 0/1 shingles match
        "short",                 # < n words -> no shingles
    ]
    got = {r.probe: r for r in T.contamination_ngram(df, probes, n=3).collect()}
    full = got["the quick brown fox"]
    assert (full.n_shingles, full.n_matched, full.n_docs) == (2, 2, 1)
    assert full.overlap_fraction == 1.0
    miss = got["quick brown wolf"]
    assert (miss.n_shingles, miss.n_matched, miss.n_docs) == (1, 0, 0)
    assert miss.overlap_fraction == 0.0
    short = got["short"]
    assert short.n_shingles == 0 and short.overlap_fraction is None


def test_aho_corasick_matches_brute_force():
    import itertools
    import random

    from safedata_pipeline_spark.operators.text import _AhoCorasick

    rng = random.Random(3)
    # overlapping/nested/prefix-suffix patterns over a tiny alphabet
    probes = ["a", "ab", "ba", "aba", "bab", "abab", "bb", "aaa"]
    ac = _AhoCorasick(probes)
    for length in range(0, 9):
        for tup in itertools.product("ab", repeat=length):
            text = "".join(tup)
            want = {i for i, p in enumerate(probes) if p in text}
            assert ac.matches(text) == want, text
    # random longer texts
    for _ in range(50):
        text = "".join(rng.choice("ab") for _ in range(60))
        want = {i for i, p in enumerate(probes) if p in text}
        assert ac.matches(text) == want


def test_contamination_scan_many_matches_literal_scan(spark, sf_dir):
    from safedata_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    probes = ["key agg row scan", "spark order data", "zz-not-in-corpus-zz", "table"]
    lit = {r.probe: (r.n_docs, r.example_doc_id)
           for r in T.contamination_scan(docs, probes).collect()}
    many = {r.probe: (r.n_docs, r.example_doc_id)
            for r in T.contamination_scan_many(docs, probes).collect()}
    assert many == lit
    assert many["zz-not-in-corpus-zz"] == (0, None)


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [
            (1, ""),                      # bucket -1
            (2, "one"),                   # 1 token -> bucket 0
            (3, "a b"),                   # 2 -> bucket 1
            (4, "a b c"),                 # 3 -> bucket 1
            (5, " ".join(["w"] * 4)),     # 4 -> bucket 2
            (6, " ".join(["w"] * 7)),     # 7 -> bucket 2
            (7, " ".join(["w"] * 8)),     # 8 -> bucket 3 (exact power)
        ],
        "doc_id bigint, text string",
    )
    got = {r.bucket: r for r in T.length_histogram(df).collect()}
    assert got[-1].n_docs == 1 and got[-1].lo_tokens == 0
    assert got[0].n_docs == 1
    assert got[1].n_docs == 2 and got[1].lo_tokens == 2
    assert got[2].n_docs == 2 and got[2].total_tokens == 11
    assert got[3].n_docs == 1 and got[3].lo_tokens == 8


def test_unigram_logprob_orders_rare_docs_higher(spark):
    import math

    common = "the the the the the"
    rare = "zyx qwv jkl mno pqr"
    df = spark.createDataFrame(
        [(1, common), (2, rare), (3, "")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in T.unigram_logprob(df).collect()}
    # rare tokens are less probable -> higher surprise
    assert got[2].avg_neg_logprob > got[1].avg_neg_logprob
    assert got[3].n_tokens == 0 and got[3].avg_neg_logprob is None
    # hand-check doc 1: p(the) = (5+1)/(10+6); 10 tokens, 6 vocab
    want = round(-math.log(6 / 16), 6)
    assert abs(got[1].avg_neg_logprob - want) < 1e-6


def test_top_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "A b x"), (3, ""), (4, "solo")],
        "doc_id bigint, text string",
    )
    rows = T.top_ngrams(df, n=2, top_k=3).collect()
    assert [(r.ngram, r.n_occurrences, r.rank) for r in rows] == [
        ("a b", 3, 1),  # lowercased: doc 2's "A b" counts
        ("b c", 1, 2),
        ("b x", 1, 3),
    ]
    # unigrams: empty and short docs handled
    uni = {r.ngram: r.n_occurrences for r in T.top_ngrams(df, n=1, top_k=10).collect()}
    assert uni["a"] == 3 and uni["solo"] == 1


def test_source_lang_pivot(spark):
    df = spark.createDataFrame(
        [(1, "s1", "en"), (2, "s1", "de"), (3, "s2", "en"), (4, "s2", None)],
        "doc_id bigint, source string, lang string",
    )
    got = {r.source: r for r in T.source_lang_pivot(df).collect()}
    assert got["s1"].n_docs == 2 and got["s1"].n_en == 1 and got["s1"].n_de == 1
    assert got["s2"].n_docs == 2 and got["s2"].n_en == 1 and got["s2"].n_de == 0
    # explicit pivot values pin the schema (absent value -> zero column)
    cols = T.source_lang_pivot(df, pivot_values=["en", "fr"]).columns
    assert cols == ["source", "n_docs", "n_en", "n_fr"]


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [
            (1, "  Hello\t\tWORLD \n x  "),
            (2, "already clean"),
            (3, "ctrl\x00chars\x1fhere"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.text for r in T.normalize_text(df).collect()}
    assert got[1] == "hello world x"
    assert got[2] == "already clean"
    assert got[3] == "ctrlcharshere"
    assert got[4] == ""
    # flags off -> identity
    same = {r.doc_id: r.text for r in T.normalize_text(
        df, lowercase=False, collapse_whitespace=False, strip_control=False
    ).collect()}
    assert same[1] == "  Hello\t\tWORLD \n x  "
    # normalization makes case/space variants collide for exact dedup
    a = spark.createDataFrame([(1, "The  Cat"), (2, "the cat")], "doc_id bigint, text string")
    n = T.normalize_text(a).select("text").distinct().count()
    assert n == 1


def test_bigram_logprob_orders_sensitivity(spark):
    # natural-order docs repeat "a b"; the shuffled doc has the same
    # unigram profile but rare bigrams -> higher bigram surprise
    rows = [(i, "a b c a b c a b c") for i in range(10)]
    rows.append((99, "b a c b a c b a c"))
    rows.append((100, ""))
    rows.append((101, "solo"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in T.bigram_logprob(df).collect()}
    assert got[0].avg_neg_logprob < got[99].avg_neg_logprob
    # short/empty docs keep their row with no score
    assert got[100].n_bigrams == 0 and got[100].avg_neg_logprob is None
    assert got[101].n_bigrams == 0 and got[101].avg_neg_logprob is None
    assert got[0].n_bigrams == 8


def test_quality_filter_approx_close_to_exact(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i % 30)))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    exact_ids = {r.doc_id for r in T.quality_filter(df, 0.5, exact=True).collect()}
    approx_ids = {r.doc_id for r in T.quality_filter(df, 0.5, exact=False).collect()}
    # same order of magnitude of survivors; overwhelming overlap
    assert abs(len(exact_ids) - len(approx_ids)) <= 30
    assert len(exact_ids & approx_ids) / max(len(exact_ids), 1) > 0.85


def test_decontaminate_three_methods_agree(spark):
    """A verbatim-planted probe is removed by every method; clean and
    null-text docs survive everywhere."""
    from safedata_pipeline_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated clean document about spark plans"),
            (3, "prefix text the quick brown fox jumps over suffix text"),
            (4, None),
            (5, "another clean one with enough words to shingle on"),
        ],
        "doc_id bigint, text string",
    )
    probes = ["the quick brown fox jumps over"]
    for method in ("substring", "ngram", "aho"):
        kept = sorted(
            r.doc_id for r in TX.decontaminate(docs, probes, method=method).collect()
        )
        assert kept == [2, 4, 5], method
    # ngram catches a REWORDED leak the substring scan misses
    reflowed = spark.createDataFrame(
        [(6, "intro the quick brown fox leaps over the lazy dog")],
        "doc_id bigint, text string",
    )
    assert TX.decontaminate(reflowed, probes, method="substring").count() == 1
    assert TX.decontaminate(reflowed, probes, method="ngram", n=3).count() == 0

    import pytest

    with pytest.raises(ValueError, match="method"):
        TX.decontaminate(docs, probes, method="bogus")


def test_chunk_documents_offsets_and_reassembly(spark):
    from safedata_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a" * 450), (2, "short"), (3, None), (4, "")],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, size=200, overlap=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,150,300 -> lens 200,200,150
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_no"])
    assert [(r["start"], r["chunk_len"]) for r in c1] == [(0, 200), (150, 200), (300, 150)]
    # consecutive chunks overlap by exactly `overlap` chars
    assert c1[0]["chunk_text"][150:] == c1[1]["chunk_text"][:50]
    # short doc -> one whole chunk; null/empty dropped
    assert [(r["start"], r["chunk_text"]) for r in by_doc[2]] == [(0, "short")]
    assert 3 not in by_doc and 4 not in by_doc
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, size=100, overlap=100)


def test_build_vocab_and_oov_rate(spark):
    from safedata_pipeline_spark.operators.text import build_vocab, oov_rate

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the THE dog"),
            (3, "zebra"),
            (4, None),
            (5, ""),
        ],
        "doc_id bigint, text string",
    )
    vocab = build_vocab(docs, top_k=2)
    rows = sorted((r["token_id"], r["token"], r["n"]) for r in vocab.collect())
    # 'the' x3; tie between cat/dog/sat/zebra at 1 -> 'cat' wins (asc)
    assert rows == [(1, "the", 3), (2, "cat", 1)]
    out = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 1  # 'sat'
    assert out[2]["n_oov"] == 1                               # 'dog'
    assert out[3]["oov_rate"] == 1.0                          # 'zebra'
    assert out[4]["n_tokens"] == 0 and out[4]["oov_rate"] is None
    assert out[5]["n_tokens"] == 0


def test_chunk_documents_no_contained_tail(spark):
    """A tail start within `overlap` of the end would emit a chunk
    fully contained in its predecessor — pure duplicate content. The
    start sequence must stop at the first chunk that reaches the end."""
    from safedata_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "x" * 950), (2, "y" * 1000), (3, "z" * 1001), (4, "w" * 1900)],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, size=1000, overlap=100).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["start"], r["chunk_len"]))
    # len=950 < size: exactly one chunk (NOT [0:950] + duplicate [900:950])
    assert sorted(by_doc[1]) == [(0, 950)]
    # len=1000 == size: one chunk
    assert sorted(by_doc[2]) == [(0, 1000)]
    # len=1001: second chunk contributes one new char
    assert sorted(by_doc[3]) == [(0, 1000), (900, 101)]
    # len=1900: second chunk ends exactly at the end
    assert sorted(by_doc[4]) == [(0, 1000), (900, 1000)]
    # every chunk contributes at least one char past the previous end
    for doc, chunks in by_doc.items():
        ends = [s + ln for s, ln in sorted(chunks)]
        assert all(b > a for a, b in zip(ends, ends[1:]))


def test_encode_tokens_greedy_and_conservation(spark):
    """Maximal munch: longest vocab token wins at every position;
    fallback is single chars; concatenating a word's pieces in
    piece_no order reconstructs the word exactly (conservation)."""
    from safedata_pipeline_spark.operators.text import (
        build_vocab, encode_tokens, token_count_vocab,
    )

    vocab = spark.createDataFrame(
        [("the", 1), ("theory", 2), ("or", 3), ("y", 4)],
        "token string, token_id int",
    )
    docs = spark.createDataFrame(
        [(1, "theory theor zzz THE"), (2, None)], "doc_id bigint, text string"
    )
    rows = encode_tokens(docs, vocab).collect()
    by_word = {}
    for r in rows:
        by_word.setdefault((r["doc_id"], r["wpos"]), []).append(r)
    # "theory": whole-word longest match beats "the"+"or"+"y"
    w1 = sorted(by_word[(1, 1)], key=lambda r: r["piece_no"])
    assert [r["piece"] for r in w1] == ["theory"] and w1[0]["token_id"] == 2
    # "theor": greedy takes "the", then "or" (no backtrack)
    w2 = sorted(by_word[(1, 2)], key=lambda r: r["piece_no"])
    assert [r["piece"] for r in w2] == ["the", "or"]
    assert [r["token_id"] for r in w2] == [1, 3]
    # "zzz": pure char fallback, token_id NULL
    w3 = sorted(by_word[(1, 3)], key=lambda r: r["piece_no"])
    assert [r["piece"] for r in w3] == ["z", "z", "z"]
    assert all(r["is_fallback"] and r["token_id"] is None for r in w3)
    # "THE" lowercases to an exact vocab hit
    w4 = by_word[(1, 4)]
    assert len(w4) == 1 and w4[0]["piece"] == "the" and not w4[0]["is_fallback"]
    # conservation: pieces concatenate back to the lowercased word
    for (doc, wpos), pieces in by_word.items():
        word = "theory theor zzz the".split()[wpos - 1]
        assert "".join(
            r["piece"] for r in sorted(pieces, key=lambda r: r["piece_no"])
        ) == word
    # counts agree with the piece table
    counts = {r["doc_id"]: r for r in token_count_vocab(docs, vocab).collect()}
    assert counts[1]["n_tokens"] == len(rows)
    assert counts[1]["n_fallback"] == 3
    # without a vocab: whitespace proxy, zero fallbacks
    ws = {r["doc_id"]: r for r in token_count_vocab(docs).collect()}
    assert ws[1]["n_tokens"] == 4 and ws[1]["n_fallback"] == 0
    # fitted-vocab path on a real corpus: every piece re-joins its word
    corpus = spark.createDataFrame(
        [(i, f"alpha beta{i % 3} gamma delta common common") for i in range(20)],
        "doc_id bigint, text string",
    )
    fitted = build_vocab(corpus, top_k=3)
    enc = encode_tokens(corpus, fitted)
    pdf = enc.toPandas()
    rebuilt = (
        pdf.sort_values(["doc_id", "wpos", "piece_no"])
        .groupby(["doc_id", "wpos"])["piece"].apply("".join)
    )
    for (doc, wpos), word in rebuilt.items():
        orig = f"alpha beta{doc % 3} gamma delta common common".split()[wpos - 1]
        assert word == orig


def test_zipf_profile_totals_and_slope(spark):
    # 'a'x8, 'b'x4, 'c'x2, 'd'x1: perfect power law would give slope
    # -1 on ranks {1,2,4,8}... here freqs 8,4,2,1 at ranks 1,2,3,4
    docs = spark.createDataFrame(
        [(1, "a a a a a a a a b b b b c c d")], "doc_id bigint, text string"
    )
    row = T.zipf_profile(docs).collect()[0]
    assert row.n_tokens == 15 and row.n_types == 4
    assert row.top1_share == round(8 / 15, 6)
    assert row.type_token_ratio == round(4 / 15, 6)
    # exact least-squares slope of ln(freq) on ln(rank)
    import math

    xs = [round(math.log(r), 9) for r in (1, 2, 3, 4)]
    ys = [round(math.log(f), 9) for f in (8, 4, 2, 1)]
    n = 4
    slope = (n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        n * sum(x * x for x in xs) - sum(xs) ** 2
    )
    assert abs(row.zipf_slope - round(slope, 6)) < 1e-6


def test_zipf_profile_top_ranks_cap_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "x x y y z w")], "doc_id bigint, text string"
    )
    # top_ranks=2 keeps x,y only (tie between z,w broken by token asc is moot)
    row = T.zipf_profile(docs, top_ranks=2).collect()[0]
    assert row.n_types == 4 and row.n_tokens == 6
    # equal freqs at both kept ranks -> flat fit, slope 0
    assert row.zipf_slope == 0.0


def test_ngram_diversity_exact_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a", "A"),
            (2, "a b c d", "B"),
            (3, "x y", "B"),
            (4, "", "B"),
            (5, None, "B"),
        ],
        "doc_id bigint, text string, source string",
    )
    got = {(r.source, r.n): r for r in T.ngram_diversity(df).collect()}
    # source A: "a a a a" -> 4/1 unigrams, 3/1 bigrams, 2/1 trigrams
    assert got[("A", 1)].total_ngrams == 4 and got[("A", 1)].distinct_ngrams == 1
    assert got[("A", 2)].total_ngrams == 3 and got[("A", 2)].distinct_ngrams == 1
    assert got[("A", 3)].total_ngrams == 2 and got[("A", 3)].distinct_ngrams == 1
    assert got[("A", 2)].distinct_ratio == round(1 / 3, 6)
    # source B: "a b c d" + "x y" (too short for trigrams)
    assert got[("B", 1)].total_ngrams == 6 and got[("B", 1)].distinct_ngrams == 6
    assert got[("B", 2)].total_ngrams == 4 and got[("B", 2)].distinct_ngrams == 4
    assert got[("B", 3)].total_ngrams == 2 and got[("B", 3)].distinct_ngrams == 2
    assert got[("B", 1)].distinct_ratio == 1.0
    # no rows beyond the two sources x n grid with data
    assert len(got) == 6
    # the approx switch lands near exact on a bigger corpus
    big = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(20)), "S") for i in range(200)],
        "doc_id bigint, text string, source string",
    )
    ex = {r.n: r.distinct_ngrams for r in T.ngram_diversity(big).collect()}
    ap = {r.n: r.distinct_ngrams for r in T.ngram_diversity(big, exact=False).collect()}
    for n in (1, 2, 3):
        assert abs(ap[n] - ex[n]) <= max(5, 0.05 * ex[n]), n


def test_kneser_ney_vs_sequential_twin(spark):
    """Exact-equality (to the 1e-6 snap) vs a pure-Python KN twin."""
    import math
    from collections import Counter, defaultdict
    from decimal import Decimal

    rows = [
        (1, "the cat sat on the mat the cat ran"),
        (2, "the dog sat on the rug"),
        (3, "a completely different sentence here"),
        (4, "the cat sat"),
        (5, ""),
        (6, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in T.kneser_ney_logprob(df).collect()}

    docs = {i: t.strip().lower().split() if t and t.strip() else [] for i, t in rows}
    inst = {i: list(zip(tk, tk[1:])) for i, tk in docs.items()}
    all_bg = [b for bs in inst.values() for b in bs]
    cbg = Counter(all_bg)
    cw1 = Counter(b[0] for b in all_bg)
    fwd, bwd = defaultdict(set), defaultdict(set)
    for w1, w2 in cbg:
        fwd[w1].add(w2)
        bwd[w2].add(w1)
    ntypes = len(cbg)
    d = 0.75
    for i, bs in inst.items():
        if not bs:
            assert got[i].n_bigrams == 0 and got[i].avg_neg_logprob is None
            continue
        s = Decimal(0)
        for b in bs:
            p = (cbg[b] - d) / cw1[b[0]] + (d * len(fwd[b[0]]) / cw1[b[0]]) * (
                len(bwd[b[1]]) / ntypes
            )
            s += Decimal(str(round(-math.log(p), 6)))
        avg = math.floor(float(s) / len(bs) * 1e6 + 0.5) / 1e6
        assert got[i].n_bigrams == len(bs)
        assert abs(got[i].avg_neg_logprob - avg) <= 2e-6, i


def test_kneser_ney_repetition_scores_lower_surprise(spark):
    rows = [(i, "a b c a b c a b c") for i in range(10)]
    rows.append((99, "c a b a c b b c a"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.avg_neg_logprob for r in T.kneser_ney_logprob(df).collect()}
    assert got[0] < got[99]


def test_gopher_ngram_repetition_semantics(spark):
    """X229 (Gopher A1.1 char-fraction family): hand-computed top and
    dup fractions, row-set policy (rows only for n <= word count;
    empty docs dropped), and repartition invariance."""
    df = spark.createDataFrame(
        [
            # 16 words, 16 chars; "a b" x3 -> 6/16; "a b a b" x2 -> 8/16
            (1, "a b a b a b c d e f g h i j k l"),
            # doubled 10-word sentence: every dup-n covers all chars
            (2, "one two three four five six seven eight nine ten "
                "one two three four five six seven eight nine ten"),
            (3, "short text"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        (r.doc_id, r.kind, r.n): r.char_frac
        for r in T.gopher_ngram_repetition(df).collect()
    }
    assert rows[(1, "top", 2)] == 0.375           # 3 * 2 / 16
    assert rows[(1, "top", 4)] == 0.5             # 2 * 4 / 16
    for n in range(5, 11):
        assert rows[(1, "dup", n)] == 0.0         # no >=5-gram repeats
        assert rows[(2, "dup", n)] == 1.0         # doubled sentence
    assert rows[(3, "top", 2)] == 1.0
    assert (3, "dup", 5) not in rows              # only 2 words
    assert all(k[0] != 4 for k in rows)           # empty doc dropped
    # tiebreak: count DESC then ngram ASC — "eight nine" (c=2, len 9)
    # wins among doc 2's 2-grams: 2*9/78
    assert rows[(2, "top", 2)] == round((2 * 9 / 78) * 1e6) / 1e6
    r7 = {
        (r.doc_id, r.kind, r.n): r.char_frac
        for r in T.gopher_ngram_repetition(df.repartition(7)).collect()
    }
    assert r7 == rows


def test_gopher_ngram_repetition_overlapping_coverage_counts_once(spark):
    """Overlapping duplicated n-grams must not double-count covered
    words (position-set semantics): 'x x x x x x x' has every 5-gram
    duplicated and overlapping; coverage is all 7 words, frac 1.0."""
    df = spark.createDataFrame([(1, "x x x x x x x")], "doc_id bigint, text string")
    rows = {
        (r.kind, r.n): r.char_frac for r in T.gopher_ngram_repetition(df).collect()
    }
    assert rows[("dup", 5)] == 1.0
    assert rows[("dup", 6)] == 1.0
    assert ("dup", 8) not in rows  # only 7 words
    # top 2-gram "x x" occurs 6 times, clen 2, total 7 chars
    assert rows[("top", 2)] == round(6 * 2 / 7 * 1e6) / 1e6


def test_ccnet_perplexity_buckets_rank_tertiles(spark):
    """X231: scored docs split into rank-based tertiles on the
    (score, doc_id) total order — floor(n/3)/floor(2n/3) thresholds —
    and <2-token docs bucket 'unscored'; repartition-invariant."""
    rows = [(i, "w%d w%d common common" % (i, i + 1)) for i in range(10)]
    rows += [(100, "solo"), (101, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in T.ccnet_perplexity_buckets(df).collect()}
    assert out[100].bucket == "unscored" and out[101].bucket == "unscored"
    scored = [r for r in out.values() if r.bucket != "unscored"]
    assert len(scored) == 10
    from collections import Counter

    c = Counter(r.bucket for r in scored)
    assert c == {"head": 3, "middle": 3, "tail": 4}  # floor(10/3), floor(20/3)-3, rest
    # head scores <= middle scores <= tail scores on the total order
    mx = {b: max(r.avg_neg_logprob for r in scored if r.bucket == b) for b in c}
    mn = {b: min(r.avg_neg_logprob for r in scored if r.bucket == b) for b in c}
    assert mx["head"] <= mn["middle"] and mx["middle"] <= mn["tail"]
    r7 = {r.doc_id: r.bucket for r in T.ccnet_perplexity_buckets(df.repartition(7)).collect()}
    assert r7 == {k: v.bucket for k, v in out.items()}


def test_c4_line_filter_rules(spark):
    """X232 (C4 §2.2 line cleaning): terminal punctuation, >=3 words,
    javascript line rule; lorem-ipsum / curly-brace page drops; empty
    text keeps its row; repartition invariance."""
    df = spark.createDataFrame(
        [
            (1, "This is a good sentence.\nshort.\nNo terminal punct here\n"
                "Another fine line!\nEnable javascript to view this."),
            (2, "Fine sentence here.\nBut Lorem Ipsum dolor sit."),
            (3, "Code page.\nfunction f() { return 1; }"),
            (4, ""),
            (5, 'He said "quote."\nHe asked why?\nEnds with quote"'),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in T.c4_line_filter(df).collect()}
    assert (out[1].n_lines, out[1].n_kept, out[1].page_kept) == (5, 2, True)
    assert out[1].text_clean == "This is a good sentence.\nAnother fine line!"
    assert out[2].has_lorem and not out[2].page_kept and out[2].n_kept == 0
    assert out[3].has_curly and not out[3].page_kept and out[3].text_clean == ""
    assert (out[4].n_lines, out[4].page_kept) == (0, True)
    # quote-terminal and question-terminal lines pass; 3-word rule
    assert out[5].n_kept == 3 and out[5].page_kept
    r7 = {r.doc_id: r.text_clean for r in T.c4_line_filter(df.repartition(7)).collect()}
    assert r7 == {k: v.text_clean for k, v in out.items()}


def test_c4_line_filter_null_text(spark):
    """ADVICE r13: NULL text coalesces to '' — the row survives with
    exact-integer zero counts and non-NULL flags (the old form leaked
    size(NULL) = -1 with NULL page_kept)."""
    df = spark.createDataFrame(
        [(1, None), (2, "A good full sentence.")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in T.c4_line_filter(df).collect()}
    r = out[1]
    assert (r.n_lines, r.n_kept) == (0, 0)
    assert r.page_kept is True and r.has_lorem is False and r.has_curly is False
    assert r.text_clean == ""
    assert out[2].n_kept == 1


def test_boilerplate_lines_corpus_df(spark):
    """X233 (CCNet §4.1 corpus boilerplate): lines in >= min_doc_freq
    DISTINCT docs are removed everywhere; within-doc duplicates count
    once for df but both copies are removed; line order survives;
    line-less docs keep 0/'' rows; repartition-invariant."""
    df = spark.createDataFrame(
        [
            (1, "footer line\nreal content one.\nfooter line"),
            (2, "footer line\nreal content two."),
            (3, "rare pair\nreal content three.\nfooter line"),
            (4, "rare pair\nreal content four."),
            (5, ""),
            (6, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in T.boilerplate_lines(df, min_doc_freq=3).collect()}
    assert len(out) == 6
    # footer df=3 (doc 1 counts once) -> removed; 'rare pair' df=2 -> kept
    assert (out[1].n_lines, out[1].n_boiler) == (3, 2)
    assert out[1].text_clean == "real content one."
    assert out[3].text_clean == "rare pair\nreal content three."
    assert out[4].n_boiler == 0
    assert (out[5].n_lines, out[5].text_clean) == (0, "")
    assert (out[6].n_lines, out[6].text_clean) == (0, "")
    r7 = {r.doc_id: tuple(r) for r in T.boilerplate_lines(df.repartition(7), min_doc_freq=3).collect()}
    assert r7 == {k: tuple(v) for k, v in out.items()}
    import pytest

    with pytest.raises(ValueError, match="min_doc_freq"):
        T.boilerplate_lines(df, min_doc_freq=1)


def test_char_entropy_exact_values(spark):
    """X234: entropy equals the closed-form Decimal recomputation
    (9dp terms, 6dp snap); printable ratio exact; binary flag at the
    exact 0.8 integer boundary; single-char text has entropy 0."""
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "ab\x01\x02\x03"), (4, "abcdefgh")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in T.char_entropy(df).collect()}
    assert out[1].entropy == 0.0 and out[1].n_distinct_chars == 1
    assert out[2].entropy == 1.0  # two equiprobable symbols
    assert out[4].entropy == 3.0  # eight equiprobable symbols
    # doc 3: printable 2/5 = 0.4 -> binary
    assert out[3].printable_ratio == 0.4 and out[3].is_binary
    assert not out[2].is_binary
    # decimal recomputation of doc 3's entropy: p=1/5 five ways
    import math
    from decimal import ROUND_HALF_UP, Decimal

    term = Decimal(repr(-(1 / 5) * math.log2(1 / 5))).quantize(
        Decimal("1e-9"), rounding=ROUND_HALF_UP
    )
    want = float(
        (term * 5).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )
    assert abs(out[3].entropy - want) < 1e-12
    # exact 0.8 boundary: 4 printable of 5 -> 5*4 == 4*5 -> NOT binary
    b = spark.createDataFrame([(9, "abcd\x01")], "doc_id bigint, text string")
    r = T.char_entropy(b).collect()[0]
    assert r.printable_ratio == 0.8 and not r.is_binary


def test_refinedweb_line_correct_rules(spark):
    """X236 (RefinedWeb line-wise correction): the four removal rules,
    the exact-integer 30% doc-drop, and the kept-order reassembly."""
    df = spark.createDataFrame(
        [
            (1, "THIS IS ALL CAPS\nA perfectly normal sentence here.\n"
                "42 likes\n123 456.7\nword"),
            (2, "Good line with many words here.\nAnother good line follows it."),
            (3, "ok\nMixed Case Normal Line here."),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in T.refinedweb_line_correct(df).collect()}
    assert out[1].n_removed == 4 and not out[1].doc_kept
    assert out[1].text_clean == ""
    assert out[2].n_removed == 0 and out[2].doc_kept
    # doc 3: 'ok' is one-word (2 chars removed of 30 total) -> kept
    assert out[3].n_removed == 1 and out[3].doc_kept
    assert out[3].text_clean == "Mixed Case Normal Line here."
    assert (out[4].n_lines, out[4].frac_removed, out[4].doc_kept) == (0, 0.0, True)
    # uppercase rule is exact-integer: 'ABcd' 2 upper of 4 -> 2*2 !> 4 kept;
    # 'ABCd' 3 of 4 -> removed
    e = spark.createDataFrame(
        [(1, "ABcd efgh ijkl\nABCd efgh ijkl")], "doc_id bigint, text string"
    )
    r = T.refinedweb_line_correct(e).collect()[0]
    assert r.n_removed == 0  # letters span the whole line incl 2 words


def test_ngram_novelty_df1_fraction(spark):
    """X237 (WIMBD per-doc originality): novelty = distinct-gram df==1
    fraction; within-doc repeats collapse via array_distinct; docs
    with < n tokens are absent; exact 6dp int/int snap."""
    df = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams: abc, bcd
            (2, "a b c e"),      # grams: abc, bce
            (3, "q r s q r s"),  # grams: qrs, rsq, sqr, qrs -> 3 distinct
            (4, "x y"),          # < 3 tokens -> absent
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in T.ngram_novelty(df, n=3).collect()}
    assert 4 not in out and len(out) == 3
    assert (out[1].n_grams, out[1].n_novel, out[1].novelty) == (2, 1, 0.5)
    assert (out[2].n_grams, out[2].n_novel) == (2, 1)
    assert (out[3].n_grams, out[3].n_novel, out[3].novelty) == (3, 3, 1.0)
    r5 = {r.doc_id: tuple(r) for r in T.ngram_novelty(df.repartition(5), n=3).collect()}
    assert r5 == {k: tuple(v) for k, v in out.items()}


def test_ngram_novelty_vs_ref_cross_snapshot(spark):
    """X239: per-new-doc fraction of distinct 3-grams absent from the
    reference corpus; within-doc repeats collapse; <n-token docs
    absent; exact 6dp snap; repartition-invariant."""
    ref = spark.createDataFrame(
        [(100, "a b c d"), (101, "p q r")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [
            (1, "a b c d"),    # grams abc, bcd — both in ref -> 0.0
            (2, "a b c x"),    # abc in ref, bcx new -> 0.5
            (3, "x y z w"),    # both new -> 1.0
            (4, "x y"),        # < 3 tokens -> absent
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in T.ngram_novelty_vs_ref(new, ref).collect()}
    assert 4 not in out and len(out) == 3
    assert (out[1].n_grams, out[1].n_new, out[1].novelty_vs_ref) == (2, 0, 0.0)
    assert (out[2].n_grams, out[2].n_new, out[2].novelty_vs_ref) == (2, 1, 0.5)
    assert (out[3].n_grams, out[3].n_new, out[3].novelty_vs_ref) == (2, 2, 1.0)
    r7 = {
        r.doc_id: tuple(r)
        for r in T.ngram_novelty_vs_ref(new.repartition(7), ref.repartition(3)).collect()
    }
    assert r7 == {kk: tuple(v) for kk, v in out.items()}


def test_decontaminate_fuzzy_drops_near_dups_keeps_clean(spark):
    """A tail-edited near-copy of a probe is dropped (no verbatim or
    exact-shingle hit needed); clean, NULL-text and sub-shingle docs
    survive; schema passes through unchanged."""
    from safedata_pipeline_spark.operators import text as TX

    probe = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near = probe.rsplit(" ", 1)[0] + " omega"  # last word changed
    docs = spark.createDataFrame(
        [
            (1, near, "s1"),
            (2, "completely unrelated clean document about spark plans", "s2"),
            (3, None, "s3"),
            (4, "two words", "s4"),  # < n words -> no shingles -> kept
            (5, probe, "s5"),  # the verbatim copy is also a near-dup
        ],
        "doc_id bigint, text string, source string",
    )
    out = TX.decontaminate_fuzzy(docs, [probe], threshold=0.5)
    assert out.columns == ["doc_id", "text", "source"]
    assert sorted(r.doc_id for r in out.collect()) == [2, 3, 4]


def test_decontaminate_fuzzy_threshold_and_short_probe(spark):
    """threshold=1.0 keeps everything but exact-signature matches; a
    probe shorter than n words is inert (no shingles, no matches)."""
    from safedata_pipeline_spark.operators import text as TX

    probe = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near = probe.rsplit(" ", 1)[0] + " omega"
    docs = spark.createDataFrame(
        [(1, near), (2, probe), (3, "clean words all the way down here")],
        "doc_id bigint, text string",
    )
    strict = TX.decontaminate_fuzzy(docs, [probe], threshold=1.0)
    assert sorted(r.doc_id for r in strict.collect()) == [1, 3]
    inert = TX.decontaminate_fuzzy(docs, ["too short"], threshold=0.0)
    assert sorted(r.doc_id for r in inert.collect()) == [1, 2, 3]


def test_decontaminate_fuzzy_probe_side_broadcasts(spark):
    """The candidate join must be a broadcast on the probe side — the
    corpus never shuffles for candidate generation."""
    from safedata_pipeline_spark.operators import text as TX

    probe = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [(i, f"doc {i} filler words enough to shingle properly here") for i in range(8)],
        "doc_id bigint, text string",
    )
    plan = (
        TX.decontaminate_fuzzy(docs, [probe], threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_min_k_prob_k100_equals_kn_mean(spark):
    # k_pct=100 selects EVERY position, so the score must equal the
    # Kneser-Ney per-doc mean bit-for-bit (same snapped DECIMAL terms,
    # same 6dp mean snap) — pins the shared model expressions
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the cat ran"),
            (2, "a b a b a b a c"),
            (3, "single"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    kn = {r.doc_id: r for r in T.kneser_ney_logprob(df).collect()}
    mk = {r.doc_id: r for r in T.min_k_prob(df, k_pct=100).collect()}
    assert set(mk) == {1, 2, 3, 4}
    for d in (1, 2):
        assert mk[d].n_bigrams == kn[d].n_bigrams
        assert mk[d].k_used == kn[d].n_bigrams
        assert mk[d].min_k_score == kn[d].avg_neg_logprob
    for d in (3, 4):
        assert mk[d].n_bigrams == 0 and mk[d].k_used == 0
        assert mk[d].min_k_score is None


def test_min_k_prob_selects_worst_positions(spark):
    # k=20% of 10 positions = 2: the score averages the TWO most
    # surprising positions, so it is >= the whole-doc mean, and a doc
    # whose worst positions are rarer scores strictly higher
    df = spark.createDataFrame(
        [
            (1, "x x x x x x x x x rare1 rare2"),
            (2, "x x x x x x x x x x x"),
        ],
        "doc_id bigint, text string",
    )
    kn = {r.doc_id: r.avg_neg_logprob for r in T.kneser_ney_logprob(df).collect()}
    mk = {r.doc_id: r for r in T.min_k_prob(df, k_pct=20).collect()}
    for d in (1, 2):
        assert mk[d].n_bigrams == 10
        assert mk[d].k_used == 2
        assert mk[d].min_k_score >= kn[d]
    assert mk[1].min_k_score > mk[2].min_k_score


def test_min_k_prob_floor_one_and_validation(spark):
    import pytest

    # m=4 positions at k=20% -> (4*20) div 100 = 0 -> floor to 1
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    row = T.min_k_prob(df, k_pct=20).collect()[0]
    assert row.n_bigrams == 4 and row.k_used == 1
    with pytest.raises(ValueError):
        T.min_k_prob(df, k_pct=0)
    with pytest.raises(ValueError):
        T.min_k_prob(df, discount=1.5)
