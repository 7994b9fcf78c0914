"""Trained char-n-gram language ID (operators/langid.py): NB fit/score
semantics on planted frames — smoothing math, unseen-gram floors,
short-doc edges, deterministic tiebreak."""

import math
import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from safedata_pipeline_spark.operators import langid as LI


def _fit_score(spark, train_rows, score_rows, n=3):
    train = spark.createDataFrame(train_rows, "doc_id bigint, text string, lang string")
    score = spark.createDataFrame(score_rows, "doc_id bigint, text string")
    model = LI.langid_fit(train, n=n)
    return model, LI.langid_score(score, model, n=n)


def test_langid_separates_planted_languages(spark):
    # two "languages" with disjoint character inventories
    train = [(i, "aaa bbb aab aba bab", "aa") for i in range(4)] + [
        (10 + i, "xxx yyy xxy xyx yxy", "xx") for i in range(4)
    ]
    score = [(100, "aab aba aaa"), (101, "xyx yyy xxx"), (102, "bbb bab")]
    _, out = _fit_score(spark, train, score)
    got = {r.doc_id: r.lang_pred for r in out.collect()}
    assert got == {100: "aa", 101: "xx", 102: "aa"}


def test_langid_model_smoothing_math(spark):
    # one lang, one doc "abcd" -> trigrams abc, bcd: total=2, V=2
    train = [(1, "abcd", "en")]
    model, _ = _fit_score(spark, train, [(9, "abc")])
    rows = {(r.lang, r.ngram): float(r.logp) for r in model.collect()}
    # observed: ln((1+1)/(2+2)) = ln(0.5); floor: ln(1/(2+2)) = ln(0.25)
    assert abs(rows[("en", "abc")] - round(math.log(0.5), 6)) < 1e-9
    assert abs(rows[("en", "bcd")] - round(math.log(0.5), 6)) < 1e-9
    assert abs(rows[("en", None)] - round(math.log(0.25), 6)) < 1e-9


def test_langid_score_uses_floor_for_unseen_grams(spark):
    train = [(1, "abcd", "en")]
    _, out = _fit_score(spark, train, [(9, "abcz")])  # grams abc (seen), bcz (unseen)
    r = out.collect()[0]
    expect = round(math.log(0.5), 6) + round(math.log(0.25), 6)
    assert r.lang_pred == "en"
    assert abs(r.score - expect) < 1e-9


def test_langid_short_doc_ties_break_on_lang_asc(spark):
    # doc shorter than n has zero grams -> score 0 for every language
    # -> deterministic prediction = first language code ascending
    train = [(1, "aaa aaa", "bb"), (2, "zzz zzz", "aa")]
    _, out = _fit_score(spark, train, [(9, "xy")])
    r = out.collect()[0]
    assert r.lang_pred == "aa"
    assert r.score == 0.0


def test_langid_case_insensitive(spark):
    train = [(1, "AAA AAA AAA", "aa"), (2, "zzz zzz zzz", "zz")]
    _, out = _fit_score(spark, train, [(9, "aaa AAA")])
    assert out.collect()[0].lang_pred == "aa"


def test_langid_score_plan_broadcasts_model(spark):
    # the corpus-side apply must broadcast the model, never shuffle it
    train = [(1, "aaa bbb", "aa"), (2, "xxx yyy", "xx")]
    df = spark.createDataFrame([(9, "aaa xxx")], "doc_id bigint, text string")
    model = LI.langid_fit(spark.createDataFrame(train, "doc_id bigint, text string, lang string"))
    plan = LI.langid_score(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_langid_margin_semantics(spark):
    # clear-cut doc has a wide margin; a doc mixing both languages'
    # inventories sits near zero; ordering fields are consistent
    train = [(1, "aaa bbb aab aba bab aaa", "aa"), (2, "xxx yyy xxy xyx yxy xxx", "xx")]
    tr = spark.createDataFrame(train, "doc_id bigint, text string, lang string")
    model = LI.langid_fit(tr)
    score_df = spark.createDataFrame(
        [(10, "aaa aab aba"), (11, "aaa xxx aab xxy"), (12, "xy")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in LI.langid_margin(score_df, model).collect()}
    pred = {r.doc_id: r for r in LI.langid_score(score_df, model).collect()}
    for i in (10, 11, 12):
        assert got[i].lang_pred == pred[i].lang_pred  # argmax agrees
        assert got[i].margin >= 0
    assert got[10].lang_pred == "aa"
    assert got[10].margin > got[11].margin  # mixed doc is less confident
    assert got[12].margin == 0.0  # zero-gram doc ties everything


def test_langid_segments_merges_consecutive_runs(spark):
    train = [(1, "aaa bbb aab aba bab aaa", "aa"), (2, "xxx yyy xxy xyx yxy xxx", "xx")]
    model = LI.langid_fit(
        spark.createDataFrame(train, "doc_id bigint, text string, lang string")
    )
    docs = spark.createDataFrame(
        [
            # aa, aa, xx, aa -> spans (0-1 aa), (2-2 xx), (3-3 aa)
            (7, "aaa aab\n\naba bab\n\nxxx xxy\n\naaa bbb"),
            # monolingual -> one span
            (8, "xxx yyy\n\nxyx yxy"),
        ],
        "doc_id bigint, text string",
    )
    rows = LI.langid_segments(docs, model).collect()
    got = {
        (r.doc_id, r.seg_idx): (r.lang, r.start_para, r.end_para, r.n_paras)
        for r in rows
    }
    assert got == {
        (7, 1): ("aa", 0, 1, 2),
        (7, 2): ("xx", 2, 2, 1),
        (7, 3): ("aa", 3, 3, 1),
        (8, 1): ("xx", 0, 1, 2),
    }


def test_langid_segments_drops_blank_paragraphs(spark):
    # a blank paragraph (double separator) is dropped but its INDEX is
    # preserved, so the spans around it do not merge across the gap
    train = [(1, "aaa bbb aab", "aa"), (2, "xxx yyy xxy", "xx")]
    model = LI.langid_fit(
        spark.createDataFrame(train, "doc_id bigint, text string, lang string")
    )
    docs = spark.createDataFrame(
        [(5, "aaa aab\n\n\n\naaa bbb")], "doc_id bigint, text string"
    )
    rows = LI.langid_segments(docs, model).collect()
    got = sorted((r.seg_idx, r.lang, r.start_para, r.end_para) for r in rows)
    assert got == [(1, "aa", 0, 0), (2, "aa", 2, 2)]


def test_langid_segments_scoring_matches_per_para_score(spark):
    # the composite-key grid must agree with langid_score run on the
    # paragraphs as standalone docs
    train = [(1, "aaa bbb aab aba", "aa"), (2, "xxx yyy xxy xyx", "xx")]
    model = LI.langid_fit(
        spark.createDataFrame(train, "doc_id bigint, text string, lang string")
    )
    paras = ["aaa aba", "xyx yyy", "bab bbb"]
    docs = spark.createDataFrame(
        [(3, "\n\n".join(paras))], "doc_id bigint, text string"
    )
    seg_rows = LI.langid_segments(docs, model).collect()
    solo = spark.createDataFrame(
        [(i, p) for i, p in enumerate(paras)], "doc_id bigint, text string"
    )
    solo_pred = {r.doc_id: r.lang_pred for r in LI.langid_score(solo, model).collect()}
    # reconstruct each paragraph's language from the spans
    para_lang = {}
    for r in seg_rows:
        for p in range(r.start_para, r.end_para + 1):
            para_lang[p] = r.lang
    assert para_lang == solo_pred
