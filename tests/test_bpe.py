from collections import Counter

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import bpe as B


def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Sequential reference: Sennrich et al.'s algorithm with the
    module's exact tiebreak (max count, then lexicographic pair)."""
    wf = Counter(w for t in texts for w in t.split())
    syms = {w: list(w) + [B.END_OF_WORD] for w in wf}
    rules = []
    for step in range(1, num_merges + 1):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        rules.append((step, left, right, left + right, cnt))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms[w] = out
    return rules


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the new low the new lower",
    "widest wide wider the the the",
]


def test_bpe_fit_matches_sequential_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in B.bpe_fit(df, num_merges=12).orderBy("step").collect()
    ]
    assert got == _ref_bpe(TEXTS, 12)
    assert len(got) > 5  # the corpus genuinely supports several merges


def test_bpe_fit_stops_below_min_pair_count(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id bigint, text string")
    # every adjacent pair occurs once — nothing reaches min_pair_count=2
    assert B.bpe_fit(df, num_merges=5).count() == 0


def test_bpe_segment_round_trip_and_merge_effect(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string")
    rules = [(r.left, r.right) for r in B.bpe_fit(df, num_merges=12).orderBy("step").collect()]
    seg = {r.doc_id: r for r in B.bpe_segment(df, rules).collect()}
    for i, t in enumerate(TEXTS):
        toks = seg[i].bpe_tokens
        # lossless: concatenating the tokens reproduces every word + marker
        assert "".join(toks) == "".join(w + B.END_OF_WORD for w in t.split())
        # merges actually compress vs character count
        n_chars = sum(len(w) + 1 for w in t.split())
        assert seg[i].n_bpe_tokens < n_chars
    # with no rules, segmentation is plain characters
    seg0 = B.bpe_segment(df.limit(1), []).collect()[0]
    assert seg0.n_bpe_tokens == sum(len(w) + 1 for w in TEXTS[0].split())


def test_bpe_token_count_unit_matches_sequential_reference(spark):
    """X168: BPE-unit token counts (fit -> merge-rank segment -> count)
    equal the sequential reference's piece counts per document — the
    real-BPE alternative unit for packing budgets."""
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id bigint, text string"
    )
    rules = [
        (r["left"], r["right"])
        for r in sorted(B.bpe_fit(docs, num_merges=10).collect(), key=lambda r: r["step"])
    ]
    got = {r.doc_id: r.n_bpe_tokens for r in B.bpe_segment(docs, rules).collect()}
    # the aggregate-first count twin must agree with the full segmenter
    fast = {r.doc_id: r.n_tokens for r in B.bpe_token_count(docs, rules).collect()}
    assert fast == got

    ref_rules = [(l, r) for _, l, r, _, _ in _ref_bpe(TEXTS, 10)]
    assert [(l, r) for l, r in rules] == ref_rules
    for i, t in enumerate(TEXTS):
        n = 0
        for w in t.split():
            s = list(w) + [B.END_OF_WORD]
            for left, right in ref_rules:
                out = []
                for x in s:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                s = out
            n += len(s)
        assert got[i] == n


def test_pack_sequences_with_bpe_counts(spark):
    """pack_sequences(counts=...) budgets in the supplied unit."""
    from safedata_pipeline_spark.operators import pack as PK

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id bigint, text string"
    )
    counts = B.bpe_segment(docs, [("l", "o")]).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    expect = {r.doc_id: r.n_tokens for r in counts.collect()}
    packed = PK.pack_sequences(docs, budget=16, buckets=2, counts=counts)
    rows = {r.doc_id: r for r in packed.collect()}
    assert {i: rows[i].n_tokens for i in rows} == expect
    assert all(r.pack_no == r.start_offset // 16 for r in rows.values())
    import pytest

    with pytest.raises(ValueError):
        PK.pack_sequences(docs, vocab=counts, counts=counts)
