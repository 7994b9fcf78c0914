"""Property-based parity tests (hypothesis): random inputs, compared
against reference-engine computations (pandas/numpy — the reference's
own substrate), not hand-picked examples.

Spark jobs per example are ~100ms, so max_examples stays small; the
value is in the generator shapes (ties, duplicates, skew), not volume.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from safedata_pipeline_spark.operators import drift as DR
from safedata_pipeline_spark.operators import protect as PR

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# values drawn from a tiny grid force heavy ties — the qcut
# duplicate-edge-drop and KS tie-handling branches
_tied_floats = st.lists(
    st.sampled_from([0.0, 1.0, 1.5, 2.0, 7.25, 100.0]), min_size=12, max_size=60
)
_floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=12,
    max_size=60,
)


@_settings
@given(data=st.one_of(_floats, _tied_floats), bins=st.sampled_from([2, 4, 10]))
def test_quantile_edges_match_pandas_qcut(spark, data, bins):
    """Edge parity with the reference: pd.qcut(duplicates='drop') bins
    by np.quantile edges with exact duplicates removed (privacy.py:17).
    """
    df = spark.createDataFrame([(float(x),) for x in data], "v double")
    got = PR.quantile_edges(df, "v", bins)
    # probs as i/bins, NOT np.linspace: linspace accumulates step error
    # (its 0.6 is one ulp off 6/10), which makes np.quantile interpolate
    # a spurious ~1e-15 edge on tied data that exact-duplicate-drop then
    # keeps — a prob-construction artifact, not a quantile difference
    want_raw = np.quantile(np.array(data), [i / bins for i in range(bins + 1)])
    want = []
    for e in want_raw:
        if not want or float(e) != want[-1]:
            want.append(float(e))
    # last-ulp interpolation differences can still merge/split an edge
    # under exact-duplicate drop; require set-closeness both ways rather
    # than identical edge counts
    got_a, want_a = np.asarray(got), np.asarray(want)
    for e in got_a:
        assert np.isclose(want_a, e, rtol=1e-9, atol=1e-9).any()
    for e in want_a:
        assert np.isclose(got_a, e, rtol=1e-9, atol=1e-9).any()


def _ks_numpy(a, b):
    a, b = np.sort(np.asarray(a, dtype=float)), np.sort(np.asarray(b, dtype=float))
    grid = np.union1d(a, b)
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


@_settings
@given(a=st.one_of(_floats, _tied_floats), b=st.one_of(_floats, _tied_floats))
def test_ks_statistic_matches_numpy_ecdf(spark, a, b):
    da = spark.createDataFrame([(float(x),) for x in a], "v double")
    db = spark.createDataFrame([(float(x),) for x in b], "v double")
    got = DR.ks_statistic(da, db, "v").collect()[0][0]
    assert abs(got - round(_ks_numpy(a, b), 6)) <= 1e-6


@_settings
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 3)),
        min_size=5,
        max_size=40,
    )
)
def test_sdc_suppress_matches_pandas_value_counts(spark, data):
    """Suppression parity: values whose group count < threshold become
    OTHER, exactly the reference's value_counts cut (privacy.py:4-11)."""
    threshold = 3
    vals = [t[0] * (t[1] + 1) for t in data]  # strings like 'aa', 'ccc'
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    got = [r.c for r in PR.sdc_suppress(df, ["c"], threshold=threshold).collect()]
    counts = pd.Series(vals).value_counts(dropna=False)
    rare = set(counts[counts < threshold].index)
    want = ["OTHER" if v in rare else v for v in vals]
    assert sorted(got) == sorted(want)


# docs drawn from a tiny vocabulary force heavy unit collisions —
# the global-first-occurrence and bigram-tie branches
_doc_lists = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8),
    min_size=1,
    max_size=10,
)


@_settings
@given(docs=_doc_lists)
def test_paragraph_dedup_matches_sequential_reference(spark, docs):
    """paragraph_dedup == a single-threaded first-occurrence scan."""
    from safedata_pipeline_spark.operators.dedup import paragraph_dedup

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in paragraph_dedup(df, sep=" ").collect()}

    seen: set[str] = set()
    for i, words in enumerate(docs):
        kept = []
        for w in words:
            if w not in seen:
                seen.add(w)
                kept.append(w)
        assert got[i].text_dedup == " ".join(kept)
        assert got[i].n_units == len(words)
        assert got[i].n_kept == len(kept)


@_settings
@given(
    toks=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=30),
    budget=st.sampled_from([16, 64, 256]),
)
def test_pack_sequences_matches_python_cumsum(spark, toks, budget):
    """Pack assignment == per-bucket python cumulative sum with the
    same md5-derived bucket keys."""
    import hashlib

    from safedata_pipeline_spark.operators.pack import pack_sequences

    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in pack_sequences(df, budget=budget, buckets=4).collect()}

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(f"0:{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) % 4

    offsets: dict[int, int] = {}
    for i, n in enumerate(toks):  # doc_id order == bucket order key
        b = bucket(i)
        start = offsets.get(b, 0)
        assert got[i].bucket == b
        assert got[i].n_tokens == n
        assert got[i].start_offset == start
        assert got[i].pack_no == start // budget
        offsets[b] = start + n


@_settings
@given(
    words=st.lists(
        st.sampled_from(["x", "y", "zz", "www"]), min_size=0, max_size=25
    )
)
def test_repetition_stats_matches_python_reference(spark, words):
    from collections import Counter

    from safedata_pipeline_spark.operators.text import repetition_stats

    df = spark.createDataFrame([(0, " ".join(words))], "doc_id bigint, text string")
    r = repetition_stats(df).collect()[0]
    assert r.n_words == len(words)
    assert r.n_distinct_words == len(set(words))
    if words:
        assert abs(r.dup_word_fraction - (1 - len(set(words)) / len(words))) < 1e-6
        assert abs(r.mean_word_length - (sum(map(len, words)) / len(words))) < 1e-6
    else:
        assert r.dup_word_fraction is None
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    if bigrams:
        counts = Counter(bigrams)
        top_cnt = max(counts.values())
        top_bg = min(bg for bg, c in counts.items() if c == top_cnt)
        assert (r.top_bigram, r.top_bigram_count) == (top_bg, top_cnt)
        assert abs(r.top_bigram_fraction - top_cnt / len(bigrams)) < 1e-6
    else:
        assert r.top_bigram is None


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=40),
    classes=st.lists(st.integers(min_value=0, max_value=2), min_size=2, max_size=40),
)
def test_t_closeness_matches_python_reference(spark, vals, classes):
    """t_closeness == max over classes of the hand-computed total
    variation distance, and always lands in [0, 1]."""
    from safedata_pipeline_spark.operators import anonymity as AN

    n = min(len(vals), len(classes))
    rows = [(classes[i], str(vals[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "q int, s string")
    got = AN.t_closeness(df, ["q"], "s", t=0.2).collect()[0]

    from collections import Counter

    total = Counter(s for _, s in rows)
    ntot = sum(total.values())
    tvs = []
    for cls in {q for q, _ in rows}:
        cc = Counter(s for q, s in rows if q == cls)
        nc = sum(cc.values())
        tv = 0.5 * sum(
            abs(round(abs(cc.get(v, 0) / nc - total[v] / ntot), 10))
            for v in total
        )
        tvs.append(round(tv, 6))
    assert abs(got.t_closeness - round(max(tvs), 6)) < 1e-6
    assert 0.0 <= got.t_closeness <= 1.0
    assert got.n_classes == len({q for q, _ in rows})


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    toks=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=16),
)
def test_pack_windows_conserves_tokens(spark, toks, budget):
    """Σ slice lengths over a doc's windows == its token count, for
    any document lengths and any budget."""
    from safedata_pipeline_spark.operators.pack import pack_windows

    docs = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(t))) for i, t in enumerate(toks)],
        "doc_id bigint, text string",
    )
    rows = pack_windows(docs, budget=budget, buckets=3).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + (r.end_tok - r.start_tok)
    for i, t in enumerate(toks):
        assert per_doc.get(i, 0) == t
        # every slice within budget
    assert all(0 < r.end_tok - r.start_tok <= budget for r in rows)


# CDC logs: small key space forces multi-version keys; distinct
# (ts, offset) pairs keep the winner well-defined (the operator's
# documented contract)
_log_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),       # key
        st.integers(min_value=0, max_value=20),      # ts bucket
        st.integers(min_value=0, max_value=100),     # payload
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_log_rows)
def test_latest_by_key_matches_pandas_reference(spark, rows):
    """latest_by_key == pandas sort + tail(1) per key, for any log
    shape (ties on ts resolved by the unique offset)."""
    import pandas as pd

    from safedata_pipeline_spark.operators.cdc import latest_by_key

    pdf = pd.DataFrame(rows, columns=["k", "ts", "payload"])
    pdf["offset"] = range(len(pdf))  # unique tiebreak
    df = spark.createDataFrame(pdf[["offset", "ts", "k", "payload"]])
    got = {
        r["k"]: (r["ts"], r["offset"], r["payload"])
        for r in latest_by_key(df, ["k"], "ts", "offset").collect()
    }
    ref = {
        int(k): (int(g["ts"].iloc[-1]), int(g["offset"].iloc[-1]), int(g["payload"].iloc[-1]))
        for k, g in pdf.sort_values(["ts", "offset"]).groupby("k")
    }
    assert got == ref


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\ndé"), min_size=0, max_size=120
    ),
    min_size=1,
    max_size=8,
)


@_settings
@given(texts=_texts, size=st.sampled_from([5, 16, 50]), overlap=st.sampled_from([0, 2, 4]))
def test_chunk_documents_reassembles_original(spark, texts, size, overlap):
    """Dropping each chunk's first `overlap` chars (after chunk 0) and
    concatenating reproduces the original text exactly — no char lost
    or duplicated, for any unicode text and any size/overlap combo."""
    from safedata_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = chunk_documents(docs, size=size, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_no"], r["chunk_text"]))
    for i, t in enumerate(texts):
        if not t:
            assert i not in by_doc
            continue
        chunks = [c for _, c in sorted(by_doc[i])]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == t


@_settings
@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        min_size=5,
        max_size=60,
    ),
    n_splits=st.sampled_from([2, 3]),
)
def test_profile_partials_batching_invariance(spark, vals, n_splits):
    """merge(partials of ANY disjoint batching) == partials(whole),
    for arbitrary float data — the monoid law under real inputs."""
    from safedata_pipeline_spark.operators import incremental as INC

    pdf = pd.DataFrame({"v": vals, "g": [i % n_splits for i in range(len(vals))]})
    whole = spark.createDataFrame(pdf[["v"]])
    parts = [
        spark.createDataFrame(pdf[pdf["g"] == i][["v"]])
        if (pdf["g"] == i).any()
        else spark.createDataFrame([], "v double")
        for i in range(n_splits)
    ]
    a = INC.finalize_profile(
        INC.merge_partials(*[INC.profile_partials(p, ["v"]) for p in parts])
    ).collect()
    b = INC.finalize_profile(INC.profile_partials(whole, ["v"])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@_settings
@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=14),
        min_size=1,
        max_size=8,
    ),
    k=st.sampled_from([2, 3]),
)
def test_substring_dedup_matches_sequential_reference(spark, docs, k):
    """substring_dedup == a single-threaded reference: collect every
    k-window occurrence, keep the global (doc, pos)-first of each
    duplicated window, mark the rest, strip marked positions."""
    from safedata_pipeline_spark.operators.dedup import substring_dedup

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in substring_dedup(df, k=k).collect()}

    # reference: first pass records first occurrence of each window
    first: dict[tuple, tuple] = {}
    count: dict[tuple, int] = {}
    for i, words in enumerate(docs):
        if not words:
            continue
        for p in range(len(words) - k + 1):
            w = tuple(words[p : p + k])
            count[w] = count.get(w, 0) + 1
            first.setdefault(w, (i, p))
    for i, words in enumerate(docs):
        if not words:
            assert i not in got  # blank text dropped
            continue
        marked: set[int] = set()
        for p in range(len(words) - k + 1):
            w = tuple(words[p : p + k])
            if count[w] >= 2 and first[w] != (i, p):
                marked.update(range(p, p + k))
        kept = [w for j, w in enumerate(words) if j not in marked]
        assert got[i].n_words == len(words)
        assert got[i].n_removed == len(marked)
        assert got[i].clean_text == " ".join(kept)


_WORD_POOL = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "the", "a"]
_rand_docs = st.lists(
    st.lists(st.sampled_from(_WORD_POOL), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


@_settings
@given(docs=_rand_docs, thr=st.sampled_from([0.3, 0.6, 0.9]), n=st.sampled_from([2, 3]))
def test_jaccard_prefix_join_equals_uncapped_verifier(spark, docs, thr, n):
    """Prefix filtering is EXACT: identical pair set + values as the
    uncapped inverted-index verifier on random tied/dup-heavy corpora."""
    from safedata_pipeline_spark.operators import dedup as DD

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    brute = sorted(
        map(tuple, DD.ngram_jaccard_pairs(df, n=n, threshold=thr, max_df=None).collect())
    )
    pp = sorted(map(tuple, DD.jaccard_prefix_join(df, n=n, threshold=thr).collect()))
    assert pp == brute


@_settings
@given(docs=_rand_docs, thr=st.sampled_from([0.5, 0.8, 1.0]))
def test_containment_join_equals_brute_reference(spark, docs, thr):
    """Containment candidates+verify == sequential set arithmetic."""
    from safedata_pipeline_spark.operators import dedup as DD

    def shingles(t, n=3):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    got = sorted(
        map(tuple, DD.containment_prefix_join(df, n=3, threshold=thr).collect())
    )
    sets = {i: shingles(t) for i, t in enumerate(docs)}
    want = sorted(
        (a, b, round(len(sets[a] & sets[b]) / len(sets[a]), 6))
        for a in sets
        for b in sets
        if a != b and sets[a] and round(len(sets[a] & sets[b]) / len(sets[a]), 6) >= thr
    )
    assert got == want


@_settings
@given(
    vals=st.lists(
        st.sampled_from(["cat", "cart", "care", "car", "dog", "dig", "d", "", "carting"]),
        min_size=2,
        max_size=9,
        unique=True,
    ),
    k=st.sampled_from([1, 2]),
)
def test_edit_distance_pairs_equals_dp_reference(spark, vals, k):
    from safedata_pipeline_spark.operators import fuzzy as FZ

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = sorted(map(tuple, FZ.edit_distance_pairs(df, "v", max_dist=k, q=2).collect()))
    sv = sorted(set(vals))
    want = sorted(
        (a, b, lev(a, b))
        for i, a in enumerate(sv)
        for b in sv[i + 1 :]
        if lev(a, b) <= k
    )
    assert got == want
