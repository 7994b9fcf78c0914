import itertools

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import fuzzy as FZ
from safedata_pipeline_spark.operators import ml_utility as MU


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


WORDS = [
    "kitten", "sitten", "sittin", "sitting", "kitchen", "cat", "bat", "at",
    "a", "xyz", "xyzz", "hello", "hallo", "help", "abcd", "abxd", "",
]


def test_edit_distance_pairs_matches_brute_force(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "v string")
    for k, q in [(1, 2), (2, 2), (1, 3)]:
        got = sorted(
            map(tuple, FZ.edit_distance_pairs(df, "v", max_dist=k, q=q).collect())
        )
        brute = sorted(
            (a, b, _lev(a, b))
            for a, b in itertools.combinations(sorted(set(WORDS)), 2)
            if _lev(a, b) <= k
        )
        assert got == brute, f"k={k} q={q}"


def test_edit_distance_pairs_hot_gram_domain(spark):
    # sequential-ID style values: every pair shares the long prefix —
    # the df-ascending gram prefix must confine the join to the rare
    # digit grams and still return the exact pair set
    vals = [f"Customer#00000{i:04d}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {(r.value_a, r.value_b) for r in FZ.edit_distance_pairs(df, "v", 1, 2).collect()}
    brute = {
        (a, b) for a, b in itertools.combinations(sorted(vals), 2) if _lev(a, b) <= 1
    }
    assert got == brute and len(brute) > 0


def _ref_auc(pairs):
    """Brute-force P(score_pos > score_neg) + 0.5·P(==)."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_binary_auc_matches_brute_force(spark):
    data = [(0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.2, 1)]
    df = spark.createDataFrame(data, "score double, y int")
    row = MU.binary_auc(df, "score", F.col("y") == 1).collect()[0]
    assert row.n_pos == 4 and row.n_neg == 4
    assert abs(row.auc - _ref_auc(data)) < 1e-6


def test_binary_auc_perfect_and_random(spark):
    perfect = [(float(i), int(i >= 50)) for i in range(100)]
    df = spark.createDataFrame(perfect, "score double, y int")
    assert MU.binary_auc(df, "score", F.col("y") == 1).collect()[0].auc == 1.0
    const = [(1.0, i % 2) for i in range(50)]
    df2 = spark.createDataFrame(const, "score double, y int")
    assert MU.binary_auc(df2, "score", F.col("y") == 1).collect()[0].auc == 0.5


def test_calibration_bins_counts_and_rates(spark):
    data = [(float(i), int(i >= 70)) for i in range(100)]  # scores 0..99, pos above 69
    df = spark.createDataFrame(data, "score double, y int")
    rows = {r.bin: r for r in MU.calibration_bins(df, "score", F.col("y") == 1, bins=10).collect()}
    assert len(rows) == 10 and sum(r.n for r in rows.values()) == 100
    # width (99-0)/10 = 9.9 → bin 7 covers [69.3, 79.2): scores 70..79 → 10 pos of 10
    assert rows[0].pos_rate == 0.0 and rows[9].pos_rate == 1.0
    assert rows[7].n_pos == 10 and rows[7].pos_rate == 1.0
    assert abs(rows[0].mean_score - 4.5) < 1e-9  # scores 0..9


def test_readability_counts(spark):
    from safedata_pipeline_spark.operators import text as TX

    rows = [
        (1, "The cat sat. The dog ran!"),
        (2, ""),
        (3, "word"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in TX.readability_scores(df).collect()}
    assert out[1].n_words == 6 and out[1].n_sentences == 2
    # vowel groups: e,a,a,e,o,a → 6
    assert out[1].n_syllables == 6
    assert abs(out[1].flesch - round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)) < 1e-9
    assert out[2].n_words == 0 and out[2].flesch is None and out[2].n_sentences == 1
    assert out[3].n_words == 1 and out[3].n_syllables == 1


def test_auc_by_group_matches_per_group_brute(spark):
    data = [
        ("a", 0.1, 0), ("a", 0.5, 1), ("a", 0.3, 0), ("a", 0.9, 1),
        ("b", 0.2, 1), ("b", 0.8, 0), ("b", 0.5, 1), ("b", 0.5, 0),
        ("c", 0.4, 1), ("c", 0.6, 1),  # single-class → NULL auc
    ]
    df = spark.createDataFrame(data, "g string, score double, y int")
    out = {r.grp: r for r in
           MU.auc_by_group(df, F.col("g"), "score", F.col("y") == 1).collect()}
    assert out["a"].auc == _ref_auc([(s, y) for g, s, y in data if g == "a"])
    assert out["b"].auc == _ref_auc([(s, y) for g, s, y in data if g == "b"])
    assert out["c"].auc is None and out["c"].n_pos == 2 and out["c"].n_neg == 0


def test_roc_points_monotone_and_consistent_with_auc(spark):
    # classes separated by a gap (40..60) wider than the ~2-unit grid
    # step, so some grid threshold must land inside it
    data = [(float(i), 0) for i in range(40)] + [(float(i), 1) for i in range(60, 100)]
    df = spark.createDataFrame(data, "score double, y int")
    pts = sorted(
        MU.roc_points(df, "score", F.col("y") == 1, max_points=50).collect(),
        key=lambda r: r.threshold,
    )
    # rates decrease as the threshold rises; endpoints sane
    tprs = [r.tpr for r in pts]
    fprs = [r.fpr for r in pts]
    assert all(a >= b for a, b in zip(tprs, tprs[1:]))
    assert all(a >= b for a, b in zip(fprs, fprs[1:]))
    assert pts[0].tpr == 1.0 and pts[0].fpr == 1.0  # lowest threshold captures all
    assert pts[-1].fpr == 0.0  # top threshold above every negative
    # perfectly-separated scores: some threshold achieves (tpr=1, fpr=0)
    assert any(r.tpr == 1.0 and r.fpr == 0.0 for r in pts)
