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
