from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import ml_utility as MU
from safedata_pipeline_spark.operators import protect as PR


def _labeled(spark, n=200):
    # separable-ish: label = x > 0 with noise feature y
    rows = [(float(i - n // 2), float(i % 7), 1 if i > n // 2 else 0) for i in range(n)]
    return spark.createDataFrame(rows, "x double, y double, target int")


def test_model_utility_two_rows(spark):
    df = _labeled(spark)
    noised = PR.add_dp_noise(df, ["x", "y"], epsilon=1.0, seed=5)
    out = MU.model_utility_check(df, noised, "target").collect()
    assert [r.dataset for r in out] == ["original", "protected"]
    orig = out[0]
    assert orig.acc is not None and orig.acc > 0.9  # separable data
    assert 0.0 <= out[1].acc <= 1.0


def test_stratified_split_exact_per_class_proportions(spark):
    # skewed 2-class target: 180 of class 0, 20 of class 1 — plain
    # randomSplit would leave the minority class's train share to
    # chance; stratified_split cuts each class at exactly round(0.7*n_c)
    rows = [(float(i), 0.0 if i < 180 else 1.0) for i in range(200)]
    data = spark.createDataFrame(rows, "x double, label double")
    train, test = MU.stratified_split(data, "label", 0.7, seed=42)
    tr = {r["label"]: r["n"] for r in train.groupBy("label").agg(F.count("*").alias("n")).collect()}
    te = {r["label"]: r["n"] for r in test.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert tr[0.0] == 126 and te[0.0] == 54  # round(0.7*180)
    assert tr[1.0] == 14 and te[1.0] == 6    # round(0.7*20)
    # split is a partition: no row lost or duplicated
    assert train.count() + test.count() == 200
    assert train.join(test, on="x", how="inner").count() == 0


def test_missing_target_null_row(spark):
    df = _labeled(spark)
    out = MU.model_utility_check(df.drop("target"), df, "target").collect()
    assert out[0].acc is None and out[0].f1 is None
    assert out[1].acc is not None


def test_single_class_null_row(spark):
    df = _labeled(spark).withColumn("target", F.lit(1))
    out = MU.model_utility_check(df, df, "target").collect()
    assert all(r.acc is None for r in out)


def test_no_numeric_features_null_row(spark):
    df = _labeled(spark, 50).select(F.col("x").cast("string").alias("x"), "target")
    out = MU.model_utility_check(df, df, "target").collect()
    assert all(r.acc is None for r in out)


def test_confusion_matrix_cells_and_marginals(spark):
    from safedata_pipeline_spark.operators.ml_utility import confusion_matrix

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "a"),
        ("c", "c"),
        (None, "a"), ("a", None),   # excluded by contract
    ]
    df = spark.createDataFrame(rows, "truth string, pred string")
    out = {(r.truth, r.pred): r for r in confusion_matrix(df).collect()}
    assert set(out) == {("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"), ("c", "c")}
    aa = out[("a", "a")]
    # truth 'a' has 3 rows, pred 'a' has 3 rows (2 + b->a)
    assert aa.n == 2
    assert aa.frac_of_truth == 0.666667  # recall of class a
    assert aa.frac_of_pred == 0.666667   # precision of class a
    cc = out[("c", "c")]
    assert cc.n == 1 and cc.frac_of_truth == 1.0 and cc.frac_of_pred == 1.0
    # marginals sum to 1 per truth class
    import collections
    per_truth = collections.defaultdict(float)
    for (t, _), r in out.items():
        per_truth[t] += r.frac_of_truth
    for v in per_truth.values():
        assert abs(v - 1.0) < 1e-9
