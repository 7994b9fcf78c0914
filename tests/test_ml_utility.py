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
