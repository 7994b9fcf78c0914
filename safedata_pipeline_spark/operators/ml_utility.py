"""ML utility check (SURVEY §2.6 E7/E8, §2.7 U4).

Behavior parity targets (reference: /root/reference/modules/utility.py:125-146):
  * numeric features only, target excluded (utility.py:131)
  * mean imputation (utility.py:136) — per-column means from one agg
  * 70/30 split, seed 42 (utility.py:137); reference stratifies when
    nunique(y)<20 — here randomSplit (documented divergence; the split
    is randomized either way, so the driver check is rows-only)
  * LogisticRegression(maxIter=200) with RandomForest(100 trees,
    seed 42) fallback (utility.py:138-143)
  * metrics: accuracy + weighted F1 on the holdout (utility.py:144-145)
  * guard rows with NULL metrics when target missing / <2 classes /
    no numeric features (utility.py:128-135)

Output: one row per dataset: (dataset, acc, f1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _null_row(spark: SparkSession, name: str) -> DataFrame:
    return spark.createDataFrame(
        [(name, None, None)], "dataset string, acc double, f1 double"
    )


def _evaluate_one(df: DataFrame, target: str, name: str, seed: int = 42) -> DataFrame:
    from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    spark = df.sparkSession
    if target not in df.columns:
        return _null_row(spark, name)
    feat_cols = [
        f.name
        for f in df.schema.fields
        if f.name != target and isinstance(f.dataType, NumericType)
    ]
    if not feat_cols:
        return _null_row(spark, name)
    data = df.select(*feat_cols, F.col(target).cast("double").alias("label")).where(
        F.col("label").isNotNull()
    )
    n_classes = data.select("label").distinct().count()
    if n_classes < 2:
        return _null_row(spark, name)

    # mean imputation from ONE wide agg (reference fillna(X.mean()))
    means = data.agg(*[F.avg(c).alias(c) for c in feat_cols]).collect()[0]
    for c in feat_cols:
        data = data.withColumn(c, F.coalesce(F.col(c).cast("double"), F.lit(float(means[c] or 0.0))))

    train, test = data.randomSplit([0.7, 0.3], seed=seed)
    va = VectorAssembler(inputCols=feat_cols, outputCol="features")
    train_v, test_v = va.transform(train), va.transform(test)
    try:
        model = LogisticRegression(maxIter=200, featuresCol="features", labelCol="label").fit(train_v)
    except Exception:
        model = RandomForestClassifier(
            numTrees=100, seed=seed, featuresCol="features", labelCol="label"
        ).fit(train_v)
    pred = model.transform(test_v)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(pred)
    f1 = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="weightedFMeasure"
    ).evaluate(pred)
    return spark.createDataFrame(
        [(name, round(acc, 6), round(f1, 6))], "dataset string, acc double, f1 double"
    )


def model_utility_check(
    df_before: DataFrame, df_after: DataFrame, target: str, seed: int = 42
) -> DataFrame:
    """U4: fit/evaluate on original vs protected data → 2-row table
    (dataset, acc, f1); the utility question is how much accuracy the
    protection chain cost."""
    before = _evaluate_one(df_before, target, "original", seed)
    after = _evaluate_one(df_after, target, "protected", seed)
    return before.unionByName(after)
