from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import anonymity as AN


def _table(spark):
    rows = [
        # class (25, m): 3 rows, 2 distinct diseases
        (25, "m", "flu"),
        (25, "m", "flu"),
        (25, "m", "cold"),
        # class (25, f): 2 rows, 1 distinct
        (25, "f", "flu"),
        (25, "f", "flu"),
        # class (30, m): 1 row
        (30, "m", "cold"),
        # class (None, f): null QI forms its own class
        (None, "f", "flu"),
    ]
    return spark.createDataFrame(rows, "age int, gender string, disease string")


def test_equivalence_classes(spark):
    cls = {(r.age, r.gender): r.class_size for r in AN.equivalence_classes(_table(spark), ["age", "gender"]).collect()}
    assert cls[(25, "m")] == 3 and cls[(25, "f")] == 2
    assert cls[(30, "m")] == 1 and cls[(None, "f")] == 1


def test_k_anonymity_metrics(spark):
    r = AN.k_anonymity(_table(spark), ["age", "gender"], k=2).collect()[0]
    assert r.k_anonymity == 1
    assert r.n_classes == 4
    assert r.n_violating_classes == 2  # the two singletons
    assert r.n_rows_at_risk == 2
    assert r.satisfies_k is False
    # k=1 is always satisfied on non-empty input
    assert AN.k_anonymity(_table(spark), ["age", "gender"], k=1).collect()[0].satisfies_k is True


def test_k_anonymity_violations_lists_classes(spark):
    v = {(r.age, r.gender) for r in AN.k_anonymity_violations(_table(spark), ["age", "gender"], k=3).collect()}
    assert v == {(25, "f"), (30, "m"), (None, "f")}


def test_l_diversity_metrics(spark):
    r = AN.l_diversity(_table(spark), ["age", "gender"], "disease", l=2).collect()[0]
    assert r.l_diversity == 1  # (25,f) and singletons have 1 distinct disease
    assert r.n_violating_classes == 3
    assert r.satisfies_l is False


def test_k_anonymity_after_suppression_improves(spark):
    # coarsening the QI (drop age) merges classes — the remediation story
    df = _table(spark)
    before = AN.k_anonymity(df, ["age", "gender"], k=2).collect()[0]
    after = AN.k_anonymity(df.withColumn("age", F.lit(0)), ["age", "gender"], k=2).collect()[0]
    assert after.k_anonymity >= before.k_anonymity
    assert after.satisfies_k is True


def test_t_closeness_uniform_vs_skewed(spark):
    """A class mirroring the global distribution scores tv=0; a fully
    concentrated class scores the max deviation."""
    from safedata_pipeline_spark.operators import anonymity as AN

    # global: A/B 50-50. class q=1 mirrors it; class q=2 is all-A.
    rows = [(1, "A"), (1, "B"), (1, "A"), (1, "B"), (2, "A"), (2, "A")]
    df = spark.createDataFrame(rows, "q int, s string")
    r = AN.t_closeness(df, ["q"], "s", t=0.2).collect()[0]
    # global p = (A: 4/6, B: 2/6); class2 = (A: 1, B: 0)
    # tv(class2) = 0.5*(|1-4/6| + |0-2/6|) = 1/3
    assert r.n_classes == 2
    assert abs(r.t_closeness - round(1 / 3, 6)) < 1e-9
    assert r.n_violating_classes == 1 and not r.satisfies_t
    # identical distributions everywhere -> t = 0, satisfied
    uni = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B")], "q int, s string"
    )
    r2 = AN.t_closeness(uni, ["q"], "s", t=0.2).collect()[0]
    assert r2.t_closeness == 0.0 and r2.satisfies_t


def test_t_closeness_null_sensitive_is_category(spark):
    from safedata_pipeline_spark.operators import anonymity as AN

    df = spark.createDataFrame(
        [(1, None), (1, "A"), (2, "A"), (2, None)], "q int, s string"
    )
    r = AN.t_closeness(df, ["q"], "s", t=0.5).collect()[0]
    # both classes mirror the 50-50 global (null, A) distribution
    assert r.t_closeness == 0.0 and r.n_classes == 2


def test_enforce_k_anonymity_masks_and_drops(spark):
    from safedata_pipeline_spark.operators import anonymity as AN

    # class (1, "x"): 5 rows (safe at k=3); (2, "y"): 1 row; (3, "z"): 1 row
    rows = [(i, 1, "x") for i in range(5)] + [(10, 2, "y"), (11, 3, "z")]
    df = spark.createDataFrame(rows, "id bigint, q1 int, q2 string")
    out = {r.id: r for r in AN.enforce_k_anonymity(df, ["q1", "q2"], k=3).collect()}
    # safe class keeps its (stringified) QI values
    assert out[0].q1 == "1" and out[0].q2 == "x"
    # violating rows are masked and merge into one class of size 2
    assert out[10].q1 == "*" and out[10].q2 == "*" and out[11].q1 == "*"
    # the merged class (size 2) still violates k=3: audit agrees...
    audit = AN.k_anonymity(
        spark.createDataFrame(
            [(r.q1, r.q2) for r in out.values()], "q1 string, q2 string"
        ),
        ["q1", "q2"],
        k=3,
    ).collect()[0]
    assert not audit.satisfies_k
    # ...and residual="drop" removes it, making the output k-anonymous
    dropped = AN.enforce_k_anonymity(df, ["q1", "q2"], k=3, residual="drop")
    assert sorted(r.id for r in dropped.collect()) == [0, 1, 2, 3, 4]
    # with enough violating rows the merged class survives on its own
    rows2 = rows + [(12, 4, "w")]
    df2 = spark.createDataFrame(rows2, "id bigint, q1 int, q2 string")
    kept = AN.enforce_k_anonymity(df2, ["q1", "q2"], k=3, residual="drop")
    assert kept.count() == 8  # 5 safe + 3 masked (class size 3 >= k)

    import pytest

    with pytest.raises(ValueError, match="residual"):
        AN.enforce_k_anonymity(df, ["q1"], residual="bogus")
