import math

import pytest

from safedata_pipeline_spark.operators import risk as R


def _real_anon(spark):
    # row-aligned pair: anon is real minus the name, like the reference demo
    real = spark.createDataFrame(
        [
            (1, 30, "M", 100.0),
            (2, 40, "F", 200.0),
            (3, 50, "M", 300.0),
            (4, 60, "F", 400.0),
        ],
        "rid int, age int, gender string, income double",
    )
    anon = spark.createDataFrame(
        [
            (11, 30, "M", 100.0),
            (12, 40, "F", 200.0),
            (13, 52, "M", 310.0),
            (14, 90, "X", 999.0),  # unseen category + outlier
        ],
        "aid int, age int, gender string, income double",
    )
    return real, anon


def test_split_quasi_ids_validates(spark):
    real, _ = _real_anon(spark)
    num, cat = R.split_quasi_ids(real, ["age", "gender", "nope"])
    assert num == ["age"] and cat == ["gender"]
    with pytest.raises(ValueError):
        R.split_quasi_ids(real, ["nope"])


def test_encoder_zero_std_scales_by_one(spark):
    df = spark.createDataFrame([(1.0,), (1.0,)], "x double")
    params = R.fit_encoder(df, ["x"])
    assert params["num"]["x"] == (1.0, 1.0)


def test_one_hot_unseen_category_all_zero(spark):
    real, anon = _real_anon(spark)
    enc = R.one_hot(anon, anon, "gender", keep=["aid"])
    row = {r.aid: r for r in enc.collect()}
    # vocab fit on anon includes X; refit on real-only vocab:
    enc2 = R.one_hot(real, anon, "gender", keep=["aid"])
    r14 = [r for r in enc2.collect() if r.aid == 14][0]
    assert r14["f_gender_M"] == 0.0 and r14["f_gender_F"] == 0.0  # unseen → all zero


def test_knn_exact_match_distance_zero(spark):
    real, anon = _real_anon(spark)
    nn = R.knn_linkage_join(anon, real, ["age", "gender", "income"], "aid", "rid")
    got = {r.anon_id: r for r in nn.collect()}
    assert got[11].real_id == 1 and got[11].dist == 0.0
    assert got[12].real_id == 2 and got[12].dist == 0.0
    assert got[13].real_id == 3 and got[13].dist > 0.0
    assert len(got) == 4


def test_knn_tiebreak_smallest_real_id(spark):
    real = spark.createDataFrame([(1, 10.0), (2, 10.0)], "rid int, x double")
    anon = spark.createDataFrame([(9, 10.0)], "aid int, x double")
    nn = R.knn_linkage_join(anon, real, ["x"], "aid", "rid").collect()
    assert nn[0].real_id == 1


def test_risk_score_formula(spark):
    real, anon = _real_anon(spark)
    nn = R.knn_linkage_join(anon, real, ["age", "gender", "income"], "aid", "rid")
    scores = {r.anon_id: r.risk_score for r in R.row_risk_scores(nn).collect()}
    assert scores[11] == 1.0  # exact match
    assert scores[13] < 0.001  # non-match ≈ 0
    overall = R.linkage_risk_score(nn).collect()[0]
    assert 0.0 <= overall.overall_risk <= 1.0
    assert overall.n_rows == 4
    # 2 exact matches of 4 → mean ≈ 0.5
    assert abs(overall.overall_risk - 0.5) < 0.001


def test_lsh_finds_planted_duplicates(spark):
    real, anon = _real_anon(spark)
    nn = R.knn_linkage_join_lsh(
        anon, real, ["age", "income"], "aid", "rid", bucket_length=2.0, num_hash_tables=5
    )
    got = {r.anon_id: r for r in nn.collect()}
    assert got[11].real_id == 1 and got[11].dist == 0.0
    assert got[12].real_id == 2 and got[12].dist == 0.0
