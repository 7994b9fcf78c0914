"""Range-clustered writes make parquet footer stats prunable
(sources/layout.py): the audit metric and the actual scan agree."""

import pytest
from pyspark.sql import functions as F

from safedata_pipeline_spark.sources import layout as LY
from safedata_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def paths(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    clustered = str(base / "clustered")
    scattered = str(base / "scattered")
    LY.write_range_clustered(ev, clustered, ["user_id"], n_files=8)
    # worst case: round-robin layout, every file spans the key range
    ev.repartition(8).write.mode("overwrite").parquet(scattered)
    return clustered, scattered


def test_skipping_stats_separate_layouts(spark, paths):
    clustered, scattered = paths
    good = LY.skipping_stats(spark, clustered, "user_id").collect()[0]
    bad = LY.skipping_stats(spark, scattered, "user_id").collect()[0]
    assert good["n_files"] >= 4
    # clustered files each own a narrow slice; scattered span ~everything
    assert good["avg_span"] < 0.35
    assert bad["avg_span"] > 0.8
    assert good["hit_fraction"] < bad["hit_fraction"]


def test_clustered_write_preserves_rows(spark, paths):
    clustered, _ = paths
    n = spark.read.parquet(clustered).count()
    assert n > 0
    # point-predicate result identical across layouts
    _, scattered = paths
    k = spark.read.parquet(clustered).agg(F.min("user_id")).collect()[0][0]
    a = spark.read.parquet(clustered).where(F.col("user_id") == k).count()
    b = spark.read.parquet(scattered).where(F.col("user_id") == k).count()
    assert a == b


def test_raises_without_stats_or_cols(spark, paths, tmp_path):
    clustered, _ = paths
    with pytest.raises(ValueError):
        LY.skipping_stats(spark, str(tmp_path / "nope"), "user_id")
    with pytest.raises(ValueError):
        LY.write_range_clustered(spark.read.parquet(clustered), str(tmp_path / "x"), [])
