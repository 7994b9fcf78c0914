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


def test_zorder_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.sources.layout import zorder_value

    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], "x double, y double"
    )
    z = zorder_value([(F.col("x"), 0.0, 4.0), (F.col("y"), 0.0, 4.0)], bits=2)
    got = {(r.x, r.y): r.z for r in df.select("x", "y", z.alias("z")).collect()}
    # 2-bit grid: x,y in {0,3} -> cells 0 and 3; morton(0,0)=0,
    # morton(3,0)=0b0101=5, morton(0,3)=0b1010=10, morton(3,3)=15
    assert got == {(0.0, 0.0): 0, (3.0, 0.0): 5, (0.0, 3.0): 10, (3.0, 3.0): 15}
    import pytest

    with pytest.raises(ValueError):
        zorder_value([(F.col("x"), 0, 1)])
    with pytest.raises(ValueError):
        zorder_value([(F.col("x"), 0, 1)] * 4, bits=16)


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering tightens footer min/max on EVERY clustered
    column; lexicographic range clustering only on the leading one.
    The audit must show a materially lower hit_fraction for the
    trailing column under Z-order."""
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.sources.layout import (
        skipping_stats,
        write_range_clustered,
        write_zorder_clustered,
    )

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).cast("double").alias("x"),
        F.floor(F.col("id") / 64).cast("double").alias("y"),
    )
    lex_path, z_path = str(tmp_path / "lex"), str(tmp_path / "zord")
    write_range_clustered(df, lex_path, ["x", "y"], n_files=16)
    write_zorder_clustered(
        df, z_path, [("x", 0.0, 64.0), ("y", 0.0, 64.0)], n_files=16, bits=8
    )
    hit = {}
    for name, path in (("lex", lex_path), ("z", z_path)):
        for c in ("x", "y"):
            hit[(name, c)] = skipping_stats(spark, path, c).collect()[0].hit_fraction
    # leading column: lexicographic is perfectly clustered
    assert hit[("lex", "x")] < 0.2
    # trailing column: lexicographic files span ~the whole y range;
    # z-order cuts it by at least 2x
    assert hit[("lex", "y")] > 0.8
    assert hit[("z", "y")] < hit[("lex", "y")] / 2
    assert hit[("z", "x")] < 0.6  # x stays well-clustered too
