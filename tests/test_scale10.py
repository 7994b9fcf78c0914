"""The decade-2 fixture generator's load-bearing property: tiling must
preserve PAIR DENSITY — true pairs scale linearly (x tiles) with rows,
no cross-tile pairs — otherwise the slope gates would measure the
fixture, not the operator (naive duplication makes a linear operator
look quadratic; distance-1 name collisions across tiles did exactly
that in the first cut)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _build(spark, sf_dir, tmp_path, tiles):
    from tools.make_scale10 import build

    out = str(tmp_path / "scaleN")
    build(spark, sf_dir, out, tiles=tiles)
    return out


def test_documents_pairs_scale_linearly(spark, sf_dir, tmp_path):
    from safedata_pipeline_spark.operators import dedup as DD
    from safedata_pipeline_spark.sources.tables import load_table

    out = _build(spark, sf_dir, tmp_path, tiles=3)
    base = DD.jaccard_prefix_join(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.7
    ).count()
    tiled = DD.jaccard_prefix_join(
        spark.read.parquet(out + "/documents.parquet"), n=3, threshold=0.7
    ).count()
    assert tiled == 3 * base


def test_customer_edit_pairs_scale_linearly(spark, sf_dir, tmp_path):
    from safedata_pipeline_spark.operators import fuzzy as FZ
    from safedata_pipeline_spark.sources.tables import load_table

    out = _build(spark, sf_dir, tmp_path, tiles=3)
    base = FZ.edit_distance_pairs(
        load_table(spark, sf_dir, "customer"), "c_name", max_dist=1, q=2
    ).count()
    tiled = FZ.edit_distance_pairs(
        spark.read.parquet(out + "/customer.parquet"), "c_name", max_dist=1, q=2
    ).count()
    # no cross-tile distance-1 pairs: tile markers differ in >= 2 chars
    assert tiled == 3 * base


def test_embedding_cosine_structure_preserved(spark, sf_dir, tmp_path):
    """Within-tile cosine pairs replicate EXACTLY (sign masks are
    orthogonal: s_i^2 = 1 preserves every dot product bit-for-bit).
    Cross-tile cosines are sign-scrambled dots concentrating near 0
    with std ~ d^(-1/2) ≈ 0.125 at d=64 — a FEW leak past a 0.4
    threshold by construction-independent math (no orthogonal map can
    do better without growing the dimension), so the property pinned
    is exact intra-tile replication plus bounded leakage."""
    from safedata_pipeline_spark.operators.dedup import embedding_cosine_pairs
    from safedata_pipeline_spark.sources.tables import load_table

    ID_OFF = 10**9
    out = _build(spark, sf_dir, tmp_path, tiles=3)
    thr = 0.4
    base = load_table(spark, sf_dir, "embeddings")
    tiled = spark.read.parquet(out + "/embeddings.parquet")
    b = embedding_cosine_pairs(base, threshold=thr).count()
    t = embedding_cosine_pairs(tiled, threshold=thr)
    tile = lambda c: F.floor(c / ID_OFF)  # noqa: E731
    intra = t.where(tile(F.col("id_a")) == tile(F.col("id_b"))).count()
    cross = t.where(tile(F.col("id_a")) != tile(F.col("id_b"))).count()
    assert intra == 3 * b
    # leakage bound: cross pairs are a small tail of the ~n^2 cross
    # population, far below the intra signal they could otherwise drown
    n = base.count()
    assert cross < 0.01 * (3 * n * n)


def test_tile_ids_disjoint_and_row_counts(spark, sf_dir, tmp_path):
    out = _build(spark, sf_dir, tmp_path, tiles=3)
    for name, src in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("customer", "c_custkey"),
    ):
        base = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        tiled = spark.read.parquet(f"{out}/{name}.parquet")
        assert tiled.count() == 3 * base.count()
        assert tiled.select(src).distinct().count() == tiled.count()
        assert tiled.schema == base.schema
        # tile 0 is the original, byte-for-byte row set
        t0 = tiled.where(F.col(src) < 10**9)
        assert t0.exceptAll(base).count() == 0 and base.exceptAll(t0).count() == 0
