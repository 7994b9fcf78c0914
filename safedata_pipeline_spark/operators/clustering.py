"""Deterministic distributed KMeans (Lloyd's algorithm, fixed
iterations) over embedding columns
(SURVEY §2.8 extension surface; no reference counterpart).

Why hand-rolled next to MLlib's KMeans (which the IVF ANN index uses
as a coarse quantizer): MLlib's implementation is neither
reproducible across engines nor across its own releases (k-means||
init, float reduce order), so its assignments can't be pinned by
equality tests. This twin is engine-deterministic end-to-end:

  * init — the k rows with the SMALLEST md5(id) (an order-insensitive
    TakeOrdered; the "random" seeds any engine can recompute);
  * assign — argmin squared L2 distance, ties broken by lowest
    centroid id (numpy stable argmin), one GEMM per Arrow batch
    (the justified-Python contract shared with the ANN module);
  * update — per-(cluster, dim) means via posexplode + groupBy with
    DECIMAL(38,9) sums, rounded to 9 dp per iteration so float
    summation order can never drift the trajectory (the PageRank /
    drift discipline).

Scale shape: each of the T iterations is one map-only assignment
pass + one (cluster, dim)-keyed aggregate (map-side combined:
k·dim cells per partition regardless of rows); centroids are
O(k·dim) driver-side fit parameters, never row data. The input is
localCheckpoint'ed once so T passes don't re-run the scan lineage.
Iterative argmax/argmin makes it rows-only for the oracle harness;
tests pin exact equality against a sequential numpy twin of the
same recurrence (tests/test_clustering.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_pipeline_spark.checkpoint import pin_eager, pin_lazy

ITER_ROUND = 9  # per-iteration centroid rounding: kills float drift
_DEC = "decimal(38,9)"


def _nearest_centroid(centers):
    """Pandas UDF: vector → id of the closest centroid (squared L2,
    stable argmin → lowest id wins ties). One GEMM per Arrow batch."""
    import numpy as np

    C = np.asarray(centers, dtype=float)
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        M = np.vstack(col.to_numpy())
        # |x-c|² = |x|² - 2x·c + |c|²; |x|² is constant per row → drop
        d = -2.0 * (M @ C.T) + c2
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return nearest


def _seed_centroids(df: DataFrame, id_col: str, vec_col: str, k: int) -> list[list[float]]:
    rows = (
        df.select(F.md5(F.col(id_col).cast("string").cast("binary")).alias("h"), F.col(vec_col))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(rows)}")
    return [[float(x) for x in r[1]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit deterministic KMeans; returns the centroid table
    ``(cluster_id, n_assigned, centroid array<double>)`` after the
    final update step."""
    if k < 1 or iterations < 1:
        raise ValueError("need k >= 1 and iterations >= 1")
    spark = df.sparkSession
    data = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .transform(pin_eager)
    )
    centers = _seed_centroids(data, "id", "v", k)
    counts: list[int] = [0] * k
    for _ in range(iterations):
        assign = _nearest_centroid(centers)
        cells = data.select(assign("v").alias("cluster_id"), "v")
        upd = (
            cells.select("cluster_id", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster_id", "dim")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("x"), ITER_ROUND).cast(_DEC)).alias("s"),
            )
            .select(
                "cluster_id",
                "dim",
                "n",
                F.round(F.col("s").cast("double") / F.col("n"), ITER_ROUND).alias("m"),
            )
            .collect()
        )
        new = [list(c) for c in centers]  # empty clusters keep their centroid
        counts = [0] * k
        for r in upd:
            new[r.cluster_id][r.dim] = float(r.m)
            counts[r.cluster_id] = int(r.n)
        centers = new
    out = [(i, counts[i], centers[i]) for i in range(k)]
    return spark.createDataFrame(
        out, "cluster_id int, n_assigned bigint, centroid array<double>"
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only cluster assignment against a fitted centroid list:
    (id, cluster_id). Scan-bound at any scale — the centroids are a
    broadcast-by-closure fit artifact."""
    assign = _nearest_centroid(centroids)
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        assign(F.col(vec_col).cast("array<double>")).alias("cluster_id"),
    )
