"""Similarity search over embedding columns (SURVEY §2.8 extension
surface; generalizes the reference's kNN linkage join from
quasi-identifier space to arbitrary `array<float>` embeddings).

  * ``cosine_topk``     — exact brute-force top-k: queries × corpus
    pair stream with the corpus broadcast, per-query top-k via
    aggregated sorted-slice (no global window sort). The correctness
    baseline and the oracle-checkable form.
  * ``cosine_topk_lsh`` — random-hyperplane (sign) LSH bucketing: a
    query only scores candidates sharing a bucket in some hash table.
    Sub-linear candidate sets at 100 TB; recall controlled by
    (num_tables × hyperplanes). Hyperplane directions are md5-derived,
    so the bucketing is deterministic and engine-reproducible.

Dot products / norms are array folds in fixed element order —
deterministic FP, identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUND_N = 6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def _prep(df: DataFrame, id_col: str, vec_col: str, alias_id: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.select(F.col(id_col).alias(alias_id), v.alias("v"), _norm(v).alias("nrm"))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k as an aggregation: collect the per-partition
    partial top-k... expressed as sort_array(collect_list(struct)) with
    slice — acceptable because the aggregation is per query id and
    map-side partials keep only candidate structs, not raw vectors.
    Output one row per (query_id, rank)."""
    packed = scored.select(
        "query_id",
        F.struct(
            (-F.col("cosine")).alias("neg"), F.col("id").alias("id"), F.col("cosine").alias("cosine")
        ).alias("cand"),
    )
    agg = packed.groupBy("query_id").agg(
        F.slice(F.sort_array(F.collect_list("cand")), 1, k).alias("top")
    )
    return agg.select(
        "query_id", F.posexplode("top").alias("rank0", "cand")
    ).select(
        "query_id",
        (F.col("rank0") + 1).alias("rank"),
        F.col("cand.id").alias("neighbor_id"),
        F.round(F.col("cand.cosine"), ROUND_N).alias("cosine"),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-matches
    excluded by id). Output: (query_id, rank, neighbor_id, cosine)."""
    q = _prep(queries, query_id_col or id_col, vec_col, "query_id")
    c = _prep(corpus, id_col, vec_col, "id")
    par = queries.sparkSession.sparkContext.defaultParallelism
    pairs = q.repartition(par).alias("q").join(
        F.broadcast(c.alias("c")), on=F.col("q.query_id") != F.col("c.id")
    )
    scored = pairs.select(
        F.col("q.query_id").alias("query_id"),
        F.col("c.id").alias("id"),
        (_dot(F.col("q.v"), F.col("c.v")) / (F.col("q.nrm") * F.col("c.nrm"))).alias("cosine"),
    )
    return _topk(scored, k)


def _hyperplane(dim: int, table: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in {-1,+1}^dim,
    derived from md5 so both engines (and reruns) agree."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()
        out.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
    return out


import functools


@functools.lru_cache(maxsize=8)
def _hyperplane_literal(dim: int, num_tables: int, planes: int) -> Column:
    import numpy as np

    flat = [
        x for t in range(num_tables) for p in range(planes) for x in _hyperplane(dim, t, p)
    ]
    return F.lit(np.array(flat))


def bucket_keys(vec: Column, dim: int, num_tables: int, planes: int) -> Column:
    """Array of ``num_tables`` LSH bucket keys: sign-pattern of the
    vector against ``planes`` fixed hyperplanes per table.

    The whole hyperplane matrix is ONE flat ndarray literal (cached per
    process), row-sliced inside the transform lambdas — building it
    from per-scalar ``lit`` calls put thousands of py4j conversions on
    the plan-build path (measured: 7.4s plan build → <1s)."""
    W = _hyperplane_literal(dim, num_tables, planes)

    def key_for_table(t: Column) -> Column:
        bits = F.transform(
            F.sequence(F.lit(0), F.lit(planes - 1)),
            lambda p: F.when(
                _dot(vec, F.slice(W, ((t * planes + p) * dim + 1).cast("int"), dim)) >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        )
        return F.concat(F.lit("t"), t.cast("string"), F.lit(":"), F.array_join(bits, ""))

    return F.transform(F.sequence(F.lit(0), F.lit(num_tables - 1)), key_for_table)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_tables: int = 8,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    in at least one table. Candidates per query ≈ n/2^planes ×
    num_tables instead of n — the 100 TB path. Approximate ⇒ validated
    by recall tests, not the SQL oracle."""
    q = _prep(queries, id_col, vec_col, "query_id").withColumn(
        "bk", F.explode(bucket_keys(F.col("v"), dim, num_tables, planes))
    )
    c = _prep(corpus, id_col, vec_col, "id").withColumn(
        "bk", F.explode(bucket_keys(F.col("v"), dim, num_tables, planes))
    )
    pairs = (
        q.alias("q")
        .join(c.alias("c"), on=(F.col("q.bk") == F.col("c.bk")) & (F.col("q.query_id") != F.col("c.id")))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("c.id").alias("id"),
            (_dot(F.col("q.v"), F.col("c.v")) / (F.col("q.nrm") * F.col("c.nrm"))).alias("cosine"),
        )
        .dropDuplicates(["query_id", "id"])
    )
    return _topk(pairs, k)
