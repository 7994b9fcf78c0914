"""Graph analytics over duplicate/similarity pair lists
(SURVEY §2.8 extension surface; no reference counterpart).

The dedup pair generators (``ngram_jaccard_pairs``, banded LSH,
SimHash bands, exact digests) emit an undirected similarity graph.
``dedup_components`` resolves it into keep/drop clusters; this module
adds the *centrality* view: which documents are template HUBS —
boilerplate that near-matches many other documents — versus leaf
copies. Hub score drives curation policy (a hub with 500 edges is a
site template to drop wholesale; a leaf pair is a syndicated article
to keep once).

Scale shape: classic synchronous power iteration — each of the T
iterations is ONE equi-join (edges ⋈ ranks on src) + ONE groupBy(dst)
shuffle, the textbook distributed PageRank. T is fixed and small, so
the plan is T stages deep, never driver-iterative-until-convergence
(convergence loops need a driver-side delta check; fixed-T keeps the
operator deterministic and oracle-expressible as T unrolled CTEs).
Ranks are rounded to 12 dp at every iteration boundary so float
summation-order differences (≤ last-ulp per engine) cannot compound
across iterations — the same determinism discipline as the md5-based
MinHash family.

At 100 TB: edges shuffle T times; runs deeper than
``CHECKPOINT_AFTER`` iterations pin (checkpoint) the rank table per
round, keeping the plan O(1) deep at any T — shallow fixture runs
keep the single fully-lazy plan (bit-identical results either way;
pinning only truncates lineage). No driver-side row data — the only
scalar is the node count, attached via a broadcast 1-row aggregate,
not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_pipeline_spark.checkpoint import pin_eager, pin_lazy

ITER_ROUND = 12  # per-iteration rounding: kills cross-engine ulp drift
OUT_ROUND = 6


def undirected_edges(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str | None = None,
) -> DataFrame:
    """Symmetrize a pair list into distinct directed edges (src, dst
    [, w]). Pair lists are canonical (id_a < id_b, unique), so the
    union is duplicate-free by construction; distinct() guards ad-hoc
    inputs."""
    cols_ab = [F.col(id_a).alias("src"), F.col(id_b).alias("dst")]
    cols_ba = [F.col(id_b).alias("src"), F.col(id_a).alias("dst")]
    if weight_col is not None:
        cols_ab.append(F.col(weight_col).cast("double").alias("w"))
        cols_ba.append(F.col(weight_col).cast("double").alias("w"))
    return pairs.select(*cols_ab).union(pairs.select(*cols_ba)).distinct()


def degree_stats(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Per-node degree in the similarity graph: (doc_id, degree).
    One symmetrize + one groupBy — the cheap hub screen before
    PageRank."""
    und = undirected_edges(pairs, id_a, id_b)
    return und.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


CHECKPOINT_AFTER = 5  # iterations beyond this pin the rank table per round


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected pair graph.

    Output: (doc_id, degree, pagerank) for every node with ≥1 edge,
    pagerank rounded to 6 dp. r₀ = 1/N; rₜ₊₁(v) = (1-d)/N +
    d·Σ_{u~v} rₜ(u)/deg(u). Undirected graphs have no dangling
    nodes (every node has degree ≥ 1), so no dangling-mass term.

    Each iteration: edges ⋈ ranks (equi-join on src) → groupBy(dst)
    partial-agg sum of rank/degree → left join back onto the node
    table (isolated receivers keep the teleport term). The node
    count N rides a broadcast 1-row aggregate. Deterministic across
    engines via per-iteration 12-dp rounding.

    ``weight_col`` switches to WEIGHTED PageRank: the random surfer
    follows edge (u,v) with probability w(u,v)/strength(u) — for
    similarity graphs, a 0.95-jaccard duplicate pulls rank harder
    than a borderline 0.5 match, separating tight template hubs from
    loose-match stars. deg stays the plain edge count in the output;
    only the transition kernel weights.
    """
    # the edge list is referenced once per iteration (T+1 times in the
    # final plan); pair GENERATORS are usually expensive subtrees
    # (shingle joins, LSH bands), so materialize the symmetrized edges
    # once — localCheckpoint truncates lineage and auto-releases blocks
    # with the DataFrame, mirroring bpe_fit's iteration discipline
    und = undirected_edges(pairs, id_a, id_b, weight_col).transform(pin_eager)
    wexpr = F.col("w") if weight_col is not None else F.lit(1.0)
    deg = und.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg"), F.round(F.sum(wexpr), 12).alias("strength")
    )
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    nodes = deg.crossJoin(F.broadcast(n))
    ranks = nodes.select(
        "src", "deg", "strength", "n_nodes",
        F.round(F.lit(1.0) / F.col("n_nodes"), ITER_ROUND).alias("rank"),
    )
    # deep-T runs pin the rank table per iteration: the unrolled plan is
    # otherwise T joins deep (28 exchanges at T=5 already), and lineage
    # growth is what kills convergence-depth PageRank on real clusters.
    # T ≤ CHECKPOINT_AFTER keeps the fully-lazy single plan (identical
    # hashes either way — pinning only truncates lineage).
    deep = iterations > CHECKPOINT_AFTER
    for _ in range(iterations):
        contrib = (
            und.join(ranks.select("src", "strength", "rank"), "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(F.sum(F.col("rank") * wexpr / F.col("strength")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, "src", "left")
            .select(
                "src",
                "deg",
                "strength",
                "n_nodes",
                F.round(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0)),
                    ITER_ROUND,
                ).alias("rank"),
            )
        )
        if deep:
            ranks = ranks.transform(pin_eager)
    return ranks.select(
        F.col("src").alias("doc_id"),
        F.col("deg").cast("bigint").alias("degree"),
        F.round("rank", OUT_ROUND).alias("pagerank"),
    )
