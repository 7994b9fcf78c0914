import numpy as np

from safedata_pipeline_spark.operators import graph as G


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def test_degree_stats_star(spark):
    # star: 1 is the hub with degree 4, leaves degree 1
    out = {r.doc_id: r.degree for r in
           G.degree_stats(_pairs(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])).collect()}
    assert out == {1: 4, 2: 1, 3: 1, 4: 1, 5: 1}


def _reference_pagerank(edges, damping=0.85, iterations=5):
    """Sequential twin of graph.pagerank's exact recurrence
    (incl. the per-iteration 12-dp rounding)."""
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in nodes]
    deg = np.zeros(n)
    for a, b in edges:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, round(1.0 / n, 12))
    for _ in range(iterations):
        nxt = np.zeros(n)
        for u in range(n):
            for v in adj[u]:
                nxt[v] += r[u] / deg[u]
        r = np.round((1.0 - damping) / n + damping * nxt, 12)
    return {v: round(float(r[idx[v]]), 6) for v in nodes}


def test_pagerank_matches_sequential_reference(spark):
    # star + chain + triangle, all in one graph
    edges = [(1, 2), (1, 3), (1, 4), (1, 5), (5, 6), (6, 7), (8, 9), (9, 10), (8, 10)]
    out = {r.doc_id: r.pagerank for r in G.pagerank(_pairs(spark, edges)).collect()}
    assert out == _reference_pagerank(edges)
    # the star hub dominates its own component
    assert out[1] == max(out[k] for k in (1, 2, 3, 4, 5))
    # triangle nodes are symmetric
    assert out[8] == out[9] == out[10]


def test_pagerank_mass_conservation(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    ranks = [r.pagerank for r in G.pagerank(_pairs(spark, edges)).collect()]
    assert abs(sum(ranks) - 1.0) < 1e-5  # no dangling mass in an undirected graph


def test_weighted_pagerank_follows_heavy_edges(spark):
    # node 1 connects to 2 (weight 0.95) and 3 (weight 0.05): the
    # heavy neighbor receives almost all of 1's mass
    pairs = spark.createDataFrame(
        [(1, 2, 0.95), (1, 3, 0.05)], "id_a bigint, id_b bigint, jaccard double"
    )
    out = {r.doc_id: r.pagerank for r in
           G.pagerank(pairs, weight_col="jaccard").collect()}
    assert out[2] > out[3]
    assert abs(sum(out.values()) - 1.0) < 1e-5
    # uniform weights == unweighted kernel exactly
    uni = spark.createDataFrame(
        [(1, 2, 0.7), (2, 3, 0.7), (1, 3, 0.7)], "id_a bigint, id_b bigint, jaccard double"
    )
    w = {r.doc_id: r.pagerank for r in G.pagerank(uni, weight_col="jaccard").collect()}
    u = {r.doc_id: r.pagerank for r in G.pagerank(uni.select("id_a", "id_b")).collect()}
    assert w == u


def test_pagerank_deep_iteration_checkpoint_is_transparent(spark):
    """Runs past CHECKPOINT_AFTER pin the rank table per iteration;
    pinning must only truncate lineage — values bit-identical to the
    fully-lazy plan at the same T, and the final plan stays O(1) deep."""
    from safedata_pipeline_spark.operators import graph as G

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (3, 4, 0.7), (1, 4, 0.6), (5, 6, 0.95), (2, 5, 0.5)],
        "id_a bigint, id_b bigint, jaccard double",
    )
    t = G.CHECKPOINT_AFTER + 3
    deep = G.pagerank(pairs, iterations=t, weight_col="jaccard")
    got = sorted((r.doc_id, r.degree, r.pagerank) for r in deep.collect())
    # the pinned final frame must not drag T joins of lineage
    assert deep._jdf.queryExecution().executedPlan().toString().count("Exchange") == 0
    old = G.CHECKPOINT_AFTER
    try:
        G.CHECKPOINT_AFTER = 10_000  # force the fully-lazy path at the same T
        lazy = sorted(
            (r.doc_id, r.degree, r.pagerank)
            for r in G.pagerank(pairs, iterations=t, weight_col="jaccard").collect()
        )
    finally:
        G.CHECKPOINT_AFTER = old
    assert got == lazy
