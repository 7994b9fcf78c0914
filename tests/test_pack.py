"""Sequence packing: deterministic bucket/offset assignment."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators.pack import pack_sequences


def _docs(spark):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(40)],
        "doc_id bigint, text string",
    )


def test_pack_offsets_are_contiguous_per_bucket(spark):
    rows = pack_sequences(_docs(spark), budget=32, buckets=4).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(len(v) for v in by_bucket.values()) and len(rows) == 40
    for b, docs in by_bucket.items():
        docs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in docs:
            assert r.start_offset == run  # cumulative, gap-free
            assert r.pack_no == run // 32
            run += r.n_tokens


def test_pack_deterministic_across_partitionings(spark):
    df = _docs(spark)
    a = sorted(map(tuple, pack_sequences(df, budget=32, buckets=4).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(7), budget=32, buckets=4).collect())
    )
    assert a == b


def test_pack_no_global_sort(spark, sf_dir):
    from safedata_pipeline_spark import plans
    from safedata_pipeline_spark.sources.tables import load_table

    out = pack_sequences(load_table(spark, sf_dir, "documents"), budget=256, buckets=8)
    plan = plans.formatted_plan(out)
    # the cumsum window partitions by bucket — no single-partition sort
    assert "hashpartitioning(bucket" in plan
    assert "SinglePartition" not in plan


def test_pack_stats_accounts_every_token(spark):
    from safedata_pipeline_spark.operators.pack import pack_stats

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(40)],
        "doc_id bigint, text string",
    )
    r = pack_stats(docs, budget=64, buckets=4).collect()[0]
    total = sum(10 + i % 7 for i in range(40))
    assert r.n_docs == 40 and r.total_tokens == total
    assert r.n_buckets <= 4 and r.n_windows >= total // 64
    assert 0.0 < r.avg_window_fill <= 1.0
    assert abs(r.avg_window_fill + r.wasted_fraction - 1.0) < 1e-9
    # a single huge budget -> one window per bucket, fill = total/(buckets*budget)
    r2 = pack_stats(docs, budget=100000, buckets=2).collect()[0]
    assert r2.n_windows == r2.n_buckets


def test_pack_windows_token_conservation(spark):
    """Every document's token slices across its windows are gap-free,
    disjoint, and sum to n_tokens; every window except each bucket's
    last is filled to exactly `budget` tokens."""
    from safedata_pipeline_spark.operators.pack import pack_windows

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 37) % 90))) for i in range(60)],
        "doc_id bigint, text string",
    )
    budget = 32
    packed = {r.doc_id: r for r in pack_sequences(docs, budget=budget, buckets=4).collect()}
    rows = pack_windows(docs, budget=budget, buckets=4).collect()

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, wins in by_doc.items():
        wins.sort(key=lambda r: r.window_no)
        # contiguous window range starting at the doc's pack_no
        assert wins[0].window_no == packed[doc_id].pack_no
        assert [w.window_no for w in wins] == list(
            range(wins[0].window_no, wins[0].window_no + len(wins))
        )
        # slices partition [0, n_tokens)
        assert wins[0].start_tok == 0
        assert wins[-1].end_tok == packed[doc_id].n_tokens
        for a, b in zip(wins, wins[1:]):
            assert a.end_tok == b.start_tok
        assert sum(w.end_tok - w.start_tok for w in wins) == packed[doc_id].n_tokens
    # zero-token docs emit nothing
    empty_ids = {d for d, p in packed.items() if p.n_tokens == 0}
    assert empty_ids.isdisjoint(by_doc)

    # per-(bucket, window) fill: exactly budget except each bucket's last
    fill = {}
    for r in rows:
        fill[(r.bucket, r.window_no)] = fill.get((r.bucket, r.window_no), 0) + (
            r.end_tok - r.start_tok
        )
    last_per_bucket = {}
    for (b, w) in fill:
        last_per_bucket[b] = max(last_per_bucket.get(b, -1), w)
    for (b, w), tok in fill.items():
        if w != last_per_bucket[b]:
            assert tok == budget, (b, w, tok)
        else:
            assert 0 < tok <= budget


def test_pack_sequences_vocab_unit(spark):
    """Packing budgets in real tokenizer units: with a vocab covering
    the frequent words, per-doc n_tokens comes from the greedy encode
    (rare words cost their piece decomposition, not 1)."""
    from safedata_pipeline_spark.operators.pack import pack_sequences
    from safedata_pipeline_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [(i, "common common rareword") for i in range(8)],
        "doc_id bigint, text string",
    )
    vocab = build_vocab(docs, top_k=1)  # just "common"
    ws = {r["doc_id"]: r for r in pack_sequences(docs, budget=16).collect()}
    enc = {r["doc_id"]: r for r in pack_sequences(docs, budget=16, vocab=vocab).collect()}
    assert all(r["n_tokens"] == 3 for r in ws.values())
    # "rareword" = 8 fallback chars -> 2 + 8 = 10 encode units
    assert all(r["n_tokens"] == 10 for r in enc.values())
    # same deterministic bucketing, offsets rescale with the unit
    for d in ws:
        assert ws[d]["bucket"] == enc[d]["bucket"]
