import pytest

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import sampling as S


def _corpus(spark, n_a=600, n_b=300, n_c=100):
    rows = []
    i = 0
    for src, n in (("web", n_a), ("books", n_b), ("code", n_c)):
        for _ in range(n):
            rows.append((i, src, f"doc {i} text with some words here {i % 7}"))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_mixture_rates_max_volume(spark):
    df = _corpus(spark)
    rates = S.mixture_rates(df, {"web": 0.5, "books": 0.3, "code": 0.2})
    # cap = min(600/.5, 300/.3, 100/.2) = 500 ⇒ rates (.4167, .5, 1.0)
    assert rates["code"] == 1.0
    assert rates["books"] == pytest.approx(0.3 * 500 / 300)
    assert rates["web"] == pytest.approx(0.5 * 500 / 600)
    assert all(0 < r <= 1.0 for r in rates.values())


def test_mixture_sample_composition(spark):
    df = _corpus(spark)
    shares = {"web": 0.5, "books": 0.3, "code": 0.2}
    out = S.source_mixture_sample(df, shares)
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    total = sum(got.values())
    # expected totals: 250/150/100 of 500; md5-Bernoulli ⇒ binomial noise
    for src, w in shares.items():
        assert got[src] / total == pytest.approx(w, abs=0.08)
    # rate-1.0 source keeps EVERY row (no sampling noise)
    assert got["code"] == 100


def test_mixture_sample_deterministic(spark):
    df = _corpus(spark, 100, 50, 20)
    shares = {"web": 0.6, "books": 0.4}
    a = sorted(r.doc_id for r in S.source_mixture_sample(df, shares).collect())
    b = sorted(r.doc_id for r in S.source_mixture_sample(df, shares).collect())
    assert a == b and len(a) > 0


def test_mixture_sample_absent_source_dropped(spark):
    df = _corpus(spark, 100, 50, 20)
    out = S.source_mixture_sample(df, {"web": 0.7, "books": 0.3})
    assert out.where(F.col("source") == "code").count() == 0


def test_mixture_sample_empty_and_unknown_shares(spark):
    df = _corpus(spark, 50, 20, 10)
    assert S.source_mixture_sample(df, {}).count() == 0
    # shares naming only nonexistent sources ⇒ empty result, same schema
    out = S.source_mixture_sample(df, {"wiki": 1.0})
    assert out.count() == 0
    assert out.columns == df.columns


def test_mixture_rates_reuse_on_holdout(spark):
    train = _corpus(spark, 200, 100, 50)
    rates = S.mixture_rates(train, {"web": 0.5, "books": 0.5})
    holdout = _corpus(spark, 40, 40, 40)
    out = S.source_mixture_sample(holdout, {}, rates=rates)
    # the holdout is filtered with the TRAIN-fitted rates: code dropped,
    # web/books sampled at the train rates
    assert out.where(F.col("source") == "code").count() == 0
    assert out.count() > 0


def test_quality_decile_edges_dedup(spark):
    # constant-quality corpus ⇒ all edges equal ⇒ collapses to 1 edge
    df = spark.createDataFrame(
        [(i, "same text every time") for i in range(40)], "doc_id bigint, text string"
    )
    edges = S.quality_decile_edges(df)
    assert len(edges) == 1
    # and quality_deciles degrades to an empty, correctly-typed frame
    out = S.quality_deciles(df)
    assert out.count() == 0
    assert out.columns == ["bucket", "lo", "hi", "n_docs", "total_ws_tokens", "avg_quality"]


def test_quality_deciles_partition(spark):
    rows = []
    for i in range(100):
        # vary length and punctuation so quality actually spreads
        words = " ".join(f"w{j}" for j in range(1 + (i % 25)))
        punct = "!" * (i % 5)
        rows.append((i, f"{words} the and of {punct}"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = S.quality_deciles(df).collect()
    assert 1 < len(out) <= 10
    # every doc lands in exactly one bucket
    assert sum(r.n_docs for r in out) == 100
    by_bucket = sorted(out, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi <= b.lo + 1e-9  # buckets ordered, non-overlapping
    assert all(0.0 <= r.avg_quality <= 1.0 for r in out)
    assert all(r.lo - 1e-9 <= r.avg_quality <= r.hi + 1e-9 for r in out)


def test_quality_deciles_empty_input(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    out = S.quality_deciles(df)
    assert out.count() == 0


def test_quality_deciles_approx_path(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i % 20)))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    exact = {r.bucket: r.n_docs for r in S.quality_deciles(df, exact=True).collect()}
    approx = {r.bucket: r.n_docs for r in S.quality_deciles(df, exact=False).collect()}
    # approx quantiles at 0.001 accuracy on 200 rows = exact
    assert sum(exact.values()) == sum(approx.values()) == 200


def test_take_per_source(spark):
    df = _corpus(spark, 50, 30, 10)
    out = S.take_per_source(df, 8)
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"web": 8, "books": 8, "code": 8}
    # deterministic across invocations
    a = sorted(r.doc_id for r in S.take_per_source(df, 8).collect())
    b = sorted(r.doc_id for r in S.take_per_source(df, 8).collect())
    assert a == b
    # n larger than a source takes the whole source
    tiny = S.take_per_source(df, 20)
    assert tiny.where(F.col("source") == "code").count() == 10


def test_weighted_sample_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators import sampling as SMP

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0.9)).otherwise(F.lit(0.1)).alias("w"),
    )
    kept = SMP.weighted_sample(df, "w").collect()
    hi = sum(1 for r in kept if r.doc_id % 2 == 0)
    lo = len(kept) - hi
    # md5-uniform coins: ~90% of evens, ~10% of odds survive
    assert abs(hi / 2000 - 0.9) < 0.05 and abs(lo / 2000 - 0.1) < 0.05
    # deterministic replay
    again = SMP.weighted_sample(df, "w").collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in kept)
    # clamp: weight >= 1 keeps everything, <= 0 keeps nothing
    allw = df.withColumn("w", F.lit(5.0))
    assert SMP.weighted_sample(allw, "w").count() == 4000
    nonew = df.withColumn("w", F.lit(-1.0))
    assert SMP.weighted_sample(nonew, "w").count() == 0


def test_source_share_sums_to_one(spark):
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators import sampling as SMP

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(90)], "doc_id bigint, source string"
    ).union(spark.createDataFrame([(100, "src0")], "doc_id bigint, source string"))
    rows = {r.source: r for r in SMP.source_share(df).collect()}
    assert rows["src0"].n_docs == 31 and rows["src1"].n_docs == 30
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-5


def test_assign_folds_deterministic_and_balanced(spark):
    from safedata_pipeline_spark.operators.sampling import assign_folds

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["fold"] for r in assign_folds(df, "doc_id", 5).collect()}
    b = {r["doc_id"]: r["fold"] for r in assign_folds(df.repartition(7), "doc_id", 5).collect()}
    assert a == b  # stable under repartitioning
    assert set(a.values()) == {0, 1, 2, 3, 4}
    from collections import Counter

    counts = Counter(a.values())
    assert min(counts.values()) > 120  # roughly balanced
    import pytest as _pytest

    with _pytest.raises(ValueError):
        assign_folds(df, "doc_id", 1)


def test_length_matched_sample_matches_reference_profile(spark):
    """X177: survivors' length-bucket distribution matches the
    reference's (exact expected counts via per-bucket rates); the coin
    is replayable, buckets absent from the reference drop entirely."""
    from safedata_pipeline_spark.operators.sampling import (
        length_bucket,
        length_matched_rates,
        length_matched_sample,
    )
    import pyspark.sql.functions as F

    # corpus: 40 short (bucket 1), 40 long (bucket 4); reference wants
    # 3:1 short:long
    rows = [(i, "w1 w2 w3") for i in range(40)]
    rows += [(100 + i, " ".join(f"x{j}" for j in range(20))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ref_rows = [(0, "a b c")] * 3 + [(1, " ".join("y" * 1 for _ in range(20)))]
    ref = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(ref_rows)], "doc_id bigint, text string"
    )
    rates = length_matched_rates(df, ref)
    # bucket 1 (3 words): rate 1.0 (the binding bucket); bucket 4: 1/3
    assert rates[1] == 1.0 and abs(rates[4] - 1 / 3) < 1e-12
    kept = length_matched_sample(df, ref, rates=rates)
    by_bucket = {
        r["b"]: r["cnt"]
        for r in kept.select(length_bucket(F.col("text")).alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_bucket[1] == 40                      # rate 1.0 keeps all
    assert 0 < by_bucket.get(4, 0) < 40            # thinned by the coin
    # determinism: the same call yields the same survivors
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {r.doc_id for r in length_matched_sample(df, ref, rates=rates).collect()}
    assert ids1 == ids2
    # a bucket the reference lacks drops wholesale
    extra = spark.createDataFrame(
        [(999, " ".join(f"z{j}" for j in range(300)))], "doc_id bigint, text string"
    )
    kept_extra = length_matched_sample(df.union(extra), ref, rates=rates)
    assert kept_extra.where(F.col("doc_id") == 999).count() == 0


def test_alpha_mixture_rates_closed_form(spark):
    from safedata_pipeline_spark.operators.sampling import alpha_mixture_sample
    import math

    # sources with 64 / 16 / 4 docs: rates sqrt(4/64)=0.25,
    # sqrt(4/16)=0.5, 1.0 — smallest source kept whole
    rows = (
        [(i, "big") for i in range(64)]
        + [(100 + i, "mid") for i in range(16)]
        + [(200 + i, "small") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = alpha_mixture_sample(df).collect()
    rates = {r.source: r.rate for r in got}
    assert rates["small"] == 1.0
    assert abs(rates["mid"] - 0.5) < 1e-9
    assert abs(rates["big"] - 0.25) < 1e-9
    kept = {}
    for r in got:
        kept[r.source] = kept.get(r.source, 0) + 1
    assert kept["small"] == 4  # rate 1: everything survives
    # md5 coin keeps roughly rate*count of the others (loose bounds)
    assert 8 <= kept["big"] <= 28
    assert 3 <= kept["mid"] <= 13


def test_alpha_mixture_deterministic_across_runs(spark):
    from safedata_pipeline_spark.operators.sampling import alpha_mixture_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    a = {r.doc_id for r in alpha_mixture_sample(df).collect()}
    b = {r.doc_id for r in alpha_mixture_sample(df).collect()}
    assert a == b and len(a) > 0


def test_stratified_split_exact_quotas(spark):
    from pyspark.sql import functions as F

    from safedata_pipeline_spark.operators.sampling import stratified_split

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "rare") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, label string")
    out = stratified_split(df, "label", train_pct=80)
    counts = {
        (r.label, r.split): r.n
        for r in out.groupBy("label", "split").agg(F.count("*").alias("n")).collect()
    }
    # exact to the row: ceil(100*0.8)=80, ceil(5*0.8)=4
    assert counts[("big", "train")] == 80 and counts[("big", "eval")] == 20
    assert counts[("rare", "train")] == 4 and counts[("rare", "eval")] == 1
    # deterministic: identical assignment across runs
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in stratified_split(df, "label", 80).collect()}
    assert a == b

    import pytest

    with pytest.raises(ValueError):
        stratified_split(df, "label", train_pct=0)


def test_bootstrap_mean_ci_vs_sequential_twin(spark):
    """Exact equality vs a pure-Python Poisson-bootstrap twin (same
    md5 coin, same thresholds, same rounding discipline)."""
    import hashlib
    import math
    from decimal import Decimal

    from safedata_pipeline_spark.operators.sampling import (
        bootstrap_mean_ci,
        poisson1_cum_thresholds,
    )

    rows = [(i, float(10 + (i * 37) % 100) / 7.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, x double")
    B = 32
    got = bootstrap_mean_ci(df, "x", replicates=B).collect()[0]
    assert got.n_rows == 200 and got.n_replicates == B

    cum = poisson1_cum_thresholds()

    def coin(i, b):
        h = hashlib.md5(f"boot|{i}|{b}".encode()).hexdigest()
        return (int(h[:8], 16) + 1.0) / 4294967296.0

    def weight(u):
        for k, t in enumerate(cum):
            if u < t:
                return k
        return len(cum)

    means = []
    for b in range(B):
        s, n = Decimal(0), 0
        for i, x in rows:
            w = weight(coin(i, b))
            if w > 0:
                s += Decimal(str(round(w * x, 9)))
                n += w
        means.append(math.floor(float(s) / n * 1e6 + 0.5) / 1e6)
    ptot = sum(Decimal(str(round(x, 9))) for _, x in rows)
    pmean = math.floor(float(ptot) / 200 * 1e6 + 0.5) / 1e6
    assert got.mean == pmean
    ms = sorted(means)

    def q(p):
        pos = p * (B - 1)
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        return ms[lo] if lo == hi else (hi - pos) * ms[lo] + (pos - lo) * ms[hi]

    assert abs(got.ci_lo - round(q(0.025), 6)) <= 1e-6
    assert abs(got.ci_hi - round(q(0.975), 6)) <= 1e-6
    # a sane interval brackets the point estimate
    assert got.ci_lo <= got.mean <= got.ci_hi
    # deterministic at any parallelism
    again = bootstrap_mean_ci(df.repartition(7), "x", replicates=B).collect()[0]
    assert (again.mean, again.ci_lo, again.ci_hi) == (got.mean, got.ci_lo, got.ci_hi)


def test_bootstrap_ci_width_shrinks_with_n(spark):
    from safedata_pipeline_spark.operators.sampling import bootstrap_mean_ci

    small = spark.createDataFrame(
        [(i, float((i * 13) % 50)) for i in range(50)], "doc_id bigint, x double"
    )
    big = spark.createDataFrame(
        [(i, float((i * 13) % 50)) for i in range(5000)], "doc_id bigint, x double"
    )
    ws = bootstrap_mean_ci(small, "x", replicates=32).collect()[0]
    wb = bootstrap_mean_ci(big, "x", replicates=32).collect()[0]
    assert (wb.ci_hi - wb.ci_lo) < (ws.ci_hi - ws.ci_lo)


def test_temperature_mix_exact_quotas_and_determinism(spark):
    """X230: quotas are exact largest-remainder apportionment summing
    to the budget; tau=1 reproduces natural shares; tau<1 upsamples
    rare sources; the sampled set is repartition-invariant."""
    rows = [(i, "big" if i < 80 else ("mid" if i < 95 else "rare")) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = S.temperature_mix(df, budget=20, temperature=0.5).collect()
    quotas = {}
    for r in out:
        quotas.setdefault(r.source, set()).add(r.quota)
    q = {k: v.pop() for k, v in quotas.items()}
    n_sampled = len(out)
    assert sum(q.values()) == 20 == n_sampled
    # tau=0.5 weights: sqrt(.8)=.894, sqrt(.15)=.387, sqrt(.05)=.224
    # -> shares .594/.257/.149 of 20 -> quotas 12/5/3 by largest remainder
    assert q == {"big": 12, "mid": 5, "rare": 3}
    nat = S.temperature_mix(df, budget=20, temperature=1.0).collect()
    qn = {r.source: r.quota for r in nat}
    assert qn == {"big": 16, "mid": 3, "rare": 1}  # natural 16/3/1
    out7 = S.temperature_mix(df.repartition(7), budget=20, temperature=0.5).collect()
    assert {(r.source, r.doc_id) for r in out7} == {(r.source, r.doc_id) for r in out}


def test_temperature_mix_quota_exceeds_source_and_validation(spark):
    """A source smaller than its quota contributes all its docs (the
    realized sample can undershoot the budget); bad params raise."""
    import pytest

    rows = [(i, "a" if i < 98 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    # tau=0.1 pushes b's quota far above its 2 docs
    out = S.temperature_mix(df, budget=50, temperature=0.1).collect()
    by = {}
    for r in out:
        by.setdefault(r.source, []).append(r)
    assert len(by["b"]) == 2  # all of b, quota not reachable
    with pytest.raises(ValueError, match="budget"):
        S.temperature_mix(df, budget=0)
    with pytest.raises(ValueError, match="temperature"):
        S.temperature_mix(df, temperature=1.5)


def test_temperature_mix_prefilter_bit_identical(spark):
    """VERDICT r13 Next #3: the md5-threshold prefilter (scale path —
    no full-source single-task sort) is BIT-IDENTICAL to the
    unfiltered oracle-replay twin: at the default slack, at a
    starvation slack that forces the exact per-source fallback for
    every source, and on the quota>population edge."""
    rows = [
        (i, "big" if i < 300 else ("mid" if i < 380 else "rare"))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    for budget, tau in [(60, 0.5), (25, 1.0), (390, 0.3)]:
        want = sorted(
            tuple(r)
            for r in S.temperature_mix(
                df, budget=budget, temperature=tau, prefilter_slack=None
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in S.temperature_mix(
                df, budget=budget, temperature=tau
            ).collect()
        )
        # starvation slack: thresholds ~0 -> every source deficits ->
        # the full-rank fallback must reproduce the twin exactly
        starved = sorted(
            tuple(r)
            for r in S.temperature_mix(
                df, budget=budget, temperature=tau, prefilter_slack=1e-6
            ).collect()
        )
        assert got == want and starved == want and len(want) > 0
    # ENGAGED path (N=4000 > GATE*slack*budget): prefilter prunes for
    # real and the survivor sets must still reproduce the twin exactly
    big = spark.createDataFrame(
        [
            (i, "hot" if i % 10 < 9 else ("warm" if i % 10 == 9 and i % 3 else "cold"))
            for i in range(4000)
        ],
        "doc_id bigint, source string",
    )
    want = sorted(
        tuple(r)
        for r in S.temperature_mix(
            big, budget=30, temperature=0.6, prefilter_slack=None
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in S.temperature_mix(
            big, budget=30, temperature=0.6, prefilter_slack=2.0
        ).collect()
    )
    assert got == want and len(want) == 30
    import pytest

    with pytest.raises(ValueError, match="prefilter_slack"):
        S.temperature_mix(df, prefilter_slack=-1.0)


def test_dsir_logweights_model_and_order(spark):
    """X235 (DSIR importance weights): add-one multinomial log-ratio
    over md5-hashed unigram+bigram slots; target-like docs outscore
    off-target docs; weights are repartition-invariant; empty docs
    absent; decimal recomputation of one doc matches."""
    rows = [
        (1, "spark table scan", True),
        (2, "spark row merge", True),
        (3, "cat dog bird", False),
        (4, "spark table hash", False),
        (5, "dog cat fish", False),
        (6, "", False),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, is_target boolean")
    out = {r.doc_id: r for r in S.dsir_logweights(df).collect()}
    assert 6 not in out and len(out) == 5
    # 'spark table hash' shares features with the target model
    assert out[4].logweight > out[3].logweight
    assert out[4].logweight > out[5].logweight
    assert all(out[d].n_feats == 5 for d in (1, 2, 3, 4, 5))
    r7 = {r.doc_id: tuple(r) for r in S.dsir_logweights(df.repartition(7)).collect()}
    assert r7 == {k: tuple(v) for k, v in out.items()}
    import pytest

    with pytest.raises(ValueError, match="buckets"):
        S.dsir_logweights(df, buckets=1)


def test_doremi_weights_semantics(spark):
    """A source the corpus LM underfits (its own vocabulary) gets
    excess > 0 and weight above uniform; a source drawn from the
    corpus-typical vocabulary sits at the clamp; weights are a
    normalized distribution."""
    from safedata_pipeline_spark.operators import sampling as SMP

    rows = []
    # source A: its own private vocabulary, repeated -> own LM models
    # it far better than the corpus LM
    for i in range(6):
        rows.append((i, "A", "qq ww ee rr tt qq ww ee"))
    # source B: the corpus-dominant vocabulary (shared with C)
    for i in range(6):
        rows.append((100 + i, "B", "aa bb cc dd aa bb cc dd"))
    for i in range(6):
        rows.append((200 + i, "C", "aa bb cc dd aa bb cc dd"))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r.source: r for r in SMP.doremi_weights(df, lr=0.5).collect()}
    assert sorted(out) == ["A", "B", "C"]
    for r in out.values():
        assert r.n_docs == 6 and r.n_tokens == 48
        assert r.excess >= 0.0
    total = sum(r.weight for r in out.values())
    assert abs(total - 1.0) < 1e-6
    # A's vocabulary is 5 of ~9 corpus types but 100% of its own ->
    # the corpus LM is worse on A than A's own LM
    assert out["A"].excess > 0.0
    assert out["A"].weight > out["B"].weight
    # B and C are identical corpora -> identical rows
    assert out["B"].weight == out["C"].weight
    assert out["B"].corpus_loss == out["C"].corpus_loss


def test_doremi_weights_zero_excess_uniform(spark):
    """Identical sources -> every excess clamps to 0 and the update
    returns exactly uniform weights (integer-unit ratio is exact)."""
    from safedata_pipeline_spark.operators import sampling as SMP

    rows = [(i, f"s{i % 4}", "aa bb cc dd ee") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = SMP.doremi_weights(df, lr=0.5).collect()
    assert len(out) == 4
    for r in out:
        assert r.excess == 0.0
        assert r.weight == 0.25


def _tok_corpus(spark, sizes):
    # one doc per (source, n_tokens) pair: n_tokens single-char words
    rows = [
        (i, src, " ".join("w" for _ in range(n)))
        for i, (src, n) in enumerate(sizes)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_unimax_water_filling_exact(spark):
    # T=170, B=(170*19)//20=161; caps sorted a10,b20,c40,d100:
    # 10*4<=161 cap, 20*3<=151 cap, 40*2<=131 cap, 100*1<=91 no
    # -> rem 91 over 1 uncapped source
    df = _tok_corpus(spark, [("a", 10), ("b", 20), ("c", 40), ("d", 100)])
    out = {r["source"]: r for r in S.unimax_mixture(df).collect()}
    assert {s: out[s]["alloc"] for s in "abcd"} == {"a": 10, "b": 20, "c": 40, "d": 91}
    assert {s: out[s]["capped"] for s in "abcd"} == {
        "a": True, "b": True, "c": True, "d": False
    }
    assert sum(r["alloc"] for r in out.values()) == (170 * 19) // 20


def test_unimax_remainder_topup_order(spark):
    # T=160, B=152; a caps at 10, rem 142 over 3 -> u=47 r=1; the +1
    # goes to the FIRST uncapped source in (cap, source) order: b
    df = _tok_corpus(spark, [("a", 10), ("b", 50), ("c", 50), ("d", 50)])
    out = {r["source"]: r["alloc"] for r in S.unimax_mixture(df).collect()}
    assert out == {"a": 10, "b": 48, "c": 47, "d": 47}


def test_unimax_all_capped_and_null_source(spark):
    # budget 2x total: every source caps out at its full size;
    # NULL-source and NULL-text rows never enter the allocation
    df = _tok_corpus(spark, [("a", 10), ("b", 20)])
    extra = spark.createDataFrame(
        [(90, None, "x y z"), (91, "a", None)],
        "doc_id bigint, source string, text string",
    )
    out = {
        r["source"]: r
        for r in S.unimax_mixture(
            df.unionByName(extra), budget_num=2, budget_den=1
        ).collect()
    }
    assert set(out) == {"a", "b"}
    assert out["a"]["n_tokens"] == 10 and out["a"]["alloc"] == 10
    assert out["b"]["alloc"] == 20
    assert all(r["capped"] for r in out.values())


def test_unimax_validation(spark):
    df = _tok_corpus(spark, [("a", 5)])
    with pytest.raises(ValueError):
        S.unimax_mixture(df, budget_num=0)
    with pytest.raises(ValueError):
        S.unimax_mixture(df, epoch_cap=0)


def test_token_budget_select_prefix_property(spark):
    from pyspark.sql import Window
    from safedata_pipeline_spark.operators.text import unigram_logprob

    # a corpus with a clear quality gradient: docs made of common
    # words score low (kept first), rare-word docs score high
    rows = []
    for i in range(40):
        common = "the and of to a " * 4
        rare = f"zx{i}a zx{i}b zx{i}c zx{i}d zx{i}e "
        rows.append((i, common if i % 2 == 0 else common + rare * 2))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = S.token_budget_select(df, budget_num=1, budget_den=4).collect()
    assert out, "budget must keep at least one doc"
    # single-window twin: identical kept set and cum values
    u = unigram_logprob(df)
    h = u.where(F.col("avg_neg_logprob").isNotNull())
    B = h.agg(F.expr("(sum(n_tokens) * 1) div 4").alias("b")).collect()[0]["b"]
    w = Window.orderBy(
        F.col("avg_neg_logprob").asc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    twin = {
        r.doc_id: r.cum
        for r in h.withColumn("cum", F.sum("n_tokens").over(w))
        .where(F.col("cum") <= B)
        .collect()
    }
    got = {r.doc_id: r.cum_tokens for r in out}
    assert got == twin
    assert max(got.values()) <= B
    # prefix property: every kept doc scores <= every dropped doc
    kept_scores = {r.doc_id: r.avg_neg_logprob for r in out}
    dropped = {
        r.doc_id: r.avg_neg_logprob
        for r in h.collect()
        if r.doc_id not in kept_scores
    }
    if dropped:
        assert max(kept_scores.values()) <= min(dropped.values())


def test_token_budget_select_excludes_unscored_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    out = S.token_budget_select(df, budget_num=1, budget_den=1).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].cum_tokens == 8
    with pytest.raises(ValueError):
        S.token_budget_select(df, budget_num=0)
