"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query keys map 1:1 to SURVEY.md §2's operator inventory; see the
``queries()`` docstring of each operator module for reference
file:line parity notes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import functions as F

from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.operators import profile as P
from safedata_pipeline_spark.operators import compliance as C
from safedata_pipeline_spark.operators import protect as PR
from safedata_pipeline_spark.operators import drift as DR
from safedata_pipeline_spark.operators import risk as RK
from safedata_pipeline_spark.operators import ml_utility as MU
from safedata_pipeline_spark.operators import text as TX
from safedata_pipeline_spark.operators import dedup as DD
from safedata_pipeline_spark.operators import similarity as SIM
from safedata_pipeline_spark.operators import multimodal as MM
from safedata_pipeline_spark.operators import joins as JN
from safedata_pipeline_spark.operators import pii as PII
from safedata_pipeline_spark.operators import rollup as RU
from safedata_pipeline_spark.operators import sketch as SK
from safedata_pipeline_spark.operators import sampling as SMP
from safedata_pipeline_spark.operators import anonymity as AN
from safedata_pipeline_spark.operators import cdc as CDC
from safedata_pipeline_spark.operators import quality_rules as QR
from safedata_pipeline_spark.operators import incremental as INC
from safedata_pipeline_spark.operators import graph as GR
from safedata_pipeline_spark.operators import bpe as BP
from safedata_pipeline_spark.operators import fuzzy as FZ
from safedata_pipeline_spark.operators import clustering as CL
from safedata_pipeline_spark.operators import compression as CMP
from safedata_pipeline_spark.functions.hashing import md5_unit_interval as _hash01
from safedata_pipeline_spark.streaming import corpus as SC
from safedata_pipeline_spark.streaming import events as SE
from safedata_pipeline_spark.streaming import sessions as SS

SF_SMOKE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# static schema knowledge for oracle-SQL generation (TESTDATA.md fixtures)
# ---------------------------------------------------------------------------
LINEITEM_SCHEMA = [
    ("l_orderkey", "bigint"),
    ("l_partkey", "bigint"),
    ("l_suppkey", "bigint"),
    ("l_linenumber", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_tax", "double"),
    ("l_returnflag", "string"),
    ("l_linestatus", "string"),
    ("l_shipdate", "timestamp"),
]
CUSTOMER_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

NUMERIC_DTYPES = {"bigint", "int", "double", "float"}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full profiling table (SURVEY A12 basic_stats)
    of lineitem at sf0.001 — scan → wide agg → melt, end to end."""
    return P.basic_stats(load_table(spark, SF_SMOKE, "lineitem"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_limit_preview(spark, sf):
    # sort on EVERY column: (l_orderkey, l_linenumber) alone is not
    # unique in the fixtures, so a 2-key top-5 is engine-ambiguous
    li = load_table(spark, sf, "lineitem")
    return P.limit_preview(li, list(li.columns), 5)


def _q_project_quasi_ids(spark, sf):
    return P.project(load_table(spark, sf, "customer"), ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"])


def _q_row_count(spark, sf):
    return P.row_count(load_table(spark, sf, "lineitem"))


def _q_value_counts(spark, sf):
    # A1 + A2 in one result: per-value count and normalized frequency
    return P.value_counts(load_table(spark, sf, "orders"), "o_orderpriority")


def _q_null_profile(spark, sf):
    return P.null_profile(load_table(spark, sf, "customer"))


def _q_distinct_count(spark, sf):
    return P.distinct_counts(load_table(spark, sf, "customer"), ["c_mktsegment", "c_nationkey"])


def _q_numeric_profile(spark, sf):
    return P.numeric_profile(load_table(spark, sf, "lineitem"), ["l_extendedprice", "l_discount", "l_quantity"])


def _q_top_freq(spark, sf):
    return P.top_freq(load_table(spark, sf, "orders"), ["o_orderpriority", "o_orderstatus"])


def _q_basic_stats(spark, sf):
    return P.basic_stats(load_table(spark, sf, "lineitem"))


def _q_checklist_score(spark, sf):
    return C.checklist_score(C.default_checklist(spark))


def _skewed_priority(spark, sf):
    """orders with injected rare categories so PR1's rare branch fires
    at the correctness sf: every 997th orderkey gets one of 7 RARE-x
    values (~2 occurrences each at sf0.01 → < threshold 5)."""
    return load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 997 == 0,
            F.concat(F.lit("RARE-"), (F.col("o_orderkey") % 7).cast("string")),
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
    )


def _q_sdc_suppress(spark, sf):
    return PR.sdc_suppress(_skewed_priority(spark, sf), ["priority"], threshold=5)


def _q_generalize_numeric(spark, sf):
    df = load_table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    return PR.generalize_numeric(df, ["c_acctbal"], bins=10).withColumnRenamed(
        "c_acctbal", "acctbal_bin"
    )


def _q_smart_suggest(spark, sf):
    return PR.smart_suggest(load_table(spark, sf, "customer"))


def _q_dp_noise(spark, sf):
    df = load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    return PR.add_dp_noise(df, ["l_quantity"], epsilon=1.0, sensitivity=1.0, seed=42)


def _q_synthetic_sample(spark, sf):
    df = load_table(spark, sf, "customer").select("c_nationkey", "c_acctbal", "c_mktsegment")
    return PR.synthetic_sample(df, seed=42)


def _drift_before(spark, sf):
    return load_table(spark, sf, "lineitem").select("l_quantity", "l_extendedprice", "l_returnflag")


def _drift_after(spark, sf):
    """Deterministic 'protected' variant: price generalized to hundreds,
    returnflag 'R' suppressed — a stand-in for the (randomized) protect
    chain so the drift metrics stay oracle-checkable."""
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_quantity",
        F.round(F.col("l_extendedprice"), -2).alias("l_extendedprice"),
        F.when(F.col("l_returnflag") == "R", F.lit("OTHER"))
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
    )


def _q_ks_drift(spark, sf):
    return DR.ks_statistic(_drift_before(spark, sf), _drift_after(spark, sf), "l_extendedprice")


def _q_ks_drift_binned(spark, sf):
    # the 100 TB KS path (fixed-width bins, no global value sort) is
    # deterministic too — verify the scale twin, not just the exact form
    return DR.ks_statistic_binned(
        _drift_before(spark, sf), _drift_after(spark, sf), "l_extendedprice", bins=10000
    )


def _q_chi2_drift(spark, sf):
    orders = load_table(spark, sf, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    odd = orders.where(F.col("o_orderkey") % 2 == 1)
    return DR.chi2_categorical(even, odd, "o_orderpriority")


def _q_distribution_drift(spark, sf):
    return DR.distribution_drift(_drift_before(spark, sf), _drift_after(spark, sf))


QUASI_IDS = ["c_nationkey", "c_acctbal", "c_mktsegment"]


def _real_anon_split(spark, sf):
    """customer split into a real/anon proxy pair (FIXTURES.md §2):
    odd custkeys play 'real', even play 'anon'."""
    cust = load_table(spark, sf, "customer")
    real = cust.where(F.col("c_custkey") % 2 == 1)
    anon = cust.where(F.col("c_custkey") % 2 == 0)
    return real, anon


def _q_standard_scale(spark, sf):
    cust = load_table(spark, sf, "customer")
    return RK.standard_scale(cust, cust, ["c_acctbal"], keep=["c_custkey"])


def _q_one_hot(spark, sf):
    cust = load_table(spark, sf, "customer")
    return RK.one_hot(cust, cust, "c_mktsegment", keep=["c_custkey"])


def _q_knn_linkage_join(spark, sf):
    real, anon = _real_anon_split(spark, sf)
    return RK.knn_linkage_join(anon, real, QUASI_IDS, "c_custkey", "c_custkey")


def _q_linkage_risk_score(spark, sf):
    # fused E6 (VERDICT r10 #1): same scalar as
    # linkage_risk_score(knn_linkage_join(...)) — the oracle still
    # replays the full composition — but the pair stream carries only
    # (anon_id, d²) and sqrt is deferred past the min (bit-exact:
    # IEEE sqrt is monotone and correctly rounded)
    real, anon = _real_anon_split(spark, sf)
    return RK.linkage_risk_direct(anon, real, QUASI_IDS, "c_custkey")


# --- extension surface: text / dedup / similarity / multimodal / events ---


def _q_text_profile(spark, sf):
    # token_count ∪ lang_id ∪ doc_fingerprint, fused into one scan
    return TX.text_profile(load_table(spark, sf, "documents"))


def _q_quality_score(spark, sf):
    return TX.quality_score(load_table(spark, sf, "documents"))


def _q_repetition_stats(spark, sf):
    return TX.repetition_stats(load_table(spark, sf, "documents"))


def _q_corpus_stats(spark, sf):
    return TX.corpus_stats(load_table(spark, sf, "documents"), group_col="source")


def _q_paragraph_dedup(spark, sf):
    # fixtures carry no newlines, so dedup at word granularity — the
    # mechanics (global first-occurrence window + ordered reassembly)
    # are separator-independent
    return DD.paragraph_dedup(load_table(spark, sf, "documents"), sep=" ")


def _q_pack_sequences(spark, sf):
    from safedata_pipeline_spark.operators import pack as PK

    return PK.pack_sequences(load_table(spark, sf, "documents"), budget=256, buckets=8)


def _q_tfidf_top_terms(spark, sf):
    return TX.tfidf_top_terms(load_table(spark, sf, "documents"), top_k=5)


def _q_quality_filter(spark, sf):
    return TX.quality_filter(load_table(spark, sf, "documents"), keep_fraction=0.5)


def _q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: the canonical scan→filter→groupBy→agg headline.
    Exercises pushdown (date filter), column pruning, map-side partial
    aggregation, and decimal-stable sums in one plan."""
    li = load_table(spark, sf, "lineitem")
    d = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = lambda c: c.cast("decimal(38,10)")
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-03 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # round even the decimal-exact sums: the decimal→double
            # conversion itself differs by 1 ulp across engines at 1e9+
            F.round(F.sum(dec(F.col("l_quantity"))).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec(F.col("l_extendedprice"))).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(dec(d)).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(dec(d * (1 + F.col("l_tax")))).cast("double"), 2).alias("sum_charge"),
            # decimal-sum/count, not avg(double): double summation order
            # differs across engines and is not run-to-run stable
            F.round(F.sum(dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(dec(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(dec(F.col("l_discount"))).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


CONTAMINATION_PROBES = ["key agg row scan", "spark order data", "zz-not-in-corpus-zz"]


def _q_shipping_priority(spark, sf):
    """TPC-H Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem) with
    filters on every side, grouped revenue, top-10 — the canonical
    multi-join planning test. The dimension filters reach their scans
    via pushdown; AQE picks broadcast for the filtered customer side;
    the top-10 is TakeOrdered, never a full sort."""
    cust = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    cut = F.lit("1998-06-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf, "orders").where(F.col("o_orderdate") < cut)
    li = load_table(spark, sf, "lineitem").where(F.col("l_shipdate") > cut)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev.cast("decimal(38,10)")).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def _q_returned_revenue(spark, sf):
    """TPC-H Q10 shape: who returned the most revenue in a quarter —
    customer ⋈ filtered orders ⋈ returned lineitems, grouped per
    customer, top-20. The order-date filter prunes at the orders scan,
    returnflag at the lineitem scan; the customer side broadcasts;
    top-20 is TakeOrdered. Revenue sums ride DECIMAL for parity."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf, "customer")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        # round the exact DECIMAL sum, THEN cast: rounding after the
        # double cast flips half-cent boundaries between engines
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def _q_large_orders(spark, sf):
    """TPC-H Q18 shape: orders whose total quantity exceeds the
    threshold — a grouped HAVING on the fact table feeding a semi-ish
    join back to orders and customer. The heavy aggregate runs FIRST
    (map-side combinable), so the joins see only qualifying orderkeys;
    both dimension sides broadcast under AQE."""
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("__q"))
        .where(F.col("__q") > 300)
        .select("l_orderkey", F.round(F.col("__q").cast("double"), 2).alias("total_qty"))
    )
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


def _q_customer_order_histogram(spark, sf):
    """TPC-H Q13 shape: the order-count distribution INCLUDING the
    zero bucket — a left join from customer (so order-less customers
    survive with count 0) feeding two stacked aggregations. Count
    rides count(o_orderkey) (nulls don't count); both groupBys are
    map-side combinable and the second one is O(distinct counts)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


def _q_top_supplier(spark, sf):
    """TPC-H Q15 shape: top-revenue supplier — grouped quarterly
    revenue (DECIMAL sums) + the global max via a broadcast 1-row
    aggregate join (the view + scalar-subquery form, no window over
    the whole table). Ties all surface, like the spec requires."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("__rev")
        )
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    sup = load_table(spark, sf, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("__rev") == F.col("__mx"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__rev").cast("double"), 2).alias("total_revenue"),
        )
    )


def _q_small_qty_revenue(spark, sf):
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated per-part scalar (0.2·avg quantity) becomes a grouped
    aggregate broadcast-joined back to the brand-filtered fact scan;
    the avg rides a DECIMAL sum / count so the 0.2·avg threshold is
    the identical double on both engines."""
    part = load_table(spark, sf, "part").where(F.col("p_brand") == "Brand#13")
    li = load_table(spark, sf, "lineitem")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    avg_q = j.groupBy("p_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg")
    )
    return (
        j.join(F.broadcast(avg_q), "p_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("__avg"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


def _q_priority_lines(spark, sf):
    """TPC-H Q12 shape (adapted: the slim fixture has no l_shipmode,
    so returnflag plays the two-class group): per returnflag within
    one shipdate year, how many lines belong to HIGH-priority orders
    vs not — the conditional two-count aggregate over the fact⋈orders
    join, both counts in ONE pass."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf, "orders")
    hi = F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("bigint")).cast("bigint").alias("high_line_count"),
            F.sum((~hi).cast("bigint")).cast("bigint").alias("low_line_count"),
        )
    )


def _q_rolling_user_stats(spark, sf):
    from safedata_pipeline_spark.operators import timeseries as TS

    return TS.rolling_user_stats(load_table(spark, sf, "events"), n=3)


def _q_rolling_anomalies(spark, sf):
    from safedata_pipeline_spark.operators import timeseries as TS

    return TS.rolling_anomalies(
        load_table(spark, sf, "events"), n=5, factor=3.0, min_baseline_n=3
    )


def _q_hourly_retention(spark, sf):
    from safedata_pipeline_spark.operators import timeseries as TS

    return TS.hourly_retention(load_table(spark, sf, "events"))


def _q_drift_timeline_psi(spark, sf):
    # the PSI finish over the SAME per-(hour, bin) aggregation the
    # streaming monitor maintains; reference fit on the whole table
    from safedata_pipeline_spark.streaming import drift as SD

    ev = load_table(spark, sf, "events")
    ref = SD.fit_reference(ev, "value", bins=100)
    counts = SD.hourly_bin_counts(ev, ref["lo"], ref["width"], ref["bins"])
    return SD.finish_timeline_psi(counts, ref)


def _q_session_funnel(spark, sf):
    return SS.session_funnel(
        load_table(spark, sf, "events"), ("view", "click", "purchase"), gap_minutes=30
    )


def _q_weighted_sample(spark, sf):
    docs = load_table(spark, sf, "documents").withColumn(
        "w", F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    )
    return SMP.weighted_sample(docs, "w").drop("w")


def _q_quantile_rank(spark, sf):
    ev = (
        load_table(spark, sf, "events")
        .select("event_id", "value")
        .where(F.col("value").isNotNull())
    )
    return P.quantile_rank(ev, "value")


def _q_group_quantiles(spark, sf):
    return P.group_quantiles(load_table(spark, sf, "documents"), "source", "n_chars")


def _q_source_share(spark, sf):
    return SMP.source_share(load_table(spark, sf, "documents"))


def _q_minhash_threshold_curve(spark, sf):
    return DD.minhash_threshold_curve(
        load_table(spark, sf, "documents"), num_hashes=16, bands=4, n=3, buckets=10
    )


def _q_cluster_size_histogram(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return DD.cluster_size_histogram(docs, pairs)


def _q_enforce_k_anonymity(spark, sf):
    return AN.enforce_k_anonymity(
        load_table(spark, sf, "customer"), QI_COLS, k=10
    )


def _q_t_closeness(spark, sf):
    return AN.t_closeness(
        load_table(spark, sf, "customer"), ["c_nationkey"], "c_mktsegment", t=0.2
    )


def _q_mutual_information(spark, sf):
    return P.mutual_information(load_table(spark, sf, "documents"), "source", "lang")


def _q_regional_volume(spark, sf):
    """TPC-H Q5 shape: 5-way star join (region→nation→{customer,
    supplier}→orders→lineitem) with the customer-and-supplier-same-
    nation condition — join-reorder + broadcast-dimension showcase.
    Revenue per nation for ASIA, one order year."""
    region = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        region.join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(cust, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(F.round(F.sum(rev.cast("decimal(38,10)")).cast("double"), 2).alias("revenue"))
    )


def _q_nation_trade(spark, sf):
    """TPC-H Q7 shape: bi-directional nation-pair trade volume — the
    lineitem fact joins BOTH dimension chains (supplier→nation and
    orders→customer→nation), pair-filtered to two nations, grouped by
    (supp_nation, cust_nation, ship year). Both nation sides and
    supplier/customer broadcast; the only big-big shuffle is
    lineitem⋈orders on the order key."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev.cast("decimal(38,10)")).cast("double"), 2).alias("revenue"))
    )


def _q_priority_late_orders(spark, sf):
    """TPC-H Q4 shape: order-priority census of orders with at least
    one late lineitem (ship > order date + 30 days) — EXISTS rendered
    as a left-semi join whose compound condition carries the order
    date into the probe side. One shuffle on the order key, then a
    tiny groupBy on priority."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))


def _q_sole_late_supplier(spark, sf):
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier in a
    multi-supplier finished order — EXISTS(other supplier) as a
    left-semi self-join and NOT EXISTS(other late supplier) as a
    left-anti self-join over the distinct (order, supplier) pair set.
    The pair sets are distinct-projected BEFORE the self-joins, so the
    quadratic surface is per-order supplier counts (bounded), never
    raw lineitems. Late := ship > order date + 60 days; orders
    restricted to status 'F'."""
    orders = load_table(spark, sf, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    late = pairs.where(F.col("late")).select("l_orderkey", "l_suppkey")
    others = pairs.select(F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk"))
    w1 = late.join(
        others,
        (F.col("l_orderkey") == F.col("o_ok")) & (F.col("l_suppkey") != F.col("o_sk")),
        "left_semi",
    )
    late2 = late.select(F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk"))
    w2 = w1.join(
        late2,
        (F.col("l_orderkey") == F.col("x_ok")) & (F.col("l_suppkey") != F.col("x_sk")),
        "left_anti",
    )
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        w2.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


def _q_market_share(spark, sf):
    """TPC-H Q8 shape: one nation's market share of PROMO-part revenue
    inside the ASIA region, by order year — the 8-way join-reorder
    stress (two nation chains + region + part on one fact scan), with
    the share as a conditional-sum / sum ratio in ONE aggregate."""
    region = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nat = load_table(spark, sf, "nation")
    cn = nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg"))
    sn = nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    part = load_table(spark, sf, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    target = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0).cast("decimal(38,10)"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cn_reg") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("total_revenue"),
            F.round(F.try_divide(F.sum(target).cast("double"), F.sum(rev).cast("double")), 6).alias(
                "mkt_share"
            ),
        )
    )


def _q_disjunctive_revenue(spark, sf):
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    blocks — the disjunctive-predicate pushdown test (the filter must
    ride the part⋈lineitem join, not a post-join scan)."""
    part = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
    )


def _q_roc_points(spark, sf):
    # bounded ROC curve (ml_utility.roc_points): grid thresholds,
    # descending cumulatives over ≤100 state rows
    ev = load_table(spark, sf, "events")
    return MU.roc_points(ev, "value", F.col("event_type") == "purchase", max_points=100)


def _q_event_transitions(spark, sf):
    # first-order Markov transitions over per-user event sequences
    # (timeseries.transition_matrix)
    from safedata_pipeline_spark.operators import timeseries as TS

    return TS.transition_matrix(load_table(spark, sf, "events"))


def _q_contamination_scan(spark, sf):
    return TX.contamination_scan(load_table(spark, sf, "documents"), CONTAMINATION_PROBES)


def _q_contamination_ngram(spark, sf):
    return TX.contamination_ngram(
        load_table(spark, sf, "documents"), CONTAMINATION_PROBES, n=3
    )


def _q_decontaminate(spark, sf):
    # the removal counterpart of contamination_scan: survivors after
    # dropping every doc that contains a probe verbatim (map-only)
    return TX.decontaminate(
        load_table(spark, sf, "documents"), CONTAMINATION_PROBES, method="substring"
    )


def _q_contamination_scan_many(spark, sf):
    # Aho–Corasick path: same semantics as contamination_scan, built
    # for probe sets too large to ship as plan literals
    return TX.contamination_scan_many(
        load_table(spark, sf, "documents"), CONTAMINATION_PROBES
    )


def _q_pii_scan(spark, sf):
    return PII.pii_scan(load_table(spark, sf, "documents"))


def _q_pii_redact(spark, sf):
    return PII.pii_redact(load_table(spark, sf, "documents"))


# -- X208: Luhn-validated card detection --------------------------------------

# the classic public test numbers: first passes the mod-10 check,
# second (same digits, last bumped) fails it
_CARD_VALID = "4111111111111111"
_CARD_INVALID = "4111111111111112"


def _card_luhn_fixture(spark, sf):
    # plant one deterministic candidate per residue class so BOTH
    # branches of the checksum fire at every sf: doc_id%7==3 gets a
    # Luhn-valid card, %7==5 a same-shape invalid one (the bare regex
    # counts both; only the checksum separates them)
    docs = load_table(spark, sf, "documents")
    plant = (
        F.when(F.col("doc_id") % 7 == 3, F.lit(f"pay {_CARD_VALID} now"))
        .when(F.col("doc_id") % 7 == 5, F.lit(f"ref {_CARD_INVALID} held"))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat_ws(" ", F.col("text"), plant).alias("text"))


def _q_card_luhn_scan(spark, sf):
    return PII.card_luhn_scan(_card_luhn_fixture(spark, sf))


def _sql_card_luhn_scan() -> str:
    """Mirror of pii.card_luhn_scan over the planted fixture: same
    16-digit candidate regex, same Luhn fold (right-position doubling,
    subtract 9 over 9, sum % 10 == 0) as a list_transform/list_sum."""
    luhn = (
        "list_sum(list_transform(generate_series(1, 16), "
        "i -> CASE WHEN (16 - i + 1) % 2 = 0 "
        "THEN CASE WHEN 2 * CAST(substring(c, CAST(i AS INT), 1) AS INT) > 9 "
        "THEN 2 * CAST(substring(c, CAST(i AS INT), 1) AS INT) - 9 "
        "ELSE 2 * CAST(substring(c, CAST(i AS INT), 1) AS INT) END "
        "ELSE CAST(substring(c, CAST(i AS INT), 1) AS INT) END)) % 10 = 0"
    )
    return (
        "WITH planted AS (SELECT doc_id, concat_ws(' ', text, "
        f"CASE WHEN doc_id % 7 = 3 THEN 'pay {_CARD_VALID} now' "
        f"WHEN doc_id % 7 = 5 THEN 'ref {_CARD_INVALID} held' "
        "ELSE '' END) AS text FROM documents), "
        "c AS (SELECT doc_id, regexp_extract_all(text, '\\b\\d{16}\\b') AS cands "
        "FROM planted) "
        "SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_card_candidates, "
        f"CAST(len(list_filter(cands, c -> {luhn})) AS BIGINT) AS n_card_luhn_valid "
        "FROM c"
    )


def _q_dedup_exact(spark, sf):
    return DD.dedup_exact(load_table(spark, sf, "documents"))


def _q_ngram_jaccard(spark, sf):
    return DD.ngram_jaccard_pairs(load_table(spark, sf, "documents"), n=3, threshold=0.5)


def _q_dup_graph_pagerank_weighted(spark, sf):
    # weighted variant: transition mass proportional to the pair's
    # jaccard — tight template hubs outrank loose-match stars
    pairs = DD.ngram_jaccard_pairs(load_table(spark, sf, "documents"), n=3, threshold=0.5)
    return GR.pagerank(pairs, damping=0.85, iterations=5, weight_col="jaccard")


def _q_containment_join(spark, sf):
    # asymmetric shingle-containment dedup (quote/subset detection) —
    # prefix-filtered probe side, full index side (dedup.py)
    return DD.containment_prefix_join(load_table(spark, sf, "documents"), n=3, threshold=0.8)


def _q_dup_graph_pagerank(spark, sf):
    # template-hub centrality over the near-dup similarity graph:
    # fixed-5-iteration PageRank, deterministic via per-iteration
    # 12-dp rounding (operators/graph.py)
    pairs = DD.ngram_jaccard_pairs(load_table(spark, sf, "documents"), n=3, threshold=0.5)
    return GR.pagerank(pairs, damping=0.85, iterations=5)


def _q_jaccard_prefix_join(spark, sf):
    # exact threshold self-join via PPJoin-style prefix filtering —
    # no posting-list caps, no false negatives (dedup.py jaccard_prefix_join)
    return DD.jaccard_prefix_join(load_table(spark, sf, "documents"), n=3, threshold=0.7)


def _q_dedup_components(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return DD.dedup_components(docs, pairs)


def _q_leakage_free_split(spark, sf):
    # split assigned per near-dup CLUSTER (X134): an md5 coin on the
    # component id — split_leakage over this assignment is empty by
    # construction for the same pair generator
    docs = load_table(spark, sf, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return DD.leakage_free_split(docs, pairs, train_fraction=0.8)


def _q_dedup_components_star(spark, sf):
    """Large-star/small-star variant — deterministic, so it shares
    dedup_components' oracle (same (doc_id, comp_id, is_canonical)
    contract; only the convergence schedule differs)."""
    docs = load_table(spark, sf, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return DD.dedup_components_star(docs, pairs)


def _q_minhash_signatures(spark, sf):
    return DD.minhash_signatures(load_table(spark, sf, "documents"), num_hashes=16, n=3)


def _q_minhash_lsh(spark, sf):
    return DD.minhash_lsh_pairs(
        load_table(spark, sf, "documents"), num_hashes=16, bands=4, n=3, threshold=0.5
    )


def _q_simhash(spark, sf):
    return DD.simhash_signatures(load_table(spark, sf, "documents"), bits=32)


def _q_embedding_cosine_dedup(spark, sf):
    return DD.embedding_cosine_pairs(load_table(spark, sf, "embeddings"), threshold=0.4)


def _q_simhash_pairs(spark, sf):
    return DD.simhash_pairs(
        load_table(spark, sf, "documents"), bits=32, bands=4, max_hamming=3
    )


def _q_embedding_centroids(spark, sf):
    # long form: flat-typed columns survive the driver's value compare
    return SIM.embedding_centroids(load_table(spark, sf, "embeddings"), packed=False)


def _q_embedding_gram(spark, sf):
    return SIM.embedding_gram(load_table(spark, sf, "embeddings"))


def _q_pca_project(spark, sf):
    # rows-only: eigendecomposition has no SQL twin; pinned by the
    # numpy sequential-twin + invariance tests in test_similarity.py
    emb = load_table(spark, sf, "embeddings")
    model = SIM.pca_fit(emb, n_components=8)
    return SIM.pca_project(emb, model)


def _q_ann_cosine_topk_pca(spark, sf):
    # rows-only (rides the rows-only eigendecomposition): the standard
    # reduce-then-search stack — stage 1 scans the corpus in PCA-16
    # space (4x fewer multiplies + 4x smaller resident index at d=64;
    # the dial a 100 TB dense index turns before any bucketing) for a
    # top-50 candidate recall set, stage 2 re-ranks ONLY the
    # candidates by exact full-dim cosine (rerank_by_cosine, X215) —
    # so the full-precision scorer touches 10% of the corpus here and
    # O(queries·N_stage1/n) of it in general. recall@5/MRR vs the
    # full-dim exact top-k are stat-gated per round
    # (tools/stat_gates.py).
    emb = load_table(spark, sf, "embeddings")
    model = SIM.pca_fit(emb, n_components=16)
    proj = SIM.pca_project(emb, model, packed=True)
    cand = SIM.cosine_topk(
        proj.where(F.col("vec_id") < 10), proj, k=50, vec_col="pca"
    ).select("query_id", F.col("neighbor_id").alias("item_id"))
    return SIM.rerank_by_cosine(cand, emb, k=5).select(
        "query_id", "rank", F.col("item_id").alias("neighbor_id"), "cosine"
    )


def _q_ann_cosine_topk(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return SIM.cosine_topk(emb.where(F.col("vec_id") < 10), emb, k=5)


def _q_ann_cosine_topk_lsh(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return SIM.cosine_topk_lsh(emb.where(F.col("vec_id") < 10), emb, k=5, dim=64)


def _q_ann_cosine_topk_ivf(spark, sf):
    # (64 cells, 20 probes, 2-cell multiple assignment) holds the
    # >=0.8 recall@5 AND the >=0.95 MRR stat gates on the
    # near-orthogonal fixture (measured 0.92 / 1.00 at r10 — the probe
    # bump from 16 closed VERDICT r9 #7's MRR lag: with exact-cosine
    # candidate ranking, MRR == recall@1, so the fix is candidate
    # coverage, not re-ranking) — see cosine_topk_ivf's dial rationale
    emb = load_table(spark, sf, "embeddings")
    return SIM.cosine_topk_ivf(
        emb.where(F.col("vec_id") < 10), emb, k=5, num_cells=64, n_probe=20, index_assign=2
    )


def _q_asof_last_click(spark, sf):
    ev = load_table(spark, sf, "events")
    errors = ev.where(F.col("event_type") == "error")
    clicks = ev.where(F.col("event_type") == "click")
    return JN.asof_join(
        errors, clicks, key="user_id", right_cols=["event_id", "ts", "value"], prefix="click_"
    ).select("event_id", "user_id", "ts", "click_event_id", "click_ts", "click_value")


TIERS = [("micro", 0.0, 2.0), ("small", 2.0, 10.0), ("medium", 10.0, 50.0), ("large", 50.0, 500.0)]


def _q_range_join_tiers(spark, sf):
    ev = load_table(spark, sf, "events")
    tiers = spark.createDataFrame(TIERS, "tier string, lo double, hi double")
    return JN.range_join_bucketed(ev, tiers, "value", bucket_width=10.0).select(
        "event_id", "value", "tier"
    )


def _q_hypertable_rollup(spark, sf):
    return RU.hypertable_rollup(load_table(spark, sf, "events"))


KMV_COLS = ["c_mktsegment", "c_nationkey", "c_custkey"]


def _q_kmv_distinct(spark, sf):
    return SK.kmv_distinct(load_table(spark, sf, "customer"), KMV_COLS, k=64)


def _q_length_histogram(spark, sf):
    return TX.length_histogram(load_table(spark, sf, "documents"))


def _q_unigram_logprob(spark, sf):
    return TX.unigram_logprob(load_table(spark, sf, "documents"))


def _q_kmv_distinct_prefilter(spark, sf):
    # the 100 TB path: hash < t drops rows BEFORE the distinct shuffle;
    # md5-deterministic, so the filtered sketch is hash-checkable too
    return SK.kmv_distinct(
        load_table(spark, sf, "customer"), KMV_COLS, k=64, prefilter=0.25
    )


def _q_multimodal_meta(spark, sf):
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.to_media_table(docs, "doc_id", "payload", "text/plain")
    return MM.media_meta(media)


def _q_audio_frame_features(spark, sf):
    # audio-modality plumbing with a REAL decode (raw 16-bit LE PCM
    # needs no codec): per-frame RMS / zero-crossing / peak. Arrow
    # batch shape + framing are the point; payload bytes are the
    # fixture text reinterpreted as PCM (deterministic).
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.to_media_table(docs, "doc_id", "payload", "audio/pcm")
    return MM.extract_audio_features(media, frame_samples=256)


def _q_multimodal_features(spark, sf):
    # X18, oracle-backed since r9: REAL codec end to end — fixture
    # bytes encode to spec-conformant PNGs, the stdlib decoder
    # round-trips them, and the decoded-content features (pixel
    # sha256 fingerprint + integer-exact stats) hash-match an oracle
    # computed from the ORIGINAL bytes. The former fake-codec default
    # is retired to a unit-test hook (decode='fake').
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.encode_png_media(docs, "doc_id", "payload", width=64)
    return MM.extract_image_features(media, decode="real")


def _q_image_pixel_stats(spark, sf):
    # X183: image modality with a REAL codec round-trip, oracle-backed
    # (the audio X158 discipline applied to images): fixture text bytes
    # become genuine spec-conformant PNGs (IHDR/IDAT/IEND, CRCs, zlib),
    # the stdlib decoder inflates + unfilters them back, and the
    # integer-exact pixel sums hash-match a SQL oracle computed from
    # the ORIGINAL bytes — decode∘encode must be the identity.
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.encode_png_media(docs, "doc_id", "payload", width=64)
    return MM.image_pixel_stats(media)


def _q_jpeg_pixel_stats(spark, sf):
    # X228: the JPEG oracle anchor (VERDICT r12 #1 closed — the path
    # EXECUTES now, Pillow or vendored T.81 baseline codec alike):
    # fixture text bytes become genuine flat quality-100 grayscale
    # JPEGs (encode_jpeg_media: value = first byte, dims 16 x
    # 8*(1 + len mod 3)); image_pixel_stats REALLY decodes them
    # (Huffman + dequant + IDCT); the SQL oracle predicts the stats
    # from the SOURCE bytes alone — the hash match proves
    # decode∘encode is the identity on the flat-block content class.
    from safedata_pipeline_spark.partitioning import spread_small

    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    # spread before the per-row Python codec chain: the fixture scan
    # is ONE split, and encode+decode is exactly the per-record work
    # that must parallelize (exact-integer outputs — spread-safe)
    media = MM.encode_jpeg_media(spread_small(docs), "doc_id", "payload", width=16)
    return MM.image_pixel_stats(media)


def _q_events_hourly(spark, sf):
    return SE.hourly_event_profile(load_table(spark, sf, "events"))


QI_COLS = ["c_nationkey", "c_mktsegment"]
DOC_LANGS = ["de", "en", "es", "fr", "zh"]
CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q_psi_drift(spark, sf):
    return DR.psi_drift(
        _drift_before(spark, sf), _drift_after(spark, sf), "l_extendedprice", bins=10
    )


def _q_correlation_matrix(spark, sf):
    return P.correlation_matrix(load_table(spark, sf, "lineitem"), CORR_COLS)


def _q_corpus_cube(spark, sf):
    return TX.corpus_stats_cube(load_table(spark, sf, "documents"))


def _q_events_sliding(spark, sf):
    return SE.sliding_event_profile(load_table(spark, sf, "events"))


def _q_winsorize(spark, sf):
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    out = PR.winsorize(li, ["l_extendedprice", "l_quantity"], 0.01, 0.99)
    # round the clipped columns: the interpolated percentile bound may
    # differ from the oracle's in the last ulp; 6 decimals is exact for
    # the underlying 2-decimal prices
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 6).alias("l_extendedprice"),
        F.round("l_quantity", 6).alias("l_quantity"),
    )


def _q_robust_stats(spark, sf):
    return P.robust_stats(load_table(spark, sf, "lineitem"), CORR_COLS)


def _q_quantize_embeddings(spark, sf):
    return SIM.quantize_embeddings(load_table(spark, sf, "embeddings"))


def _q_quantization_error(spark, sf):
    return SIM.quantization_error(load_table(spark, sf, "embeddings"))


def _q_skew_report(spark, sf):
    return P.skew_report(load_table(spark, sf, "orders"), "o_custkey")


def _q_normalize_text(spark, sf):
    return TX.normalize_text(load_table(spark, sf, "documents")).select(
        "doc_id", "text"
    )


ENTROPY_COLS = ["c_mktsegment", "c_nationkey", "c_name"]


def _q_column_entropy(spark, sf):
    return P.column_entropy(load_table(spark, sf, "customer"), ENTROPY_COLS)


def _q_dedup_best(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    quality = TX.quality_score(docs).select("doc_id", "quality")
    return DD.dedup_components_best(docs, pairs, quality)


def _q_table_diff(spark, sf):
    # regression diff: how many rows did the protect chain change?
    return P.table_diff(_drift_before(spark, sf), _drift_after(spark, sf))


def _q_bigram_logprob(spark, sf):
    return TX.bigram_logprob(load_table(spark, sf, "documents"))


def _q_jsd_drift(spark, sf):
    return DR.jsd_drift(
        _drift_before(spark, sf), _drift_after(spark, sf), "l_extendedprice", bins=10
    )


def _q_drift_timeline(spark, sf):
    return DR.drift_timeline(load_table(spark, sf, "events"), "ts", "value", bins=100)


def _q_events_hourly_users(spark, sf):
    ev = load_table(spark, sf, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_start")
    ).agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))


def _q_k_anonymity_violations(spark, sf):
    return AN.k_anonymity_violations(load_table(spark, sf, "customer"), QI_COLS, k=10)


def _q_pack_stats(spark, sf):
    from safedata_pipeline_spark.operators.pack import pack_stats

    return pack_stats(load_table(spark, sf, "documents"), budget=256, buckets=8)


def _q_pack_windows(spark, sf):
    from safedata_pipeline_spark.operators.pack import pack_windows

    return pack_windows(load_table(spark, sf, "documents"), budget=256, buckets=8)


def _q_k_anonymity(spark, sf):
    return AN.k_anonymity(load_table(spark, sf, "customer"), QI_COLS, k=5)


def _q_l_diversity(spark, sf):
    return AN.l_diversity(load_table(spark, sf, "customer"), QI_COLS, "c_acctbal", l=3)


def _q_top_ngrams(spark, sf):
    return TX.top_ngrams(load_table(spark, sf, "documents"), n=2, top_k=100)


def _q_ngram_diversity(spark, sf):
    return TX.ngram_diversity(load_table(spark, sf, "documents"), max_n=3)


def _q_kn_logprob(spark, sf):
    return TX.kneser_ney_logprob(load_table(spark, sf, "documents"))


def _q_snm_pairs(spark, sf):
    # sorted-neighborhood blocking on the sequential-ID name domain —
    # the adversarial case for gram blocking is the NATURAL case for
    # positional blocking; the oracle replays rank + window + verify,
    # so the hash match certifies window-pair completeness
    cust = load_table(spark, sf, "customer")
    return FZ.sorted_neighborhood_pairs(
        cust, "c_name", "c_custkey", window=8, max_dist=1
    )


def _q_embedding_drift(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return SIM.embedding_gram_drift(
        emb.where(F.col("vec_id") % 2 == 0), emb.where(F.col("vec_id") % 2 == 1)
    )


def _q_bootstrap_ci(spark, sf):
    return SMP.bootstrap_mean_ci(
        load_table(spark, sf, "documents"), "n_chars", replicates=64
    )


def _q_source_lang_pivot(spark, sf):
    # pivot values pinned so the schema (and the 100 TB plan) is static
    return TX.source_lang_pivot(load_table(spark, sf, "documents"), pivot_values=DOC_LANGS)


def _q_dedup_incremental(spark, sf):
    docs = load_table(spark, sf, "documents")
    ref = docs.where(F.col("doc_id") < 100)
    new = docs.where(F.col("doc_id") >= 100)
    return DD.dedup_incremental(new, ref).select("doc_id", "source", "text")


def _q_substring_dedup(spark, sf):
    # Lee-et-al-style exact repeated-substring removal (X131): every
    # non-first occurrence of a duplicated 8-word window is stripped
    return DD.substring_dedup(load_table(spark, sf, "documents"), k=8)


def _q_substring_dedup_chars(spark, sf):
    # X200: the CHAR-granular ExactSubstr sibling (repeats >= 40 chars,
    # word alignment not required; word-snap removal — the safe default)
    return DD.substring_dedup_chars(load_table(spark, sf, "documents"), k=40)


def _q_dedup_incremental_near(spark, sf):
    # incremental NEAR-dup ingestion (X135): new docs whose banded
    # MinHash estimate vs the accepted corpus >= 0.5 are dropped
    docs = load_table(spark, sf, "documents")
    ref = docs.where(F.col("doc_id") < 100)
    new = docs.where(F.col("doc_id") >= 100)
    return DD.dedup_incremental_near(new, ref, threshold=0.5).select(
        "doc_id", "source", "text"
    )


def _q_cross_source_dup_matrix(spark, sf):
    # which feed copies from which (X136): near-dup pairs aggregated
    # into a source×source syndication matrix
    docs = load_table(spark, sf, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return DD.cross_source_dup_matrix(docs, pairs)


def _q_take_per_source(spark, sf):
    return SMP.take_per_source(load_table(spark, sf, "documents"), 5).select(
        "doc_id", "source"
    )


def _q_scored_documents(spark, sf):
    # the streaming doc scorer's batch twin: one map-only projection,
    # identical plan on a stream — this row hash-anchors both
    return SC.scored_documents(load_table(spark, sf, "documents"))


def _q_events_json(spark, sf):
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def _q_user_sessions(spark, sf):
    # built-in session_window path since r9 (JVM-side merge in one hash
    # aggregate; row-for-row equal to the lag+cumsum twin, which remains
    # the kernel for custom state) — same oracle SQL
    return SS.user_sessions_native(load_table(spark, sf, "events"), gap_minutes=30)


def _q_impute(spark, sf):
    base = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 50 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("v"),
    )
    return PR.impute_mean(base, ["v"]).withColumnRenamed("v", "acctbal_imputed")


MIXTURE_SHARES = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.05, "src4": 0.05}


def _q_source_mixture_sample(spark, sf):
    return SMP.source_mixture_sample(
        load_table(spark, sf, "documents").select("doc_id", "source"), MIXTURE_SHARES
    )


def _q_quality_deciles(spark, sf):
    return SMP.quality_deciles(load_table(spark, sf, "documents"))


def _q_model_utility(spark, sf):
    cust = load_table(spark, sf, "customer").select(
        "c_nationkey", "c_acctbal", (F.col("c_custkey") % 2).cast("int").alias("target")
    )
    protected = PR.add_dp_noise(cust, ["c_nationkey", "c_acctbal"], epsilon=1.0, seed=42)
    return MU.model_utility_check(cust, protected, "target")


SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

QUALITY_RULES = [
    {"name": "complete_acctbal", "kind": "completeness", "col": "c_acctbal", "min_ratio": 0.99},
    {"name": "unique_custkey", "kind": "uniqueness", "col": "c_custkey", "min_ratio": 1.0},
    {"name": "acctbal_min", "kind": "min", "col": "c_acctbal", "low": -1000.0},
    {"name": "acctbal_mean", "kind": "mean", "col": "c_acctbal", "low": 0.0, "high": 10000.0},
    {"name": "name_pattern", "kind": "pattern", "col": "c_name", "regex": "^Customer#[0-9]+$", "min_ratio": 1.0},
    {"name": "segment_domain", "kind": "in_set", "col": "c_mktsegment", "allowed": SEGMENTS, "min_ratio": 1.0},
    {"name": "table_rows", "kind": "row_count", "low": 1.0},
]


def _q_quality_rules(spark, sf):
    # Deequ-style suite: 7 rules, ONE aggregate pass (X104)
    return QR.check_rules(load_table(spark, sf, "customer"), QUALITY_RULES)


def _q_latest_events(spark, sf):
    # CDC latest-wins compaction per (user, event_type) (X105)
    return CDC.latest_by_key(
        load_table(spark, sf, "events"), ["user_id", "event_type"], "ts", "event_id"
    )


def _q_split_leakage(spark, sf):
    # near-dup edges crossing a deterministic 80/20 split (X106)
    docs = load_table(spark, sf, "documents")
    asg = docs.select(
        "doc_id",
        F.when(_hash01(F.col("doc_id")) <= 0.8, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    pairs = DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3, threshold=0.5)
    return DD.split_leakage_summary(asg, pairs)


def _q_dedup_rate_by_source(spark, sf):
    # per-source exact-dup fraction, the corpus-health KPI (X130)
    return DD.dedup_rate_by_source(load_table(spark, sf, "documents"))


def _q_cohort_retention(spark, sf):
    # first-day cohorts × day-offset retention triangle (X128)
    from safedata_pipeline_spark.operators.timeseries import cohort_retention

    return cohort_retention(load_table(spark, sf, "events"))


def _q_session_concurrency(spark, sf):
    # sweep-line concurrent-sessions timeline (X127)
    return SS.session_concurrency(load_table(spark, sf, "events"), gap_minutes=30)


def _q_vocab_top(spark, sf):
    # corpus vocabulary fit artifact, TakeOrdered top-k (X125)
    return TX.build_vocab(load_table(spark, sf, "documents"), top_k=500)


def _q_oov_rate(spark, sf):
    # encoder-coverage audit vs a deliberately small vocab (X126)
    docs = load_table(spark, sf, "documents")
    return TX.oov_rate(docs, TX.build_vocab(docs, top_k=50))


def _q_encode_tokens(spark, sf):
    # greedy maximal-munch encode against a fitted vocab (X132); the
    # deliberately tiny vocab forces real segmentation + char fallback
    docs = load_table(spark, sf, "documents")
    return TX.encode_tokens(docs, TX.build_vocab(docs, top_k=10))


def _q_auc_daily(spark, sf):
    # daily AUC trend (ml_utility.auc_by_group): per-day windows over
    # the distinct-score table, no global sort
    ev = load_table(spark, sf, "events")
    return MU.auc_by_group(
        ev, F.date_trunc("day", F.col("ts")), "value", F.col("event_type") == "purchase"
    ).withColumnRenamed("grp", "day_start")


def _q_benford_prices(spark, sf):
    # Benford first-digit screen on extended price (quality_rules.py)
    return QR.benford_screen(load_table(spark, sf, "lineitem"), "l_extendedprice")


def _q_cusum_hourly(spark, sf):
    # sequential CUSUM drift detector over the hourly mean grid —
    # aggregate-first, ONE bounded expression fold (timeseries.py)
    from safedata_pipeline_spark.operators import timeseries as TS

    return TS.cusum_hourly(load_table(spark, sf, "events"), "ts", "value", k=0.5)


def _q_kmeans_embeddings(spark, sf):
    # deterministic distributed KMeans (operators/clustering.py):
    # md5-seeded init, stable argmin, per-iteration 9dp DECIMAL means.
    # Iterative → rows-only; exact-equality property test vs a
    # sequential numpy twin in tests/test_clustering.py.
    return CL.kmeans_fit(load_table(spark, sf, "embeddings"), k=8, iterations=5)


def _q_readability(spark, sf):
    # Flesch reading-ease screen (text.readability_scores): map-only
    # regex counts, no shuffle
    return TX.readability_scores(load_table(spark, sf, "documents"))


def _q_calibration_bins(spark, sf):
    # reliability-diagram table (ml_utility.calibration_bins)
    ev = load_table(spark, sf, "events")
    return MU.calibration_bins(ev, "value", F.col("event_type") == "purchase", bins=10)


def _q_value_auc(spark, sf):
    # exact Mann–Whitney AUC with tie correction, aggregate-first
    # (ml_utility.binary_auc): does event value separate purchases?
    ev = load_table(spark, sf, "events")
    return MU.binary_auc(ev, "value", F.col("event_type") == "purchase")


def _q_edit_distance_pairs(spark, sf):
    # Ed-Join prefix-filtered Levenshtein-threshold self-join
    # (operators/fuzzy.py). The mod-7 key sample keeps the brute-force
    # DuckDB oracle tractable; the Spark side runs the full blocked
    # algorithm either way.
    cust = load_table(spark, sf, "customer").where(F.col("c_custkey") % 7 == 0)
    return FZ.edit_distance_pairs(cust, "c_name", max_dist=1, q=2)


CM_PROBE_WORDS = ["join", "hash", "row", "batch", "scan", "no_such_word_xyz"]
CM_DEPTH, CM_WIDTH = 4, 1024


def _q_count_min_words(spark, sf):
    # md5-seeded Count-Min over the word stream; probe a fixed
    # watchlist (incl. an absent word → estimate 0). Sketch state is
    # engine-reproducible, so even the approximate counts hash-match.
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        F.explode(
            F.when(F.trim("text") == "", F.array().cast("array<string>")).otherwise(
                F.split(F.trim("text"), "\\s+")
            )
        ).alias("w")
    )
    state = SK.count_min_state(toks, "w", depth=CM_DEPTH, width=CM_WIDTH)
    probes = spark.createDataFrame([(w,) for w in CM_PROBE_WORDS], "value string")
    return SK.count_min_query(state, probes, depth=CM_DEPTH, width=CM_WIDTH)


def _q_cdc_chunks(spark, sf):
    # content-defined chunking (text.content_defined_chunks):
    # shift-robust boundaries from word hashes — the CDC trick at
    # word granularity, pure DataFrame ops
    return TX.content_defined_chunks(
        load_table(spark, sf, "documents"), target_words=32, min_words=8
    )


def _q_weighted_quantiles(spark, sf):
    # exact weighted quantiles: price distribution weighted by quantity
    # (profile.weighted_quantiles — aggregate-first, ranged cumulative)
    return P.weighted_quantiles(
        load_table(spark, sf, "lineitem"), "l_extendedprice", "l_quantity"
    )


def _q_heavy_hitter_words(spark, sf):
    # EXACT heavy hitters via the CM-prefilter two-pass (sketch.py):
    # the shuffle carries only candidate values, yet the result is
    # exactly GROUP BY ... HAVING count >= T
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        F.explode(
            F.when(F.trim("text") == "", F.array().cast("array<string>")).otherwise(
                F.split(F.trim("text"), "\\s+")
            )
        ).alias("w")
    )
    return SK.heavy_hitters(toks, "w", min_count=500, depth=CM_DEPTH, width=CM_WIDTH)


def _q_bpe_merges(spark, sf):
    # distributed BPE merge-rule training (operators/bpe.py) — T
    # argmax iterations on the distinct-word table; iterative
    # algorithm → rows-only for the harness, exact-equality property
    # test vs a sequential reference in tests/test_bpe.py
    return BP.bpe_fit(load_table(spark, sf, "documents"), num_merges=10)


def _q_token_count_vocab(spark, sf):
    # per-doc real-tokenizer-unit counts from the same encode (X133)
    docs = load_table(spark, sf, "documents")
    return TX.token_count_vocab(docs, TX.build_vocab(docs, top_k=10))


def _q_incremental_percentiles(spark, sf):
    # mergeable percentile state (X124): fixed-grid histograms of two
    # disjoint batches merged, percentile finish over ≤100 state rows
    li = load_table(spark, sf, "lineitem")
    lohi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    lo, hi = float(lohi[0]), float(lohi[1])
    width = (hi - lo) / 100.0 or 1.0
    a = INC.histogram_partials(
        li.where(F.col("l_orderkey") % 2 == 0), "l_extendedprice", lo, width, 100
    )
    b = INC.histogram_partials(
        li.where(F.col("l_orderkey") % 2 == 1), "l_extendedprice", lo, width, 100
    )
    return INC.percentiles_from_histogram(INC.merge_histograms(a, b), lo, width)


def _q_iqr_outliers(spark, sf):
    # Tukey-fence triage report feeding winsorize/drop decisions (X122)
    return P.iqr_outlier_report(load_table(spark, sf, "lineitem"), INC_COLS)


def _q_completeness_timeline(spark, sf):
    # per-hour per-column null-fraction monitor (X123)
    return P.completeness_timeline(
        load_table(spark, sf, "events"), ["value", "props"]
    )


def _q_user_growth(spark, sf):
    # DAU decomposition: new / retained / resurrected per day (X120)
    from safedata_pipeline_spark.operators.timeseries import growth_accounting

    return growth_accounting(load_table(spark, sf, "events"), period="day")


def _q_trending_hourly(spark, sf):
    # top-3 event types per hour, aggregate-first (X121)
    from safedata_pipeline_spark.operators.timeseries import trending_per_period

    return trending_per_period(load_table(spark, sf, "events"), top_k=3)


def _q_chunk_documents(spark, sf):
    # RAG-style overlapping char chunks, map-only explode (X116)
    return TX.chunk_documents(load_table(spark, sf, "documents"), size=200, overlap=50)


def _q_fold_assign(spark, sf):
    # deterministic md5 k-fold assignment (X117)
    return SMP.assign_folds(
        load_table(spark, sf, "documents").select("doc_id"), "doc_id", k=5
    )


def _q_user_value_trend(spark, sf):
    # per-user least-squares drift monitor via regr_slope (X113)
    from safedata_pipeline_spark.operators.timeseries import per_key_trend

    return per_key_trend(load_table(spark, sf, "events"), "user_id", "ts", "value")


def _q_hourly_value_bands(spark, sf):
    # p50/p95/p99 latency-style bands per event hour (X114)
    from safedata_pipeline_spark.operators.timeseries import hourly_percentiles

    return hourly_percentiles(load_table(spark, sf, "events"), "ts", "value")


def _q_orders_join_audit(spark, sf):
    # exact pre-join cardinality/fanout audit lineitem ⋈ orders (X115)
    return P.join_cardinality(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        "l_orderkey",
        "o_orderkey",
    )


INC_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _q_incremental_profile(spark, sf):
    # mergeable-profile contract (X111): two disjoint batches profiled
    # separately, merged as state, finalized — must equal from-scratch
    li = load_table(spark, sf, "lineitem")
    a = INC.profile_partials(li.where(F.col("l_orderkey") % 2 == 0), INC_COLS)
    b = INC.profile_partials(li.where(F.col("l_orderkey") % 2 == 1), INC_COLS)
    return INC.finalize_profile(INC.merge_partials(a, b))


DOC_RULES = [
    {"name": "complete_text", "kind": "completeness", "col": "text", "min_ratio": 0.99},
    {"name": "chars_mean", "kind": "mean", "col": "n_chars", "low": 10.0, "high": 5000.0},
    {"name": "lang_domain", "kind": "in_set", "col": "lang", "allowed": DOC_LANGS, "min_ratio": 0.9},
    {"name": "min_docs", "kind": "row_count", "low": 10.0},
]


def _q_rules_by_source(spark, sf):
    # per-source corpus gating: same compiled suite, ONE groupBy pass (X108)
    return QR.check_rules_by(load_table(spark, sf, "documents"), ["source"], DOC_RULES)


def _q_orphan_orders(spark, sf):
    # cross-table FK audit: orders.o_custkey ⊆ customer.c_custkey (X109)
    return QR.referential_integrity(
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
        {"o_custkey": "c_custkey"},
    )


def _q_hll_user_rollup(spark, sf):
    # mergeable HLL: hourly user sketches unioned to days (X107);
    # estimate is engine-specific -> rows-only in the harness
    ev = load_table(spark, sf, "events")
    hourly = SK.hll_rollup(ev, F.date_trunc("hour", F.col("ts")), "user_id")
    daily = SK.hll_rollup_merge(hourly, F.date_trunc("day", F.col("grp")))
    return daily.select(
        F.col("grp").cast("timestamp_ntz").alias("day_start"),
        F.col("ndv_estimate").alias("n_users_approx"),
    )


# -- X165: HTML → text extraction ------------------------------------------

# Deterministic synthetic-HTML wrap of the documents fixture: head junk
# (title/style/script), a 3-link nav row (link density 1.0 → dropped),
# a 2-word h1 (< min_words → dropped), the document text as the body
# paragraph (kept when ≥ 3 words), a link-farm share row (3 anchors / 5
# words = 0.6 > 0.5 → dropped) and a 2-word footer (dropped).
_HTML_WRAP_PRE = (
    '<html><head><title>Doc ',
    '</title><style>body { margin: 0; }</style><script>var n = ',
    '; if (n > 1) { n = n - 1; }</script></head><body>'
    '<nav><a href="/">home</a> <a href="/docs">docs</a> <a href="/about">about</a></nav>'
    '<h1>Document ',
    '</h1><p>',
    '</p><div class="share">share &amp; <a href="#">tweet</a> <a href="#">post</a>'
    ' <a href="#">mail</a></div><footer>&copy; example.com</footer></body></html>',
)


def _q_extract_text(spark, sf):
    docs = load_table(spark, sf, "documents")
    p = _HTML_WRAP_PRE
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit(p[0]), did, F.lit(p[1]), did, F.lit(p[2]), did, F.lit(p[3]),
        F.col("text"), F.lit(p[4]),
    )
    wrapped = docs.select("doc_id", html.alias("html"))
    return TX.extract_html_text(wrapped).select(
        "doc_id", "text", "n_lines_kept", "n_lines_total"
    )


def _sql_extract_text() -> str:
    p = _HTML_WRAP_PRE
    block_re = (
        "(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|blockquote"
        "|section|article|aside|header|footer|nav|form|pre|hr|br)(?:\\s[^>]*)?/?>"
    )
    # entity decode chain, &amp; last (same one-pass order as the operator)
    ent = "regexp_replace(line, '<[^>]*>', '', 'g')"
    for pat, rep in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&"),
    ]:
        ent = f"regexp_replace({ent}, '{pat}', '{rep}', 'g')"
    return f"""
WITH wrapped AS (
  SELECT doc_id,
    '{p[0]}' || CAST(doc_id AS VARCHAR) || '{p[1]}' || CAST(doc_id AS VARCHAR)
    || '{p[2]}' || CAST(doc_id AS VARCHAR) || '{p[3]}' || text || '{p[4]}' AS html
  FROM documents
),
cleaned AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<!--.*?-->', ' ', 'g'),
      '{block_re}', chr(10), 'g') AS c
  FROM wrapped
),
lns AS (
  SELECT t.doc_id, g.p AS pos, t.ln[g.p] AS line
  FROM (SELECT doc_id, string_split(c, chr(10)) AS ln FROM cleaned) t
       CROSS JOIN unnest(generate_series(1, len(t.ln))) AS g(p)
),
stripped AS (
  SELECT doc_id, pos,
    trim(regexp_replace({ent}, '\\s+', ' ', 'g')) AS t,
    len(regexp_extract_all(line, '(?i)<a[\\s>]')) AS n_a
  FROM lns
),
scored AS (
  SELECT doc_id, pos, t, n_a,
    CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS w
  FROM stripped
),
kept AS (
  SELECT doc_id, pos, t FROM scored
  WHERE w >= 3 AND CAST(n_a AS DOUBLE) <= 0.5 * w
),
agg AS (
  SELECT doc_id, string_agg(t, chr(10) ORDER BY pos) AS text,
         CAST(count(*) AS BIGINT) AS n_lines_kept
  FROM kept GROUP BY doc_id
),
tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_total FROM scored GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.text, '') AS text,
       CAST(coalesce(a.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
       t.n_lines_total
FROM documents d JOIN tot t USING (doc_id) LEFT JOIN agg a USING (doc_id)
"""


# -- X166: semantic (embedding-cluster) dedup --------------------------------


def _q_semantic_dedup(spark, sf):
    # SemDeDup composition: deterministic KMeans cells -> intra-cluster
    # cosine pairs. k/iterations small (fixture scale); threshold
    # matches the brute cosine baseline so cell confinement is the only
    # difference between this and embedding_cosine_dedup. cell_cap=64
    # exercises the skew guard: cells above 64 members split into
    # md5-salted sub-buckets (ceil(|cell|/64) of them), bounding the
    # per-cell pair blowup even when KMeans lands skewed cells.
    emb = load_table(spark, sf, "embeddings")
    return DD.semantic_pairs(emb, k=8, iterations=3, threshold=0.4, cell_cap=64)


def _sql_kmeans_parts(k: int, iterations: int) -> tuple[list, str]:
    """Shared unrolled-CTE prefix replaying clustering.kmeans_fit_centers
    exactly: md5-seeded init (c0), `iterations` rounds of
    (rounded-distance argmin assignment a{t} -> 9dp DECIMAL centroid
    means u{t}/n{t}/c{t}), and the final assignment `af(id, v, cid)`.
    The distance kernel -2·(v·c)+|c|² rounded to 6dp matches
    clustering._nearest_centroid_expr term for term. Returns
    (parts, dist) so compositions (semantic_dedup's intra-cell pair
    join, the exact-cells IVF probe) can extend the chain with the
    same kernel."""
    dist = "round(-2 * list_dot_product(d.v, c.c) + list_dot_product(c.c, c.c), 6)"
    parts = [
        "data AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v "
        "FROM embeddings WHERE embedding IS NOT NULL)",
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) - 1 "
        f"AS INTEGER) AS cid, v AS c FROM data ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {k})",
    ]
    assign = (
        "(SELECT id, v, cid FROM (SELECT d.id, d.v, c.cid, "
        f"row_number() OVER (PARTITION BY d.id ORDER BY {dist}, c.cid) AS rn "
        "FROM data d CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    for t in range(1, iterations + 1):
        parts.append(f"a{t} AS " + assign.format(prev=f"c{t - 1}"))
        parts.append(
            f"u{t} AS (SELECT cid, g.p - 1 AS dim, "
            "round(CAST(sum(CAST(round(t.v[g.p], 9) AS DECIMAL(38,9))) AS DOUBLE) "
            "/ count(*), 9) AS m "
            f"FROM a{t} t CROSS JOIN unnest(generate_series(1, len(t.v))) AS g(p) "
            "GROUP BY cid, g.p)"
        )
        parts.append(
            f"n{t} AS (SELECT cid, list(m ORDER BY dim) AS c FROM u{t} GROUP BY cid)"
        )
        parts.append(
            f"c{t} AS (SELECT p.cid, coalesce(nc.c, p.c) AS c "
            f"FROM c{t - 1} p LEFT JOIN n{t} nc USING (cid))"
        )
    parts.append("af AS " + assign.format(prev=f"c{iterations}"))
    return parts, dist


def _sql_semantic_pairs(
    k: int = 8, iterations: int = 3, threshold: float = 0.4, cell_cap: int = 64
) -> str:
    # the whole composition unrolled: the shared KMeans CTE chain
    # (_sql_kmeans_parts) + intra-cell cosine pairs under the cell_cap
    # skew guard
    parts, _ = _sql_kmeans_parts(k, iterations)
    # cell-cap skew guard, mirrored: per-cell population -> n_sub =
    # ceil(cn / cap) -> md5-salted slice id (salt 7 = the operator's
    # SEMANTIC_SUB_SALT) -> pairs keyed on (cid, sub)
    parts.append("sz AS (SELECT cid, count(*) AS cn FROM af GROUP BY cid)")
    parts.append(
        "sb AS (SELECT af.id, af.v, af.cid, "
        "CAST(CAST(('0x' || substr(md5('7:' || CAST(af.id AS VARCHAR)), 1, 8)) AS UBIGINT) "
        f"% CAST(ceil(CAST(cn AS DOUBLE) / {float(cell_cap)}) AS BIGINT) AS BIGINT) AS sub "
        "FROM af JOIN sz USING (cid))"
    )
    return (
        "WITH " + ", ".join(parts) + ", "
        "p AS (SELECT a.id AS id_a, b.id AS id_b, a.cid AS cluster_id, "
        f"round({SQL_COS}, 6) AS cosine "
        "FROM sb a JOIN sb b ON a.cid = b.cid AND a.sub = b.sub AND a.id < b.id) "
        f"SELECT * FROM p WHERE cosine >= {threshold}"
    )


# -- X207: oracle-checkable IVF ANN (exact-cells scale path) ------------------


def _q_ann_cosine_topk_ivf_exactcells(spark, sf):
    # the IVF SCALE path under the hash check (VERDICT r9 #2): the
    # deterministic-KMeans coarse quantizer (X166 discipline) + a
    # 2-of-8-cell probe + exact per-cell cosine top-5. Complements the
    # rows-only recall-gated fast twin (ann_cosine_topk_ivf): this form
    # proves the candidate-confinement composition itself is correct,
    # that one measures its recall against the brute-force truth.
    emb = load_table(spark, sf, "embeddings")
    return SIM.cosine_topk_ivf_exact(
        emb.where(F.col("vec_id") < 10), emb, k=5, num_cells=8, iterations=3, n_probe=2
    )


def _q_ann_cosine_topk_lsh_exactbuckets(spark, sf):
    # the LSH SCALE path under the hash check (VERDICT r10 #2 — the
    # last rows-only asymmetry in the similarity stack): md5-derived
    # ±1 hyperplanes, the 6dp-rounded pure-expression sign kernel,
    # base-bucket candidate join, exact cosine top-5. Complements the
    # recall-gated multi-probe GEMM twin (ann_cosine_topk_lsh): this
    # form proves WHICH pairs collide; that one measures recall.
    emb = load_table(spark, sf, "embeddings")
    return SIM.cosine_topk_lsh_exact(
        emb.where(F.col("vec_id") < 10), emb, k=5, num_tables=4, planes=6
    )


def _q_bm25_search(spark, sf):
    # X210 Okapi BM25 top-k retrieval — the full-strength lexical leg
    # (Lucene-variant idf; k1=1.2, b=0.75): inverted-index equi-join
    # candidates, 9dp-rounded DECIMAL(20,9) contribution sums so the
    # ranking is engine-stable (the rrf_fuse discipline)
    docs = load_table(spark, sf, "documents")
    return SIM.bm25_topk(docs.where(F.col("doc_id") < 8), docs, k=10)


def _sql_bm25_search(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    """BM25 replayed in DuckDB with the SAME parenthesization as the
    Spark expression tree (left-assoc products, ((N−df)+0.5) grouping,
    (b·dl)/avgdl before the outer sum) so every double op sequence is
    identical; the 9dp contribution snap absorbs libm-vs-Math.log ulp
    latitude, and the DECIMAL(20,9) sum makes the rank order exact."""
    idf = "ln(CAST(1.0 AS DOUBLE) + (st.N - f.df + CAST(0.5 AS DOUBLE)) / (f.df + CAST(0.5 AS DOUBLE)))"
    denom = (
        f"(c.tf + CAST({k1} AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST({b} AS DOUBLE) "
        f"+ CAST({b} AS DOUBLE) * c.dl / st.avgdl))"
    )
    contrib = f"round({idf} * c.tf * CAST({k1 + 1.0} AS DOUBLE) / {denom}, 9)"
    return (
        "WITH tk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "d AS (SELECT doc_id AS item_id, t, len(t) AS dl FROM tk), "
        "cx AS (SELECT item_id, unnest(t) AS term, dl FROM d), "
        "ctf AS (SELECT item_id, term, count(*) AS tf, max(dl) AS dl "
        "FROM cx GROUP BY 1, 2), "
        "dft AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS N, "
        "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM d), "
        "q AS (SELECT doc_id AS query_id, unnest(list_distinct(t)) AS term "
        "FROM tk WHERE doc_id < 8), "
        f"j AS (SELECT q.query_id, c.item_id, {contrib} AS contrib "
        "FROM q JOIN ctf c ON q.term = c.term JOIN dft f ON q.term = f.term "
        "CROSS JOIN st WHERE q.query_id <> c.item_id), "
        "s AS (SELECT query_id, item_id, sum(CAST(contrib AS DECIMAL(20,9))) AS s "
        "FROM j GROUP BY 1, 2), "
        "r AS (SELECT query_id, item_id, s, row_number() OVER "
        "(PARTITION BY query_id ORDER BY s DESC, item_id ASC) AS rn FROM s) "
        "SELECT query_id, CAST(rn AS BIGINT) AS rank, item_id, "
        f"round(CAST(s AS DOUBLE), 6) AS score FROM r WHERE rn <= {k}"
    )


def _sql_ann_lsh_exactbuckets(
    k: int = 5,
    num_tables: int = 4,
    planes: int = 6,
    dim: int = 64,
    proj_round: int = 6,
) -> str:
    """The LSH composition unrolled for DuckDB: per (table, plane) the
    md5-derived ±1 hyperplane as a DOUBLE[] literal, sign bit =
    ``round(list_dot_product(v, w), 6) >= 0`` (the same 6dp snap the
    Spark kernel takes BEFORE comparing, so fold-order ulp drift can't
    flip a bit), packed key ``t·2^planes + Σ bit·2^(planes-1-p)``,
    candidates = DISTINCT shared-bucket pairs, exact cosine, (cosine
    desc, id asc) top-k — mirroring similarity._topk's NULL-drop."""
    from safedata_pipeline_spark.operators.similarity import _hyperplane

    keys = []
    for t in range(num_tables):
        terms = [str(t << planes)]
        for p in range(planes):
            w = _hyperplane(dim, t, p)
            lit = (
                "CAST(["
                + ",".join("1.0" if x > 0 else "-1.0" for x in w)
                + "] AS DOUBLE[])"
            )
            terms.append(
                f"(CASE WHEN round(list_dot_product(v, {lit}), "
                f"{proj_round}) >= 0 THEN {1 << (planes - 1 - p)} "
                "ELSE 0 END)"
            )
        keys.append("(" + " + ".join(terms) + ")")
    keys_arr = "[" + ", ".join(keys) + "]"
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND "
        "list_dot_product(c.v, c.v) > 0 "
        "THEN list_dot_product(q.qv, c.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * "
        "sqrt(list_dot_product(c.v, c.v))) ELSE NULL END"
    )
    return (
        "WITH data AS (SELECT vec_id AS id, "
        "CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        "WHERE embedding IS NOT NULL), "
        f"keyed AS (SELECT id, v, unnest({keys_arr}) AS bk FROM data), "
        "qk AS (SELECT id AS query_id, v AS qv, bk FROM keyed "
        "WHERE id < 10), "
        f"scored AS (SELECT DISTINCT q.query_id, c.id, {cos} AS cosine "
        "FROM qk q JOIN keyed c ON q.bk = c.bk AND q.query_id <> c.id), "
        "r AS (SELECT query_id, id, cosine, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, id ASC) AS rn "
        "FROM scored WHERE cosine IS NOT NULL) "
        "SELECT query_id, CAST(rn AS BIGINT) AS rank, id AS neighbor_id, "
        f"round(cosine, 6) AS cosine FROM r WHERE rn <= {k}"
    )


def _sql_ann_ivf_exactcells(
    k: int = 5, num_cells: int = 8, iterations: int = 3, n_probe: int = 2
) -> str:
    """The whole IVF composition unrolled: the shared deterministic-
    KMeans CTE chain (md5-seeded init, rounded-distance assignments,
    9dp centroid means — _sql_kmeans_parts), then the query-side
    n_probe-cell expansion by the SAME rounded kernel, an equi-join on
    the cell id against the final assignment `af`, exact cosine, and
    the (cosine desc, id asc) top-k — mirroring similarity._topk's
    NULL-cosine drop."""
    parts, dist = _sql_kmeans_parts(num_cells, iterations)
    parts.append(
        "qp AS (SELECT id AS query_id, v AS qv, cid FROM "
        "(SELECT d.id, d.v, c.cid, "
        f"row_number() OVER (PARTITION BY d.id ORDER BY {dist}, c.cid) AS rn "
        f"FROM data d CROSS JOIN c{iterations} c WHERE d.id < 10) "
        f"WHERE rn <= {n_probe})"
    )
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(a.v, a.v) > 0 "
        "THEN list_dot_product(q.qv, a.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))) "
        "ELSE NULL END"
    )
    parts.append(
        f"scored AS (SELECT q.query_id, a.id, {cos} AS cosine "
        "FROM qp q JOIN af a ON q.cid = a.cid AND q.query_id <> a.id)"
    )
    parts.append(
        "r AS (SELECT query_id, id, cosine, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, id ASC) AS rn "
        "FROM scored WHERE cosine IS NOT NULL)"
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT query_id, CAST(rn AS BIGINT) AS rank, id AS neighbor_id, "
        f"round(cosine, 6) AS cosine FROM r WHERE rn <= {k}"
    )


# -- X181: TPC-H Q6 shape (fully-pushable filtered aggregate) ----------------


def _q_forecast_revenue(spark, sf):
    # Q6: the purest pushdown showcase — every predicate reaches the
    # parquet scan (PushedFilters), zero joins, one DECIMAL aggregate.
    li = load_table(spark, sf, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)"))
            .cast("double"),
            2,
        ).alias("revenue_effect")
    )


def _sql_forecast_revenue() -> str:
    return (
        "SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) "
        "AS DOUBLE), 2) AS revenue_effect FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
    )


# -- X180: credential/secret scanning ----------------------------------------

# plants are assembled from fragments so no credential-SHAPED literal
# ever appears contiguously in this source file (leak scanners would
# rightly flag one, fake or not)
_SECRET_PLANTS = [
    " key " + "AKIA" + "ABCDEFGHIJKLMNOP" + " used",                    # aws_key
    " bearer " + ".".join(["eyJ" + "hbGciOiJIUzI1", "eyJ" + "zdWIiOiIxMjM0", "SflKxwRJSMeKKF2Q"]) + " ok",  # jwt
    " push " + "ghp" + "_" + "Ab1" * 12 + " done",                      # github_pat
    " config api" + "_key = \"" + "ABCDEFGHIJKLMNOPQRST" + "\" end",    # assigned_secret
    "",                                                                 # clean
]


def _q_secrets_scan(spark, sf):
    # plant one deterministic credential per doc_id % 5 class (the
    # fifth class stays clean) and count per type — the pre-training
    # secret screen over the documents fixture
    from safedata_pipeline_spark.operators.pii import secrets_scan

    docs = load_table(spark, sf, "documents")
    plant = F.element_at(
        F.array(*[F.lit(p) for p in _SECRET_PLANTS]),
        (F.col("doc_id") % 5).cast("int") + 1,
    )
    wrapped = docs.select("doc_id", F.concat(F.col("text"), plant).alias("text"))
    return secrets_scan(wrapped)


def _sql_secrets_scan() -> str:
    from safedata_pipeline_spark.operators.pii import SECRET_PATTERNS

    plants = ", ".join("'" + p.replace("'", "''") + "'" for p in _SECRET_PLANTS)
    counts = ", ".join(
        "CAST(len(regexp_extract_all(t, '" + pat.replace("'", "''") + "')) AS BIGINT) "
        f"AS n_{name}"
        for name, pat in SECRET_PATTERNS.items()
    )
    total = " + ".join(
        "len(regexp_extract_all(t, '" + pat.replace("'", "''") + "'))"
        for pat in SECRET_PATTERNS.values()
    )
    return (
        f"WITH plants AS (SELECT [{plants}] AS arr), "
        "w AS (SELECT doc_id, text || plants.arr[CAST(doc_id % 5 AS INT) + 1] AS t "
        "FROM documents CROSS JOIN plants) "
        f"SELECT doc_id, {counts}, CAST({total} AS BIGINT) AS n_secrets FROM w"
    )


# -- X179: conversion attribution (first/last touch in lookback) -------------


def _q_conversion_attribution(spark, sf):
    from safedata_pipeline_spark.operators import timeseries as TS

    return TS.attribute_conversions(
        load_table(spark, sf, "events"),
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_hours=24.0,
    )


def _sql_conversion_attribution() -> str:
    return (
        "WITH conv AS (SELECT event_id AS conversion_id, user_id, ts AS conversion_ts "
        "FROM events WHERE event_type = 'purchase'), "
        "touch AS (SELECT user_id, event_id AS touch_id, ts AS touch_ts "
        "FROM events WHERE event_type IN ('click', 'view')), "
        "pairs AS (SELECT c.conversion_id, t.touch_id, t.touch_ts "
        "FROM conv c JOIN touch t ON c.user_id = t.user_id "
        "AND t.touch_ts <= c.conversion_ts "
        "AND t.touch_ts > c.conversion_ts - INTERVAL 24 HOURS), "
        "ranked AS (SELECT *, "
        "row_number() OVER (PARTITION BY conversion_id ORDER BY touch_ts ASC, touch_id ASC) AS rf, "
        "row_number() OVER (PARTITION BY conversion_id ORDER BY touch_ts DESC, touch_id DESC) AS rl "
        "FROM pairs), "
        "cnt AS (SELECT conversion_id, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1) "
        "SELECT c.conversion_id, c.user_id, c.conversion_ts, "
        "CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_touches, "
        "f.touch_id AS first_touch_id, f.touch_ts AS first_touch_ts, "
        "l.touch_id AS last_touch_id, l.touch_ts AS last_touch_ts "
        "FROM conv c "
        "LEFT JOIN cnt USING (conversion_id) "
        "LEFT JOIN (SELECT conversion_id, touch_id, touch_ts FROM ranked WHERE rf = 1) f USING (conversion_id) "
        "LEFT JOIN (SELECT conversion_id, touch_id, touch_ts FROM ranked WHERE rl = 1) l USING (conversion_id)"
    )


# -- X177: length-matched sampling (eval-set construction) -------------------


def _q_length_matched_sample(spark, sf):
    # reference = the same docs truncated to their first 120 chars (a
    # deliberately shorter length profile); the sampler thins the full
    # corpus to match it, md5-replayable per doc
    from safedata_pipeline_spark.operators.sampling import length_matched_sample

    docs = load_table(spark, sf, "documents")
    ref = docs.select(F.substring(F.col("text"), 1, 120).alias("text"))
    return length_matched_sample(docs, ref).select("doc_id", "source")


def _sql_length_matched_sample() -> str:
    # same fit arithmetic in SQL: w_b = ref_b/ref_total, cap =
    # min(cur_b / w_b), rate_b = w_b * cap / cur_b — plain IEEE doubles
    # in the same order as the driver-side fit
    bucket = (
        "CASE WHEN len({toks}) <= 0 THEN -1 "
        "ELSE CAST(floor(ln(CAST(len({toks}) AS DOUBLE)) / ln(2.0)) AS INT) END"
    )
    toks_full = (
        "CASE WHEN trim(text) = '' THEN [] ELSE regexp_split_to_array(trim(text), '\\s+') END"
    )
    toks_ref = (
        "CASE WHEN trim(substr(text, 1, 120)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(substr(text, 1, 120)), '\\s+') END"
    )
    bf = bucket.format(toks=toks_full)
    br = bucket.format(toks=toks_ref)
    return (
        f"WITH cur AS (SELECT {bf} AS b, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM documents WHERE text IS NOT NULL GROUP BY 1), "
        f"ref AS (SELECT {br} AS b, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM documents WHERE text IS NOT NULL GROUP BY 1), "
        "reft AS (SELECT sum(cnt) AS t FROM ref), "
        "pos AS (SELECT ref.b, ref.cnt / reft.t AS w, cur.cnt AS cur_cnt "
        "FROM ref JOIN cur ON ref.b = cur.b CROSS JOIN reft WHERE ref.cnt > 0), "
        "cap AS (SELECT min(cur_cnt / w) AS c FROM pos), "
        "rates AS (SELECT b, w * cap.c / cur_cnt AS rate FROM pos, cap) "
        f"SELECT doc_id, source FROM documents JOIN rates ON {bf} = rates.b "
        "WHERE text IS NOT NULL AND "
        "(CAST(('0x' || substr(md5('len|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
        "/ 4294967296.0 <= rate"
    )


# -- X176: per-group scaling (source-fair normalization) ---------------------


def _q_group_scale(spark, sf):
    # z-scale prices within their returnflag group — the two-pass
    # fit/apply shape (one grouped agg -> broadcast join -> map-only
    # expression) that makes one threshold mean the same thing in
    # every group
    li = load_table(spark, sf, "lineitem")
    return P.group_scale(li, ["l_extendedprice"], ["l_returnflag"]).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice_scaled"
    )


def _sql_group_scale() -> str:
    return (
        "WITH fit AS (SELECT l_returnflag, round(avg(l_extendedprice), 9) AS loc, "
        "round(stddev_samp(l_extendedprice), 9) AS spread FROM lineitem GROUP BY 1) "
        "SELECT l_orderkey, l_linenumber, l.l_returnflag, "
        "CASE WHEN spread > 0 THEN round((l_extendedprice - loc) / spread, 6) END "
        "AS l_extendedprice_scaled "
        "FROM lineitem l JOIN fit USING (l_returnflag)"
    )


# -- X173/X174: TPC-H Q14 / Q22 shapes ---------------------------------------


def _q_promo_revenue(spark, sf):
    # Q14 shape: conditional-revenue share over the part⋈lineitem join
    # within one month — the filtered fact scan broadcast-joins the
    # dimension, and the share is a conditional-DECIMAL-sum ratio in
    # ONE aggregate (same discipline as market_share).
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(38,6)"))).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


def _sql_promo_revenue() -> str:
    return (
        "SELECT round(100.0 * "
        "CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) "
        "ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) / "
        "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS promo_revenue_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'"
    )


def _q_idle_rich_customers(spark, sf):
    # Q22 shape: scalar-average subquery + NOT EXISTS anti-join —
    # high-balance customers in target segments with no RECENT order
    # (the churn-risk list; an unwindowed NOT EXISTS is empty at
    # fixture scale since order coverage is ~100%). The avg rides a
    # broadcast 1-row aggregate; the anti-join keys on the customer id
    # (AQE broadcasts the filtered order-key side when small).
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    segs = ["AUTOMOBILE", "FURNITURE", "MACHINERY"]
    pos_avg = (
        cust.where(F.col("c_mktsegment").isin(segs) & (F.col("c_acctbal") > 0))
        .agg(F.round(F.avg("c_acctbal"), 6).alias("__avg"))
    )
    rich = (
        cust.where(F.col("c_mktsegment").isin(segs))
        .crossJoin(F.broadcast(pos_avg))
        .where(F.col("c_acctbal") > F.col("__avg"))
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double"), 2).alias("total_acctbal"),
    )


def _sql_idle_rich_customers() -> str:
    segs = "('AUTOMOBILE', 'FURNITURE', 'MACHINERY')"
    return (
        f"WITH avg_bal AS (SELECT round(avg(c_acctbal), 6) AS a FROM customer "
        f"WHERE c_mktsegment IN {segs} AND c_acctbal > 0), "
        f"rich AS (SELECT * FROM customer, avg_bal WHERE c_mktsegment IN {segs} AND c_acctbal > a), "
        "idle AS (SELECT * FROM rich WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = rich.c_custkey "
        "AND o_orderdate >= TIMESTAMP '2000-01-01')) "
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers, "
        "round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_acctbal "
        "FROM idle GROUP BY c_mktsegment"
    )


# -- X175: corpus overlap audit ----------------------------------------------


def _q_corpus_overlap(spark, sf):
    # two crawl snapshots simulated by an md5 split of the documents
    # fixture WITH an overlapping middle band (~one third of docs land
    # in both sides), so every output scalar is non-degenerate
    docs = load_table(spark, sf, "documents")
    slot = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ov|"), F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("bigint") % 3
    )
    a = docs.where(slot <= 1)     # slots 0,1
    b = docs.where(slot >= 1)     # slots 1,2 — slot 1 is the overlap
    return DD.corpus_overlap(a, b, n=3)


def _sql_corpus_overlap() -> str:
    shingle = (
        "SELECT DISTINCT md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS h "
        "FROM ({src}) s CROSS JOIN unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)"
    )
    toks = (
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(text), '\\s+') END AS t "
        "FROM documents WHERE text IS NOT NULL AND "
        "CAST(CAST(('0x' || substr(md5('ov|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 3 {cond}"
    )
    da = shingle.format(src=toks.format(cond="<= 1"))
    db = shingle.format(src=toks.format(cond=">= 1"))
    return (
        f"WITH da AS ({da}), db AS ({db}), "
        "na AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles_a FROM da), "
        "nb AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles_b FROM db), "
        "nc AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM da JOIN db USING (h)) "
        "SELECT n_shingles_a, n_shingles_b, n_common, "
        "round(n_common / CAST(nullif(n_shingles_a, 0) AS DOUBLE), 6) AS containment_a_in_b, "
        "round(n_common / CAST(nullif(n_shingles_b, 0) AS DOUBLE), 6) AS containment_b_in_a, "
        "round(n_common / CAST(nullif(n_shingles_a + n_shingles_b - n_common, 0) AS DOUBLE), 6) AS jaccard "
        "FROM na CROSS JOIN nb CROSS JOIN nc"
    )


# -- X171: URL/domain curation (registered-domain stats) ---------------------


def _q_domain_stats(spark, sf):
    # deterministic synthetic URLs over the documents fixture
    # (subdomain + TLD variants exercise the registered-domain logic,
    # incl. the co.uk multi-label suffix branch)
    docs = load_table(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("blog.")),
        F.col("source"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
        F.lit("/d/"),
        F.col("doc_id").cast("string"),
    )
    return TX.domain_stats(docs.select("doc_id", url.alias("url")))


def _sql_domain_stats() -> str:
    from safedata_pipeline_spark.operators.text import _MULTI_SUFFIXES

    suffixes = ", ".join(f"'{s}'" for s in _MULTI_SUFFIXES)
    lab = "string_split(host, '.')"
    return (
        "WITH u AS (SELECT doc_id, 'https://' || "
        "CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE 'blog.' END || source || "
        "CASE WHEN doc_id % 7 = 0 THEN '.co.uk' ELSE '.com' END || '/d/' || "
        "CAST(doc_id AS VARCHAR) AS url FROM documents), "
        "h AS (SELECT doc_id, nullif(regexp_extract("
        "regexp_replace(regexp_replace(lower(trim(url)), '^[a-z][a-z0-9+.-]*://', ''), "
        "'^[^/@?#]*@', ''), '^([a-z0-9.-]+)', 1), '') AS host FROM u), "
        "d AS (SELECT CASE WHEN host IS NULL THEN NULL "
        f"WHEN len({lab}) <= 1 THEN NULL "
        f"WHEN len({lab}) = 2 THEN host "
        f"WHEN ({lab}[-2] || '.' || {lab}[-1]) IN ({suffixes}) AND len({lab}) >= 3 "
        f"THEN ({lab}[-3] || '.' || {lab}[-2] || '.' || {lab}[-1]) "
        f"ELSE ({lab}[-2] || '.' || {lab}[-1]) END AS domain FROM h), "
        "c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs FROM d "
        "WHERE domain IS NOT NULL GROUP BY domain) "
        "SELECT domain, n_docs, round(n_docs / (SELECT sum(n_docs) FROM c), 6) AS share FROM c"
    )


# -- X170: interval-overlap join (grid-bucketed, dedup-free) -----------------


def _q_shipment_month_overlap(spark, sf):
    # big×big temporal overlap: lineitem transit intervals
    # [shipdate, receiptdate) × calendar-month windows derived from
    # orders — bucket-grid equi-join (interval_overlap_join), then a
    # dashboard aggregate per (month, returnflag).
    from safedata_pipeline_spark.operators.joins import interval_overlap_join

    # the fixture's trimmed lineitem has no receiptdate — derive a
    # deterministic 1..28-day transit span from the line number (both
    # engines reproduce it), half-open [ship_day, ship_day + span)
    epoch = "1970-01-01"
    ship_day = F.datediff(F.col("l_shipdate").cast("date"), F.lit(epoch).cast("date"))
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag",
        ship_day.alias("a_s"),
        (ship_day + 1 + F.col("l_linenumber") % 28).alias("a_e"),
    )
    months = (
        load_table(spark, sf, "orders")
        .select(F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month_start"))
        .distinct()
        .select(
            "month_start",
            F.datediff(F.col("month_start"), F.lit(epoch).cast("date")).alias("b_s"),
            F.datediff(
                F.add_months(F.col("month_start"), 1), F.lit(epoch).cast("date")
            ).alias("b_e"),
        )
    )
    pairs = interval_overlap_join(li, months, "a_s", "a_e", "b_s", "b_e", bucket_width=16)
    return (
        pairs.groupBy(
            F.date_format("month_start", "yyyy-MM").alias("month"), F.col("l_returnflag")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shipments"))
    )


def _sql_shipment_month_overlap() -> str:
    return (
        "WITH li AS (SELECT l_returnflag, "
        "datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s, "
        "datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + 1 + l_linenumber % 28 AS e "
        "FROM lineitem), "
        "m AS (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start FROM orders), "
        "mb AS (SELECT month_start, "
        "datediff('day', DATE '1970-01-01', month_start) AS bs, "
        "datediff('day', DATE '1970-01-01', CAST(month_start + INTERVAL 1 MONTH AS DATE)) AS be FROM m) "
        "SELECT strftime(mb.month_start, '%Y-%m') AS month, li.l_returnflag, "
        "CAST(count(*) AS BIGINT) AS n_shipments "
        "FROM li JOIN mb ON li.s < mb.be AND mb.bs < li.e AND li.s < li.e "
        "GROUP BY 1, 2"
    )


# -- X169: Zipf / vocabulary-shape corpus diagnostics ------------------------


def _q_zipf_profile(spark, sf):
    return TX.zipf_profile(load_table(spark, sf, "documents"), top_ranks=1000)


def _sql_zipf_profile(top_ranks: int = 1000) -> str:
    # same recipe: type-frequency table, top-R by (freq DESC, token ASC),
    # ln-ln regression with DECIMAL(38,12) sums of 9dp-rounded terms
    return (
        f"WITH toks AS ({_SQL_TOKS}), "
        "ex AS (SELECT unnest(t) AS token FROM toks), "
        "tf AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM ex GROUP BY token), "
        "tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS n_types, CAST(max(freq) AS BIGINT) AS top_freq FROM tf), "
        f"top AS (SELECT token, freq FROM tf ORDER BY freq DESC, token ASC LIMIT {top_ranks}), "
        "ranked AS (SELECT round(ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC) AS DOUBLE)), 9) AS x, "
        "round(ln(CAST(freq AS DOUBLE)), 9) AS y FROM top), "
        "fit AS (SELECT CAST(count(*) AS BIGINT) AS r, "
        "sum(CAST(x AS DECIMAL(38,12))) AS sx, sum(CAST(y AS DECIMAL(38,12))) AS sy, "
        "sum(CAST(x * x AS DECIMAL(38,12))) AS sxx, sum(CAST(x * y AS DECIMAL(38,12))) AS sxy FROM ranked) "
        "SELECT n_tokens, n_types, round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio, "
        "round(CAST(top_freq AS DOUBLE) / n_tokens, 6) AS top1_share, "
        "round((CAST(r AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "nullif(CAST(r AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6) AS zipf_slope "
        "FROM tot CROSS JOIN fit"
    )


# -- X167: trained quality classifier (fit/apply corpus filter) -------------


def _clf_fixture(spark, sf):
    # labeled reference-vs-crawl fixture: an md5 coin marks half the
    # documents as "crawl" and degrades their TEXT with SEO boilerplate
    # (repeated junk inflates dup-word / top-bigram fractions and sinks
    # the quality blend); the clean half is the "reference". Both the
    # degradation and the train/test split are md5-replayable.
    docs = load_table(spark, sf, "documents")
    junk = " ".join(["click here buy now best price"] * 6)
    degrade = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("qlabel|"), F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("bigint") % 2 == 1
    )
    fixed = docs.select(
        "doc_id",
        F.when(degrade, F.concat(F.col("text"), F.lit(" " + junk))).otherwise(
            F.col("text")
        ).alias("text"),
        (~degrade).cast("int").alias("label"),  # 1 = looks-like-reference
    )
    train_coin = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("clf|"), F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("bigint") % 2
    )
    return fixed.withColumn("is_train", train_coin == 0)


def _q_quality_classifier(spark, sf):
    # CCNet/FineWeb-style looks-like-reference classifier: features =
    # the engine's heuristic text scores; LR fit on the md5-train half
    # of a planted clean-vs-degraded fixture, scores applied MAP-ONLY
    # to every doc. Iterative solver -> rows-only; the held-out AUC is
    # stat-gated per round (tools/stat_gates.py).
    from safedata_pipeline_spark.operators import quality_classifier as QC

    fixed = _clf_fixture(spark, sf)
    labels = fixed.select("doc_id", "label")
    feats = QC.text_features(fixed)
    model = QC.classifier_fit(
        feats.join(fixed.where("is_train").select("doc_id"), "doc_id"), labels
    )
    return (
        QC.classifier_score(feats, model)
        .join(labels, "doc_id")
        .select("doc_id", "label", "clf_score")
    )


# -- X184: Gopher repetition/format quality screen ---------------------------


def _gopher_fixture(spark, sf):
    # the fixture text is single-line, so reflow it into 8-word lines
    # (pure expressions) and plant line-level signals by doc_id modulo:
    # %3==0 duplicate boilerplate lines, %5==1 bullet lines, %7==2 an
    # ellipsis line — every branch mirrored verbatim in the oracle SQL
    docs = load_table(spark, sf, "documents")
    tk = TX._ws_tokens(F.col("text"))
    nc = F.ceil(F.size(tk) / F.lit(8.0)).cast("int")
    body = F.when(
        F.size(tk) > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nc - 1),
                lambda i: F.array_join(F.slice(tk, i * 8 + 1, F.lit(8)), " "),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    dup_plant = "\nclick here to subscribe now\nclick here to subscribe now"
    bullet_plant = "\n- special offer today\n- special offer today"
    ellip_plant = "\nto be continued..."
    text = F.concat(
        body,
        F.when(F.col("doc_id") % 3 == 0, F.lit(dup_plant)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 1, F.lit(bullet_plant)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 2, F.lit(ellip_plant)).otherwise(F.lit("")),
    )
    return docs.select("doc_id", text.alias("text"))


def _q_gopher_quality(spark, sf):
    # Gopher Table-A1 screen (Rae et al. 2021): repetition + format
    # signals and the pass verdict, one map-only scan, zero shuffles
    return TX.gopher_quality_filters(_gopher_fixture(spark, sf))


def _q_c4_line_filter(spark, sf):
    # X232: C4 line-level cleaning (Raffel et al. 2020 §2.2). The
    # fixture text is single-line, so reflow into 8-word lines with
    # terminal periods on EVEN line indices (odd-index lines fail the
    # punctuation rule — live per-line signal), and plant the page
    # rules by doc_id modulo: %11==3 a "lorem ipsum" line, %13==5 a
    # curly-brace code line, %7==2 a javascript cookie-warning line
    # (terminal-punctuated, so ONLY the javascript rule drops it) —
    # every branch mirrored verbatim in the oracle SQL
    docs = load_table(spark, sf, "documents")
    tk = TX._ws_tokens(F.col("text"))
    nc = F.ceil(F.size(tk) / F.lit(8.0)).cast("int")
    body = F.when(
        F.size(tk) > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nc - 1),
                lambda i: F.concat(
                    F.array_join(F.slice(tk, i * 8 + 1, F.lit(8)), " "),
                    F.when(i % 2 == 0, F.lit(".")).otherwise(F.lit("")),
                ),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    lorem_plant = "\nthe classic lorem ipsum dolor sit amet filler."
    curly_plant = "\nif (x) { return y; }"
    js_plant = "\nplease enable javascript to continue reading this page."
    text = F.concat(
        body,
        F.when(F.col("doc_id") % 11 == 3, F.lit(lorem_plant)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 5, F.lit(curly_plant)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 2, F.lit(js_plant)).otherwise(F.lit("")),
    )
    return TX.c4_line_filter(docs.select("doc_id", text.alias("text")))


def _reflow_lines(docs, plants):
    """Shared 8-word reflow (the c4_line_filter fixture discipline):
    single-line fixture text becomes newline-separated 8-word lines
    with terminal periods on even line indices, plus per-doc modulo
    ``plants`` [(mod, rem, line), ...] appended — each mirrored
    verbatim in the oracle SQL."""
    tk = TX._ws_tokens(F.col("text"))
    nc = F.ceil(F.size(tk) / F.lit(8.0)).cast("int")
    body = F.when(
        F.size(tk) > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nc - 1),
                lambda i: F.concat(
                    F.array_join(F.slice(tk, i * 8 + 1, F.lit(8)), " "),
                    F.when(i % 2 == 0, F.lit(".")).otherwise(F.lit("")),
                ),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    parts = [body]
    for mod, rem, line in plants:
        parts.append(
            F.when(F.col("doc_id") % mod == rem, F.lit("\n" + line)).otherwise(
                F.lit("")
            )
        )
    return docs.select("doc_id", F.concat(*parts).alias("text"))


BOILER_PLANTS = [
    (2, 0, "subscribe to our newsletter for updates."),
    (5, 1, "privacy policy and terms of service."),
]


def _q_boilerplate_lines(spark, sf):
    # X233: corpus-level duplicate-line removal (CCNet §4.1 / Dolma).
    # Reflowed 8-word lines plus two HIGH-df footer plants (df = n/2
    # and n/5 >= threshold at every fixture) and one PAIRED plant
    # ("shared pair line <doc_id//2>", df == 2 < 3 — live proof the
    # threshold keeps sub-threshold duplicates); natural 8-token line
    # collisions are ~1e-8 at fixture scale and replay identically in
    # the oracle anyway
    docs = load_table(spark, sf, "documents")
    fx = _reflow_lines(docs, BOILER_PLANTS)
    pair = F.concat(
        F.lit("shared pair line "),
        F.floor(F.col("doc_id") / 2).cast("string"),
        F.lit("."),
    )
    fx = fx.select(
        "doc_id", F.concat(F.col("text"), F.lit("\n"), pair).alias("text")
    )
    return TX.boilerplate_lines(fx, min_doc_freq=3)


def _q_char_entropy(spark, sf):
    # X234: per-doc char-distribution entropy + printable ratio (the
    # binary/mojibake pre-filter). The ASCII fixture keeps printable
    # at 1.0, so plant 60 control chars on doc_id % 17 == 5 (flips
    # printable_ratio below the exact-integer 0.8 binary gate on the
    # shorter docs — live signal in every output column)
    docs = load_table(spark, sf, "documents")
    text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 17 == 5, F.lit("\x01" * 60)).otherwise(
            F.lit("")
        ),
    )
    return TX.char_entropy(docs.select("doc_id", text.alias("text")))


RW_PLANTS = [
    (5, 1, "BREAKING NEWS UPDATE NOW"),
    (7, 3, "2024 12 31."),
    (9, 2, "42 likes"),
    (13, 6, "standalone"),
]


def _q_refinedweb_line_correct(spark, sf):
    # X236: RefinedWeb line-wise correction (Penedo et al. 2023) —
    # reflowed lines plus one plant per removal rule (mainly-upper,
    # numeric-only, social counter, one-word); short docs with plants
    # cross the exact-integer 30% char budget and drop whole — every
    # branch live and mirrored verbatim in the oracle
    docs = load_table(spark, sf, "documents")
    return TX.refinedweb_line_correct(_reflow_lines(docs, RW_PLANTS))


def _q_ngram_novelty(spark, sf):
    # X237: per-doc 3-gram novelty (WIMBD-style originality). The
    # ~30-word fixture vocabulary gives a natural df spectrum (27k
    # possible 3-grams vs ~75k drawn at sf0.01), so novelty is live
    # without plants
    return TX.ngram_novelty(load_table(spark, sf, "documents"), n=3)


def _q_ngram_novelty_vs_ref(spark, sf):
    # X239: cross-snapshot 3-gram novelty — reference corpus = even
    # doc_ids, "new crawl" = odd doc_ids (a deterministic split of the
    # real fixture; shared-vocab token soup gives a live mid-range
    # novelty spectrum: most grams recur across the split, some don't)
    docs = load_table(spark, sf, "documents")
    return TX.ngram_novelty_vs_ref(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        n=3,
    )


def _q_mmr_rerank(spark, sf):
    # X238: Maximal Marginal Relevance diverse top-k over the real
    # embedding fixture — query = vec_id 0, k = 3, lam = 0.7; every
    # cosine and the combined score snap at 9dp before comparison and
    # ties break to the smallest id, so the greedy selection replays
    # in the unrolled 3-step SQL oracle
    emb = load_table(spark, sf, "embeddings")
    return SIM.mmr_rerank(emb, query_id=0, k=3, lam=0.7)


def _q_dsir_logweights(spark, sf):
    # X235: DSIR importance log-weights (Xie et al. 2023) — target
    # domain = source 'src0' (a real fixture column), features =
    # md5-slot-hashed unigrams+bigrams, add-one multinomial log-ratio
    # per slot (9dp model snap), per-doc DECIMAL sum
    docs = load_table(spark, sf, "documents")
    return SMP.dsir_logweights(
        docs.select(
            "doc_id", "text", (F.col("source") == "src0").alias("is_target")
        ),
        buckets=64,
    )


def _q_doremi_weights(spark, sf):
    # X243: DoReMi-style domain mixture reweighting — per-source
    # excess loss (corpus unigram LM vs the source's own LM) drives
    # one exp(lr*excess) multiplicative update, normalized as an exact
    # integer-unit ratio. Fixture skews per-source vocabulary with a
    # replicated source-marker token (1 + doc_id % 3 copies), so every
    # source has a live, deterministic excess signal.
    docs = load_table(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.repeat(
                F.concat(F.lit(" zsrc_"), F.col("source")),
                (F.lit(1) + F.col("doc_id") % 3).cast("int"),
            ),
        ).alias("text"),
    )
    return SMP.doremi_weights(planted, lr=0.5)


def _q_margin_bitext_mine(spark, sf):
    # X244: margin-based bitext mining (Artetxe & Schwenk 2019 — the
    # CCMatrix/NLLB pair-selection rule): a FIXED batch of even
    # vec_ids < 200 is the source side (production mining runs in
    # query batches; the bm25_search fixed-query convention keeps the
    # pair frame linear in the corpus), odd vec_ids the target; ratio
    # margin over k=4 neighborhoods cancels hubness, best-per-source
    # kept at margin >= 1.0
    emb = load_table(spark, sf, "embeddings")
    return SIM.margin_bitext_mine(
        emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 200)),
        emb.where(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.0,
    )


def _q_min_k_prob(spark, sf):
    # X245: Min-K% Prob membership score (Shi et al. 2023) — the k=20%
    # most-surprising bigram positions under the engine's interpolated
    # Kneser-Ney model (X222's exact hash-channel scores), ranked by
    # (nlp DESC, pos ASC) and averaged. The natural fixture gives a
    # live score spread (token-soup docs differ in their worst
    # positions far more than in their means) — no plant needed.
    return TX.min_k_prob(load_table(spark, sf, "documents"), k_pct=20)


def _q_unimax_mixture(spark, sf):
    # X246: UniMax epoch-capped budget allocation (Chung et al. 2023)
    # — budget = 19/20 of total tokens, epoch cap 1. The fixture's
    # per-source token sums spread ~±15% around the mean, so sources
    # below the uniform share cap out (full allocation) while the
    # rest split the remainder — both branches live at every SF by
    # construction of the 19/20 fraction (capped ⟺ below ~95% of
    # mean), verified at sf0.001/0.01/0.1.
    return SMP.unimax_mixture(
        load_table(spark, sf, "documents"),
        budget_num=19,
        budget_den=20,
        epoch_cap=1,
    )


# filter_funnel rule plants (X247): one modulo class per non-trivial
# rule — a 600-char word breaks the mean-word-length band, fifteen
# numeric words push alphabetic words below 80% on mid-length docs, a
# 200-digit word pushes digit chars past 20% of word chars; too_short
# fires naturally (fixture docs run 10-99 words). Mirrored verbatim
# in the oracle SQL.
FF_LONGWORD_MOD, FF_LONGWORD_REM = 19, 3
FF_NUMWORDS_MOD, FF_NUMWORDS_REM = 23, 7
FF_DIGITS_MOD, FF_DIGITS_REM = 29, 11
FF_NUMWORDS_PLANT = " 111 222 333 444 555 666 777 888 999 000 11 22 33 44 55"


def _q_filter_funnel(spark, sf):
    # X247: quality-rule waterfall attribution (the Dolma/FineWeb
    # funnel table): marginal fails, first-fail attribution, and
    # survivors per ordered rule. Plants make every rule's marginal
    # AND first-fail columns live; overlap between plant classes is
    # the point — attribution charges the earliest rule.
    from safedata_pipeline_spark import corpus_pipeline as CPL

    docs = load_table(spark, sf, "documents")
    text = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % FF_LONGWORD_MOD == FF_LONGWORD_REM,
            F.concat(F.lit(" "), F.repeat(F.lit("a"), 600)),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % FF_NUMWORDS_MOD == FF_NUMWORDS_REM,
            F.lit(FF_NUMWORDS_PLANT),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % FF_DIGITS_MOD == FF_DIGITS_REM,
            F.concat(F.lit(" "), F.repeat(F.lit("1234567890"), 20)),
        ).otherwise(F.lit("")),
    )
    return CPL.filter_funnel(
        docs.select("doc_id", text.alias("text")), min_words=20
    )


def _q_hard_negative_mine(spark, sf):
    # X248: hard-negative band mining (the DPR/ANCE/E5 recipe) — the
    # ann_cosine_topk probe batch (vec_id < 10), skip the top 2 ranks
    # (likely unlabeled positives), keep the next 8 as negatives
    emb = load_table(spark, sf, "embeddings")
    return SIM.hard_negative_mine(
        emb.where(F.col("vec_id") < 10), emb, skip_top=2, n_neg=8
    )


def _q_matryoshka_error(spark, sf):
    # X249: Matryoshka prefix-truncation audit over the real 64-dim
    # embedding fixture — energy-captured curve at P in {8,16,32}
    # plus top-10 rank overlap for the vec_id 0 probe
    emb = load_table(spark, sf, "embeddings")
    return SIM.matryoshka_error(
        emb, prefix_dims=(8, 16, 32), query_id=0, k=10
    )


def _q_token_budget_select(spark, sf):
    # X250: quality-ranked selection under a global token budget
    # (FineWeb-Edu style): keep the lowest-perplexity docs (X52
    # unigram LM, hash channel) until 1/4 of the corpus tokens are
    # spent; two-phase range-partitioned running sum
    return SMP.token_budget_select(
        load_table(spark, sf, "documents"), budget_num=1, budget_den=4
    )


def _q_prototype_prune(spark, sf):
    # X251: SSL-prototype density pruning (Sorscher et al. 2022) —
    # keep the hardest half of each KMeans cell by full squared
    # distance to the md5-seeded deterministic prototype (the
    # X166/X207 replayable-KMeans discipline)
    emb = load_table(spark, sf, "embeddings")
    return SIM.prototype_prune(
        emb, keep_num=1, keep_den=2, num_cells=8, iterations=3
    )


def _q_knn_label_consistency(spark, sf):
    # X252: kNN label-consistency probe (the cleanlab-family label-
    # noise screen) — fixed 50-query batch, exact top-5 cosine
    # neighbors, NULL-safe label agreement, exact int/int snap
    emb = load_table(spark, sf, "embeddings")
    return SIM.knn_label_consistency(emb, k=5, n_queries=50)


def _q_langid_confusion(spark, sf):
    # X253: multi-class confusion matrix with per-cell precision/
    # recall shares, evaluated on the X182 langid HELD-OUT half — the
    # model-selection decision table for the trained-classifier family
    from safedata_pipeline_spark.checkpoint import pin_lazy
    from safedata_pipeline_spark.operators import langid as LI

    fixed = _langid_fixture(spark, sf).transform(pin_lazy)
    model = LI.langid_fit(fixed.where("is_train")).transform(pin_lazy)
    # score ONLY the held-out half: scoring is per-doc, so filtering
    # before the gram explode instead of after the truth join keeps
    # the confusion rows identical while the score grid (explode +
    # model join + per-doc sums) processes half the corpus (guide
    # §2.3 — filter before the exchange)
    test = fixed.where(~F.col("is_train"))
    scored = LI.langid_score(test, model).join(
        test.select("doc_id", F.col("lang").alias("lang_true")),
        "doc_id",
    )
    return MU.confusion_matrix(scored, truth_col="lang_true", pred_col="lang_pred")


def _q_pq_codes(spark, sf):
    # X254: product-quantization encoding (Jegou et al. 2011) — 8
    # subspaces x 8-centroid deterministic codebooks (md5 seeds, 2
    # Lloyd rounds, 6dp argmin kernel); one map-only corpus pass
    emb = load_table(spark, sf, "embeddings")
    return SIM.pq_codes(emb, dim=64, n_sub=8, codebook_k=8, iterations=2)


def _q_pq_reconstruction_error(spark, sf):
    # X255: corpus-mean PQ reconstruction error — the codebook-quality
    # tuning metric; per-subspace rounded residuals, DECIMAL mean
    emb = load_table(spark, sf, "embeddings")
    return SIM.pq_reconstruction_error(
        emb, dim=64, n_sub=8, codebook_k=8, iterations=2
    )


def _q_ann_topk_pq_adc(spark, sf):
    # X256: PQ asymmetric-distance top-k — the billion-scale IVF-PQ
    # lookup math under the hash check; fixed probe batch (vec_id<10)
    emb = load_table(spark, sf, "embeddings")
    return SIM.ann_topk_pq_adc(
        emb.where(F.col("vec_id") < 10), emb, k=5,
        dim=64, n_sub=8, codebook_k=8, iterations=2,
    )


def _q_ann_topk_ivf_pq(spark, sf):
    # X257: IVF-PQ (Jegou et al. 2011 IVFADC; the FAISS default beyond
    # ~100M vectors) — coarse 2-of-8-cell probe confines candidates,
    # PQ asymmetric distance ranks them off their codes; the complete
    # 100 TB ANN shape under the hash check
    emb = load_table(spark, sf, "embeddings")
    return SIM.ann_topk_ivf_pq(
        emb.where(F.col("vec_id") < 10), emb, k=5,
        num_cells=8, coarse_iterations=3, n_probe=2,
        dim=64, n_sub=8, codebook_k=8, pq_iterations=2,
    )


# the repeated 10-word phrase planted (twice) on doc_id % 4 == 1 docs
# so the dup family has live signal — raw fixture text has no natural
# >= 5-gram repetition (measured all-zero at sf0.01); mirrored
# verbatim in the oracle SQL
GNR_PLANT = (
    " zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10"
    " zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10"
)

# X240 fuzzy-decontamination fixture: docs with doc_id % 9 == 4 are
# REPLACED by a near-copy of a benchmark item (17 plant words + a
# 2-word per-doc variant tail), and the probe list carries the same
# item with only its LAST word changed — no shared substring hit, but
# 14 of the doc's plant shingles survive in the probe (true Jaccard
# ~0.78, well over the 0.5 MinHash gate). The second probe shares no
# vocabulary with corpus or plant — the planted true negative. Plant
# vocabulary is disjoint from the corpus word list, so unplanted docs
# can't share a 3-gram with either probe.
FDC_PLANT = (
    "heldout benchmark suite question answer pairs must never leak"
    " into pretraining corpora during sampling temperature regime calibration"
)
FDC_PROBES = [
    FDC_PLANT.rsplit(" ", 1)[0] + " audits",
    "completely unrelated probe phrase about nothing whatsoever here",
]


def _q_decontaminate_fuzzy(spark, sf):
    # X240: MinHash probe-set NEAR-dup decontamination — drop docs
    # whose banded-MinHash estimate vs ANY probe >= 0.5 (paraphrased /
    # tail-edited benchmark leakage the substring and shared-shingle
    # decontaminate paths can't see). Probe side broadcast; estimate
    # md5-deterministic, so the whole approximate path hash-checks.
    docs = load_table(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 9 == 4,
            F.concat(
                F.lit(FDC_PLANT),
                F.lit(" variant "),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return TX.decontaminate_fuzzy(planted, FDC_PROBES, threshold=0.5)


def _q_gopher_ngram_repetition(spark, sf):
    # X229: the REMAINING Gopher A1.1 repetition family — top-n-gram
    # character fraction (n = 2..4) and duplicated-n-gram coverage
    # fraction (n = 5..10) per document; completes the word/line
    # measures repetition_stats and gopher_quality_filters carry
    docs = load_table(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 1, F.lit(GNR_PLANT)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return TX.gopher_ngram_repetition(planted)


def _q_quality_signals(spark, sf):
    # X242: the RedPajama/Dolma combined per-doc quality-signal table —
    # the Gopher screen, the pivoted n-gram repetition family, the
    # order-0 compressibility bound and the corpus-self LM score side
    # by side, one row per document, for threshold tuning. Fixture =
    # the gopher reflow+line plants PLUS the GNR word plant on
    # doc_id % 4 == 1, so every signal family has live variation.
    from safedata_pipeline_spark import corpus_pipeline as CPL
    from safedata_pipeline_spark.checkpoint import pin_lazy

    fx = _gopher_fixture(spark, sf)
    # pin the planted frame: FOUR signal families scan it, and each
    # re-scan would recompute the reflow expression chain (fixture-
    # scale pin; the real operator reads a column-pruned parquet scan)
    fq = fx.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 1, F.lit(GNR_PLANT)).otherwise(F.lit("")),
        ).alias("text"),
    ).transform(pin_lazy)
    return CPL.quality_signals(fq)


# -- X193: Bloom-filter dedup prefilter (mergeable md5 bitset state) ---------


def _q_bloom_prefilter(spark, sf):
    # build a Bloom filter over the REFERENCE corpus's content digests
    # (doc_id % 3 != 0), probe the NEW batch (doc_id % 3 == 0): every
    # true duplicate flags maybe_present (no false negatives), absent
    # content flags at the small false-positive rate. The bitset state
    # is md5-derived, so the WHOLE filter (bits and verdicts) is
    # hash-checked against the oracle.
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("digest")
    )
    ref = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    bloom = SK.bloom_build(ref, "digest")
    return SK.bloom_probe(new, "digest", bloom, "doc_id")


# -- X187: alpha-smoothed mixture sampling (XLM-R temperature rebalance) -----


def _q_alpha_mixture(spark, sf):
    # α = 0.5 exponentiated source smoothing: keep rate sqrt(n_min/n_s)
    # per source (closed form — one correctly-rounded sqrt of an
    # integer ratio, so the kept SET is engine-exact), md5 coin per doc.
    # The fixture's sources are uniform (rate would be 1 everywhere),
    # so the query derives a Zipf-ish 8:4:2:1:1 bucket from doc_id —
    # the head bucket keeps ~sqrt(1/8) of its docs, the tail all.
    d = F.col("doc_id") % 16
    bucket = (
        F.when(d < 8, F.lit("g0"))
        .when(d < 12, F.lit("g1"))
        .when(d < 14, F.lit("g2"))
        .when(d < 15, F.lit("g3"))
        .otherwise(F.lit("g4"))
    )
    docs = load_table(spark, sf, "documents").select(
        "doc_id", bucket.alias("source")
    )
    return SMP.alpha_mixture_sample(docs)


def _q_temperature_mix(spark, sf):
    # X230: the QUOTA form of temperature mixing (vs X187's rate
    # form): exact largest-remainder apportionment of a 200-doc budget
    # at tau=0.7 over the same Zipf-ish 8:4:2:1:1 source plant — every
    # quota an exact integer, the sampled set md5-deterministic
    d = F.col("doc_id") % 16
    bucket = (
        F.when(d < 8, F.lit("g0"))
        .when(d < 12, F.lit("g1"))
        .when(d < 14, F.lit("g2"))
        .when(d < 15, F.lit("g3"))
        .otherwise(F.lit("g4"))
    )
    docs = load_table(spark, sf, "documents").select(
        "doc_id", bucket.alias("source")
    )
    return SMP.temperature_mix(docs, budget=200, temperature=0.7)


def _q_ccnet_perplexity_buckets(spark, sf):
    # X231: CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    # 2020) over the engine's own interpolated Kneser-Ney score —
    # rank-based tertiles on a deterministic total order, so the split
    # is integer-exact in any engine
    return TX.ccnet_perplexity_buckets(load_table(spark, sf, "documents"))


# -- X186: winnowing fingerprints (MOSS local fingerprinting) ----------------


def _q_winnowing(spark, sf):
    # Schleimer-Wilkerson-Aiken winnowing over the documents fixture:
    # word-5gram md5 hashes, window-4 rightmost-minimum selection —
    # the guaranteed-recall substring-level fingerprint family
    # (shares ≥ w+k−1 words ⇒ shares ≥ 1 fingerprint)
    return DD.winnowing_fingerprints(
        load_table(spark, sf, "documents"), k=5, w=4
    )


# -- X196: PMI top collocations ----------------------------------------------


def _q_pmi_pairs(spark, sf):
    # Church-Hanks adjacent-word PMI with a min-count floor: one token
    # explode feeds both count tables, totals broadcast, TakeOrdered
    return TX.pmi_top_pairs(
        load_table(spark, sf, "documents"), min_count=5, topk=50
    )


# -- X195: Gopher repeated-n-gram character fractions ------------------------


def _q_repeated_ngrams(spark, sf):
    # the remaining Gopher Table-A1 repetition metrics: top-{2,3,4}-gram
    # and duplicated-{5..10}-gram character fractions — per-document
    # stats, so one map-only in-row sort+fold pass (zero shuffles)
    return TX.repeated_ngram_fractions(load_table(spark, sf, "documents"))


# -- X194: winnowing substring-overlap pair join -----------------------------


def _q_winnowing_overlap(spark, sf):
    # the MOSS pair generator over the documents fixture: docs sharing
    # >= 2 distinct winnowing fingerprints (df-capped posting lists,
    # fingerprint-keyed equi-join — never all-pairs)
    return DD.winnowing_overlap_join(
        load_table(spark, sf, "documents"), k=5, w=4, min_shared=2, max_df=50
    )


# -- X185: URL canonicalization + provenance-level dedup ---------------------


def _q_url_dedup(spark, sf):
    # synthetic crawl URLs with planted variant noise by doc_id modulo:
    # %5==1 utm/gclid tracking params, %5==2 fragment, %5==3 uppercase
    # host + default port + trailing slash, %5==4 root page (no path)
    # with the default port directly before the query plus UPPERCASE
    # tracker params riding a real one (the two variant classes the r8
    # canonicalizer missed: ':443?' kept the port, 'UTM_*' survived).
    # site/path repeat with period 100, so every canonical URL collects
    # the variant spellings — the C4-style same-page collapse the
    # canonicalizer exists for.
    docs = load_table(spark, sf, "documents")
    d = F.col("doc_id")
    base = F.concat(
        F.lit("https://"),
        F.when(d % 5 == 3, F.lit("WWW.Site")).otherwise(F.lit("www.site")),
        (d % 50).cast("string"),
        F.lit(".example.com"),
        F.when((d % 5 == 3) | (d % 5 == 4), F.lit(":443")).otherwise(F.lit("")),
        F.when(d % 5 == 4, F.lit("")).otherwise(
            F.concat(F.lit("/path/"), (d % 20).cast("string"))
        ),
        F.when(d % 5 == 1, F.lit("?utm_source=feed&utm_campaign=x&gclid=abc")).otherwise(
            F.when(d % 5 == 2, F.lit("#section-2")).otherwise(
                F.when(d % 5 == 3, F.lit("/")).otherwise(
                    F.when(
                        d % 5 == 4,
                        F.concat(
                            F.lit("?page="),
                            (d % 20).cast("string"),
                            F.lit("&UTM_Source=news&FBCLID=zz9"),
                        ),
                    ).otherwise(F.lit(""))
                )
            )
        ),
    )
    urls = docs.select("doc_id", base.alias("url"))
    return TX.url_dedup(urls)


# -- X182: trained char-n-gram language ID (NB fit -> argmax score) ----------

# per-language marker stopwords planted into the fixture (the synthetic
# corpus shares one vocabulary across lang labels, so the learnable
# signal is planted the same way _clf_fixture plants its quality
# signal). Real multilingual function words — the features a char-3gram
# model actually keys on in production language ID.
_LANGID_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "nicht", "das", "ich", "sie", "mit", "ein"],
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "es": ["el", "y", "los", "una", "que", "para", "con", "las"],
    "fr": ["le", "et", "les", "des", "une", "dans", "est", "pour"],
    "zh": ["的", "是", "不", "我", "了", "人", "在", "有"],
}
_LANGID_K = 6  # markers appended per document


def _langid_fixture(spark, sf):
    # labeled multilingual fixture: append _LANGID_K md5-selected
    # marker words of the doc's labeled language; md5 train coin.
    # Both choices are md5-replayable, so the whole fit->score
    # composition stays oracle-checkable.
    # spread BEFORE the md5 marker chain: every langid query pins this
    # frame, and a single-split scan would materialize the whole
    # CASE-chain fixture on one core (md5 outputs are per-row
    # deterministic — spread cannot move a bit; no-op at scale)
    from safedata_pipeline_spark.partitioning import spread_small

    docs = spread_small(load_table(spark, sf, "documents"))

    def mdint(tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag + "|"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")

    # marker selection off a 2-D array LITERAL (one py4j lit instead of
    # a 5-branch CASE over 8-lit arrays per marker slot): same word for
    # every (lang, pos) — row = markers[lang], word = row[pos-1]; an
    # unknown/NULL lang yields NULL exactly like the old un-defaulted
    # CASE chain. Cuts the fixture's plan-build time (~1s warm, more
    # cold) for every langid query that pins this frame.
    langs = sorted(_LANGID_MARKERS)
    M = F.lit([_LANGID_MARKERS[lang] for lang in langs])
    lrow = F.get(M, (F.array_position(F.lit(langs), F.col("lang")) - 1).cast("int"))
    marker_cols = []
    for j in range(_LANGID_K):
        pos = (mdint(f"lid{j}") % 8).cast("int") + 1
        marker_cols.append(F.get(lrow, pos - 1))
    return docs.select(
        "doc_id",
        "lang",
        F.concat_ws(" ", F.col("text"), *marker_cols).alias("text"),
        (mdint("lidtrain") % 2 == 0).alias("is_train"),
    )


def _q_lang_id_trained(spark, sf):
    # trained language ID (fastText/Cavnar-Trenkle lineage): char-3gram
    # multinomial NB fit on the md5-train half of the planted fixture,
    # argmax score applied to EVERY doc via a broadcast model join.
    # Fully deterministic (add-one smoothing, 6dp log-probs, exact
    # DECIMAL sums) -> oracle-backed despite being a trained model;
    # held-out accuracy is additionally stat-gated per round.
    from safedata_pipeline_spark.checkpoint import pin_lazy
    from safedata_pipeline_spark.operators import langid as LI

    # pin the labeled fixture once: FOUR consumers scan it (fit, gram
    # explode, per-doc gram totals, the truth join-back), and each
    # re-scan would recompute + re-codegen the md5 marker CASE chains
    # (measured ~1s of Janino per consumer cold). The fixture is the
    # LABELED-corpus role — small by the langid contract — so the pin
    # is O(labeled sample), not O(corpus)
    fixed = _langid_fixture(spark, sf).transform(pin_lazy)
    # the model is a few-thousand-row table consumed twice inside
    # langid_score (per-gram rows + per-lang floors) — pin it so the
    # fit's corpus scan runs once, not once per consumer
    model = LI.langid_fit(fixed.where("is_train")).transform(pin_lazy)
    return (
        LI.langid_score(fixed, model)
        .join(
            fixed.select(
                "doc_id", F.col("lang").alias("lang_true"), "is_train"
            ),
            "doc_id",
        )
        .select("doc_id", "lang_true", "is_train", "lang_pred", "score")
    )


# -- X197: language-ID prediction margin (code-switching flag) ---------------


def _q_lang_id_margin(spark, sf):
    # top-vs-runner-up score gap per doc — the confidence threshold
    # production lang-ID applies; exact DECIMAL difference, same
    # fixture and model as lang_id_trained
    from safedata_pipeline_spark.checkpoint import pin_lazy
    from safedata_pipeline_spark.operators import langid as LI

    # same fixture pin as lang_id_trained: one materialization feeds
    # the fit + both grid scans instead of three md5-chain recomputes
    fixed = _langid_fixture(spark, sf).transform(pin_lazy)
    model = LI.langid_fit(fixed.where("is_train")).transform(pin_lazy)
    return LI.langid_margin(fixed, model)


_SEG_LANGS = sorted(_LANGID_MARKERS)  # de en es fr zh (ascending tiebreak order)
_SEG_K = 6  # marker words per paragraph
_SEG_MAXP = 4  # paragraph slots; doc keeps 2 + doc_id % 3 of them


def _langid_segments_fixture(spark, sf):
    # code-switching fixture: each document becomes 2-4 paragraphs
    # ("\n\n"-joined), paragraph j written in an md5-chosen language
    # (so consecutive same-language runs arise naturally) as _SEG_K
    # md5-selected marker words of that language — every choice
    # md5-replayable, the _langid_fixture discipline.
    # spread first: the per-paragraph md5 selection chain is the
    # fixture's heavy map work (same rationale as _langid_fixture)
    from safedata_pipeline_spark.partitioning import spread_small

    docs = spread_small(load_table(spark, sf, "documents"))

    def mdint(tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag + "|"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")

    # same 2-D marker literal trick as _langid_fixture: word =
    # markers[lidx][pos-1] — identical selection, ~40x fewer literal
    # nodes in the fixture plan
    M = F.lit([_LANGID_MARKERS[lang] for lang in _SEG_LANGS])
    paras = []
    for j in range(_SEG_MAXP):
        lidx = (mdint(f"segl{j}") % len(_SEG_LANGS)).cast("int")
        lrow = F.get(M, lidx)
        words = []
        for k in range(_SEG_K):
            pos = (mdint(f"segw{j}_{k}") % 8).cast("int") + 1
            words.append(F.get(lrow, pos - 1))
        paras.append(F.concat_ws(" ", *words))
    n_paras = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    text = F.array_join(F.slice(F.array(*paras), 1, n_paras), "\n\n")
    return docs.select("doc_id", text.alias("text"))


def _q_langid_segments(spark, sf):
    # X241: per-paragraph language ID over the X182 trained model,
    # consecutive same-language paragraphs merged into spans — the
    # code-switch localization step run after whole-doc lang ID flags
    # a low-margin document. Same exact-DECIMAL scoring channel as
    # lang_id_trained, so every span boundary is hash-checkable.
    from safedata_pipeline_spark.checkpoint import pin_lazy
    from safedata_pipeline_spark.operators import langid as LI

    fixed = _langid_fixture(spark, sf).transform(pin_lazy)
    model = LI.langid_fit(fixed.where("is_train")).transform(pin_lazy)
    # pin the segments fixture (fixture-scale, the lang_id_trained
    # discipline): _scored_grid reads its input twice (gram explode +
    # per-unit gram totals), and each re-scan would recompute the
    # per-paragraph md5 selection chain
    seg_fx = _langid_segments_fixture(spark, sf).transform(pin_lazy)
    return LI.langid_segments(seg_fx, model)


# -- X198/X199: compressibility quality signals -------------------------------


def _q_compression_entropy(spark, sf):
    # order-0 byte entropy + the ideal compressed fraction it implies
    # (Shannon bound) per document — the hash-checkable face of the
    # DataComp-LM/Dolma compressibility screen; exact-integer counts,
    # 6dp-ln DECIMAL sums, floor-snapped finish
    return CMP.compression_entropy(load_table(spark, sf, "documents"))


def _q_zlib_ratio(spark, sf):
    # the REAL deflate ratio (stdlib zlib level 6) — the repetition
    # detector the entropy bound can't be (LZ77 window vs order-0
    # alphabet skew). Deterministic per zlib build but not
    # SQL-reproducible -> rows-only; pinned by determinism/monotone
    # tests and the zlib-vs-entropy correlation stat gate.
    return CMP.zlib_signal(load_table(spark, sf, "documents"))


# -- X202: hybrid search — reciprocal-rank fusion of lexical + vector legs ----


def _q_hybrid_search(spark, sf):
    # the standard RAG retrieval combiner (Cormack et al. RRF): exact
    # token-set-Jaccard top-20 (lexical leg) fused with exact cosine
    # top-20 (vector leg, ids shared between the documents and
    # embeddings fixtures) -> top-10 per query. DECIMAL(20,9)
    # contribution sums make the fused ORDER engine-stable, so the
    # whole two-leg retrieval stack is hash-checked end to end.
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    lex = SIM.lexical_jaccard_topk(docs.where(F.col("doc_id") < 10), docs, k=20)
    vec = SIM.cosine_topk(emb.where(F.col("vec_id") < 10), emb, k=20).select(
        "query_id", "rank", F.col("neighbor_id").alias("item_id")
    )
    return SIM.rrf_fuse(
        [
            lex.select("query_id", "item_id", "rank"),
            vec.select("query_id", "item_id", "rank"),
        ],
        k_rrf=60,
        top_n=10,
    )


# -- X31 (promoted r9): salted skew join, oracle channel -----------------------


def _q_salted_segment_revenue(spark, sf):
    # the extreme-skew join path in the hash-checked channel: the salt
    # is a partitioning artifact (row set identical to the plain join,
    # which is exactly what the oracle computes), so revenue per market
    # segment through the salted path must hash-match a plain SQL join.
    # DECIMAL sums keep the aggregate partition-order independent.
    orders = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = JN.salted_join(orders, cust, key="c_custkey", salt=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,4)")).cast("double"), 2
        ).alias("revenue"),
    )


# -- X206: per-document contamination coverage --------------------------------


def _q_contamination_fraction(spark, sf):
    # the graded per-doc signal behind the binary decontaminate drop:
    # what fraction of each doc's distinct 3-grams sits in the probe set
    return TX.contamination_fraction(
        load_table(spark, sf, "documents"), CONTAMINATION_PROBES, n=3
    )


# -- X205: deterministic stratified split --------------------------------------


def _q_stratified_split(spark, sf):
    # exact per-class (source) 80/20 quotas under the md5 rank order —
    # the class-balanced eval carve randomSplit can only approximate
    return SMP.stratified_split(
        load_table(spark, sf, "documents").select("doc_id", "source"),
        label_col="source",
        train_pct=80,
    )


# -- X204: two-table fuzzy record linkage (Ed-Join across tables) -------------


def _q_record_linkage(spark, sf):
    # entity resolution across a clean roster and a dirty one: per
    # customer an md5-derived 16-char identity token (near-unique
    # strings — the regime record linkage actually runs in; sequential
    # c_name-style IDs are the documented adversarial case where ANY
    # gram scheme degenerates) vs a roster where every third token has
    # one md5-positioned character DELETED (the fat-finger). The engine
    # runs the shared-global-prefix Ed-Join; the ORACLE brute-forces
    # the full cross join with levenshtein — the hash match therefore
    # certifies the prefix filter's COMPLETENESS (no missed pair), not
    # just value agreement.
    cust = load_table(spark, sf, "customer")
    tok = F.substring(
        F.md5(F.concat(F.lit("id|"), F.col("c_custkey").cast("string")).cast("binary")),
        1,
        16,
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("rl|"), F.col("c_custkey").cast("string")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    pos = (h % F.lit(16)).cast("int")  # 0-based deletion index
    variant = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(F.substr(tok, F.lit(1), pos), F.substr(tok, pos + F.lit(2), F.lit(16))),
    ).otherwise(tok)
    left = cust.select(tok.alias("id_token"))
    right = cust.select(variant.alias("v_token"))
    # q=4 on the 16-hex-char alphabet: 65k possible 4-grams vs 256
    # bigrams — gram selectivity is what bounds candidates (measured
    # 84s -> 4s at sf0.1 going q=2 -> q=4 on this fixture)
    return FZ.edit_distance_join(left, right, "id_token", "v_token", max_dist=1, q=4)


# -- X201: md5-register HLL — approximate distinct in the ORACLE channel ------


def _q_hll_daily_users(spark, sf):
    # daily distinct-user ESTIMATE built the mergeable way: hourly md5
    # register partials -> max() merge to day -> harmonic finish. The
    # oracle computes the DAY-DIRECT registers from raw rows, so the
    # hash match certifies determinism AND merge(partials) == direct
    # in one row set — an approximate operator in the exact channel
    # (Datasketches hll_user_rollup stays the rows-only industrial twin).
    ev = load_table(spark, sf, "events")
    tagged = ev.select(
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day_start"),
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_start"),
        "user_id",
    )
    hourly = SK.hll_md5_registers(tagged, "user_id", ["day_start", "hour_start"])
    daily = hourly.groupBy("day_start", "bucket").agg(F.max("r").alias("r"))
    return SK.hll_md5_estimate(daily, ["day_start"])


# -- X168: BPE-unit token counts (merge-rank application) --------------------


def _q_bpe_token_count(spark, sf):
    # real BPE semantics as the packing/count unit: apply the fitted
    # merge rules in training order (expression-fold, map-only) and
    # count pieces per doc. bpe_fit's iterative argmax makes the
    # composition rows-only; exact-equality property tests vs the
    # sequential reference pin both the fit and the segmentation
    # (tests/test_bpe.py).
    from safedata_pipeline_spark.operators import bpe as BPE

    docs = load_table(spark, sf, "documents")
    rules = [
        (r["left"], r["right"])
        for r in sorted(
            BPE.bpe_fit(docs, num_merges=10).collect(), key=lambda r: r["step"]
        )
    ]
    return BPE.bpe_token_count(docs, rules)


# -- X214-X219: round-12 additions -------------------------------------------


def _q_audio_fingerprint64(spark, sf):
    # X214a: the two-word fingerprint CONSTRUCTION itself, one row per
    # clip — the strong hash check behind pairs64 (whose pair output
    # is legitimately EMPTY at fixture scale: 64-bit resolution is
    # fine enough that the fixture's edited near-dup texts sit at
    # Hamming >= 14; the 32-bit form's single sf0.01 pair was a
    # coarse-resolution chance collision, which is exactly the
    # saturation X214 exists to fix)
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.to_media_table(docs, "doc_id", "payload", "audio/pcm")
    return MM.audio_energy_fingerprint64(media, frames=64)


def _q_audio_fingerprint_pairs64(spark, sf):
    # X214: the TWO-WORD (64-bit) energy fingerprint — the corpus-size
    # scale dial of X213 (32-bit saturates around 10^4-10^5 clips) —
    # with dhash_pairs' 4x16-bit banding as the pair generator; the
    # oracle replays fingerprint AND banding from the original bytes
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.to_media_table(docs, "doc_id", "payload", "audio/pcm")
    return MM.dhash_pairs(
        MM.audio_energy_fingerprint64(media, frames=64).select(
            "media_id", "w0", "w1"
        ),
        max_hamming=3,
    )


def _q_bm25_rerank_cosine(spark, sf):
    # X215: two-stage retrieval — BM25 top-20 recall, exact-cosine
    # re-rank to top-5 (the production retrieve-then-re-rank stack);
    # both stages in the hash channel
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    cand = SIM.bm25_topk(docs.where(F.col("doc_id") < 8), docs, k=20)
    return SIM.rerank_by_cosine(cand.select("query_id", "item_id"), emb, k=5)


def _q_nation_profit(spark, sf):
    """TPC-H Q9 shape (adapted: the slim fixture has no partsupp, so
    p_retailprice·quantity/10 plays the supply cost): product-line
    profit by supplier nation and order year — the 5-table snowflake
    join (lineitem⋈part⋈supplier⋈nation + orders for the year) with
    filter pushdown into the part scan, broadcast dims, and one
    grouped DECIMAL aggregate."""
    part = load_table(spark, sf, "part").where(
        F.col("p_name").contains("gear")
    )
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") / 10.0
    ).cast("decimal(38,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"))
    )


def _q_important_parts(spark, sf):
    """TPC-H Q11 shape (adapted partsupp→lineitem): parts whose
    revenue share exceeds 0.002 of total — grouped DECIMAL revenue +
    the global-total scalar via a broadcast 1-row aggregate (the
    HAVING-scalar-subquery form), then a broadcast join back to part
    for names. Shape point: the threshold never leaves the engine."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("__val")
    )
    # scale-free threshold: 1.5x the AVERAGE per-part revenue (a
    # fixed share-of-total would shrink per part as the part table
    # grows with sf and select nothing at larger scales)
    tot = rev.agg(
        F.sum("__val").alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    return (
        rev.crossJoin(F.broadcast(tot))
        .where(
            F.col("__val").cast("double")
            > F.lit(1.5) * F.col("__tot").cast("double") / F.col("__n")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.round(F.col("__val").cast("double"), 2).alias("part_value"),
        )
    )


def _q_supplier_part_counts(spark, sf):
    """TPC-H Q16 shape (adapted: negative account balance plays the
    complaints filter): distinct-supplier counts per (brand, type,
    size) over lineitem⋈part, EXCLUDING excluded-brand parts and
    bad suppliers — the NOT-IN subquery as a broadcast anti-join
    ahead of the count-distinct aggregation."""
    part = load_table(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size") <= 20)
    )
    li = load_table(spark, sf, "lineitem")
    bad = load_table(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


def _q_excess_shipments(spark, sf):
    """TPC-H Q20 shape (adapted): suppliers in region 0 who shipped
    more than 50 units of SMALL-type parts during 1996 — the nested
    semi-join chain (part filter → per-supplier shipped-quantity
    aggregate → threshold → supplier⋈nation region filter), surfacing
    the aggregate that justified selection."""
    part = load_table(spark, sf, "part").where(F.col("p_type") == "SMALL")
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("__q"))
        .where(F.col("__q").cast("double") > 50.0)
    )
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation").where(F.col("n_regionkey") == 0)
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qty, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("__q").cast("double"), 2).alias("shipped_qty"),
        )
    )


def _q_min_cost_supplier(spark, sf):
    """TPC-H Q2 shape (adapted: no partsupp, so min(l_extendedprice)
    per (part, supplier) plays the supply-cost offer) — the last of
    the 22 TPC-H query shapes: for small parts (p_size <= 5), the
    region-1 supplier(s) offering the per-part MINIMUM cost. The
    correlated MIN scalar subquery becomes a grouped per-part min
    joined back on (partkey, cost) equality — exact because min over
    doubles involves no arithmetic; ties (co-minimal suppliers) all
    surface, as in Q2. Dims broadcast; the only wide shuffles are the
    two grouped aggregates on (part, supplier) and (part)."""
    part = load_table(spark, sf, "part").where(F.col("p_size") <= 5).select(
        "p_partkey", "p_name"
    )
    sup = (
        load_table(spark, sf, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf, "nation").where(F.col("n_regionkey") == 1)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        load_table(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("__cost"))
    )
    part_min = cost.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("__cost").alias("__mc")
    )
    return (
        cost.join(
            part_min,
            (F.col("p_partkey") == F.col("__pk")) & (F.col("__cost") == F.col("__mc")),
        )
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.round("__cost", 2).alias("min_cost"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Round-15 window rotation (the driver hash-checks the FIRST 50
    # entries; 14 consecutive all-green rounds — the window is policy:
    # anchors + touched + stalest-green refresh):
    # (1) the 15 standing anchors (text_profile, basic_stats, ks_drift
    #     and dedup_best double as r15-touched re-verification: the
    #     min-shingle fold, the table-handle memo and the
    #     ngram_jaccard_pairs hot-set change sit under them);
    # (2) the FOURTEEN r14-rewritten kernels the r14 window FROZE OUT
    #     (VERDICT r14 "what's wrong" #1 — the driver has never hashed
    #     them on the joint-fit / literal-kernel / spread+pin-fusion
    #     code): the PQ scale family pq_codes / pq_reconstruction_error
    #     / ann_topk_pq_adc / ann_topk_ivf_pq (X254-X257, further
    #     rewritten this round: joint coarse+PQ fit, shared encode
    #     kernel, _dlit literals), langid_confusion (X253, now scoring
    #     only the held-out half), the label-propagation pair
    #     (dedup_components / dedup_components_star), the signature
    #     family (minhash_lsh / simhash / simhash_pairs /
    #     winnowing_overlap / paragraph_dedup), kmeans_embeddings and
    #     cluster_size_histogram;
    # (3) the FOURTEEN queries round 15 touched beyond (1)/(2):
    #     gopher_ngram_repetition / quality_signals / repeated_ngrams /
    #     compression_entropy / scored_documents (in-row per-document
    #     rewrites — explode+shuffle chains became map-only sort+fold
    #     projections; scored_documents rides text_profile's min-fold),
    #     prototype_prune / semantic_dedup /
    #     ann_cosine_topk_ivf_exactcells (the _dlit literal kernels),
    #     jaccard_prefix_join / containment_join (pinned ranked/sset
    #     subtrees), substring_dedup_chars (128-bit xxhash window
    #     keys), and the ngram_jaccard_pairs consumers
    #     dup_graph_pagerank / leakage_free_split /
    #     cross_source_dup_matrix (lazy hot-set);
    # (4) 7 refresh slots for the STALEST driver greens — the r7
    #     vintage head of the refresh line the r14 rotation queued
    #     (auc_daily, audio_frame_features, benford_prices,
    #     calibration_bins, cdc_chunks, corpus_overlap,
    #     count_min_words); cusum_hourly onward and the r8 vintage
    #     head the r16 line.
    # Displaced out: the r14-new cohort (all driver-green in
    # CORRECTNESS_r14) and the r14 re-verification/refresh blocks —
    # every displaced row keeps the local full-sweep hash check via
    # tools/check_oracle.py every round. Out-of-window order preserves
    # the prior dict order (stable keys for BENCH_r* comparability).
    return {
        # -- (1) anchors ---------------------------------------------------
        "basic_stats": _q_basic_stats,
        "ks_drift": _q_ks_drift,
        "distribution_drift": _q_distribution_drift,
        "knn_linkage_join": _q_knn_linkage_join,
        "dedup_best": _q_dedup_best,
        "embedding_cosine_dedup": _q_embedding_cosine_dedup,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "asof_last_click": _q_asof_last_click,
        "hypertable_rollup": _q_hypertable_rollup,
        "incremental_profile": _q_incremental_profile,
        "latest_events": _q_latest_events,
        "pii_redact": _q_pii_redact,
        "text_profile": _q_text_profile,
        "decontaminate": _q_decontaminate,
        "pack_windows": _q_pack_windows,
        # -- (2) r14-rewritten kernels: first driver hash on the new code --
        "pq_codes": _q_pq_codes,
        "pq_reconstruction_error": _q_pq_reconstruction_error,
        "ann_topk_pq_adc": _q_ann_topk_pq_adc,
        "ann_topk_ivf_pq": _q_ann_topk_ivf_pq,
        "langid_confusion": _q_langid_confusion,
        "dedup_components": _q_dedup_components,
        "dedup_components_star": _q_dedup_components_star,
        "minhash_lsh": _q_minhash_lsh,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "winnowing_overlap": _q_winnowing_overlap,
        "paragraph_dedup": _q_paragraph_dedup,
        "kmeans_embeddings": _q_kmeans_embeddings,
        "cluster_size_histogram": _q_cluster_size_histogram,
        # -- (3) r15-touched ------------------------------------------------
        "gopher_ngram_repetition": _q_gopher_ngram_repetition,
        "quality_signals": _q_quality_signals,
        "repeated_ngrams": _q_repeated_ngrams,
        "compression_entropy": _q_compression_entropy,
        "scored_documents": _q_scored_documents,
        "prototype_prune": _q_prototype_prune,
        "semantic_dedup": _q_semantic_dedup,
        "ann_cosine_topk_ivf_exactcells": _q_ann_cosine_topk_ivf_exactcells,
        "jaccard_prefix_join": _q_jaccard_prefix_join,
        "containment_join": _q_containment_join,
        "substring_dedup_chars": _q_substring_dedup_chars,
        "dup_graph_pagerank": _q_dup_graph_pagerank,
        "leakage_free_split": _q_leakage_free_split,
        "cross_source_dup_matrix": _q_cross_source_dup_matrix,
        # -- (4) stalest-green refresh (r7 vintage) -------------------------
        "auc_daily": _q_auc_daily,
        "audio_frame_features": _q_audio_frame_features,
        "benford_prices": _q_benford_prices,
        "calibration_bins": _q_calibration_bins,
        "cdc_chunks": _q_cdc_chunks,
        "corpus_overlap": _q_corpus_overlap,
        "count_min_words": _q_count_min_words,
        # -- out of window: local full-sweep hash check every round ---------
        "boilerplate_lines": _q_boilerplate_lines,
        "char_entropy": _q_char_entropy,
        "refinedweb_line_correct": _q_refinedweb_line_correct,
        "ngram_novelty": _q_ngram_novelty,
        "dsir_logweights": _q_dsir_logweights,
        "ngram_novelty_vs_ref": _q_ngram_novelty_vs_ref,
        "mmr_rerank": _q_mmr_rerank,
        "decontaminate_fuzzy": _q_decontaminate_fuzzy,
        "langid_segments": _q_langid_segments,
        "doremi_weights": _q_doremi_weights,
        "margin_bitext_mine": _q_margin_bitext_mine,
        "min_k_prob": _q_min_k_prob,
        "unimax_mixture": _q_unimax_mixture,
        "filter_funnel": _q_filter_funnel,
        "hard_negative_mine": _q_hard_negative_mine,
        "matryoshka_error": _q_matryoshka_error,
        "token_budget_select": _q_token_budget_select,
        "knn_label_consistency": _q_knn_label_consistency,
        "lang_id_trained": _q_lang_id_trained,
        "lang_id_margin": _q_lang_id_margin,
        "jpeg_pixel_stats": _q_jpeg_pixel_stats,
        "image_pixel_stats": _q_image_pixel_stats,
        "multimodal_features": _q_multimodal_features,
        "c4_line_filter": _q_c4_line_filter,
        "ccnet_perplexity_buckets": _q_ccnet_perplexity_buckets,
        "temperature_mix": _q_temperature_mix,
        "embedding_gram": _q_embedding_gram,
        "embedding_drift": _q_embedding_drift,
        "fold_assign": _q_fold_assign,
        "dedup_rate_by_source": _q_dedup_rate_by_source,
        "nation_trade": _q_nation_trade,
        "priority_late_orders": _q_priority_late_orders,
        "sole_late_supplier": _q_sole_late_supplier,
        "cusum_hourly": _q_cusum_hourly,
        "dedup_incremental_near": _q_dedup_incremental_near,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "domain_stats": _q_domain_stats,
        "dup_graph_pagerank_weighted": _q_dup_graph_pagerank_weighted,
        "event_transitions": _q_event_transitions,
        "extract_text": _q_extract_text,
        "group_scale": _q_group_scale,
        "snm_pairs": _q_snm_pairs,
        "mutual_information": _q_mutual_information,
        "enforce_k_anonymity": _q_enforce_k_anonymity,
        "iqr_outliers": _q_iqr_outliers,
        "completeness_timeline": _q_completeness_timeline,
        "incremental_percentiles": _q_incremental_percentiles,
        "vocab_top": _q_vocab_top,
        "oov_rate": _q_oov_rate,
        "cohort_retention": _q_cohort_retention,
        "user_growth": _q_user_growth,
        "trending_hourly": _q_trending_hourly,
        "hourly_value_bands": _q_hourly_value_bands,
        "drift_timeline_psi": _q_drift_timeline_psi,
        "rolling_user_stats": _q_rolling_user_stats,
        "rolling_anomalies": _q_rolling_anomalies,
        "l_diversity": _q_l_diversity,
        "regional_volume": _q_regional_volume,
        "column_entropy": _q_column_entropy,
        "large_orders": _q_large_orders,
        "weighted_sample": _q_weighted_sample,
        "quantile_rank": _q_quantile_rank,
        "group_quantiles": _q_group_quantiles,
        "rules_by_source": _q_rules_by_source,
        "orphan_orders": _q_orphan_orders,
        "chunk_documents": _q_chunk_documents,
        "audio_fingerprint64": _q_audio_fingerprint64,
        "audio_fingerprint_pairs64": _q_audio_fingerprint_pairs64,
        "bm25_rerank_cosine": _q_bm25_rerank_cosine,
        "nation_profit": _q_nation_profit,
        "important_parts": _q_important_parts,
        "supplier_part_counts": _q_supplier_part_counts,
        "excess_shipments": _q_excess_shipments,
        "min_cost_supplier": _q_min_cost_supplier,
        "ngram_diversity": _q_ngram_diversity,
        "kn_logprob": _q_kn_logprob,
        "bootstrap_ci": _q_bootstrap_ci,
        "bigram_logprob": _q_bigram_logprob,
        "bm25_search": _q_bm25_search,
        "hybrid_search_trio": _q_hybrid_search_trio,
        "hybrid_search": _q_hybrid_search,
        "image_dhash_pairs": _q_image_dhash_pairs,
        "audio_fingerprint_pairs": _q_audio_fingerprint_pairs,
        "robust_stats": _q_robust_stats,
        "chi2_drift": _q_chi2_drift,
        "minhash_signatures": _q_minhash_signatures,
        "quality_rules": _q_quality_rules,
        "jsd_drift": _q_jsd_drift,
        "winsorize": _q_winsorize,
        "user_value_trend": _q_user_value_trend,
        "orders_join_audit": _q_orders_join_audit,
        "returned_revenue": _q_returned_revenue,
        "substring_dedup": _q_substring_dedup,
        "dedup_incremental": _q_dedup_incremental,
        "pca_project": _q_pca_project,
        "ann_cosine_topk_pca": _q_ann_cosine_topk_pca,
        "ann_cosine_topk_lsh_exactbuckets": _q_ann_cosine_topk_lsh_exactbuckets,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "ngram_jaccard": _q_ngram_jaccard,
        "top_freq": _q_top_freq,
        "linkage_risk_score": _q_linkage_risk_score,
        "embedding_centroids": _q_embedding_centroids,
        "one_hot": _q_one_hot,
        "unigram_logprob": _q_unigram_logprob,
        "standard_scale": _q_standard_scale,
        "split_leakage": _q_split_leakage,
        "drift_timeline": _q_drift_timeline,
        "t_closeness": _q_t_closeness,
        "repetition_stats": _q_repetition_stats,
        "table_diff": _q_table_diff,
        "impute": _q_impute,
        "session_funnel": _q_session_funnel,
        "hourly_retention": _q_hourly_retention,
        "psi_drift": _q_psi_drift,
        "record_linkage": _q_record_linkage,
        "stratified_split": _q_stratified_split,
        "contamination_fraction": _q_contamination_fraction,
        "salted_segment_revenue": _q_salted_segment_revenue,
        "row_count": _q_row_count,
        "limit_preview": _q_limit_preview,
        "project_quasi_ids": _q_project_quasi_ids,
        "null_profile": _q_null_profile,
        "distinct_count": _q_distinct_count,
        "numeric_profile": _q_numeric_profile,
        "value_counts": _q_value_counts,
        "sdc_suppress": _q_sdc_suppress,
        "generalize_numeric": _q_generalize_numeric,
        "smart_suggest": _q_smart_suggest,
        "correlation_matrix": _q_correlation_matrix,
        "checklist_score": _q_checklist_score,
        "k_anonymity": _q_k_anonymity,
        "corpus_stats": _q_corpus_stats,
        "card_luhn_scan": _q_card_luhn_scan,
        "customer_order_histogram": _q_customer_order_histogram,
        "top_supplier": _q_top_supplier,
        "small_qty_revenue": _q_small_qty_revenue,
        "priority_lines": _q_priority_lines,
        "bloom_prefilter": _q_bloom_prefilter,
        "pmi_pairs": _q_pmi_pairs,
        "url_dedup": _q_url_dedup,
        "gopher_quality": _q_gopher_quality,
        "user_sessions": _q_user_sessions,
        "session_concurrency": _q_session_concurrency,
        "events_hourly": _q_events_hourly,
        "events_json": _q_events_json,
        "multimodal_meta": _q_multimodal_meta,
        "kmv_distinct": _q_kmv_distinct,
        "range_join_tiers": _q_range_join_tiers,
        "quality_score": _q_quality_score,
        "dedup_exact": _q_dedup_exact,
        "pricing_summary": _q_pricing_summary,
        "pii_scan": _q_pii_scan,
        "quality_filter": _q_quality_filter,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "pack_sequences": _q_pack_sequences,
        "contamination_scan": _q_contamination_scan,
        "hll_daily_users": _q_hll_daily_users,
        "length_matched_sample": _q_length_matched_sample,
        "conversion_attribution": _q_conversion_attribution,
        "secrets_scan": _q_secrets_scan,
        "forecast_revenue": _q_forecast_revenue,
        "quality_deciles": _q_quality_deciles,
        "top_ngrams": _q_top_ngrams,
        "normalize_text": _q_normalize_text,
        "length_histogram": _q_length_histogram,
        "skew_report": _q_skew_report,
        "contamination_ngram": _q_contamination_ngram,
        "contamination_scan_many": _q_contamination_scan_many,
        "kmv_distinct_prefilter": _q_kmv_distinct_prefilter,
        "minhash_threshold_curve": _q_minhash_threshold_curve,
        "source_mixture_sample": _q_source_mixture_sample,
        "quantize_embeddings": _q_quantize_embeddings,
        "quantization_error": _q_quantization_error,
        "shipping_priority": _q_shipping_priority,
        "source_lang_pivot": _q_source_lang_pivot,
        "take_per_source": _q_take_per_source,
        "corpus_cube": _q_corpus_cube,
        "events_sliding": _q_events_sliding,
        "events_hourly_users": _q_events_hourly_users,
        "source_share": _q_source_share,
        "k_anonymity_violations": _q_k_anonymity_violations,
        "pack_stats": _q_pack_stats,
        "encode_tokens": _q_encode_tokens,
        "token_count_vocab": _q_token_count_vocab,
        "winnowing": _q_winnowing,
        "alpha_mixture": _q_alpha_mixture,
        "heavy_hitter_words": _q_heavy_hitter_words,
        "value_auc": _q_value_auc,
        "roc_points": _q_roc_points,
        "readability": _q_readability,
        "weighted_quantiles": _q_weighted_quantiles,
        "market_share": _q_market_share,
        "promo_revenue": _q_promo_revenue,
        "idle_rich_customers": _q_idle_rich_customers,
        "shipment_month_overlap": _q_shipment_month_overlap,
        "ks_drift_binned": _q_ks_drift_binned,
        "zipf_profile": _q_zipf_profile,
        "bpe_merges": _q_bpe_merges,
        "dp_noise": _q_dp_noise,
        "synthetic_sample": _q_synthetic_sample,
        "model_utility": _q_model_utility,
        "ann_cosine_topk_lsh": _q_ann_cosine_topk_lsh,
        "ann_cosine_topk_ivf": _q_ann_cosine_topk_ivf,
        "hll_user_rollup": _q_hll_user_rollup,
        "quality_classifier": _q_quality_classifier,
        "bpe_token_count": _q_bpe_token_count,
        "zlib_ratio": _q_zlib_ratio,
    }


def _sql_null_profile(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", CAST(sum(CAST({c} IS NULL AS INT)) AS BIGINT) AS n_missing, "
        f"round(sum(CAST({c} IS NULL AS INT)) * 100.0 / count(*), 2) AS missing_pct FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def _sql_distinct_count(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", CAST(count(DISTINCT {c}) AS BIGINT) AS n_unique FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def _sql_numeric_profile(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", round(avg({c}), 6) AS mean, round(stddev_samp({c}), 6) AS std, "
        f"round(CAST(min({c}) AS DOUBLE), 6) AS min_num, "
        f"round(quantile_cont({c}, 0.25), 6) AS p25, round(quantile_cont({c}, 0.5), 6) AS median, "
        f"round(quantile_cont({c}, 0.75), 6) AS p75, round(CAST(max({c}) AS DOUBLE), 6) AS max_num "
        f"FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def _sql_top_freq(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS top, CAST(count(*) AS BIGINT) AS freq "
        f"FROM {table} WHERE {c} IS NOT NULL GROUP BY {c} ORDER BY count(*) DESC, CAST({c} AS VARCHAR) ASC LIMIT 1"
        for c in cols
    ]
    return " UNION ALL ".join(f"({p})" for p in parts)


def _sql_basic_stats(table: str, schema: list[tuple[str, str]]) -> str:
    parts = []
    for c, dt in schema:
        num = dt in NUMERIC_DTYPES
        ts = dt == "timestamp"
        s = dt == "string"
        mean = f"round(avg({c}), 6)" if num else "CAST(NULL AS DOUBLE)"
        std = f"round(stddev_samp({c}), 6)" if num else "CAST(NULL AS DOUBLE)"
        mn = f"round(CAST(min({c}) AS DOUBLE), 6)" if num else "CAST(NULL AS DOUBLE)"
        p25 = f"round(quantile_cont({c}, 0.25), 6)" if num else "CAST(NULL AS DOUBLE)"
        med = f"round(quantile_cont({c}, 0.5), 6)" if num else "CAST(NULL AS DOUBLE)"
        p75 = f"round(quantile_cont({c}, 0.75), 6)" if num else "CAST(NULL AS DOUBLE)"
        mx = f"round(CAST(max({c}) AS DOUBLE), 6)" if num else "CAST(NULL AS DOUBLE)"
        mints = f"min({c})" if ts else "CAST(NULL AS TIMESTAMP)"
        maxts = f"max({c})" if ts else "CAST(NULL AS TIMESTAMP)"
        top = (
            f"(SELECT CAST({c} AS VARCHAR) FROM {table} WHERE {c} IS NOT NULL GROUP BY {c} "
            f"ORDER BY count(*) DESC, CAST({c} AS VARCHAR) ASC LIMIT 1)"
            if s
            else "CAST(NULL AS VARCHAR)"
        )
        freq = (
            f"(SELECT CAST(count(*) AS BIGINT) FROM {table} WHERE {c} IS NOT NULL GROUP BY {c} "
            f"ORDER BY count(*) DESC, CAST({c} AS VARCHAR) ASC LIMIT 1)"
            if s
            else "CAST(NULL AS BIGINT)"
        )
        parts.append(
            f"SELECT '{c}' AS \"column\", '{dt}' AS dtype, count(*) AS count, "
            f"CAST(sum(CAST({c} IS NULL AS INT)) AS BIGINT) AS missing, "
            f"round(sum(CAST({c} IS NULL AS INT)) * 100.0 / count(*), 2) AS missing_pct, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS nunique, "
            f"{mean} AS mean, {std} AS std, {mn} AS min_num, {p25} AS p25, {med} AS median, "
            f"{p75} AS p75, {mx} AS max_num, {mints} AS min_ts, {maxts} AS max_ts, "
            f"{top} AS top, {freq} AS freq FROM {table}"
        )
    return " UNION ALL ".join(parts)


SQL_SKEWED_PRIORITY = (
    "SELECT o_orderkey, CASE WHEN o_orderkey % 997 = 0 "
    "THEN 'RARE-' || CAST(o_orderkey % 7 AS VARCHAR) ELSE o_orderpriority END AS priority "
    "FROM orders"
)


def _sql_sdc_suppress() -> str:
    return (
        f"WITH base AS ({SQL_SKEWED_PRIORITY}), "
        "cnt AS (SELECT priority AS v, count(*) AS c FROM base GROUP BY priority) "
        "SELECT b.o_orderkey, CASE WHEN cnt.c < 5 THEN 'OTHER' ELSE b.priority END AS priority "
        "FROM base b JOIN cnt ON b.priority IS NOT DISTINCT FROM cnt.v"
    )


def _sql_generalize_numeric(table: str, key: str, col: str, out: str, bins: int) -> str:
    probs = ", ".join(str(i / bins) for i in range(bins + 1))
    return (
        f"WITH e AS (SELECT DISTINCT ed AS edge FROM "
        f"(SELECT unnest(quantile_cont({col}, [{probs}])) AS ed FROM {table})), "
        f"b AS (SELECT edge AS lo, lead(edge) OVER (ORDER BY edge) AS hi, "
        f"row_number() OVER (ORDER BY edge) AS rn, count(*) OVER () AS m FROM e), "
        f"bins AS (SELECT lo, hi, printf('[%.2f, %.2f)', floor(lo * 100.0 + 0.5) / 100.0, "
        f"floor(hi * 100.0 + 0.5) / 100.0) AS label, rn = m - 1 AS is_last "
        f"FROM b WHERE hi IS NOT NULL) "
        f"SELECT t.{key}, bins.label AS {out} FROM {table} t LEFT JOIN bins "
        f"ON t.{col} >= bins.lo AND (t.{col} < bins.hi OR (bins.is_last AND t.{col} <= bins.hi))"
    )


def _sql_smart_suggest(table: str, schema: list[tuple[str, str]]) -> str:
    parts = []
    for c, dt in schema:
        num = dt in NUMERIC_DTYPES
        kind = "numeric" if num else "categorical"
        if num:
            sugg = "CASE WHEN count(DISTINCT {c}) > 50 THEN 'generalize+dp' ELSE 'dp' END"
        else:
            sugg = "CASE WHEN count(DISTINCT {c}) > 20 THEN 'sdc' ELSE 'none' END"
        parts.append(
            f"SELECT '{c}' AS \"column\", '{kind}' AS kind, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_unique, "
            f"{sugg.format(c=c)} AS suggestion FROM {table}"
        )
    return " UNION ALL ".join(parts)


def _sql_ks(a_select: str, b_select: str, out: str = "ks_stat") -> str:
    """Two-sample KS in ANSI SQL: grouped tagged union + ordered-window
    cumulative counts (integers until the final division)."""
    return (
        f"WITH u AS (SELECT v, 1 AS ka, 0 AS kb FROM ({a_select}) "
        f"UNION ALL SELECT v, 0 AS ka, 1 AS kb FROM ({b_select})), "
        "g AS (SELECT v, CAST(sum(ka) AS BIGINT) AS ka, CAST(sum(kb) AS BIGINT) AS kb FROM u GROUP BY v), "
        "c AS (SELECT sum(ka) OVER (ORDER BY v) AS ca, sum(kb) OVER (ORDER BY v) AS cb, "
        "sum(ka) OVER () AS na, sum(kb) OVER () AS nb FROM g) "
        f"SELECT CASE WHEN max(na) >= 5 AND max(nb) >= 5 "
        f"THEN round(max(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)), 6) END AS {out} FROM c"
    )


def _sql_chi2(a_select: str, b_select: str, out: str = "chi2") -> str:
    """Reference χ² drift: nulls → 'NA', outer-join category counts,
    Σ (oa-ob)²/(oa+ob+1e-9); DECIMAL(38,12) sum for order-independence."""
    return (
        f"WITH ta AS (SELECT coalesce(CAST(cat AS VARCHAR), 'NA') AS cat, count(*) AS oa "
        f"FROM ({a_select}) GROUP BY 1), "
        f"tb AS (SELECT coalesce(CAST(cat AS VARCHAR), 'NA') AS cat, count(*) AS ob "
        f"FROM ({b_select}) GROUP BY 1), "
        "j AS (SELECT CAST(coalesce(oa, 0) AS BIGINT) AS oa, CAST(coalesce(ob, 0) AS BIGINT) AS ob "
        "FROM ta FULL OUTER JOIN tb USING (cat)) "
        f"SELECT CASE WHEN sum(oa) > 0 AND sum(ob) > 0 THEN "
        f"round(CAST(sum(CAST(((oa - ob) * (oa - ob)) / (oa + ob + 1e-9) AS DECIMAL(38,12))) AS DOUBLE), 6) "
        f"END AS {out} FROM j"
    )


_SQL_DRIFT_AFTER_PRICE = "SELECT round(l_extendedprice, -2) AS v FROM lineitem WHERE l_extendedprice IS NOT NULL"
_SQL_DRIFT_BEFORE_PRICE = "SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL"


def _sql_ks_binned(a_select: str, b_select: str, bins: int = 10000) -> str:
    # mirrors drift.ks_statistic_binned bit for bit: width and bin ids
    # are the same IEEE double ops ((hi-lo)/bins, floor((v-lo)/w)), so
    # both engines land every value in the same bin
    return (
        f"WITH a AS ({a_select}), b AS ({b_select}), "
        "u AS (SELECT CAST(v AS DOUBLE) AS v, 1 AS ka, 0 AS kb FROM a "
        "UNION ALL SELECT CAST(v AS DOUBLE) AS v, 0 AS ka, 1 AS kb FROM b), "
        "r AS (SELECT min(v) AS lo, CASE WHEN max(v) - min(v) = 0 THEN 1.0 "
        f"ELSE (max(v) - min(v)) / {float(bins)} END AS w FROM u), "
        f"bn AS (SELECT least(floor((u.v - r.lo) / r.w), {bins - 1}) AS v, ka, kb FROM u, r), "
        "g AS (SELECT v, sum(ka) AS ka, sum(kb) AS kb FROM bn GROUP BY v), "
        "c AS (SELECT sum(ka) OVER (ORDER BY v) AS ca, sum(kb) OVER (ORDER BY v) AS cb, "
        "sum(ka) OVER () AS na, sum(kb) OVER () AS nb FROM g) "
        "SELECT CASE WHEN max(na) >= 5 AND max(nb) >= 5 THEN "
        "round(max(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)), 6) END AS ks_stat FROM c"
    )


def _sql_distribution_drift() -> str:
    ks_qty = _sql_ks(
        "SELECT l_quantity AS v FROM lineitem WHERE l_quantity IS NOT NULL",
        "SELECT l_quantity AS v FROM lineitem WHERE l_quantity IS NOT NULL",
        "m",
    )
    ks_price = _sql_ks(_SQL_DRIFT_BEFORE_PRICE, _SQL_DRIFT_AFTER_PRICE, "m")
    chi2_flag = _sql_chi2(
        "SELECT l_returnflag AS cat FROM lineitem",
        "SELECT CASE WHEN l_returnflag = 'R' THEN 'OTHER' ELSE l_returnflag END AS cat FROM lineitem",
        "m",
    )
    return (
        f"SELECT 'l_quantity' AS \"column\", 'numeric' AS type, m AS ks_stat, CAST(NULL AS DOUBLE) AS chi2 FROM ({ks_qty}) "
        f"UNION ALL SELECT 'l_extendedprice', 'numeric', m, CAST(NULL AS DOUBLE) FROM ({ks_price}) "
        f"UNION ALL SELECT 'l_returnflag', 'categorical', CAST(NULL AS DOUBLE), m FROM ({chi2_flag})"
    )


MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _sql_standard_scale() -> str:
    return (
        "WITH st AS (SELECT avg(c_acctbal) AS mu, "
        "CASE WHEN stddev_pop(c_acctbal) IS NULL OR stddev_pop(c_acctbal) = 0 THEN 1.0 "
        "ELSE stddev_pop(c_acctbal) END AS sd FROM customer) "
        "SELECT c_custkey, round((c_acctbal - st.mu) / st.sd, 6) AS f_c_acctbal "
        "FROM customer, st"
    )


def _sql_one_hot() -> str:
    inds = ", ".join(
        f"CAST(c_mktsegment = '{v}' AS DOUBLE) AS f_c_mktsegment_{v}" for v in MKTSEGMENTS
    )
    return f"SELECT c_custkey, {inds} FROM customer"


def _sql_knn_linkage_join() -> str:
    """Exact 1-NN in SQL, mirroring the Spark plan: anon-fitted scaling
    + one-hot, cross join, squared distance in the same term order,
    per-anon top-1 with (dist, real_id) tiebreak."""
    ind_a = ", ".join(
        f"CAST(c_mktsegment = '{v}' AS DOUBLE) AS i{j}" for j, v in enumerate(MKTSEGMENTS)
    )
    dist_terms = "(a.fn - r.fn) * (a.fn - r.fn) + (a.fa - r.fa) * (a.fa - r.fa)"
    for j in range(len(MKTSEGMENTS)):
        dist_terms += f" + (a.i{j} - r.i{j}) * (a.i{j} - r.i{j})"
    return (
        "WITH anon AS (SELECT * FROM customer WHERE c_custkey % 2 = 0), "
        "realt AS (SELECT * FROM customer WHERE c_custkey % 2 = 1), "
        "st AS (SELECT avg(CAST(c_nationkey AS DOUBLE)) AS mu_n, "
        "CASE WHEN stddev_pop(c_nationkey) IS NULL OR stddev_pop(c_nationkey) = 0 THEN 1.0 ELSE stddev_pop(c_nationkey) END AS sd_n, "
        "avg(c_acctbal) AS mu_a, "
        "CASE WHEN stddev_pop(c_acctbal) IS NULL OR stddev_pop(c_acctbal) = 0 THEN 1.0 ELSE stddev_pop(c_acctbal) END AS sd_a "
        "FROM anon), "
        f"ae AS (SELECT c_custkey AS anon_id, (CAST(c_nationkey AS DOUBLE) - st.mu_n) / st.sd_n AS fn, "
        f"(c_acctbal - st.mu_a) / st.sd_a AS fa, {ind_a} FROM anon, st), "
        f"re AS (SELECT c_custkey AS real_id, (CAST(c_nationkey AS DOUBLE) - st.mu_n) / st.sd_n AS fn, "
        f"(c_acctbal - st.mu_a) / st.sd_a AS fa, {ind_a} FROM realt, st), "
        f"pairs AS (SELECT a.anon_id, r.real_id, sqrt(0.0 + {dist_terms}) AS dist FROM ae a CROSS JOIN re r), "
        "best AS (SELECT anon_id, real_id, dist, "
        "row_number() OVER (PARTITION BY anon_id ORDER BY dist ASC, real_id ASC) AS rn FROM pairs) "
        "SELECT anon_id, real_id, round(dist, 6) AS dist FROM best WHERE rn = 1"
    )


def _sql_linkage_risk_score() -> str:
    return (
        f"WITH nn AS ({_sql_knn_linkage_join()}) "
        "SELECT round(least(greatest(avg(1.0 - dist / (dist + 1e-9)), 0.0), 1.0), 6) AS overall_risk, "
        "count(*) AS n_rows FROM nn"
    )


# --- extension oracle SQL -------------------------------------------------

TOKEN_REGEX_SQL = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
STOPWORDS_SQL = "['the','a','and','of','to','in','is','it','that','for']"

def _sql_toks(src: str = "documents") -> str:
    # the shared (doc_id, text, tokens) projection; src swaps the
    # source relation (the X240 fuzzy-decontamination oracle runs it
    # over its planted fixture and its probe VALUES list)
    return (
        "SELECT doc_id, text, CASE WHEN trim(text) = '' THEN [] "
        f"ELSE regexp_split_to_array(trim(text), '\\s+') END AS t FROM {src}"
    )


SQL_TOKS = _sql_toks()


def _sql_token_count() -> str:
    return (
        f"WITH toks AS ({SQL_TOKS}) SELECT doc_id, CAST(len(t) AS BIGINT) AS n_ws_tokens, "
        f"CAST(len(regexp_extract_all(text, '{TOKEN_REGEX_SQL}')) AS BIGINT) AS n_regex_tokens "
        "FROM toks"
    )


def _sql_quality_score() -> str:
    return (
        f"WITH toks AS ({SQL_TOKS}), "
        f"c AS (SELECT doc_id, text, len(t) AS n_tok, "
        f"len(list_filter(t, tk -> list_contains({STOPWORDS_SQL}, tk))) AS n_stop, "
        f"length(text) AS n_chars, "
        f"len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct FROM toks), "
        "r AS (SELECT doc_id, n_chars, n_tok, "
        "CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / n_tok ELSE 0.0 END AS stop_ratio, "
        "CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio, "
        "least(n_chars / 500.0, 1.0) AS len_score FROM c) "
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tok AS BIGINT) AS n_tokens, "
        "round(stop_ratio, 6) AS stopword_ratio, round(punct_ratio, 6) AS punct_ratio, "
        "round(0.4 * len_score + 0.4 * least(5.0 * stop_ratio, 1.0) + 0.2 * (1.0 - punct_ratio), 6) AS quality "
        "FROM r"
    )


def _sql_pii_scan() -> str:
    from safedata_pipeline_spark.operators.pii import PII_PATTERNS

    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return (
        f"WITH c AS (SELECT doc_id, {counts} FROM documents) "
        f"SELECT doc_id, "
        + ", ".join(f"CAST(n_{n} AS BIGINT) AS n_{n}" for n in PII_PATTERNS)
        + f", CAST({total} AS BIGINT) AS n_pii FROM c"
    )


def _sql_pii_redact() -> str:
    from safedata_pipeline_spark.operators.pii import PII_PATTERNS

    expr = "text"
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '[{name.upper()}]', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def _sql_quality_filter(keep_fraction: float) -> str:
    return (
        f"WITH qs AS ({_sql_quality_score()}), "
        f"thr AS (SELECT round(quantile_cont(quality, {1.0 - keep_fraction}), 6) AS threshold FROM qs) "
        "SELECT doc_id, quality, threshold FROM qs, thr WHERE quality >= threshold"
    )


LANG_MARKERS_SQL = {
    "en": "['the','and','of','is','with']",
    "de": "['der','die','und','ist','nicht']",
    "fr": "['le','les','et','est','dans']",
    "es": "['el','los','y','es','por']",
}


def _sql_lang_id() -> str:
    hits = ", ".join(
        f"len(list_filter(CASE WHEN trim(lower(text)) = '' THEN [] "
        f"ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END, "
        f"tk -> list_contains({v}, tk))) AS h_{k}"
        for k, v in LANG_MARKERS_SQL.items()
    )
    return (
        f"WITH h AS (SELECT doc_id, {hits} FROM documents) "
        "SELECT doc_id, CASE "
        "WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown' "
        "WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en' "
        "WHEN h_de >= h_fr AND h_de >= h_es THEN 'de' "
        "WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS lang_guess, "
        "CAST(h_en AS BIGINT) AS hits_en, CAST(h_de AS BIGINT) AS hits_de, "
        "CAST(h_fr AS BIGINT) AS hits_fr, CAST(h_es AS BIGINT) AS hits_es FROM h"
    )


def _sql_doc_fingerprint() -> str:
    return (
        "SELECT doc_id, md5(text) AS content_md5, "
        "list_min([md5(substr(text, i, 5)) FOR i IN generate_series(1, greatest(length(text) - 4, 1))]) "
        "AS min_shingle_md5 FROM documents"
    )


def _sql_text_profile() -> str:
    return (
        f"WITH tc AS ({_sql_token_count()}), li AS ({_sql_lang_id()}), "
        f"fp AS ({_sql_doc_fingerprint()}) "
        "SELECT tc.doc_id, tc.n_ws_tokens, tc.n_regex_tokens, li.lang_guess, "
        "li.hits_en, li.hits_de, li.hits_fr, li.hits_es, fp.content_md5, fp.min_shingle_md5 "
        "FROM tc JOIN li USING (doc_id) JOIN fp USING (doc_id)"
    )


def _sql_psi(a_select: str, b_select: str, bins: int = 10, eps: float = 1e-6) -> str:
    # mirrors drift.psi_drift bit for bit: same bin math as _sql_ks_binned,
    # proportions clamped to eps, contributions rounded to 10 decimals
    # and DECIMAL-summed before the final 6-decimal round
    return (
        f"WITH a AS ({a_select}), b AS ({b_select}), "
        "u AS (SELECT CAST(v AS DOUBLE) AS v, 1 AS ka, 0 AS kb FROM a "
        "UNION ALL SELECT CAST(v AS DOUBLE) AS v, 0 AS ka, 1 AS kb FROM b), "
        "r AS (SELECT min(v) AS lo, CASE WHEN max(v) - min(v) = 0 THEN 1.0 "
        f"ELSE (max(v) - min(v)) / {float(bins)} END AS w FROM u), "
        f"bn AS (SELECT least(floor((u.v - r.lo) / r.w), {bins - 1}) AS b, ka, kb FROM u, r), "
        "g AS (SELECT b, sum(ka) AS ca, sum(kb) AS cb FROM bn GROUP BY b), "
        f"p AS (SELECT greatest(CAST(ca AS DOUBLE) / sum(ca) OVER (), {eps!r}) AS pa, "
        f"greatest(CAST(cb AS DOUBLE) / sum(cb) OVER (), {eps!r}) AS pb, "
        "sum(ca) OVER () AS na, sum(cb) OVER () AS nb FROM g) "
        "SELECT CASE WHEN max(na) > 0 AND max(nb) > 0 THEN "
        "round(CAST(sum(CAST(round((pa - pb) * ln(pa / pb), 10) AS DECIMAL(38,10))) AS DOUBLE), 6) "
        "END AS psi FROM p"
    )


def _sql_correlation_matrix(cols: list[str]) -> str:
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for c in cols:
        sums.append(f"sum(CAST({c} AS DECIMAL(38,12))) AS s_{c}")
        sums.append(f"sum(CAST({c} * {c} AS DECIMAL(38,12))) AS ss_{c}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        sums.append(f"sum(CAST({a} * {b} AS DECIMAL(38,12))) AS sp_{a}__{b}")
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sel = []
    for a, b in pairs:
        # identical IEEE op order to profile.correlation_matrix
        n = "CAST(n AS DOUBLE)"
        sa, sb = f"CAST(s_{a} AS DOUBLE)", f"CAST(s_{b} AS DOUBLE)"
        ssa, ssb = f"CAST(ss_{a} AS DOUBLE)", f"CAST(ss_{b} AS DOUBLE)"
        sp = f"CAST(sp_{a}__{b} AS DOUBLE)"
        var_a, var_b = f"({n} * {ssa} - {sa} * {sa})", f"({n} * {ssb} - {sb} * {sb})"
        sel.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"CASE WHEN {var_a} > 0 AND {var_b} > 0 THEN "
            f"round(({n} * {sp} - {sa} * {sb}) / sqrt({var_a} * {var_b}), 6) END AS corr FROM m"
        )
    body = " UNION ALL ".join(sel)
    cast_cols = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in cols)
    return (
        f"WITH d AS (SELECT {cast_cols} FROM lineitem WHERE {notnull}), "
        f"m AS (SELECT {', '.join(sums)} FROM d) {body}"
    )


def _sql_corpus_cube() -> str:
    return (
        "WITH d AS (SELECT source, lang, CAST(len(CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS nt FROM documents) "
        "SELECT source, lang, CAST(grouping(source, lang) AS BIGINT) AS gid, "
        "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_ws_tokens "
        "FROM d GROUP BY CUBE (source, lang)"
    )


def _sql_events_sliding() -> str:
    return (
        "WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events), "
        "w AS (SELECT date_trunc('hour', ts) AS ws, event_type, value FROM e "
        "UNION ALL "
        "SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type, value FROM e) "
        "SELECT CAST(ws AS TIMESTAMP) AS window_start, "
        "CAST(ws + INTERVAL 2 HOUR AS TIMESTAMP) AS window_end, event_type, "
        "count(*) AS n_events, "
        "round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_value, "
        "round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE), 4) AS sum_value "
        "FROM w GROUP BY 1, 2, 3"
    )


def _sql_table_diff() -> str:
    a = "SELECT l_quantity, l_extendedprice, l_returnflag FROM lineitem"
    b = (
        "SELECT l_quantity, round(l_extendedprice, -2) AS l_extendedprice, "
        "CASE WHEN l_returnflag = 'R' THEN 'OTHER' ELSE l_returnflag END AS l_returnflag "
        "FROM lineitem"
    )
    return (
        f"WITH a AS ({a}), b AS ({b}), "
        "oa AS (SELECT count(*) AS c FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)), "
        "ob AS (SELECT count(*) AS c FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)) "
        "SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a, "
        "CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b, "
        "CAST(oa.c AS BIGINT) AS n_only_a, CAST(ob.c AS BIGINT) AS n_only_b, "
        "CAST((SELECT count(*) FROM a) - oa.c AS BIGINT) AS n_common "
        "FROM oa, ob"
    )


def _sql_column_entropy(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in cols
    ]
    melted = " UNION ALL ".join(parts)
    return (
        f"WITH m AS ({melted}), "
        "cnt AS (SELECT \"column\", val, count(*) AS c FROM m GROUP BY 1, 2), "
        "p AS (SELECT \"column\", CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY \"column\") AS p FROM cnt) "
        "SELECT \"column\", CAST(count(*) AS BIGINT) AS n_categories, "
        "round(CAST(sum(CAST(round(-p * ln(p), 10) AS DECIMAL(38,10))) AS DOUBLE), 6) AS entropy "
        "FROM p GROUP BY \"column\""
    )


def _sql_dedup_best() -> str:
    return (
        f"WITH RECURSIVE j AS ({_sql_ngram_jaccard()}), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM j "
        "UNION ALL SELECT id_b, id_a FROM j), "
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS comp_id FROM reach GROUP BY id), "
        f"q AS ({_sql_quality_score()}) "
        "SELECT comp.doc_id, comp.comp_id, q.quality AS score, "
        "row_number() OVER (PARTITION BY comp.comp_id "
        "ORDER BY q.quality DESC NULLS LAST, comp.doc_id ASC) = 1 AS is_kept "
        "FROM comp JOIN q ON comp.doc_id = q.doc_id"
    )


def _sql_normalize_text() -> str:
    # same fixed op order as text.normalize_text: strip control chars →
    # collapse whitespace runs → trim → lowercase
    return (
        "SELECT doc_id, lower(trim(regexp_replace("
        "regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'), "
        "'\\s+', ' ', 'g'))) AS text FROM documents"
    )


def _sql_skew_report(table: str, key: str) -> str:
    return (
        f"WITH c AS (SELECT {key}, count(*) AS c FROM {table} GROUP BY {key}) "
        "SELECT CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys, "
        "CAST(max(c) AS BIGINT) AS max_key_count, "
        "round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS avg_key_count, "
        "quantile_cont(c, 0.5) AS p50_count, quantile_cont(c, 0.9) AS p90_count, "
        "quantile_cont(c, 0.99) AS p99_count, "
        "round(CAST(max(c) AS DOUBLE) / (CAST(sum(c) AS DOUBLE) / count(*)), 6) AS skew_ratio "
        "FROM c"
    )


_SQL_QUANT_BASE = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS raw_scale FROM e), "
    "ex AS (SELECT vec_id, raw_scale, unnest(v) AS x, unnest(range(0, len(v))) AS dim FROM s), "
    "q AS (SELECT vec_id, dim, raw_scale, x, "
    "CASE WHEN raw_scale > 0 THEN round(x / raw_scale, 0) ELSE 0 END AS qd FROM ex) "
)


def _sql_quantize_embeddings() -> str:
    return (
        _SQL_QUANT_BASE
        + "SELECT vec_id, CAST(dim AS BIGINT) AS dim, CAST(qd AS BIGINT) AS qval, "
        "round(raw_scale, 6) AS scale FROM q"
    )


def _sql_quantization_error() -> str:
    return (
        _SQL_QUANT_BASE
        + ", err AS (SELECT abs(x - qd * raw_scale) AS e FROM q) "
        "SELECT CAST(count(*) AS BIGINT) AS n_values, "
        "floor(CAST(sum(CAST(round(e, 10) AS DECIMAL(38,10))) AS DOUBLE) / count(*) "
        "* 1000000.0 + 0.5) / 1000000.0 AS mean_abs_err, "
        "round(max(e), 6) AS max_abs_err FROM err"
    )


def _sql_shipping_priority() -> str:
    return (
        "SELECT l_orderkey, "
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue, "
        "o_orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
    )


def _sql_regional_volume() -> str:
    return (
        "SELECT n_name, "
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue "
        "FROM region JOIN nation ON r_regionkey = n_regionkey "
        "JOIN customer ON n_nationkey = c_nationkey "
        "JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey "
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name"
    )


def _sql_nation_trade(n1: str, n2: str) -> str:
    return (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year, "
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        f"WHERE (sn.n_name = '{n1}' AND cn.n_name = '{n2}') "
        f"OR (sn.n_name = '{n2}' AND cn.n_name = '{n1}') "
        "GROUP BY 1, 2, 3"
    )


def _sql_market_share(nation: str) -> str:
    rev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))"
    return (
        "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year, "
        f"round(CAST(sum({rev}) AS DOUBLE), 2) AS total_revenue, "
        f"round(CAST(sum(CASE WHEN sn.n_name = '{nation}' THEN {rev} "
        f"ELSE CAST(0 AS DECIMAL(38,10)) END) AS DOUBLE) "
        f"/ nullif(CAST(sum({rev}) AS DOUBLE), 0), 6) AS mkt_share "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "JOIN region ON cn.n_regionkey = r_regionkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "WHERE p_type = 'PROMO' AND r_name = 'ASIA' GROUP BY 1"
    )


def _sql_disjunctive_revenue() -> str:
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"
    )


def _sql_roc_points(max_points: int) -> str:
    return (
        "WITH e AS (SELECT CAST(value AS DOUBLE) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT min(s) AS lo, CASE WHEN max(s) - min(s) = 0 THEN 1.0 "
        f"ELSE (max(s) - min(s)) / {float(max_points)} END AS w FROM e), "
        f"g AS (SELECT least(floor((s - lo) / w), {max_points - 1}) AS bin, "
        "min(lo + w * least(floor((s - lo) / w), "
        f"{max_points - 1})) AS threshold, sum(y) AS pos, sum(1 - y) AS neg "
        "FROM e, r GROUP BY 1), "
        "c AS (SELECT threshold, sum(pos) OVER (ORDER BY bin DESC) AS cpos, "
        "sum(neg) OVER (ORDER BY bin DESC) AS cneg FROM g), "
        "t AS (SELECT CAST(sum(pos) AS DOUBLE) AS P, CAST(sum(neg) AS DOUBLE) AS N FROM g) "
        "SELECT round(threshold, 6) AS threshold, CAST(cpos + cneg AS BIGINT) AS n_ge, "
        "round(CAST(cpos AS DOUBLE) / nullif(t.P, 0), 6) AS tpr, "
        "round(CAST(cneg AS DOUBLE) / nullif(t.N, 0), 6) AS fpr FROM c, t"
    )


def _sql_event_transitions() -> str:
    return (
        "WITH s AS (SELECT user_id, event_type AS next_type, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), "
        "g AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n FROM s "
        "WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
        "t AS (SELECT prev_type, sum(n) AS row_total FROM g GROUP BY 1) "
        "SELECT g.prev_type, g.next_type, g.n, "
        "round(CAST(g.n AS DOUBLE) / t.row_total, 6) AS prob FROM g JOIN t USING (prev_type)"
    )


def _sql_priority_late_orders() -> str:
    return (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) "
        "GROUP BY o_orderpriority"
    )


def _sql_sole_late_supplier() -> str:
    return (
        "WITH pairs AS (SELECT l_orderkey, l_suppkey, "
        "max(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' GROUP BY l_orderkey, l_suppkey), "
        "late AS (SELECT l_orderkey, l_suppkey FROM pairs WHERE late) "
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM late l1 "
        "JOIN supplier ON l1.l_suppkey = s_suppkey "
        "WHERE EXISTS (SELECT 1 FROM pairs l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey) "
        "GROUP BY s_name"
    )


def _sql_winsorize(lower: float, upper: float) -> str:
    def clip(c: str) -> str:
        return (
            f"round(least(greatest({c}, (SELECT quantile_cont({c}, {lower}) FROM lineitem)), "
            f"(SELECT quantile_cont({c}, {upper}) FROM lineitem)), 6) AS {c}"
        )

    return (
        "SELECT l_orderkey, l_linenumber, "
        f"{clip('l_extendedprice')}, {clip('l_quantity')} FROM lineitem"
    )


def _sql_robust_stats(cols: list[str]) -> str:
    # half-up floor-snap mirrors the Spark side's _r6 (python round()
    # would be half-even; see quality_deciles for the same convention)
    def snap(expr: str) -> str:
        return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"

    sel = []
    for c in cols:
        med = f"(SELECT quantile_cont({c}, 0.5) FROM lineitem)"
        q25 = f"(SELECT quantile_cont({c}, 0.25) FROM lineitem)"
        q75 = f"(SELECT quantile_cont({c}, 0.75) FROM lineitem)"
        sel.append(
            f"SELECT '{c}' AS \"column\", "
            f"{snap(med)} AS median, "
            f"{snap(q25)} AS p25, "
            f"{snap(q75)} AS p75, "
            f"{snap(f'{q75} - {q25}')} AS iqr, "
            f"round((SELECT quantile_cont(abs(CAST({c} AS DOUBLE) - {med}), 0.5) "
            f"FROM lineitem WHERE {c} IS NOT NULL), 6) AS mad"
        )
    return " UNION ALL ".join(sel)


def _sql_k_anonymity(k: int) -> str:
    qi = ", ".join(QI_COLS)
    return (
        f"WITH cls AS (SELECT {qi}, CAST(count(*) AS BIGINT) AS class_size "
        f"FROM customer GROUP BY {qi}) "
        "SELECT min(class_size) AS k_anonymity, "
        "CAST(count(*) AS BIGINT) AS n_classes, "
        f"CAST(sum(CAST(class_size < {k} AS INT)) AS BIGINT) AS n_violating_classes, "
        f"CAST(sum(CASE WHEN class_size < {k} THEN class_size ELSE 0 END) AS BIGINT) AS n_rows_at_risk, "
        f"CAST({k} AS INT) AS k_required, "
        f"min(class_size) >= {k} AS satisfies_k FROM cls"
    )


def _sql_l_diversity(l: int, sensitive: str = "c_acctbal") -> str:
    qi = ", ".join(QI_COLS)
    return (
        f"WITH cls AS (SELECT {qi}, CAST(count(DISTINCT {sensitive}) AS BIGINT) AS n_sensitive "
        f"FROM customer GROUP BY {qi}) "
        "SELECT min(n_sensitive) AS l_diversity, "
        "CAST(count(*) AS BIGINT) AS n_classes, "
        f"CAST(sum(CAST(n_sensitive < {l} AS INT)) AS BIGINT) AS n_violating_classes, "
        f"CAST({l} AS INT) AS l_required, "
        f"min(n_sensitive) >= {l} AS satisfies_l FROM cls"
    )


def _sql_top_ngrams(top_k: int) -> str:
    return (
        "WITH w AS (SELECT CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w FROM documents), "
        "g AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS ngram "
        "FROM w WHERE len(w) >= 2), "
        "c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences FROM g GROUP BY ngram "
        f"ORDER BY n_occurrences DESC, ngram ASC LIMIT {top_k}) "
        "SELECT ngram, n_occurrences, CAST(row_number() OVER "
        "(ORDER BY n_occurrences DESC, ngram ASC) AS BIGINT) AS rank FROM c"
    )


def _sql_source_lang_pivot(langs: list[str]) -> str:
    cols = ", ".join(
        f"CAST(sum(CAST(lang = '{v}' AS INT)) AS BIGINT) AS n_{v}" for v in sorted(langs)
    )
    return (
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        f"{cols} FROM documents GROUP BY source"
    )


def _sql_dedup_incremental(split_id: int) -> str:
    return (
        f"WITH ref AS (SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id < {split_id} AND text IS NOT NULL), "
        f"new AS (SELECT doc_id, source, text, md5(text) AS d FROM documents WHERE doc_id >= {split_id} AND text IS NOT NULL), "
        "surv AS (SELECT new.* FROM new WHERE d NOT IN (SELECT d FROM ref)), "
        "keep AS (SELECT d, min(doc_id) AS doc_id FROM surv GROUP BY d) "
        "SELECT s.doc_id, s.source, s.text FROM surv s JOIN keep USING (d, doc_id)"
    )


def _sql_dedup_incremental_near(
    split_id: int, num_hashes: int = 16, bands: int = 4, threshold: float = 0.5
) -> str:
    """Mirror of dedup.dedup_incremental_near: band-key equi-join
    NEW × REF only, signature-verified estimate, anti-join."""
    rows = num_hashes // bands
    slot_list = ", ".join(f"mh_{i}" for i in range(num_hashes))
    band_selects = []
    for b in range(bands):
        parts = " || '|' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS key FROM sig")
    buckets = " UNION ALL ".join(band_selects)
    return (
        f"WITH sig AS ({_sql_minhash_signatures(num_hashes)}), "
        f"sigarr AS (SELECT doc_id, [{slot_list}] AS s FROM sig), "
        f"buckets AS ({buckets}), "
        "cand AS (SELECT DISTINCT n.doc_id AS idn, r.doc_id AS idr FROM buckets n "
        "JOIN buckets r ON n.band = r.band AND n.key = r.key "
        f"AND n.doc_id >= {split_id} AND r.doc_id < {split_id}), "
        "hit AS (SELECT DISTINCT c.idn FROM cand c "
        "JOIN sigarr sa ON c.idn = sa.doc_id JOIN sigarr sb ON c.idr = sb.doc_id "
        f"WHERE len(list_filter(range(1, {num_hashes + 1}), i -> sa.s[i] = sb.s[i])) "
        f"/ {float(num_hashes)} >= {threshold}) "
        f"SELECT doc_id, source, text FROM documents WHERE doc_id >= {split_id} "
        "AND text IS NOT NULL AND doc_id NOT IN (SELECT idn FROM hit)"
    )


def _sql_decontaminate_fuzzy(
    threshold: float = 0.5, num_hashes: int = 16, bands: int = 4
) -> str:
    """Mirror of text.decontaminate_fuzzy over the X240 fixture: the
    planted near-benchmark docs, corpus + probe MinHash signatures
    (shingle-less rows filtered on BOTH sides, the engine's mh_0
    guard), band-key candidates, full-signature verification, NOT IN
    anti-join — the X135 discipline with a probe VALUES list as the
    reference side."""
    rows = num_hashes // bands
    slot_list = ", ".join(f"mh_{i}" for i in range(num_hashes))

    def bucket_union(sig: str) -> str:
        sels = []
        for b in range(bands):
            parts = " || '|' || ".join(
                f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
            )
            sels.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS key FROM {sig}")
        return " UNION ALL ".join(sels)

    probes_vals = ", ".join(f"({i}, '{p}')" for i, p in enumerate(FDC_PROBES))
    return (
        "WITH fx AS (SELECT doc_id, source, CASE WHEN doc_id % 9 = 4 "
        f"THEN '{FDC_PLANT}' || ' variant ' || CAST(doc_id % 5 AS VARCHAR) "
        "ELSE text END AS text FROM documents), "
        f"csig0 AS ({_sql_minhash_signatures(num_hashes, src='fx')}), "
        "csig AS (SELECT * FROM csig0 WHERE mh_0 IS NOT NULL), "
        f"pdocs AS (SELECT * FROM (VALUES {probes_vals}) AS t(doc_id, text)), "
        f"psig0 AS ({_sql_minhash_signatures(num_hashes, src='pdocs')}), "
        "psig AS (SELECT * FROM psig0 WHERE mh_0 IS NOT NULL), "
        f"carr AS (SELECT doc_id, [{slot_list}] AS s FROM csig), "
        f"parr AS (SELECT doc_id, [{slot_list}] AS s FROM psig), "
        f"cb AS ({bucket_union('csig')}), "
        f"pb AS ({bucket_union('psig')}), "
        "cand AS (SELECT DISTINCT c.doc_id AS idc, p.doc_id AS idp "
        "FROM cb c JOIN pb p ON c.band = p.band AND c.key = p.key), "
        "hit AS (SELECT DISTINCT cd.idc FROM cand cd "
        "JOIN carr ca ON cd.idc = ca.doc_id JOIN parr pa ON cd.idp = pa.doc_id "
        f"WHERE len(list_filter(range(1, {num_hashes + 1}), i -> ca.s[i] = pa.s[i])) "
        f"/ {float(num_hashes)} >= {threshold}) "
        "SELECT doc_id, source, text FROM fx WHERE doc_id NOT IN (SELECT idc FROM hit)"
    )


def _sql_cross_source_dup_matrix() -> str:
    """Mirror of dedup.cross_source_dup_matrix over the ngram-Jaccard
    pair generator (the same pairs the Spark wrapper composes)."""
    return (
        f"WITH pairs AS ({_sql_ngram_jaccard()}), "
        "s AS (SELECT doc_id, source FROM documents), "
        "tagged AS (SELECT least(a.source, b.source) AS source_a, "
        "greatest(a.source, b.source) AS source_b, "
        "CASE WHEN a.source <= b.source THEN p.id_a ELSE p.id_b END AS da, "
        "CASE WHEN a.source <= b.source THEN p.id_b ELSE p.id_a END AS db "
        "FROM pairs p JOIN s a ON p.id_a = a.doc_id JOIN s b ON p.id_b = b.doc_id) "
        "SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs, "
        "CAST(count(DISTINCT da) AS BIGINT) AS n_docs_a, "
        "CAST(count(DISTINCT db) AS BIGINT) AS n_docs_b "
        "FROM tagged GROUP BY source_a, source_b"
    )


def _sql_take_per_source(n: int) -> str:
    return (
        "SELECT doc_id, source FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY source ORDER BY "
        "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
        f"/ 4294967296.0 ASC, doc_id ASC) <= {n}"
    )


def _sql_scored_documents() -> str:
    # text_profile ∪ quality: the same fused projection the streaming
    # scorer emits (streaming/corpus.scored_documents)
    return (
        f"WITH tp AS ({_sql_text_profile()}), qs AS ({_sql_quality_score()}) "
        "SELECT tp.*, qs.quality FROM tp JOIN qs USING (doc_id)"
    )


def _sql_repetition_stats() -> str:
    return (
        "WITH d AS (SELECT doc_id, "
        "CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w, "
        "list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ln FROM documents), "
        "base AS (SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS nwd, "
        "len(ln) AS nl, len(list_distinct(ln)) AS nld, "
        "list_sum(list_transform(w, x -> length(x))) AS sl FROM d), "
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), "
        "i -> w[i] || ' ' || w[i + 1])) AS bg FROM d WHERE len(w) >= 2), "
        "cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg), "
        "top AS (SELECT doc_id, bg, c, sum(c) OVER (PARTITION BY doc_id) AS total, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg ASC) AS rn FROM cnt) "
        "SELECT b.doc_id, CAST(b.nw AS BIGINT) AS n_words, "
        "CAST(b.nwd AS BIGINT) AS n_distinct_words, "
        "CASE WHEN b.nw > 0 THEN round(1.0 - CAST(b.nwd AS DOUBLE) / b.nw, 6) END AS dup_word_fraction, "
        "CAST(b.nl AS BIGINT) AS n_lines, CAST(b.nld AS BIGINT) AS n_distinct_lines, "
        "CASE WHEN b.nl > 0 THEN round(1.0 - CAST(b.nld AS DOUBLE) / b.nl, 6) END AS dup_line_fraction, "
        "CASE WHEN b.nw > 0 THEN round(CAST(b.sl AS DOUBLE) / b.nw, 6) END AS mean_word_length, "
        "t.bg AS top_bigram, CAST(t.c AS BIGINT) AS top_bigram_count, "
        "round(CAST(t.c AS DOUBLE) / t.total, 6) AS top_bigram_fraction "
        "FROM base b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)"
    )


def _sql_corpus_stats() -> str:
    return (
        f"WITH q AS ({_sql_quality_score()}), "
        "b AS (SELECT doc_id, source, lang, CAST(len(CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS n_toks FROM documents) "
        "SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(b.n_toks) AS BIGINT) AS total_ws_tokens, "
        "CAST(count(DISTINCT b.lang) AS BIGINT) AS n_langs, "
        "floor(CAST(sum(CAST(q.quality AS DECIMAL(38,6))) AS DOUBLE) / count(*) * 1000000.0 + 0.5) "
        "/ 1000000.0 AS avg_quality "
        "FROM b JOIN q USING (doc_id) GROUP BY b.source"
    )


def _sql_paragraph_dedup(sep: str) -> str:
    return (
        f"WITH f AS (SELECT doc_id, list_filter(list_transform(string_split(text, '{sep}'), "
        "x -> trim(x)), x -> x <> '') AS us FROM documents), "
        "u AS (SELECT doc_id, unnest(us) AS unit, unnest(range(1, len(us) + 1)) AS pos FROM f), "
        "k AS (SELECT doc_id, pos, unit FROM (SELECT doc_id, pos, unit, "
        "row_number() OVER (PARTITION BY unit ORDER BY doc_id, pos) AS rn FROM u) WHERE rn = 1), "
        f"r AS (SELECT doc_id, string_agg(unit, '{sep}' ORDER BY pos) AS text_dedup, "
        "count(*) AS n_kept FROM k GROUP BY doc_id) "
        "SELECT f.doc_id, coalesce(r.text_dedup, '') AS text_dedup, "
        "CAST(len(f.us) AS BIGINT) AS n_units, "
        "CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept "
        "FROM f LEFT JOIN r USING (doc_id)"
    )


def _sql_pack_sequences(budget: int, buckets: int) -> str:
    return (
        "WITH t AS (SELECT doc_id, "
        "CAST(CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
        f"% {buckets} AS BIGINT) AS bucket, "
        "CAST(len(CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(text), '\\s+') END) AS BIGINT) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, bucket, n_tokens, "
        "CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset FROM t) "
        "SELECT doc_id, bucket, n_tokens, start_offset, "
        f"CAST(floor(start_offset / {float(budget)}) AS BIGINT) AS pack_no FROM c"
    )


def _sql_pack_windows(budget: int, buckets: int) -> str:
    return (
        f"WITH p AS ({_sql_pack_sequences(budget, buckets)}), "
        "e AS (SELECT doc_id, bucket, n_tokens, start_offset, "
        f"unnest(generate_series(CAST(floor(start_offset / {float(budget)}) AS BIGINT), "
        f"CAST(floor((start_offset + n_tokens - 1) / {float(budget)}) AS BIGINT))) AS window_no "
        "FROM p WHERE n_tokens > 0) "
        "SELECT doc_id, bucket, CAST(window_no AS BIGINT) AS window_no, "
        f"CAST(greatest(0, window_no * {budget} - start_offset) AS BIGINT) AS start_tok, "
        f"CAST(least(n_tokens, (window_no + 1) * {budget} - start_offset) AS BIGINT) AS end_tok "
        "FROM e"
    )


def _sql_tfidf_top_terms(top_k: int) -> str:
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "ex AS (SELECT doc_id, unnest(t) AS term FROM toks), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term), "
        "idf AS (SELECT term, ln(((SELECT count(*) FROM documents) + 1.0) / (count(*) + 1.0)) + 1.0 AS idf "
        "FROM tf GROUP BY term), "
        "scored AS (SELECT tf.doc_id, tf.term, tf.tf, round(tf.tf * idf.idf, 6) AS tfidf "
        "FROM tf JOIN idf USING (term)), "
        "ranked AS (SELECT doc_id, term, tf, tfidf, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk FROM scored) "
        "SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf, CAST(rnk AS BIGINT) AS \"rank\" "
        f"FROM ranked WHERE rnk <= {top_k}"
    )


def _sql_dedup_exact() -> str:
    return (
        "SELECT md5(text) AS content_md5, CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "count(*) AS n_copies FROM documents GROUP BY text"
    )


SQL_SHINGLES = (
    f"WITH toks AS ({SQL_TOKS}), "
    "sh AS (SELECT DISTINCT doc_id AS id, array_to_string(t[i:i+2], ' ') AS s "
    "FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i))"
)


def _sql_auc_daily() -> str:
    return (
        "WITH e AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grp, "
        "value AS s, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "g AS (SELECT grp, s, sum(y) AS pos, sum(1 - y) AS neg FROM e GROUP BY grp, s), "
        "c AS (SELECT grp, pos, neg, sum(neg) OVER (PARTITION BY grp ORDER BY s) - neg AS cneg FROM g) "
        "SELECT grp AS day_start, CAST(sum(pos) AS BIGINT) AS n_pos, "
        "CAST(sum(neg) AS BIGINT) AS n_neg, "
        "CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN "
        "round(CAST(sum(2 * pos * cneg + pos * neg) AS DOUBLE) "
        "/ (2.0 * sum(pos) * sum(neg)), 6) END AS auc FROM c GROUP BY grp"
    )


def _sql_benford_prices() -> str:
    ld = "regexp_extract(CAST(abs(l_extendedprice) AS VARCHAR), '[1-9]', 0)"
    exp = "log10(1 + 1.0 / digit)"
    return (
        f"WITH g AS (SELECT CAST({ld} AS INT) AS digit, count(*) AS n FROM lineitem "
        f"WHERE l_extendedprice IS NOT NULL AND l_extendedprice <> 0 AND {ld} <> '' "
        "GROUP BY 1), "
        "t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM g) "
        "SELECT digit, CAST(n AS BIGINT) AS n, "
        "round(CAST(n AS DOUBLE) / tot, 6) AS observed_freq, "
        f"round({exp}, 6) AS expected_freq, "
        f"round((CAST(n AS DOUBLE) / tot - {exp}) * (CAST(n AS DOUBLE) / tot - {exp}) "
        f"/ {exp} * tot, 6) AS chi2_term FROM g, t"
    )


def _sql_cusum_hourly(k: float) -> str:
    # recursive CTE replays the identical 9dp-rounded recurrence
    mu = "CAST(sum(CAST(m AS DECIMAL(38,6))) AS DOUBLE) / count(*)"
    return (
        "WITH RECURSIVE "
        "e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, CAST(value AS DOUBLE) AS v "
        "FROM events WHERE value IS NOT NULL), "
        "g AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, "
        "CAST(count(*) AS BIGINT) AS n, "
        "round(CAST(sum(CAST(round(v, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*), 9) AS m "
        "FROM e GROUP BY 1), "
        f"st AS (SELECT {mu} AS mu, "
        "sqrt(greatest(CAST(sum(CAST(round(m * m, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*) "
        f"- ({mu}) * ({mu}), 0)) AS sigma FROM g), "
        "gi AS (SELECT g.hour_start, g.n, "
        "CASE WHEN st.sigma > 0 THEN round((g.m - st.mu) / st.sigma, 9) ELSE 0.0 END AS z, "
        "ROW_NUMBER() OVER (ORDER BY g.hour_start) AS i FROM g, st), "
        "c AS (SELECT i, hour_start, n, z, "
        f"round(greatest(0, z - {k}), 9) AS s_pos, round(greatest(0, -z - {k}), 9) AS s_neg "
        "FROM gi WHERE i = 1 "
        "UNION ALL SELECT gi.i, gi.hour_start, gi.n, gi.z, "
        f"round(greatest(0, c.s_pos + gi.z - {k}), 9), "
        f"round(greatest(0, c.s_neg - gi.z - {k}), 9) "
        "FROM c JOIN gi ON gi.i = c.i + 1) "
        "SELECT hour_start, n, z, s_pos, s_neg FROM c"
    )


def _sql_readability() -> str:
    return (
        "WITH c AS (SELECT doc_id, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words, "
        "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences, "
        "len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables FROM documents) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(n_sentences AS BIGINT) AS n_sentences, CAST(n_syllables AS BIGINT) AS n_syllables, "
        "CASE WHEN n_words > 0 THEN round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) "
        "- 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) END AS flesch FROM c"
    )


def _sql_calibration_bins(bins: int) -> str:
    return (
        "WITH e AS (SELECT CAST(value AS DOUBLE) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT min(s) AS lo, CASE WHEN max(s) - min(s) = 0 THEN 1.0 "
        f"ELSE (max(s) - min(s)) / {float(bins)} END AS w FROM e), "
        f"b AS (SELECT least(floor((s - lo) / w), {bins - 1}) AS bin, s, y, lo, w FROM e, r) "
        "SELECT CAST(bin AS BIGINT) AS bin, round(min(lo + w * bin), 6) AS bin_lo, "
        "CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos, "
        "round(CAST(sum(CAST(round(s, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS mean_score, "
        "round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate FROM b GROUP BY bin"
    )


def _sql_value_auc() -> str:
    return (
        "WITH e AS (SELECT value AS s, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "g AS (SELECT s, sum(y) AS pos, sum(1 - y) AS neg FROM e GROUP BY s), "
        "c AS (SELECT s, pos, neg, sum(neg) OVER (ORDER BY s) - neg AS cneg FROM g) "
        "SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg, "
        "round(CAST(sum(2 * pos * cneg + pos * neg) AS DOUBLE) "
        "/ (2.0 * sum(pos) * sum(neg)), 6) AS auc FROM c"
    )


def _sql_edit_distance_pairs(max_dist: int, mod: int) -> str:
    return (
        f"WITH v AS (SELECT DISTINCT c_name AS value FROM customer WHERE c_custkey % {mod} = 0) "
        "SELECT a.value AS value_a, b.value AS value_b, "
        "CAST(levenshtein(a.value, b.value) AS INT) AS dist "
        "FROM v a JOIN v b ON a.value < b.value "
        f"AND abs(length(a.value) - length(b.value)) <= {max_dist} "
        f"WHERE levenshtein(a.value, b.value) <= {max_dist}"
    )


def _sql_cdc_chunks(target: int, min_words: int) -> str:
    cut = f"CASE WHEN CAST(('0x' || substr(md5('0:' || w), 1, 8)) AS UBIGINT) % {target} = 0 THEN 1 ELSE 0 END"
    return (
        f"WITH toks AS ({SQL_TOKS}), "
        "wds AS (SELECT doc_id AS id, t[p] AS w, p AS pos FROM toks "
        "CROSS JOIN unnest(generate_series(1, len(t))) AS g(p)), "
        f"m AS (SELECT id, w, pos, {cut} AS rawcut FROM wds), "
        "r AS (SELECT *, sum(rawcut) OVER (PARTITION BY id ORDER BY pos) - rawcut AS rawchunk FROM m), "
        "c AS (SELECT *, count(*) OVER (PARTITION BY id, rawchunk) AS chunklen FROM r), "
        f"e AS (SELECT *, CASE WHEN rawcut = 1 AND chunklen >= {min_words} THEN 1 ELSE 0 END AS cut FROM c), "
        "k AS (SELECT *, sum(cut) OVER (PARTITION BY id ORDER BY pos) - cut AS chunk_idx FROM e) "
        "SELECT id AS doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, "
        "CAST(count(*) AS BIGINT) AS n_words, "
        "string_agg(w, ' ' ORDER BY pos) AS chunk_text, "
        "md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_md5 "
        "FROM k GROUP BY 1, 2"
    )


def _sql_audio_frame_features(frame: int) -> str:
    # the fixture text is pure ASCII (verified: octet_length(blob) ==
    # length for every doc), so VARCHAR char positions == byte
    # positions and ord(substr(...)) == the payload byte. int16 LE:
    # lo + 256·hi − 65536·(hi ≥ 128). All frame sums are INTEGER, so
    # the float finish (divide, sqrt, round) is engine-exact.
    b = "ord(substr(text, CAST(i AS INT), 1)) + 256 * ord(substr(text, CAST(i AS INT) + 1, 1))"
    hi = "ord(substr(text, CAST(i AS INT) + 1, 1))"
    return (
        "WITH l AS (SELECT doc_id, text, (length(text) // 2) * 2 AS nb FROM documents "
        "WHERE length(text) >= 2), "
        "s AS (SELECT doc_id, CAST((i - 1) // 2 AS BIGINT) AS sidx, "
        f"{b} - CASE WHEN {hi} >= 128 THEN 65536 ELSE 0 END AS x "
        "FROM l CROSS JOIN unnest(generate_series(CAST(1 AS BIGINT), CAST(nb - 1 AS BIGINT), "
        "CAST(2 AS BIGINT))) AS g(i)), "
        f"f AS (SELECT doc_id, sidx, x, CAST(sidx // {frame} AS INT) AS frame_idx, "
        f"lag(x) OVER (PARTITION BY doc_id, CAST(sidx // {frame} AS INT) ORDER BY sidx) AS px "
        "FROM s) "
        "SELECT doc_id AS media_id, frame_idx, CAST(count(*) AS INT) AS n_samples, "
        "round(sqrt(CAST(sum(x * x) AS DOUBLE) / count(*)), 6) AS rms, "
        "CASE WHEN count(*) >= 2 THEN round(CAST(sum(CASE WHEN px IS NOT NULL "
        "AND sign(x) * sign(px) < 0 THEN 1 ELSE 0 END) AS DOUBLE) / (count(*) - 1), 6) "
        "ELSE 0.0 END AS zcr, "
        "CAST(max(abs(x)) AS INT) AS peak FROM f GROUP BY 1, 2"
    )


def _q_audio_fingerprint_pairs(spark, sf):
    # X213 perceptual audio near-dup: int16-LE PCM (real decode, no
    # codec) -> integer-exact energy-delta fingerprint (33-frame
    # floor-division grid, cross-multiplied mean-energy bits, one
    # sign-safe 32-bit word) -> pigeonhole-banded pair join + exact
    # Hamming verify. The oracle replays fingerprint AND banding from
    # the original bytes (the X158 audio discipline).
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    media = MM.to_media_table(docs, "doc_id", "payload", "audio/pcm")
    return MM.audio_fingerprint_pairs(
        MM.audio_energy_fingerprint(media, frames=32), max_hamming=3
    )


def _sql_audio_fingerprint_pairs(frames: int = 32, max_hamming: int = 3) -> str:
    """The fingerprint pipeline from the original bytes: int16-LE
    samples from char pairs (pure-ASCII fixture), ``frames+1``
    floor-division frames, integer energy sums, cross-multiplied
    delta bits, 4×8-bit pigeonhole bands, xor+bit_count Hamming."""
    b = "ord(substr(text, CAST(i AS INT), 1)) + 256 * ord(substr(text, CAST(i AS INT) + 1, 1))"
    hi = "ord(substr(text, CAST(i AS INT) + 1, 1))"
    g = frames + 1
    return (
        "WITH l AS (SELECT doc_id, text, (length(text) // 2) * 2 AS nb, "
        f"length(text) // 2 AS n FROM documents WHERE length(text) // 2 >= {g}), "
        "s AS (SELECT doc_id, n, CAST((i - 1) // 2 AS BIGINT) AS sidx, "
        f"{b} - CASE WHEN {hi} >= 128 THEN 65536 ELSE 0 END AS x "
        "FROM l CROSS JOIN unnest(generate_series(CAST(1 AS BIGINT), "
        "CAST(nb - 1 AS BIGINT), CAST(2 AS BIGINT))) AS g(i)), "
        f"e AS (SELECT doc_id, (sidx * {g}) // n AS fb, "
        "CAST(sum(x * x) AS BIGINT) AS en, CAST(count(*) AS BIGINT) AS cnt "
        "FROM s GROUP BY 1, 2), "
        "bits AS (SELECT a.doc_id, a.fb, "
        "CASE WHEN a.en * b2.cnt > b2.en * a.cnt THEN 1 ELSE 0 END AS bit "
        "FROM e a JOIN e b2 ON a.doc_id = b2.doc_id AND b2.fb = a.fb + 1 "
        f"WHERE a.fb < {frames}), "
        "words AS (SELECT doc_id, CAST(sum(bit * (CAST(1 AS BIGINT) << fb)) "
        "AS BIGINT) AS fp FROM bits GROUP BY 1), "
        "bands AS (SELECT doc_id, fp, unnest([0 * 256 + (fp // 1) % 256, "
        "1 * 256 + (fp // 256) % 256, 2 * 256 + (fp // 65536) % 256, "
        "3 * 256 + (fp // 16777216) % 256]) AS bk FROM words), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id) "
        "SELECT c.id_a, c.id_b, "
        "CAST(bit_count(xor(wa.fp, wb.fp)) AS BIGINT) AS hamming "
        "FROM cand c JOIN words wa ON c.id_a = wa.doc_id "
        "JOIN words wb ON c.id_b = wb.doc_id "
        f"WHERE bit_count(xor(wa.fp, wb.fp)) <= {max_hamming}"
    )


def _sql_count_min_words(probes: list[str], depth: int, width: int) -> str:
    def slot(d: str, v: str) -> str:
        return f"CAST(('0x' || substr(md5({d} || ':' || {v}), 1, 8)) AS UBIGINT) % {width}"

    probe_vals = ", ".join(f"('{w}')" for w in probes)
    depth_vals = ", ".join(f"({d})" for d in range(depth))
    return (
        f"WITH toks AS ({SQL_TOKS}), "
        "w AS (SELECT unnest(t) AS w FROM toks), "
        f"dd AS (SELECT * FROM (VALUES {depth_vals}) AS dv(d)), "
        f"state AS (SELECT d, {slot('d', 'w')} AS slot, CAST(count(*) AS BIGINT) AS n "
        "FROM w CROSS JOIN dd GROUP BY 1, 2), "
        f"pr AS (SELECT value, d, {slot('d', 'value')} AS slot "
        f"FROM (VALUES {probe_vals}) AS pv(value) CROSS JOIN dd) "
        "SELECT value, CAST(min(coalesce(n, 0)) AS BIGINT) AS cm_estimate "
        "FROM pr LEFT JOIN state USING (d, slot) GROUP BY value"
    )


def _sql_dup_graph_pagerank(
    damping: float = 0.85, iterations: int = 5, weighted: bool = False
) -> str:
    # unrolled power iteration: rT references r(T-1); per-iteration
    # round(…,12) mirrors operators/graph.py exactly, so the two
    # engines' float sums cannot drift across iterations. weighted=True
    # mirrors the weight_col kernel: transition mass w/strength(u).
    one_minus = 1.0 - damping  # same Python-evaluated literal both sides
    w_sel = ", jaccard AS w" if weighted else ""
    w_sel2 = ", jaccard" if weighted else ""
    kernel = "r.rank * und.w / r.strength" if weighted else "r.rank / r.strength"
    strength = "round(sum(w), 12)" if weighted else "round(sum(1.0), 12)"
    ctes = [
        f"und AS (SELECT id_a AS src, id_b AS dst{w_sel} FROM j "
        f"UNION SELECT id_b, id_a{w_sel2} FROM j)",
        f"deg AS (SELECT src, count(*) AS deg, {strength} AS strength FROM und GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM deg)",
        "r0 AS (SELECT src, deg, strength, round(1.0 / n_nodes, 12) AS rank FROM deg CROSS JOIN nn)",
    ]
    for t in range(1, iterations + 1):
        prev = f"r{t - 1}"
        ctes.append(
            f"r{t} AS (SELECT d.src, d.deg, d.strength, "
            f"round({one_minus!r} / nn.n_nodes + {damping!r} * coalesce(c.c, 0), 12) AS rank "
            f"FROM deg d CROSS JOIN nn LEFT JOIN "
            f"(SELECT und.dst, sum({kernel}) AS c FROM und "
            f"JOIN {prev} r ON und.src = r.src GROUP BY und.dst) c ON d.src = c.dst)"
        )
    return (
        f"WITH j AS ({_sql_ngram_jaccard()}), " + ", ".join(ctes) + " "
        f"SELECT src AS doc_id, CAST(deg AS BIGINT) AS degree, "
        f"round(rank, 6) AS pagerank FROM r{iterations}"
    )


def _sql_containment_join(threshold: float) -> str:
    # brute containment over the same n=3 shingle CTE: C(A→B) = |A∩B|/|A|
    return (
        f"{SQL_SHINGLES}, "
        "common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c "
        "FROM sh a JOIN sh b ON a.s = b.s AND a.id <> b.id GROUP BY 1, 2), "
        "sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id) "
        "SELECT id_a, id_b, round(CAST(c AS DOUBLE) / n, 6) AS containment "
        "FROM common JOIN sizes ON common.id_a = sizes.id "
        f"WHERE round(CAST(c AS DOUBLE) / n, 6) >= {threshold}"
    )


def _sql_jaccard_prefix(n: int, threshold: float) -> str:
    # oracle for jaccard_prefix_join: prefix filtering is exact (no
    # false negatives), so the oracle is the brute-force pair set at
    # the same (n, threshold) — parameterized shingle width.
    return (
        f"WITH toks AS ({SQL_TOKS}), "
        f"sh AS (SELECT DISTINCT doc_id AS id, array_to_string(t[i:i+{n - 1}], ' ') AS s "
        f"FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS g(i)), "
        "sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id), "
        "common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common "
        "FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY a.id, b.id), "
        "j AS (SELECT id_a, id_b, round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard "
        "FROM common JOIN sizes sa ON common.id_a = sa.id JOIN sizes sb ON common.id_b = sb.id) "
        f"SELECT * FROM j WHERE jaccard >= {threshold}"
    )


def _sql_ngram_jaccard() -> str:
    return (
        f"{SQL_SHINGLES}, "
        "sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id), "
        "common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common "
        "FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY a.id, b.id), "
        "j AS (SELECT id_a, id_b, round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard "
        "FROM common JOIN sizes sa ON common.id_a = sa.id JOIN sizes sb ON common.id_b = sb.id) "
        "SELECT * FROM j WHERE jaccard >= 0.5"
    )


def _sql_unigram_logprob(src: str = "documents") -> str:
    # src swaps the (doc_id, text) source relation (X242 reuse)
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        f"ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM {src}), "
        "ex AS (SELECT doc_id, unnest(t) AS tok FROM toks), "
        "cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok), "
        "tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM cnt), "
        "scored AS (SELECT ex.doc_id, CAST(round(-ln((cnt.c + 1.0) / (tot.total + tot.vocab)), 6) "
        "AS DECIMAL(38,6)) AS nlp FROM ex JOIN cnt USING (tok) CROSS JOIN tot), "
        "per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "floor(CAST(sum(nlp) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_neg_logprob "
        "FROM scored GROUP BY doc_id) "
        "SELECT toks.doc_id, CAST(coalesce(per_doc.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "per_doc.avg_neg_logprob FROM toks LEFT JOIN per_doc USING (doc_id)"
    )


def _sql_drift_timeline(bins: int = 100) -> str:
    return (
        "WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT min(value) AS lo, CASE WHEN max(value) - min(value) = 0 THEN 1.0 "
        f"ELSE (max(value) - min(value)) / {float(bins)} END AS w FROM e), "
        "bn AS (SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS hour_start, "
        f"least(floor((e.value - r.lo) / r.w), {bins - 1}) AS b FROM e, r), "
        "g AS (SELECT hour_start, b, count(*) AS c FROM bn GROUP BY 1, 2), "
        "gb AS (SELECT b, sum(c) AS cg FROM g GROUP BY b), "
        "hours AS (SELECT hour_start, sum(c) AS nh FROM g GROUP BY hour_start), "
        "grid AS (SELECT hour_start, nh, b, cg FROM hours CROSS JOIN gb), "
        "j AS (SELECT grid.hour_start, grid.nh, grid.b, grid.cg, coalesce(g.c, 0) AS c "
        "FROM grid LEFT JOIN g ON grid.hour_start = g.hour_start AND grid.b = g.b), "
        "cum AS (SELECT hour_start, nh, "
        "sum(c) OVER (PARTITION BY hour_start ORDER BY b) AS ch, "
        "sum(cg) OVER (PARTITION BY hour_start ORDER BY b) AS cgc FROM j), "
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM e) "
        "SELECT hour_start, CAST(max(nh) AS BIGINT) AS n_rows, "
        "round(max(abs(CAST(ch AS DOUBLE) / nh - CAST(cgc AS DOUBLE) / tot.total)), 6) AS ks_stat "
        "FROM cum, tot GROUP BY hour_start"
    )


def _sql_events_hourly_users() -> str:
    return (
        "SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events GROUP BY 1"
    )


def _sql_k_anonymity_violations(k: int) -> str:
    qi = ", ".join(QI_COLS)
    return (
        f"SELECT {qi}, CAST(count(*) AS BIGINT) AS class_size "
        f"FROM customer GROUP BY {qi} HAVING count(*) < {k}"
    )


def _sql_pack_stats(budget: int, buckets: int) -> str:
    return (
        f"WITH p AS ({_sql_pack_sequences(budget, buckets)}), "
        "pb AS (SELECT bucket, count(*) AS docs, sum(n_tokens) AS toks FROM p GROUP BY bucket), "
        f"w AS (SELECT docs, toks, CAST(ceil(toks / {float(budget)}) AS BIGINT) AS w FROM pb), "
        "a AS (SELECT CAST(sum(docs) AS BIGINT) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens, "
        "CAST(count(*) AS BIGINT) AS n_buckets, CAST(sum(w) AS BIGINT) AS n_windows FROM w) "
        f"SELECT n_docs, total_tokens, n_buckets, n_windows, "
        f"round(CAST(total_tokens AS DOUBLE) / (n_windows * {budget}), 6) AS avg_window_fill, "
        f"round(CAST(n_windows * {budget} - total_tokens AS DOUBLE) / (n_windows * {budget}), 6) AS wasted_fraction "
        "FROM a"
    )


def _sql_bigram_logprob() -> str:
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "ex AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1, "
        "unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg "
        "FROM toks WHERE len(t) >= 2), "
        "bgc AS (SELECT bg, count(*) AS cbg FROM ex GROUP BY bg), "
        "w1c AS (SELECT w1, count(*) AS cw1 FROM ex GROUP BY w1), "
        "tot AS (SELECT count(*) AS vocab FROM bgc), "
        "scored AS (SELECT ex.doc_id, CAST(round(-ln((bgc.cbg + 1.0) / (w1c.cw1 + tot.vocab)), 6) "
        "AS DECIMAL(38,6)) AS nlp FROM ex JOIN bgc USING (bg) JOIN w1c USING (w1) CROSS JOIN tot), "
        "per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "floor(CAST(sum(nlp) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_neg_logprob "
        "FROM scored GROUP BY doc_id) "
        "SELECT toks.doc_id, CAST(coalesce(per_doc.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
        "per_doc.avg_neg_logprob FROM toks LEFT JOIN per_doc USING (doc_id)"
    )


def _sql_jsd(a_select: str, b_select: str, bins: int = 10) -> str:
    # mirrors drift.jsd_drift: same bin math as _sql_ks_binned, KL terms
    # with 0·ln(0/m) := 0, round@10 → DECIMAL-sum → round 6
    return (
        f"WITH a AS ({a_select}), b AS ({b_select}), "
        "u AS (SELECT CAST(v AS DOUBLE) AS v, 1 AS ka, 0 AS kb FROM a "
        "UNION ALL SELECT CAST(v AS DOUBLE) AS v, 0 AS ka, 1 AS kb FROM b), "
        "r AS (SELECT min(v) AS lo, CASE WHEN max(v) - min(v) = 0 THEN 1.0 "
        f"ELSE (max(v) - min(v)) / {float(bins)} END AS w FROM u), "
        f"bn AS (SELECT least(floor((u.v - r.lo) / r.w), {bins - 1}) AS b, ka, kb FROM u, r), "
        "g AS (SELECT b, sum(ka) AS ca, sum(kb) AS cb FROM bn GROUP BY b), "
        "p AS (SELECT coalesce(CAST(ca AS DOUBLE) / nullif(sum(ca) OVER (), 0), 0.0) AS pa, "
        "coalesce(CAST(cb AS DOUBLE) / nullif(sum(cb) OVER (), 0), 0.0) AS pb, "
        "sum(ca) OVER () AS na, sum(cb) OVER () AS nb FROM g), "
        "k AS (SELECT na, nb, CAST(round(0.5 * ("
        "(CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0.0 END) + "
        "(CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0.0 END)), 10) "
        "AS DECIMAL(38,10)) AS t FROM p) "
        "SELECT CASE WHEN max(na) > 0 AND max(nb) > 0 THEN "
        "round(CAST(sum(t) AS DOUBLE), 6) END AS jsd FROM k"
    )


def _sql_length_histogram(max_pow: int = 20) -> str:
    # integer CASE chain, not floor(log2(n)) — see operators.text
    cases = " ".join(f"WHEN len(t) >= {1 << b} THEN {b}" for b in range(max_pow, -1, -1))
    return (
        f"WITH toks AS ({SQL_TOKS}), "
        f"st AS (SELECT CASE {cases} ELSE -1 END AS bucket, len(t) AS n FROM toks) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, "
        "CAST(CASE WHEN bucket >= 0 THEN power(2.0, bucket) ELSE 0 END AS BIGINT) AS lo_tokens, "
        "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens "
        "FROM st GROUP BY bucket"
    )


def _sql_contamination_scan() -> str:
    return (
        "SELECT p.probe, CAST(count(d.doc_id) AS BIGINT) AS n_docs, "
        "min(d.doc_id) AS example_doc_id FROM (VALUES "
        + ", ".join(f"('{p}')" for p in CONTAMINATION_PROBES)
        + ") AS p(probe) LEFT JOIN documents d ON contains(d.text, p.probe) "
        "GROUP BY p.probe"
    )


def _sql_hourly_retention() -> str:
    return (
        "WITH uh AS (SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS h FROM events), "
        "f AS (SELECT u, h, CASE WHEN lead(h) OVER (PARTITION BY u ORDER BY h) = h + INTERVAL 1 HOUR "
        "THEN 1 ELSE NULL END AS ret FROM uh) "
        "SELECT h AS hour_start, CAST(count(*) AS BIGINT) AS n_users, "
        "CAST(COALESCE(sum(ret), 0) AS BIGINT) AS n_retained, "
        "round(CAST(COALESCE(sum(ret), 0) AS DOUBLE) / count(*), 6) AS retention_rate "
        "FROM f GROUP BY h"
    )


def _sql_drift_timeline_psi(bins: int = 100, eps: float = 1e-6) -> str:
    return (
        "WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT min(value) AS lo, CASE WHEN max(value) - min(value) = 0 THEN 1.0 "
        f"ELSE (max(value) - min(value)) / {float(bins)} END AS w FROM e), "
        "bn AS (SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS hour_start, "
        f"least(floor((e.value - r.lo) / r.w), {bins - 1}) AS b FROM e, r), "
        "g AS (SELECT hour_start, b, count(*) AS c FROM bn GROUP BY 1, 2), "
        "gb AS (SELECT b, sum(c) AS cg FROM g GROUP BY b), "
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM g), "
        "refp AS (SELECT b, cg / tot.total AS ref_p FROM gb, tot), "
        "hours AS (SELECT hour_start, sum(c) AS nh FROM g GROUP BY hour_start), "
        "grid AS (SELECT hour_start, nh, b, ref_p FROM hours CROSS JOIN refp), "
        "j AS (SELECT grid.hour_start, grid.nh, grid.ref_p, coalesce(g.c, 0) AS c "
        "FROM grid LEFT JOIN g ON grid.hour_start = g.hour_start AND grid.b = g.b), "
        "t AS (SELECT hour_start, nh, CAST(round("
        f"(greatest(CAST(c AS DOUBLE) / nh, {eps}) - greatest(ref_p, {eps})) * "
        f"ln(greatest(CAST(c AS DOUBLE) / nh, {eps}) / greatest(ref_p, {eps})), 10) "
        "AS DECIMAL(38,10)) AS term FROM j) "
        "SELECT hour_start, CAST(max(nh) AS BIGINT) AS n_rows, "
        "round(CAST(sum(term) AS DOUBLE), 6) AS psi FROM t GROUP BY hour_start"
    )


def _sql_rolling_anomalies(n: int, factor: float, min_n: int) -> str:
    return (
        "WITH s AS (SELECT event_id, user_id, ts, value, "
        "round(CAST(sum(CAST(value AS DECIMAL(38,12))) OVER w AS DOUBLE) / count(*) OVER w, 6) AS baseline_mean, "
        "CAST(count(*) OVER w AS BIGINT) AS baseline_n "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING)) "
        "SELECT event_id, user_id, ts, value, baseline_mean, baseline_n FROM s "
        f"WHERE baseline_n >= {min_n} AND value > {factor} * baseline_mean"
    )


def _sql_session_funnel(steps: tuple, gap_minutes: int) -> str:
    gap_us = gap_minutes * 60_000_000
    mins = ", ".join(
        f"min(CASE WHEN event_type = '{s}' THEN ts END) AS t{i}"
        for i, s in enumerate(steps)
    )
    chain, inds = [], []
    for i in range(len(steps)):
        chain.append(f"t{i} IS NOT NULL" if i == 0 else f"t{i} > t{i-1}")
        inds.append("CASE WHEN " + " AND ".join(chain) + " THEN 1 ELSE 0 END")
    counts = ", ".join(f"CAST(sum({ind}) AS BIGINT) AS c{i}" for i, ind in enumerate(inds))
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{s}' AS step, COALESCE(c{i}, 0) AS n_sessions FROM counts"
        for i, s in enumerate(steps)
    )
    return (
        "WITH tagged AS (SELECT user_id, ts, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        f"OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us} THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "sess AS (SELECT user_id, ts, event_type, sum(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id "
        "FROM tagged), "
        f"mins AS (SELECT user_id, session_id, {mins} FROM sess GROUP BY user_id, session_id), "
        f"counts AS (SELECT {counts} FROM mins) "
        + selects
    )


def _sql_rolling_user_stats(n: int) -> str:
    return (
        "SELECT event_id, user_id, ts, value, "
        "round(CAST(sum(CAST(value AS DECIMAL(38,12))) OVER w AS DOUBLE) / count(*) OVER w, 6) AS roll_mean, "
        "max(value) OVER w AS roll_max, "
        "CAST(count(*) OVER w AS BIGINT) AS roll_n "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
    )


def _sql_weighted_sample() -> str:
    return (
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
        "/ 4294967296.0 <= least(1.0, greatest(0.0, n_chars / 400.0))"
    )


def _sql_quantile_rank() -> str:
    return (
        "SELECT event_id, value, round(cume_dist() OVER (ORDER BY value), 6) AS q_rank "
        "FROM events WHERE value IS NOT NULL"
    )


def _sql_group_quantiles(probs: tuple) -> str:
    cols = ", ".join(
        f"round(quantile_cont(n_chars, {p}), 6) AS p{int(round(p * 100)):02d}"
        for p in probs
    )
    return f"SELECT source, {cols} FROM documents GROUP BY source"


def _sql_source_share() -> str:
    return (
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "round(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE), 6) AS share "
        "FROM documents GROUP BY source"
    )


def _sql_minhash_threshold_curve(num_hashes: int, bands: int, buckets: int) -> str:
    return (
        f"WITH p AS ({_sql_minhash_lsh(num_hashes, bands, 0.0)}) "
        f"SELECT round(least(floor(est_jaccard * {buckets}), {buckets - 1}) / {float(buckets)}, 6) AS bucket_lo, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1"
    )


def _sql_cluster_size_histogram() -> str:
    return (
        f"WITH RECURSIVE j AS ({_sql_ngram_jaccard()}), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM j "
        "UNION ALL SELECT id_b, id_a FROM j), "
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id AS doc_id, min(r) AS comp_id FROM reach GROUP BY id), "
        "sizes AS (SELECT comp_id, count(*) AS cluster_size FROM comp GROUP BY comp_id) "
        "SELECT CAST(cluster_size AS BIGINT) AS cluster_size, "
        "CAST(count(*) AS BIGINT) AS n_clusters FROM sizes GROUP BY cluster_size"
    )


def _sql_returned_revenue() -> str:
    return (
        "SELECT c_custkey, c_name, c_acctbal, c_mktsegment, "
        "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment "
        "ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
    )


def _sql_large_orders(threshold: int) -> str:
    return (
        "WITH big AS (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,10))) AS q "
        f"FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(38,10))) > {threshold}) "
        "SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, "
        "round(CAST(q AS DOUBLE), 2) AS total_qty "
        "FROM big JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey"
    )


def _sql_enforce_k_anonymity(k: int) -> str:
    qi = ", ".join(QI_COLS)
    cols = []
    for c in ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]:
        if c in QI_COLS:
            cols.append(
                f"CASE WHEN count(*) OVER (PARTITION BY {qi}) < {k} "
                f"THEN '*' ELSE CAST({c} AS VARCHAR) END AS {c}"
            )
        else:
            cols.append(c)
    return f"SELECT {', '.join(cols)} FROM customer"


def _sql_t_closeness(t: float) -> str:
    return (
        "WITH d AS (SELECT c_nationkey AS q0, COALESCE(CAST(c_mktsegment AS VARCHAR), '__NULL__') AS s FROM customer), "
        "cs AS (SELECT q0, s, count(*) AS c FROM d GROUP BY q0, s), "
        "cls AS (SELECT q0, sum(c) AS n_c FROM cs GROUP BY q0), "
        "gn AS (SELECT s, sum(c) AS g, (SELECT sum(c) FROM cs) AS N FROM cs GROUP BY s), "
        "grid AS (SELECT cls.q0, cls.n_c, gn.s, gn.g, gn.N FROM cls CROSS JOIN gn), "
        "j AS (SELECT grid.q0, grid.n_c, grid.g, grid.N, COALESCE(cs.c, 0) AS c "
        "FROM grid LEFT JOIN cs ON grid.q0 = cs.q0 AND grid.s = cs.s), "
        "pc AS (SELECT q0, round(CAST(sum(CAST(round(abs(CAST(c AS DOUBLE)/n_c - CAST(g AS DOUBLE)/N), 10) "
        "AS DECIMAL(38,10))) AS DOUBLE)/2, 6) AS tv FROM j GROUP BY q0) "
        "SELECT round(max(tv), 6) AS t_closeness, CAST(count(*) AS BIGINT) AS n_classes, "
        f"CAST(sum(CASE WHEN tv > {t} THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_classes, "
        f"CAST({t} AS DOUBLE) AS t_required, CAST(max(tv) <= {t} AS BOOLEAN) AS satisfies_t FROM pc"
    )


def _sql_mutual_information() -> str:
    return (
        "WITH d AS (SELECT COALESCE(CAST(source AS VARCHAR), '__NULL__') AS x, "
        "COALESCE(CAST(lang AS VARCHAR), '__NULL__') AS y FROM documents), "
        "cxy AS (SELECT x, y, count(*) AS cxy FROM d GROUP BY x, y), "
        "p AS (SELECT x, y, cxy, sum(cxy) OVER (PARTITION BY x) AS cx, "
        "sum(cxy) OVER (PARTITION BY y) AS cy, sum(cxy) OVER () AS n FROM cxy) "
        "SELECT round(CAST(sum(CAST(round((CAST(cxy AS DOUBLE)/n) * "
        "ln((CAST(cxy AS DOUBLE)*n)/(CAST(cx AS DOUBLE)*cy)), 10) AS DECIMAL(38,10))) AS DOUBLE), 6) AS mi, "
        "CAST(count(DISTINCT x) AS BIGINT) AS n_x_categories, "
        "CAST(count(DISTINCT y) AS BIGINT) AS n_y_categories FROM p"
    )


def _sql_decontaminate() -> str:
    cond = " OR ".join(f"contains(text, '{p}')" for p in CONTAMINATION_PROBES)
    return f"SELECT * FROM documents WHERE NOT COALESCE({cond}, FALSE)"


def _sql_contamination_ngram(probes: list[str]) -> str:
    values = ", ".join(f"('{p}')" for p in probes)
    return (
        f"{SQL_SHINGLES}, "
        f"probes(probe) AS (VALUES {values}), "
        "ptoks AS (SELECT probe, CASE WHEN trim(probe) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(probe), '\\s+') END AS t FROM probes), "
        "psh AS (SELECT DISTINCT probe, array_to_string(t[i:i+2], ' ') AS s "
        "FROM ptoks CROSS JOIN unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)), "
        "totals AS (SELECT p.probe, count(psh.s) AS n_shingles FROM probes p "
        "LEFT JOIN psh ON p.probe = psh.probe GROUP BY p.probe), "
        "hits AS (SELECT psh.probe, count(DISTINCT sh.s) AS n_matched, "
        "count(DISTINCT sh.id) AS n_docs FROM sh JOIN psh ON sh.s = psh.s GROUP BY psh.probe) "
        "SELECT t.probe, CAST(t.n_shingles AS BIGINT) AS n_shingles, "
        "CAST(coalesce(h.n_matched, 0) AS BIGINT) AS n_matched, "
        "CASE WHEN t.n_shingles > 0 THEN "
        "round(CAST(coalesce(h.n_matched, 0) AS DOUBLE) / t.n_shingles, 6) END AS overlap_fraction, "
        "CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs "
        "FROM totals t LEFT JOIN hits h USING (probe)"
    )


def _sql_dedup_components() -> str:
    # connected components as a recursive CTE: reach(id, r) holds every
    # label r reachable from id; min(r) per id = the component id
    return (
        f"WITH RECURSIVE j AS ({_sql_ngram_jaccard()}), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM j "
        "UNION ALL SELECT id_b, id_a FROM j), "
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) "
        "SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS comp_id, "
        "(min(r) = id) AS is_canonical FROM reach GROUP BY id"
    )


def _sql_minhash_lsh(num_hashes: int, bands: int, threshold: float) -> str:
    # the banded-LSH candidate generator is md5-deterministic end to
    # end, so even the "approximate" path is oracle-checkable
    rows = num_hashes // bands
    slot_list = ", ".join(f"mh_{i}" for i in range(num_hashes))
    band_selects = []
    for b in range(bands):
        parts = " || '|' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS key FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    return (
        f"WITH sig AS ({_sql_minhash_signatures(num_hashes)}), "
        f"sigarr AS (SELECT doc_id, [{slot_list}] AS s FROM sig), "
        f"buckets AS ({buckets}), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM buckets a "
        "JOIN buckets b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), "
        "est AS (SELECT c.id_a, c.id_b, "
        f"round(len(list_filter(range(1, {num_hashes + 1}), i -> sa.s[i] = sb.s[i])) / {float(num_hashes)}, 6) AS est_jaccard "
        "FROM cand c JOIN sigarr sa ON c.id_a = sa.doc_id JOIN sigarr sb ON c.id_b = sb.doc_id) "
        f"SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}"
    )


def _hash_slot_sql(expr: str, slot: int) -> str:
    return f"CAST(CAST(('0x' || substr(md5('{slot}:' || {expr}), 1, 8)) AS UBIGINT) AS BIGINT)"


def _sql_minhash_signatures(num_hashes: int = 16, src: str = "documents") -> str:
    from safedata_pipeline_spark.operators.dedup import MINHASH_P, minhash_params

    sh_list = (
        "list_distinct([array_to_string(t[i:i+2], ' ') "
        "FOR i IN generate_series(1, greatest(len(t) - 2, 0))])"
    )
    slots = ", ".join(
        f"list_min([({a} * h + {b}) % {MINHASH_P} FOR h IN hs]) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    return (
        f"WITH toks AS ({_sql_toks(src)}), g AS (SELECT doc_id, {sh_list} AS ss FROM toks), "
        f"hh AS (SELECT doc_id, [{_hash_slot_sql('s', 0)} FOR s IN ss] AS hs FROM g) "
        f"SELECT doc_id, {slots} FROM hh"
    )


def _sql_simhash(bits: int = 32) -> str:
    votes = ", ".join(
        f"CAST(sum(CASE WHEN (hv & {1 << j}) <> 0 THEN 1 ELSE -1 END) AS BIGINT) AS v{j}"
        for j in range(bits)
    )
    packed = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits))
    # LEFT JOIN back to the full doc list: a doc with an empty token
    # array produces no unnest rows (it would vanish from the GROUP BY),
    # while Spark's per-row fold emits simhash=0 for it — coalesce keeps
    # the row sets identical.
    return (
        f"WITH toks AS ({SQL_TOKS}), "
        "tok AS (SELECT doc_id, unnest(t) AS tk FROM toks), "
        f"h AS (SELECT doc_id, {_hash_slot_sql('tk', 0)} AS hv FROM tok), "
        f"votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id), "
        f"packed AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes) "
        "SELECT toks.doc_id, CAST(coalesce(packed.simhash, 0) AS BIGINT) AS simhash "
        "FROM toks LEFT JOIN packed ON toks.doc_id = packed.doc_id"
    )


def _sql_simhash_pairs(bits: int, bands: int, max_hamming: int) -> str:
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = " UNION ALL ".join(
        f"SELECT doc_id AS id, simhash, {i} AS band, "
        f"(simhash >> {i * band_bits}) & {mask} AS band_key FROM sig"
        for i in range(bands)
    )
    return (
        f"WITH sig AS ({_sql_simhash(bits)}), "
        f"banded AS ({banded}) "
        "SELECT DISTINCT a.id AS id_a, b.id AS id_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        "FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key "
        "AND a.id < b.id "
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


def _sql_embedding_centroids() -> str:
    return (
        "WITH ex AS (SELECT label, unnest(embedding::DOUBLE[]) AS x, "
        "unnest(range(0, len(embedding))) AS dim FROM embeddings) "
        "SELECT label, CAST(dim AS BIGINT) AS dim, "
        "floor(CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*) * 1000000.0 + 0.5) "
        "/ 1000000.0 AS centroid_val, "
        "CAST(count(*) AS BIGINT) AS n_vectors FROM ex GROUP BY label, dim"
    )


SQL_EMB = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
# zero-norm guard mirrors functions.vector.cosine: undefined → NULL
# (DuckDB's x/0 is inf/NaN, and NaN sorts above all values there)
SQL_COS = (
    "CASE WHEN list_dot_product(a.v, a.v) > 0 AND list_dot_product(b.v, b.v) > 0 "
    "THEN list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) "
    "ELSE NULL END"
)


def _sql_embedding_cosine_dedup(threshold: float = 0.4) -> str:
    return (
        f"WITH e AS ({SQL_EMB}), "
        f"p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({SQL_COS}, 6) AS cosine "
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) "
        f"SELECT * FROM p WHERE cosine >= {threshold}"
    )


def _sql_ann_cosine_topk(k: int = 5) -> str:
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(e.v, e.v) > 0 "
        "THEN list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) "
        "ELSE NULL END"
    )
    return (
        f"WITH e AS ({SQL_EMB}), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10), "
        f"scored AS (SELECT q.query_id, e.vec_id AS id, {cos} AS cosine "
        "FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id), "
        # NULL (zero-norm) cosines are excluded from ranking, mirroring
        # the Spark _topk filter
        "scored_nn AS (SELECT * FROM scored WHERE cosine IS NOT NULL), "
        "r AS (SELECT query_id, id, cosine, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, id ASC) AS rn FROM scored_nn) "
        f"SELECT query_id, CAST(rn AS BIGINT) AS rank, id AS neighbor_id, "
        f"round(cosine, 6) AS cosine FROM r WHERE rn <= {k}"
    )


def _sql_asof_last_click() -> str:
    # DuckDB has a native ASOF join — the engine's union+window
    # construction must agree with it exactly
    return (
        "WITH e AS (SELECT * FROM events WHERE event_type = 'error'), "
        "c AS (SELECT * FROM events WHERE event_type = 'click') "
        "SELECT e.event_id, e.user_id, e.ts, c.event_id AS click_event_id, "
        "c.ts AS click_ts, c.value AS click_value "
        "FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts"
    )


def _sql_range_join_tiers() -> str:
    values = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in TIERS)
    return (
        f"SELECT e.event_id, e.value, t.tier FROM events e "
        f"LEFT JOIN (VALUES {values}) AS t(tier, lo, hi) "
        f"ON e.value >= t.lo AND e.value < t.hi"
    )


def _sql_hypertable_rollup() -> str:
    def level(unit: str) -> str:
        return (
            f"SELECT '{unit}' AS resolution, CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS bucket_start, "
            "event_type, count(*) AS n_events, "
            "round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE), 4) AS sum_value, "
            "min(value) AS min_value, max(value) AS max_value, "
            "round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_value "
            "FROM events GROUP BY 2, 3"
        )

    # the engine re-aggregates partials (hour -> day -> month); the
    # oracle aggregates straight from raw — decimal sums make them equal
    return " UNION ALL ".join(level(u) for u in ("hour", "day", "month"))


def _sql_kmv_distinct(k: int) -> str:
    def col_sql(c: str) -> str:
        hv = (
            f"(CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
            "/ 4294967296.0"
        )
        return (
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS k_used, "
            f"round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE) "
            f"ELSE {float(k - 1)} / max(hv) END, 6) AS kmv_estimate "
            f"FROM (SELECT hv FROM (SELECT DISTINCT {hv} AS hv FROM customer "
            f"WHERE {c} IS NOT NULL) ORDER BY hv LIMIT {k})"
        )

    return " UNION ALL ".join(col_sql(c) for c in KMV_COLS)


def _sql_kmv_distinct_prefilter(k: int, t: float) -> str:
    def col_sql(c: str) -> str:
        hv = (
            f"(CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
            "/ 4294967296.0"
        )
        return (
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS k_used, "
            f"round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE) / {t} "
            f"ELSE {float(k - 1)} / max(hv) END, 6) AS kmv_estimate "
            f"FROM (SELECT hv FROM (SELECT DISTINCT {hv} AS hv FROM customer "
            f"WHERE {c} IS NOT NULL) WHERE hv < {t} ORDER BY hv LIMIT {k})"
        )

    return " UNION ALL ".join(col_sql(c) for c in KMV_COLS)


def _sql_multimodal_meta() -> str:
    return (
        "SELECT doc_id AS media_id, 'text/plain' AS mime, "
        "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, "
        "sha256(text) AS sha256 FROM documents"
    )


def _sql_events_hourly() -> str:
    return (
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type, "
        "count(*) AS n_events, "
        "round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_value, "
        "round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE), 4) AS sum_value "
        "FROM events GROUP BY 1, 2"
    )


def _sql_events_json() -> str:
    return "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events"


def _sql_user_sessions(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    # CAST ts to µs TIMESTAMP first: Spark reads the nano fixtures µs-
    # truncated, DuckDB keeps ns — truncate so gap math + outputs agree
    return (
        "WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events), "
        "tagged AS (SELECT user_id, ts, value, CAST(coalesce("
        f"epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > {gap_us}, "
        "true) AS BIGINT) AS new_s FROM ev), "
        "sess AS (SELECT user_id, ts, value, sum(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id FROM tagged) "
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, min(ts) AS session_start, "
        "max(ts) AS session_end, count(*) AS n_events, "
        "round(CAST(sum(value) AS DOUBLE), 4) AS sum_value "
        "FROM sess GROUP BY user_id, session_id"
    )


def _sql_impute() -> str:
    return (
        "WITH base AS (SELECT c_custkey, CASE WHEN c_custkey % 50 = 0 THEN NULL "
        "ELSE c_acctbal END AS v FROM customer), "
        "m AS (SELECT avg(v) AS mu FROM base) "
        "SELECT c_custkey, round(coalesce(v, m.mu), 6) AS acctbal_imputed FROM base, m"
    )


def _sql_checklist_score() -> str:
    rows = ", ".join(f"('{k}', false)" for k, _, _ in C.CHECKLIST_ITEMS)
    return (
        f"SELECT round(coalesce(avg(CAST(status AS DOUBLE)), 0.0), 6) AS score, "
        f"count(*) AS n_items, CAST(sum(CAST(status AS INT)) AS BIGINT) AS n_done "
        f"FROM (VALUES {rows}) AS t(key, status)"
    )


def _sql_source_mixture_sample(shares: dict[str, float]) -> str:
    vals = ", ".join(f"('{s}', {w!r})" for s, w in sorted(shares.items()))
    return (
        "WITH cnt AS (SELECT source, CAST(count(*) AS DOUBLE) AS c "
        "FROM documents GROUP BY source), "
        f"sh(source, share) AS (VALUES {vals}), "
        "j AS (SELECT cnt.source, c, share FROM cnt JOIN sh ON cnt.source = sh.source "
        "WHERE share > 0), "
        # rate = share * min(c/share) / c, same IEEE op order as mixture_rates
        "rate AS (SELECT source, share * (SELECT min(c / share) FROM j) / c AS r FROM j) "
        "SELECT d.doc_id, d.source FROM documents d JOIN rate ON d.source = rate.source "
        "WHERE (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
        "/ 4294967296.0 <= r"
    )


def _sql_quality_deciles(buckets: int = 10) -> str:
    probs = ", ".join(repr(i / buckets) for i in range(buckets + 1))
    return (
        f"WITH s0 AS ({_sql_quality_score()}), "
        "s AS (SELECT n_tokens, quality FROM s0), "
        f"qs AS (SELECT unnest(quantile_cont(quality, [{probs}])) AS e FROM s), "
        "ded AS (SELECT DISTINCT e FROM qs WHERE e IS NOT NULL), "
        "ord AS (SELECT e, row_number() OVER (ORDER BY e) - 1 AS i FROM ded), "
        "pairs AS (SELECT a.i AS bucket, a.e AS lo, b.e AS hi, "
        "b.i = (SELECT max(i) FROM ord) AS islast FROM ord a JOIN ord b ON b.i = a.i + 1), "
        # bin against the UNROUNDED edges, [lo, hi) with the top bucket closed
        "asg AS (SELECT s.n_tokens, s.quality, p.bucket, p.lo, p.hi FROM s JOIN pairs p "
        "ON s.quality >= p.lo AND (s.quality < p.hi OR (p.islast AND s.quality <= p.hi))) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, "
        "floor(lo * 1000000.0 + 0.5) / 1000000.0 AS lo, "
        "floor(hi * 1000000.0 + 0.5) / 1000000.0 AS hi, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS total_ws_tokens, "
        "floor(CAST(sum(CAST(quality AS DECIMAL(38,6))) AS DOUBLE) / count(*) "
        "* 1000000.0 + 0.5) / 1000000.0 AS avg_quality "
        "FROM asg GROUP BY bucket, lo, hi"
    )


def _sql_check_rules(table: str, rules: list[dict]) -> str:
    """Mirror of quality_rules.check_rules: one CTE computes every
    metric; UNION ALL emits one literal-typed row per rule."""
    return _sql_rules_impl(table, [], rules)


def _sql_check_rules_by(table: str, group_cols: list[str], rules: list[dict]) -> str:
    """Mirror of quality_rules.check_rules_by: grouped metric CTE."""
    return _sql_rules_impl(table, group_cols, rules)


def _sql_rules_impl(table: str, group_cols: list[str], rules: list[dict]) -> str:
    metrics = []
    for i, r in enumerate(rules):
        k, c = r["kind"], r.get("col")
        if k == "completeness":
            m = f"count({c}) * 1.0 / count(*)"
        elif k == "uniqueness":
            # nullif mirrors Spark's try_divide: all-NULL column group
            # → NULL metric → passed=FALSE on both engines
            m = f"count(DISTINCT {c}) * 1.0 / nullif(count({c}), 0)"
        elif k == "min":
            m = f"CAST(min({c}) AS DOUBLE)"
        elif k == "max":
            m = f"CAST(max({c}) AS DOUBLE)"
        elif k == "mean":
            m = f"avg({c})"
        elif k == "pattern":
            m = (
                f"sum(CASE WHEN regexp_matches({c}, '{r['regex']}') THEN 1 ELSE 0 END)"
                f" * 1.0 / nullif(count({c}), 0)"
            )
        elif k == "in_set":
            vals = ", ".join(f"'{v}'" for v in r["allowed"])
            m = f"sum(CASE WHEN {c} IN ({vals}) THEN 1 ELSE 0 END) * 1.0 / nullif(count({c}), 0)"
        else:  # row_count
            m = "CAST(count(*) AS DOUBLE)"
        metrics.append(f"round({m}, 6) AS m{i}")
    rows = []
    for i, r in enumerate(rules):
        k = r["kind"]
        if k in ("completeness", "uniqueness", "pattern", "in_set"):
            low, high = float(r.get("min_ratio", 1.0)), None
        else:
            low = float(r["low"]) if "low" in r else None
            high = float(r["high"]) if "high" in r else None
        name = r.get("name") or f"{k}_{r.get('col', 'table')}"
        low_s = f"{low}" if low is not None else "CAST(NULL AS DOUBLE)"
        high_s = f"{high}" if high is not None else "CAST(NULL AS DOUBLE)"
        ok = []
        if low is not None:
            ok.append(f"m{i} >= {low}")
        if high is not None:
            ok.append(f"m{i} <= {high}")
        ok_s = " AND ".join(ok) if ok else "TRUE"
        grp_sel = "".join(f"{g}, " for g in group_cols)
        rows.append(
            f"SELECT {grp_sel}'{name}' AS rule, '{r.get('col', '')}' AS col, '{k}' AS metric, "
            f"m{i} AS value, {low_s} AS low, {high_s} AS high, "
            f"coalesce({ok_s}, FALSE) AS passed FROM m"
        )
    grp_cte = "".join(f"{g}, " for g in group_cols)
    group_by = f" GROUP BY {', '.join(group_cols)}" if group_cols else ""
    return (
        f"WITH m AS (SELECT {grp_cte}{', '.join(metrics)} FROM {table}{group_by}) "
        + " UNION ALL ".join(rows)
    )


_SQL_TOKS = (
    "SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
    "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t "
    "FROM documents WHERE text IS NOT NULL"
)


def _sql_dedup_rate_by_source() -> str:
    uniq = (
        "count(DISTINCT md5(text)) "
        "+ sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)"
    )
    return (
        "SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST({uniq} AS BIGINT) AS n_unique, "
        f"round(1.0 - ({uniq}) * 1.0 / count(*), 6) AS dup_rate "
        "FROM documents GROUP BY source"
    )


def _sql_cohort_retention() -> str:
    return (
        "WITH act AS (SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d "
        "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
        "cohorts AS (SELECT u, min(d) AS c0 FROM act GROUP BY u), "
        "sizes AS (SELECT c0, CAST(count(*) AS BIGINT) AS cohort_n FROM cohorts GROUP BY c0), "
        "grid AS (SELECT c0, CAST(date_diff('day', c0, d) AS INT) AS day_offset, "
        "CAST(count(*) AS BIGINT) AS n_users FROM act JOIN cohorts USING (u) "
        "GROUP BY c0, date_diff('day', c0, d)) "
        "SELECT g.c0 AS cohort_day, g.day_offset, g.n_users, "
        "round(g.n_users * 1.0 / s.cohort_n, 6) AS retention_rate "
        "FROM grid g JOIN sizes s USING (c0)"
    )


def _sql_session_concurrency(gap_minutes: int) -> str:
    return (
        f"WITH s AS ({_sql_user_sessions(gap_minutes)}), "
        "d AS (SELECT date_trunc('hour', session_start) AS h, 1 AS dlt FROM s "
        "UNION ALL SELECT date_trunc('hour', session_end) + INTERVAL 1 HOUR, -1 FROM s), "
        "g AS (SELECT h, sum(dlt) AS dd FROM d GROUP BY h) "
        "SELECT h AS hour_start, CAST(sum(dd) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS n_concurrent FROM g"
    )


def _sql_vocab_top(top_k: int) -> str:
    return (
        f"WITH toks AS ({_SQL_TOKS}), "
        "ex AS (SELECT unnest(t) AS token FROM toks), "
        "cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY token), "
        f"top AS (SELECT token, n FROM cnt ORDER BY n DESC, token ASC LIMIT {top_k}) "
        "SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS token_id, n FROM top"
    )


def _sql_oov_rate(top_k: int) -> str:
    return (
        f"WITH toks AS ({_SQL_TOKS}), "
        "ex AS (SELECT doc_id, unnest(t) AS token FROM toks), "
        "cnt AS (SELECT token, count(*) AS n FROM ex GROUP BY token), "
        f"top AS (SELECT token FROM cnt ORDER BY n DESC, token ASC LIMIT {top_k}), "
        "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN token NOT IN (SELECT token FROM top) THEN 1 ELSE 0 END) AS BIGINT) AS n_oov "
        "FROM ex GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "CAST(coalesce(per.n_oov, 0) AS BIGINT) AS n_oov, "
        "round(per.n_oov * 1.0 / per.n_tokens, 6) AS oov_rate "
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )


def _sql_incremental_percentiles(
    table: str, col: str, bins: int, probs: tuple
) -> str:
    pcols = []
    for p in probs:
        name = f"p{int(round(p * 100)):02d}"
        pcols.append(
            f"(SELECT round((SELECT lo FROM mm) + (bin + least(greatest(({p} * tot - (cn - n)) / n, 0.0), 1.0)) "
            f"* (SELECT w FROM mm), 6) FROM c WHERE cn >= {p} * tot ORDER BY bin LIMIT 1) AS {name}"
        )
    return (
        f"WITH mm AS (SELECT CAST(min({col}) AS DOUBLE) AS lo, "
        # degenerate-guard mirrors the Spark side's `(hi-lo)/bins or 1.0`:
        # a constant column gets width 1.0 instead of a divide-by-zero
        f"CASE WHEN CAST(max({col}) AS DOUBLE) = CAST(min({col}) AS DOUBLE) THEN 1.0 "
        f"ELSE (CAST(max({col}) AS DOUBLE) - CAST(min({col}) AS DOUBLE)) / {float(bins)} END AS w FROM {table}), "
        f"h AS (SELECT CAST(least(greatest(floor(({col} - mm.lo) / mm.w), 0), {bins - 1}) AS BIGINT) AS bin, "
        f"CAST(count(*) AS BIGINT) AS n FROM {table}, mm WHERE {col} IS NOT NULL GROUP BY 1), "
        "c AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cn, sum(n) OVER () AS tot FROM h) "
        "SELECT (SELECT CAST(max(tot) AS BIGINT) FROM c) AS n, " + ", ".join(pcols)
    )


def _sql_iqr_outliers(table: str, cols: list[str], k: float = 1.5) -> str:
    parts = []
    for c in cols:
        fence = (
            f"SELECT round(quantile_cont({c}, 0.25), 6) AS q1, "
            f"round(quantile_cont({c}, 0.75), 6) AS q3 FROM {table}"
        )
        derived = (
            f"SELECT q1, q3, round(q3 - q1, 6) AS iqr, "
            f"round(q1 - {k} * round(q3 - q1, 6), 6) AS lo_fence, "
            f"round(q3 + {k} * round(q3 - q1, 6), 6) AS hi_fence FROM ({fence})"
        )
        parts.append(
            f"SELECT '{c}' AS \"column\", f.q1, f.q3, f.iqr, f.lo_fence, f.hi_fence, "
            f"CAST(sum(CASE WHEN t.{c} < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_low, "
            f"CAST(sum(CASE WHEN t.{c} > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_high, "
            f"round((sum(CASE WHEN t.{c} < f.lo_fence THEN 1 ELSE 0 END) "
            f"+ sum(CASE WHEN t.{c} > f.hi_fence THEN 1 ELSE 0 END)) * 100.0 / count(*), 2) AS outlier_pct "
            f"FROM {table} t CROSS JOIN ({derived}) f "
            "GROUP BY f.q1, f.q3, f.iqr, f.lo_fence, f.hi_fence"
        )
    return " UNION ALL ".join(parts)


def _sql_completeness_timeline(cols: list[str]) -> str:
    nn = ", ".join(
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_{c}"
        for c in cols
    )
    rows = " UNION ALL ".join(
        f"SELECT period_start, '{c}' AS \"column\", n_rows, nn_{c} AS n_null, "
        f"round((n_rows - nn_{c}) * 1.0 / n_rows, 6) AS completeness FROM g"
        for c in cols
    )
    return (
        "WITH g AS (SELECT date_trunc('hour', ts) AS period_start, "
        f"CAST(count(*) AS BIGINT) AS n_rows, {nn} "
        "FROM events WHERE ts IS NOT NULL GROUP BY 1) " + rows
    )


def _sql_user_growth() -> str:
    lagp = "lag(p) OVER (PARTITION BY u ORDER BY p)"
    return (
        "WITH act AS (SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS p "
        "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
        f"t AS (SELECT p, CASE WHEN {lagp} IS NULL THEN 'new' "
        f"WHEN epoch(p) - epoch({lagp}) <= 86400 THEN 'retained' "
        "ELSE 'resurrected' END AS status FROM act) "
        "SELECT p AS period_start, CAST(count(*) AS BIGINT) AS n_active, "
        "CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new, "
        "CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, "
        "CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected "
        "FROM t GROUP BY p"
    )


def _sql_trending_hourly(top_k: int) -> str:
    return (
        "WITH c AS (SELECT date_trunc('hour', ts) AS period_start, "
        "event_type AS key, CAST(count(*) AS BIGINT) AS n FROM events "
        "WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2) "
        "SELECT period_start, CAST(rank AS INT) AS rank, key, n FROM ("
        "SELECT *, row_number() OVER (PARTITION BY period_start "
        "ORDER BY n DESC, key ASC) AS rank FROM c) "
        f"WHERE rank <= {top_k}"
    )


def _sql_chunk_documents(size: int, overlap: int) -> str:
    step = size - overlap
    return (
        f"SELECT doc_id, CAST(t.s / {step} AS INT) AS chunk_no, CAST(t.s AS INT) AS start, "
        f"substr(text, CAST(t.s AS INT) + 1, {size}) AS chunk_text, "
        f"CAST(length(substr(text, CAST(t.s AS INT) + 1, {size})) AS INT) AS chunk_len "
        f"FROM documents, unnest(generate_series(0, "
        f"greatest(CAST(ceil((length(text) - {size}) / CAST({step} AS DOUBLE)) AS INT) * {step}, 0), "
        f"{step})) AS t(s) "
        "WHERE text IS NOT NULL AND length(text) > 0"
    )


def _sql_fold_assign(k: int) -> str:
    h = "CAST(CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)"
    return f"SELECT doc_id, CAST({h} % {k} AS INT) AS fold FROM documents"


def _sql_user_value_trend() -> str:
    # exact DECIMAL moment sums, mirroring per_key_trend (NOT DuckDB's
    # regr_slope — its float path differs in the 6th decimal)
    xr = "round((epoch(ts) - 1704067200.0) / 3600.0, 6)"
    yr = "round(value, 6)"
    dec = "DECIMAL(38,10)"
    return (
        "WITH g AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_points, "
        f"CAST(sum(CAST({xr} AS {dec})) AS DOUBLE) AS sx, "
        f"CAST(sum(CAST({yr} AS {dec})) AS DOUBLE) AS sy, "
        f"CAST(sum(CAST(round({xr} * {yr}, 10) AS {dec})) AS DOUBLE) AS sxy, "
        f"CAST(sum(CAST(round({xr} * {xr}, 10) AS {dec})) AS DOUBLE) AS sxx "
        "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY user_id) "
        "SELECT key, n_points, "
        "CASE WHEN n_points >= 2 AND n_points * sxx - sx * sx <> 0 THEN "
        "round((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx), 6) END AS slope_per_hour, "
        "CASE WHEN n_points >= 2 AND n_points * sxx - sx * sx <> 0 THEN "
        "round((sy - (n_points * sxy - sx * sy) / (n_points * sxx - sx * sx) * sx) / n_points, 6) END AS intercept "
        "FROM g"
    )


def _sql_hourly_value_bands(probs: tuple) -> str:
    cols = ", ".join(
        f"round(quantile_cont(value, {p}), 6) AS p{int(round(p * 100)):02d}"
        for p in probs
    )
    return (
        "SELECT date_trunc('hour', ts) AS hour_start, "
        f"CAST(count(*) AS BIGINT) AS n, {cols} "
        "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL "
        "GROUP BY date_trunc('hour', ts)"
    )


def _sql_orders_join_audit() -> str:
    return (
        "WITH ca AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS cnt_a "
        "FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1), "
        "cb AS (SELECT CAST(o_orderkey AS VARCHAR) AS k, count(*) AS cnt_b "
        "FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1), "
        "j AS (SELECT ca.k, cnt_a * cnt_b AS fan FROM ca JOIN cb USING (k)) "
        "SELECT (SELECT CAST(sum(cnt_a) AS BIGINT) FROM ca) AS n_a, "
        "(SELECT CAST(sum(cnt_b) AS BIGINT) FROM cb) AS n_b, "
        "(SELECT CAST(count(*) AS BIGINT) FROM ca) AS n_keys_a, "
        "(SELECT CAST(count(*) AS BIGINT) FROM cb) AS n_keys_b, "
        "CAST(count(*) AS BIGINT) AS n_keys_common, "
        "CAST(coalesce(sum(fan), 0) AS BIGINT) AS n_out, "
        "CAST(max(fan) AS BIGINT) AS max_fanout, "
        "(SELECT k FROM j ORDER BY fan DESC, k LIMIT 1) AS top_key FROM j"
    )


def _sql_incremental_profile(table: str, cols: list[str]) -> str:
    # from-scratch twin of the merged-partials profile: exact DECIMAL
    # sums of round@6 inputs, cast to DOUBLE once before dividing
    parts = []
    for c in cols:
        s = f"CAST(sum(CAST(round({c}, 6) AS DECIMAL(38,6))) AS DOUBLE)"
        s2 = f"CAST(sum(CAST(round({c} * {c}, 6) AS DECIMAL(38,6))) AS DOUBLE)"
        n = f"count({c})"
        mean = f"{s} / {n}"
        var = f"greatest({s2} / {n} - ({mean}) * ({mean}), 0.0)"
        parts.append(
            f"SELECT '{c}' AS \"column\", CAST({n} AS BIGINT) AS n, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"round({n} * 1.0 / count(*), 6) AS completeness, "
            f"round({mean}, 6) AS mean, "
            f"round(sqrt({var}), 6) AS std_pop, "
            f"round(CAST(min({c}) AS DOUBLE), 6) AS min, "
            f"round(CAST(max({c}) AS DOUBLE), 6) AS max FROM {table}"
        )
    return " UNION ALL ".join(parts)


def _sql_orphan_orders() -> str:
    orphan = "CASE WHEN o_custkey IS NOT NULL AND k IS NULL THEN 1 ELSE 0 END"
    return (
        "WITH pk AS (SELECT DISTINCT c_custkey AS k FROM customer), "
        "j AS (SELECT o.o_custkey, pk.k FROM orders o LEFT JOIN pk ON o.o_custkey = pk.k) "
        "SELECT CAST(count(*) AS BIGINT) AS n_child, "
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys, "
        f"CAST(sum({orphan}) AS BIGINT) AS n_orphans, "
        f"round(sum({orphan}) * 1.0 / count(*), 6) AS orphan_ratio, "
        f"(sum({orphan}) = 0) AS ri_ok FROM j"
    )


def _sql_latest_events() -> str:
    return (
        "SELECT event_id, ts, user_id, event_type, value, props FROM ("
        "SELECT *, row_number() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"
    )


def _sql_split_leakage() -> str:
    asg = (
        "SELECT doc_id, CASE WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
        "AS UBIGINT) + 1.0) / 4294967296.0 <= 0.8 THEN 'train' ELSE 'eval' END AS split "
        "FROM documents"
    )
    return (
        f"WITH pairs AS ({_sql_minhash_lsh(16, 4, 0.5)}), asg AS ({asg}) "
        "SELECT a.split AS split_a, b.split AS split_b, "
        "CAST(count(*) AS BIGINT) AS n_pairs, "
        "CAST(count(DISTINCT p.id_b) AS BIGINT) AS n_leaked_docs "
        "FROM pairs p JOIN asg a ON p.id_a = a.doc_id JOIN asg b ON p.id_b = b.doc_id "
        "WHERE a.split <> b.split GROUP BY a.split, b.split"
    )


def _sql_encode_tokens(top_k: int) -> str:
    """Mirror of text.encode_tokens: the identical maximal-munch
    segmentation as a recursive CTE — at each position the longest
    vocab token matching the remaining suffix (correlated scalar
    subquery), else a single-char fallback."""
    match_expr = (
        "(SELECT v.token FROM vocab v WHERE substr(word, {pos}, len(v.token)) = v.token "
        "ORDER BY len(v.token) DESC LIMIT 1)"
    )
    m1 = match_expr.format(pos="1")
    mn = match_expr.format(pos="pos + len(piece)")
    return (
        "WITH RECURSIVE "
        f"toks AS ({_SQL_TOKS}), "
        "ex AS (SELECT unnest(t) AS token FROM toks), "
        "cnt AS (SELECT token, count(*) AS n FROM ex GROUP BY token), "
        "vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS token_id "
        f"FROM (SELECT token, n FROM cnt ORDER BY n DESC, token ASC LIMIT {top_k})), "
        "words AS (SELECT doc_id, CAST(s.i AS INT) AS wpos, t[s.i] AS word "
        "FROM toks, unnest(generate_series(1, len(t))) AS s(i)), "
        "seg AS ("
        f"SELECT doc_id, wpos, word, 1 AS pos, 1 AS piece_no, "
        f"coalesce({m1}, substr(word, 1, 1)) AS piece, {m1} IS NULL AS is_fallback "
        "FROM words "
        "UNION ALL "
        "SELECT doc_id, wpos, word, pos + len(piece) AS pos, piece_no + 1, "
        f"coalesce({mn}, substr(word, pos + len(piece), 1)) AS piece, "
        f"{mn} IS NULL AS is_fallback "
        "FROM seg WHERE pos + len(piece) <= len(word)) "
        "SELECT s.doc_id, s.wpos, CAST(s.piece_no AS INT) AS piece_no, s.piece, "
        "v.token_id, s.is_fallback "
        "FROM seg s LEFT JOIN vocab v ON s.piece = v.token"
    )


def _sql_token_count_vocab(top_k: int) -> str:
    return (
        f"WITH enc AS ({_sql_encode_tokens(top_k)}), "
        "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN is_fallback THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback "
        "FROM enc GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens, "
        "coalesce(per.n_fallback, 0) AS n_fallback "
        "FROM documents d LEFT JOIN per USING (doc_id) WHERE d.text IS NOT NULL"
    )


def _sql_leakage_free_split(train_fraction: float) -> str:
    """Mirror of dedup.leakage_free_split: components (the
    dedup_components recursive CTE) + the md5 unit-interval coin on
    the component id."""
    coin = (
        "(CAST(('0x' || substr(md5(CAST(comp_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) "
        "/ 4294967296.0"
    )
    return (
        f"WITH comp AS ({_sql_dedup_components()}) "
        f"SELECT doc_id, comp_id, CASE WHEN {coin} <= {train_fraction} "
        "THEN 'train' ELSE 'eval' END AS split FROM comp"
    )


def _sql_substring_dedup(k: int) -> str:
    """Mirror of dedup.substring_dedup: k-word window digests, global
    first-occurrence (doc_id, start) keeps, every other occurrence's
    word positions stripped, text rebuilt space-joined."""
    return (
        "WITH base AS (SELECT doc_id AS id, "
        "regexp_split_to_array(trim(text), '\\s+') AS words FROM documents "
        "WHERE text IS NOT NULL AND trim(text) <> ''), "
        f"occ AS (SELECT id, s.i AS pos, md5(array_to_string(words[s.i+1:s.i+{k}], ' ')) AS h "
        f"FROM base, unnest(generate_series(0, len(words) - {k})) AS s(i) "
        f"WHERE len(words) >= {k}), "
        "ranked AS (SELECT id, pos, "
        "row_number() OVER (PARTITION BY h ORDER BY id, pos) AS rn, "
        "count(*) OVER (PARTITION BY h) AS cnt FROM occ), "
        "markedocc AS (SELECT id, pos FROM ranked WHERE cnt >= 2 AND rn > 1), "
        f"marked AS (SELECT DISTINCT id, u.i AS widx FROM markedocc, "
        f"unnest(generate_series(pos, pos + {k - 1})) AS u(i)), "
        "toks AS (SELECT id, s.i - 1 AS pos, words[s.i] AS w FROM base, "
        "unnest(generate_series(1, len(words))) AS s(i)), "
        "counts AS (SELECT id, CAST(count(*) AS BIGINT) AS n_removed FROM marked GROUP BY id), "
        "clean AS (SELECT t.id, string_agg(t.w, ' ' ORDER BY t.pos) AS clean_text "
        "FROM toks t LEFT JOIN marked m ON t.id = m.id AND t.pos = m.widx "
        "WHERE m.id IS NULL GROUP BY t.id) "
        "SELECT b.id AS doc_id, CAST(len(b.words) AS BIGINT) AS n_words, "
        "coalesce(c.n_removed, 0) AS n_removed, "
        "coalesce(cl.clean_text, '') AS clean_text "
        "FROM base b LEFT JOIN counts c ON b.id = c.id "
        "LEFT JOIN clean cl ON b.id = cl.id"
    )


def _sql_substring_dedup_chars(k: int) -> str:
    """Mirror of dedup.substring_dedup_chars (snap='word'): k-CHAR
    window digests over whitespace-normalized text, global
    first-occurrence keeps, marked char positions, word removed iff
    fully covered, text rebuilt space-joined."""
    return (
        "WITH base AS (SELECT doc_id AS id, "
        "array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' ') AS t "
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''), "
        f"occ AS (SELECT id, CAST(s.i AS INT) AS pos, md5(substr(t, CAST(s.i AS INT), {k})) AS h "
        "FROM base, unnest(generate_series(CAST(1 AS BIGINT), "
        f"CAST(length(t) - {k - 1} AS BIGINT))) AS s(i) WHERE length(t) >= {k}), "
        "ranked AS (SELECT id, pos, "
        "row_number() OVER (PARTITION BY h ORDER BY id, pos) AS rn, "
        "count(*) OVER (PARTITION BY h) AS cnt FROM occ), "
        "markedocc AS (SELECT id, pos FROM ranked WHERE cnt >= 2 AND rn > 1), "
        "marked AS (SELECT DISTINCT id, CAST(u.i AS INT) AS cidx FROM markedocc, "
        f"unnest(generate_series(CAST(pos AS BIGINT), CAST(pos + {k - 1} AS BIGINT))) AS u(i)), "
        "counts AS (SELECT id, CAST(count(*) AS BIGINT) AS n_marked FROM marked GROUP BY id), "
        "wl AS (SELECT id, string_split(t, ' ') AS ws FROM base), "
        "wd AS (SELECT id, CAST(s.i AS INT) AS widx, list_extract(ws, CAST(s.i AS INT)) AS w "
        "FROM wl, unnest(generate_series(CAST(1 AS BIGINT), CAST(len(ws) AS BIGINT))) AS s(i)), "
        "sp AS (SELECT id, widx, w, CAST(coalesce(sum(length(w) + 1) OVER "
        "(PARTITION BY id ORDER BY widx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS INT) AS s "
        "FROM wd), "
        "cov AS (SELECT sp.id, sp.widx, sp.w, count(m.cidx) AS c FROM sp "
        "LEFT JOIN marked m ON m.id = sp.id AND m.cidx BETWEEN sp.s AND sp.s + length(sp.w) - 1 "
        "GROUP BY 1, 2, 3), "
        "clean AS (SELECT id, string_agg(w, ' ' ORDER BY widx) AS clean_text "
        "FROM cov WHERE c < length(w) GROUP BY id) "
        "SELECT b.id AS doc_id, CAST(length(b.t) AS BIGINT) AS n_chars, "
        "coalesce(c.n_marked, 0) AS n_marked_chars, "
        "coalesce(cl.clean_text, '') AS clean_text "
        "FROM base b LEFT JOIN counts c ON b.id = c.id "
        "LEFT JOIN clean cl ON b.id = cl.id"
    )


def _sql_pmi_pairs(min_count: int, topk: int) -> str:
    return (
        "WITH tk AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "w AS (SELECT unnest(t) AS w FROM tk), "
        "uni AS (SELECT w, count(*) AS c FROM w GROUP BY 1), "
        "bg AS (SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2 FROM tk, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(greatest(len(t) - 1, 0) AS BIGINT))) AS s(i)), "
        f"pairs AS (SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        "tu AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM uni), "
        "tb AS (SELECT CAST(sum(c_pair) AS BIGINT) AS B FROM pairs) "
        "SELECT p.w1, p.w2, CAST(p.c_pair AS BIGINT) AS c_pair, "
        "CAST(u1.c AS BIGINT) AS c_w1, CAST(u2.c AS BIGINT) AS c_w2, "
        "round(ln((CAST(p.c_pair AS DOUBLE) / tb.B) / "
        "((CAST(u1.c AS DOUBLE) / tu.T) * (CAST(u2.c AS DOUBLE) / tu.T))), 6) AS pmi "
        "FROM pairs p JOIN uni u1 ON p.w1 = u1.w JOIN uni u2 ON p.w2 = u2.w "
        "CROSS JOIN tu CROSS JOIN tb "
        f"ORDER BY pmi DESC, p.w1 ASC, p.w2 ASC LIMIT {topk}"
    )


def _sql_repeated_ngrams() -> str:
    snap = "floor({x} * 1e6 + 0.5) / 1e6"
    tops = ", ".join(
        "CASE WHEN ch.charsum > 0 THEN "
        + snap.format(
            x=f"least(coalesce(max(CASE WHEN p.n = {n} THEN p.topchars END), 0) "
            "/ CAST(ch.charsum AS DOUBLE), 1.0)"
        )
        + f" ELSE 0.0 END AS top_{n}gram_frac"
        for n in (2, 3, 4)
    )
    dups = ", ".join(
        "CASE WHEN ch.charsum > 0 THEN "
        + snap.format(
            x=f"least(coalesce(max(CASE WHEN p.n = {n} THEN p.dupchars END), 0) "
            "/ CAST(ch.charsum AS DOUBLE), 1.0)"
        )
        + f" ELSE 0.0 END AS dup_{n}gram_frac"
        for n in range(5, 11)
    )
    return (
        "WITH tk AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t, "
        "CAST(length(regexp_replace(lower(text), '\\s+', '', 'g')) AS BIGINT) AS charsum "
        "FROM documents), "
        "g AS (SELECT doc_id, CAST(nn.n AS INT) AS n, "
        "array_to_string(t[CAST(i AS INT):CAST(i AS INT) + CAST(nn.n AS INT) - 1], ' ') AS gram "
        "FROM tk, unnest(generate_series(CAST(2 AS BIGINT), CAST(10 AS BIGINT))) AS nn(n), "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(greatest(len(t) - nn.n + 1, 0) AS BIGINT))) AS s(i)), "
        "c AS (SELECT doc_id, n, gram, count(*) AS c, "
        "CAST(length(gram) - (n - 1) AS BIGINT) AS clen FROM g GROUP BY 1, 2, 3), "
        "top AS (SELECT doc_id, n, CAST(c * clen AS BIGINT) AS topchars FROM c "
        "QUALIFY row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, gram ASC) = 1), "
        "dup AS (SELECT doc_id, n, CAST(sum(CASE WHEN c >= 2 THEN c * clen ELSE 0 END) AS BIGINT) "
        "AS dupchars FROM c GROUP BY 1, 2), "
        "p AS (SELECT coalesce(t.doc_id, d.doc_id) AS doc_id, coalesce(t.n, d.n) AS n, "
        "t.topchars, d.dupchars FROM top t FULL JOIN dup d ON t.doc_id = d.doc_id AND t.n = d.n) "
        f"SELECT ch.doc_id, {tops}, {dups} "
        "FROM tk ch LEFT JOIN p ON p.doc_id = ch.doc_id "
        "GROUP BY ch.doc_id, ch.charsum"
    )


def _sql_winnowing_overlap(k: int, w: int, min_shared: int, max_df: int) -> str:
    return (
        f"WITH wn AS ({_sql_winnowing(k, w)}), "
        "d AS (SELECT DISTINCT doc_id AS id, fingerprint FROM wn), "
        f"ok AS (SELECT fingerprint FROM d GROUP BY 1 HAVING count(*) <= {max_df}), "
        "dd AS (SELECT d.id, d.fingerprint FROM d JOIN ok USING (fingerprint)) "
        "SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared "
        "FROM dd a JOIN dd b ON a.fingerprint = b.fingerprint AND a.id < b.id "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_shared}"
    )


def _sql_bloom_prefilter(m_bits: int, k: int) -> str:
    def slot(s: int) -> str:
        return (
            f"CAST(CAST(('0x' || substr(md5('{s}:' || d), 1, 8)) AS UBIGINT) AS BIGINT) % {m_bits}"
        )

    slots = ", ".join(slot(s) for s in range(k))
    return (
        "WITH refd AS (SELECT md5(text) AS d FROM documents WHERE doc_id % 3 <> 0), "
        "newd AS (SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id % 3 = 0), "
        f"rpos AS (SELECT unnest([{slots}]) AS p FROM refd), "
        "words AS (SELECT CAST(p // 32 AS INT) AS word_idx, "
        "bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits FROM rpos GROUP BY 1), "
        f"npos AS (SELECT doc_id, unnest([{slots}]) AS p FROM newd), "
        "hits AS (SELECT n.doc_id, count(*) AS c FROM "
        "(SELECT doc_id, CAST(p // 32 AS INT) AS w, CAST(p % 32 AS INT) AS b FROM npos) n "
        "JOIN words ON n.w = words.word_idx "
        "AND (words.bits & (CAST(1 AS BIGINT) << n.b)) <> 0 GROUP BY 1) "
        f"SELECT nd.doc_id, coalesce(h.c, 0) = {k} AS maybe_present "
        "FROM (SELECT doc_id FROM newd) nd LEFT JOIN hits h USING (doc_id)"
    )


def _sql_customer_order_histogram() -> str:
    return (
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM "
        "(SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) "
        "GROUP BY c_count"
    )


def _sql_top_supplier() -> str:
    return (
        "WITH rev AS (SELECT l_suppkey, "
        "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS r "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
        "SELECT s_suppkey, s_name, round(CAST(r AS DOUBLE), 2) AS total_revenue "
        "FROM rev JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE r = (SELECT max(r) FROM rev)"
    )


def _sql_small_qty_revenue() -> str:
    return (
        "WITH j AS (SELECT l_partkey AS p_partkey, l_quantity, l_extendedprice "
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#13'), "
        "a AS (SELECT p_partkey, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avgq "
        "FROM j GROUP BY 1) "
        "SELECT round(CAST(sum(CAST(j.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 4) "
        "AS avg_yearly FROM j JOIN a USING (p_partkey) WHERE j.l_quantity < 0.2 * a.avgq"
    )


def _sql_priority_lines() -> str:
    return (
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY l_returnflag"
    )


def _sql_alpha_mixture(salt: str) -> str:
    coin = (
        "(CAST(CAST(('0x' || substr(md5('" + salt + "|' || CAST(doc_id AS VARCHAR)), 1, 8)) "
        "AS UBIGINT) AS BIGINT) + 1.0) / 4294967296.0"
    )
    return (
        "WITH b AS (SELECT doc_id, CASE WHEN doc_id % 16 < 8 THEN 'g0' "
        "WHEN doc_id % 16 < 12 THEN 'g1' WHEN doc_id % 16 < 14 THEN 'g2' "
        "WHEN doc_id % 16 < 15 THEN 'g3' ELSE 'g4' END AS source FROM documents), "
        "c AS (SELECT source, count(*) AS n FROM b GROUP BY 1), "
        "mn AS (SELECT min(n) AS nmin FROM c), "
        "r AS (SELECT source, sqrt(CAST(nmin AS DOUBLE) / n) AS rate FROM c CROSS JOIN mn) "
        "SELECT d.doc_id, d.source, round(r.rate, 6) AS rate "
        "FROM b d JOIN r USING (source) "
        f"WHERE {coin} <= r.rate"
    )


def _sql_winnowing(k: int, w: int) -> str:
    """DuckDB twin of winnowing: same md5 k-gram hashes, per-window
    frame minimum, then the rightmost-min tiebreak as a join back to
    the gram table (the engine does it in one max(struct) window; the
    numbers are identical)."""
    h = (
        "CAST(CAST(('0x' || substr(md5(array_to_string(t[CAST(i AS INT):CAST(i AS INT) + "
        f"{k - 1}], ' ')), 1, 8)) AS UBIGINT) AS BIGINT)"
    )
    return (
        "WITH tk AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        f"g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, {h} AS h, "
        f"CAST(len(t) - {k - 1} AS BIGINT) AS m FROM tk, "
        f"unnest(generate_series(CAST(1 AS BIGINT), CAST(greatest(len(t) - {k - 1}, 0) AS BIGINT))) AS s(i)), "
        "c1 AS (SELECT doc_id, pos, m, min(h) OVER (PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS minh FROM g), "
        f"st AS (SELECT doc_id, pos AS wstart, minh FROM c1 WHERE pos <= greatest(m - {w - 1}, 1)), "
        "sel AS (SELECT s.doc_id, s.wstart, s.minh, max(t2.pos) AS selpos FROM st s "
        "JOIN g t2 ON t2.doc_id = s.doc_id AND t2.pos BETWEEN s.wstart AND s.wstart + "
        f"{w - 1} AND t2.h = s.minh GROUP BY 1, 2, 3) "
        "SELECT DISTINCT doc_id, selpos AS pos, minh AS fingerprint FROM sel"
    )


def _sql_url_dedup() -> str:
    # canonicalization steps mirror text.canonicalize_url term for term
    # (DuckDB regexp_replace needs the explicit 'g' flag and \\2-style
    # backreferences where Spark defaults to global and uses $2)
    e = "trim(url)"
    e = f"regexp_replace({e}, '#.*$', '', 'g')"
    e = f"regexp_replace({e}, '(?i)[?&](utm_[a-z_]+|gclid|fbclid)=[^&#]*', '', 'g')"
    e = f"regexp_replace({e}, '\\?&', '?', 'g')"
    e = f"regexp_replace({e}, '^([^?&]*)&', '\\1?')"  # first match only (no g)
    e = f"regexp_replace({e}, '[?&]+$', '', 'g')"
    return (
        "WITH u0 AS (SELECT doc_id, 'https://' "
        "|| CASE WHEN doc_id % 5 = 3 THEN 'WWW.Site' ELSE 'www.site' END "
        "|| CAST(doc_id % 50 AS VARCHAR) || '.example.com' "
        "|| CASE WHEN doc_id % 5 = 3 OR doc_id % 5 = 4 THEN ':443' ELSE '' END "
        "|| CASE WHEN doc_id % 5 = 4 THEN '' ELSE '/path/' || CAST(doc_id % 20 AS VARCHAR) END "
        "|| CASE WHEN doc_id % 5 = 1 THEN '?utm_source=feed&utm_campaign=x&gclid=abc' "
        "WHEN doc_id % 5 = 2 THEN '#section-2' "
        "WHEN doc_id % 5 = 3 THEN '/' "
        "WHEN doc_id % 5 = 4 THEN '?page=' || CAST(doc_id % 20 AS VARCHAR) || '&UTM_Source=news&FBCLID=zz9' "
        "ELSE '' END AS url FROM documents), "
        f"s1 AS (SELECT doc_id, url, {e} AS v FROM u0), "
        "s2 AS (SELECT doc_id, url, CASE WHEN regexp_extract(v, '^(https?://[^/?]*)', 1) = '' "
        "THEN v ELSE lower(regexp_extract(v, '^(https?://[^/?]*)', 1)) "
        "|| regexp_replace(v, '^https?://[^/?]*', '') END AS v FROM s1), "
        "s3 AS (SELECT doc_id, url, regexp_replace(regexp_replace(regexp_replace(v, "
        "'(:80|:443)([/?]|$)', '\\2', 'g'), '/+\\?', '?', 'g'), '/+$', '', 'g') AS canon_url FROM s2), "
        "g AS (SELECT canon_url, min(doc_id) AS k, CAST(count(*) AS BIGINT) AS n_variants "
        "FROM s3 GROUP BY 1) "
        "SELECT s.doc_id, s.url, s.canon_url, s.doc_id = g.k AS is_canonical, g.n_variants "
        "FROM s3 s JOIN g USING (canon_url)"
    )


def _sql_gopher_fixture_ctes() -> str:
    """The gopher-screen fixture CTE chain (reflow into 8-word lines +
    the %3/%5/%7 line plants), ending in ``fx(doc_id, text)`` — shared
    by the X184 standalone oracle and the X242 combined-signal
    oracle's fixture prefix."""
    return (
        f"WITH tk AS ({SQL_TOKS}), "
        # ref0 reflows via a lateral series expansion, which yields ZERO
        # rows for a zero-token doc (empty generate_series) — the LEFT
        # JOIN back onto tk resurrects those docs with an empty body so
        # the oracle's row set matches the Spark fixture, which keeps
        # every doc (ADVICE r8: latent row-set divergence, can't fire on
        # current fixtures but closed here at the source)
        "ref0 AS (SELECT doc_id, string_agg(array_to_string(t[(i*8+1):((i+1)*8)], ' '), "
        "chr(10) ORDER BY i) AS body FROM tk, "
        "unnest(generate_series(CAST(0 AS BIGINT), CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)) AS g(i) "
        "GROUP BY doc_id), "
        "ref AS (SELECT tk.doc_id, coalesce(ref0.body, '') AS body "
        "FROM tk LEFT JOIN ref0 USING (doc_id)), "
        "fx AS (SELECT doc_id, body "
        "|| CASE WHEN doc_id % 3 = 0 THEN chr(10)||'click here to subscribe now'"
        "||chr(10)||'click here to subscribe now' ELSE '' END "
        "|| CASE WHEN doc_id % 5 = 1 THEN chr(10)||'- special offer today'"
        "||chr(10)||'- special offer today' ELSE '' END "
        "|| CASE WHEN doc_id % 7 = 2 THEN chr(10)||'to be continued...' ELSE '' END AS text "
        "FROM ref), "
    )


def _sql_gopher_quality() -> str:
    """DuckDB twin of fixture reflow + the Gopher screen. The
    duplicate-line character fraction runs as an unnest/groupBy CTE
    (same numbers as the engine's in-array nested filter); every
    fraction is an int/int divide with the shared floor-snap."""
    return _sql_gopher_fixture_ctes() + _sql_gopher_screen_body("fx")


def _sql_gopher_screen_body(src: str) -> str:
    """The X184 screen CTE chain + final select over a (doc_id, text)
    source relation — shared verbatim by the standalone oracle
    (src='fx') and the X242 combined-signal oracle."""
    from safedata_pipeline_spark.operators.text import GOPHER_BOUNDS, GOPHER_STOPWORDS

    b = GOPHER_BOUNDS
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    snap = "floor(CAST({num} AS DOUBLE) / {den} * 1e6 + 0.5) / 1e6"
    mean_wl = snap.format(num="w.charsum", den="w.n_words")
    f_dup = snap.format(num="l.dupchars", den="l.totchars")
    f_bul = snap.format(num="l.n_bullet", den="l.n_lines")
    f_ell = snap.format(num="l.n_ellip", den="l.n_lines")
    f_sym = snap.format(num="w.n_sym", den="w.n_words")
    return (
        "ftk AS (SELECT doc_id, text, CASE WHEN trim(text) = '' THEN [] "
        f"ELSE regexp_split_to_array(trim(text), '\\s+') END AS t FROM {src}), "
        f"ln0 AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM {src}), "
        "ln AS (SELECT doc_id, line FROM ln0 WHERE length(line) > 0), "
        "lc AS (SELECT doc_id, line, count(*) AS c, length(line) AS w FROM ln GROUP BY 1, 2), "
        "ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines, "
        "CAST(sum(CASE WHEN c >= 2 THEN c * w ELSE 0 END) AS BIGINT) AS dupchars, "
        "CAST(sum(c * w) AS BIGINT) AS totchars, "
        "CAST(sum(CASE WHEN line LIKE '- %' OR line LIKE '* %' THEN c ELSE 0 END) AS BIGINT) AS n_bullet, "
        "CAST(sum(CASE WHEN line LIKE '%...' THEN c ELSE 0 END) AS BIGINT) AS n_ellip "
        "FROM lc GROUP BY 1), "
        "ws AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words, "
        "CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS charsum, "
        f"CAST(len(list_intersect(list_distinct(t), [{stops}])) AS INT) AS n_stop, "
        "CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_sym FROM ftk), "
        "o AS (SELECT w.doc_id, w.n_words, coalesce(l.n_lines, 0) AS n_lines, "
        f"CASE WHEN w.n_words > 0 THEN {mean_wl} ELSE 0.0 END AS mean_word_len, "
        f"CASE WHEN l.totchars > 0 THEN {f_dup} ELSE 0.0 END AS frac_chars_dup_lines, "
        f"CASE WHEN l.n_lines > 0 THEN {f_bul} ELSE 0.0 END AS frac_bullet_lines, "
        f"CASE WHEN l.n_lines > 0 THEN {f_ell} ELSE 0.0 END AS frac_ellipsis_lines, "
        f"CASE WHEN w.n_words > 0 THEN {f_sym} ELSE 0.0 END AS symbol_word_ratio, "
        "w.n_stop AS n_stop_types "
        "FROM ws w LEFT JOIN ls l USING (doc_id)) "
        "SELECT *, ("
        f"n_words >= {b['min_words']} AND n_words <= {b['max_words']} "
        f"AND mean_word_len >= {b['min_mean_word_len']} AND mean_word_len <= {b['max_mean_word_len']} "
        f"AND symbol_word_ratio <= {b['max_symbol_word_ratio']} "
        f"AND n_stop_types >= {b['min_stop_types']} "
        f"AND frac_bullet_lines <= {b['max_frac_bullet_lines']} "
        f"AND frac_ellipsis_lines <= {b['max_frac_ellipsis_lines']} "
        f"AND frac_chars_dup_lines <= {b['max_frac_chars_dup_lines']}"
        ") AS passes FROM o"
    )


def _sql_quality_signals() -> str:
    """DuckDB twin of the X242 combined quality-signal table: the
    shared fixture (gopher reflow+line plants, then the GNR word plant
    on doc_id % 4 == 1), each signal family's PROVEN oracle body run
    as a WITH-in-subquery over it (private CTE namespaces, zero
    drift from the standalone oracles), the repetition long form
    pivoted wide, and three LEFT JOINs anchored on the screen's
    all-docs row set — exactly the engine's assembly."""
    piv = ", ".join(
        f"max(CASE WHEN kind = '{kind}' AND n = {n_} THEN char_frac END) "
        f"AS {kind}_{n_}gram_frac"
        for kind, ns in (("top", (2, 3, 4)), ("dup", (5, 6, 7, 8, 9, 10)))
        for n_ in ns
    )
    rep_cols = ", ".join(
        f"rw.{kind}_{n_}gram_frac"
        for kind, ns in (("top", (2, 3, 4)), ("dup", (5, 6, 7, 8, 9, 10)))
        for n_ in ns
    )
    return (
        _sql_gopher_fixture_ctes()
        + "fq AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 1 "
        f"THEN '{GNR_PLANT}' ELSE '' END AS text FROM fx), "
        "g AS (SELECT doc_id, n_words, n_lines, mean_word_len, "
        "frac_chars_dup_lines, frac_bullet_lines, frac_ellipsis_lines, "
        "symbol_word_ratio, n_stop_types, passes AS gopher_passes FROM "
        f"(WITH {_sql_gopher_screen_body('fq')})), "
        f"r AS (SELECT * FROM (WITH {_sql_gnr_body('fq')})), "
        f"rw AS (SELECT doc_id, {piv} FROM r GROUP BY doc_id), "
        f"ce AS (SELECT * FROM ({_sql_compression_entropy(src='fq')})), "
        f"ul AS (SELECT * FROM ({_sql_unigram_logprob(src='fq')})) "
        f"SELECT g.*, {rep_cols}, ce.entropy_bits_per_byte, ce.ideal_ratio, "
        "ul.n_tokens, ul.avg_neg_logprob AS unigram_neg_logprob "
        "FROM g LEFT JOIN rw USING (doc_id) LEFT JOIN ce USING (doc_id) "
        "LEFT JOIN ul USING (doc_id)"
    )


def _sql_image_pixel_stats(width: int) -> str:
    """Oracle from the ORIGINAL text bytes: the engine's value is only
    equal if encode->PNG->decode round-trips exactly. ASCII fixture
    (octet_length == length, verified for the audio oracle) makes
    ord(substr(...)) the payload byte; integer sums, floor-snap mean."""
    return (
        f"WITH l AS (SELECT doc_id, text, (length(text) // {width}) * {width} AS n "
        f"FROM documents WHERE length(text) >= {width}), "
        "s AS (SELECT doc_id, CAST(sum(ord(substr(text, CAST(i AS INT), 1))) AS BIGINT) AS ps, "
        "CAST(count(*) AS INT) AS n_pixels FROM l, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(n AS BIGINT))) AS g(i) GROUP BY doc_id) "
        f"SELECT doc_id AS media_id, CAST({width} AS INT) AS width, "
        f"CAST(n_pixels // {width} AS INT) AS height, n_pixels, ps AS pixel_sum, "
        "floor(CAST(ps AS DOUBLE) / n_pixels * 1e6 + 0.5) / 1e6 AS mean_pixel FROM s"
    )


def _sql_jpeg_pixel_stats(width: int) -> str:
    """Oracle from the ORIGINAL text bytes (the X183/X228 discipline):
    encode_jpeg_media plants FLAT quality-100 grayscale JPEGs of value
    g = first byte and dims width × 8·(1 + len mod 3) — a DC-only DCT
    with an all-ones quantizer, the one JPEG class where decode∘encode
    is the identity — so the engine's really-decoded stats equal this
    prediction iff the codec round-trips exactly.

    BYTE semantics throughout (ADVICE r13): the engine casts text →
    binary (UTF-8) and reads b[0] / len(b), so the oracle reads the
    first byte via hex(encode(text)) and the byte length via
    strlen() — character-level ord()/length() would silently match
    only on ASCII fixtures."""
    first_byte = "CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INT)"
    blen = "strlen(text)"
    return (
        f"SELECT doc_id AS media_id, CAST({width} AS INT) AS width, "
        f"CAST(8 * (1 + {blen} % 3) AS INT) AS height, "
        f"CAST({width} * 8 * (1 + {blen} % 3) AS INT) AS n_pixels, "
        f"CAST({first_byte} AS BIGINT) "
        f"* {width} * 8 * (1 + {blen} % 3) AS pixel_sum, "
        f"CAST({first_byte} AS DOUBLE) AS mean_pixel "
        f"FROM documents WHERE text IS NOT NULL AND {blen} > 0"
    )


def _sql_gopher_ngram_repetition() -> str:
    """DuckDB twin of the X229 n-gram repetition family: the planted
    fixture (the GNR_PLANT phrase on doc_id % 4 == 1), the same
    lowercased whitespace tokens, the top-(2..4)-gram char fraction
    via a per-(doc, n) argmax (count DESC, ngram ASC), and the
    dup-(5..10)-gram coverage fraction via a DISTINCT position set —
    every fraction an exact int/int divide with the shared 6dp
    floor-snap."""
    plant = GNR_PLANT
    return (
        "WITH fx AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 1 "
        f"THEN '{plant}' ELSE '' END AS text FROM documents), "
        + _sql_gnr_body("fx")
    )


def _sql_gnr_body(src: str) -> str:
    """The X229 CTE chain + final select over a (doc_id, text) source
    relation — shared verbatim by the standalone oracle (src='fx', the
    GNR_PLANT fixture) and the X242 combined-signal oracle (where it
    runs as a WITH-in-subquery over the shared fixture)."""
    return (
        f"d AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w, "
        "CAST(length(regexp_replace(trim(lower(text)), '\\s+', '', 'g')) AS BIGINT) AS total "
        f"FROM {src}), "
        "d2 AS (SELECT * FROM d WHERE total > 0), "
        "ex AS (SELECT doc_id, total, n, i AS pos, "
        "array_to_string(w[i:i+n-1], ' ') AS ng, "
        "CAST(length(array_to_string(w[i:i+n-1], '')) AS BIGINT) AS clen "
        "FROM d2, unnest([2,3,4,5,6,7,8,9,10]) AS t(n), "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(len(w) - n + 1 AS BIGINT))) AS g(i) "
        "WHERE len(w) >= n), "
        "topc AS (SELECT doc_id, total, n, ng, count(*) AS c, max(clen) AS clen "
        "FROM ex WHERE n <= 4 GROUP BY doc_id, total, n, ng), "
        "topr AS (SELECT doc_id, total, n, c, clen, "
        "row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, ng ASC) AS rn FROM topc), "
        "top AS (SELECT doc_id, CAST(n AS INT) AS n, 'top' AS kind, "
        "floor(CAST(c * clen AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS char_frac "
        "FROM topr WHERE rn = 1), "
        "dupocc AS (SELECT doc_id, n, pos, "
        "count(*) OVER (PARTITION BY doc_id, n, ng) AS c FROM ex WHERE n >= 5), "
        "cov AS (SELECT DISTINCT doc_id, n, pos + k AS wp FROM dupocc, "
        "unnest(generate_series(CAST(0 AS BIGINT), CAST(n - 1 AS BIGINT))) AS u(k) "
        "WHERE c >= 2), "
        "wl AS (SELECT doc_id, p AS wp, CAST(length(w[CAST(p AS INT)]) AS BIGINT) AS wl "
        "FROM d2, unnest(generate_series(CAST(1 AS BIGINT), CAST(len(w) AS BIGINT))) AS q(p)), "
        "dchar AS (SELECT c.doc_id, c.n, CAST(sum(l.wl) AS BIGINT) AS s "
        "FROM cov c JOIN wl l ON c.doc_id = l.doc_id AND c.wp = l.wp "
        "GROUP BY c.doc_id, c.n), "
        "grid AS (SELECT doc_id, total, n FROM d2, unnest([5,6,7,8,9,10]) AS t(n) "
        "WHERE len(w) >= n), "
        "dup AS (SELECT g.doc_id, CAST(g.n AS INT) AS n, 'dup' AS kind, "
        "coalesce(floor(CAST(d.s AS DOUBLE) / g.total * 1e6 + 0.5) / 1e6, 0.0) AS char_frac "
        "FROM grid g LEFT JOIN dchar d ON g.doc_id = d.doc_id AND g.n = d.n) "
        "SELECT * FROM top UNION ALL SELECT * FROM dup"
    )


def _sql_compression_entropy(src: str = "documents") -> str:
    """DuckDB twin of the order-0 byte-entropy bound: the same TRUE
    UTF-8 byte enumeration as the engine — hex(encode(text)) turns the
    byte string into a hex string whose (2i−1, 2)-substrings are the
    individual byte values (é → C3, A9), so multi-byte text counts per
    BYTE, consistent with zlib_signal's n_bytes — then the same exact
    DECIMAL(12,0)×DECIMAL(20,6) ln-term products, double finishing
    divides, and 6dp floor-snaps. ``src`` swaps the (doc_id, text)
    source relation (the X242 combined-signal oracle reuses the chain
    over its shared fixture)."""
    return (
        "WITH ch AS (SELECT doc_id, substr(hex(encode(text)), CAST(i * 2 - 1 AS INT), 2) AS b "
        f"FROM {src}, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(octet_length(encode(text)) AS BIGINT))) AS g(i)), "
        "cnt AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2), "
        "pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bytes, "
        "CAST(count(*) AS BIGINT) AS n_distinct_bytes, "
        "CAST(sum(CAST(CAST(c AS DECIMAL(12,0)) * CAST(round(ln(c), 6) AS DECIMAL(20,6)) "
        "AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS s FROM cnt GROUP BY 1), "
        "h AS (SELECT doc_id, n_bytes, n_distinct_bytes, "
        "floor(CAST(CAST(CAST(n_bytes AS DECIMAL(12,0)) * CAST(round(ln(CAST(n_bytes AS DOUBLE)), 6) "
        "AS DECIMAL(20,6)) AS DECIMAL(38,6)) - s AS DOUBLE) / n_bytes / 0.6931471805599453 "
        "* 1e6 + 0.5) / 1e6 AS entropy_bits_per_byte FROM pd) "
        "SELECT d.doc_id, coalesce(h.n_bytes, 0) AS n_bytes, "
        "coalesce(h.n_distinct_bytes, 0) AS n_distinct_bytes, "
        "coalesce(h.entropy_bits_per_byte, 0.0) AS entropy_bits_per_byte, "
        "floor(coalesce(h.entropy_bits_per_byte, 0.0) / 8 * 1e6 + 0.5) / 1e6 AS ideal_ratio "
        f"FROM {src} d LEFT JOIN h USING (doc_id)"
    )


def _sql_hybrid_search() -> str:
    """Both retrieval legs + the RRF combine, unrolled: exact cosine
    top-20 (the ann CTE), token-set-Jaccard top-20, per-leg
    1/(60+rank) contributions as DECIMAL(20,9), fused order (score
    desc, item asc) -> top-10 per query."""
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(e.v, e.v) > 0 "
        "THEN list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) "
        "ELSE NULL END"
    )
    return (
        f"WITH e AS ({SQL_EMB}), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10), "
        f"vs AS (SELECT q.query_id, e.vec_id AS item_id, {cos} AS cosine "
        "FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id), "
        "vr AS (SELECT query_id, item_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, item_id ASC) AS rank "
        "FROM vs WHERE cosine IS NOT NULL), "
        "tk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
        "ELSE list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS t "
        "FROM documents WHERE text IS NOT NULL), "
        "qe AS (SELECT doc_id AS query_id, len(t) AS nq, unnest(t) AS tok FROM tk WHERE doc_id < 10), "
        "ce AS (SELECT doc_id AS item_id, len(t) AS nc, unnest(t) AS tok FROM tk), "
        "inter AS (SELECT query_id, item_id, count(*) AS i, any_value(nq) AS nq, any_value(nc) AS nc "
        "FROM qe JOIN ce USING (tok) WHERE query_id <> item_id GROUP BY 1, 2), "
        "lr AS (SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY CAST(i AS DOUBLE) / (nq + nc - i) DESC, item_id ASC) AS rank FROM inter), "
        "allc AS (SELECT query_id, item_id, CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(20,9)) AS c "
        "FROM lr WHERE rank <= 20 "
        "UNION ALL SELECT query_id, item_id, CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(20,9)) AS c "
        "FROM vr WHERE rank <= 20), "
        "sc AS (SELECT query_id, item_id, CAST(sum(c) AS DECIMAL(20,9)) AS s FROM allc GROUP BY 1, 2), "
        "rk AS (SELECT query_id, item_id, s, row_number() OVER (PARTITION BY query_id "
        "ORDER BY s DESC, item_id ASC) AS rank FROM sc) "
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, item_id, CAST(s AS DOUBLE) AS rrf_score "
        "FROM rk WHERE rank <= 10"
    )


def _q_hybrid_search_trio(spark, sf):
    # the full three-leg retrieval stack (X211): Okapi BM25 top-20 +
    # token-set-Jaccard top-20 (lexical) + exact cosine top-20
    # (vector), RRF-fused to top-10 per query — every leg and the
    # combine in the hash channel (the X202 discipline with X210's
    # BM25 slotting in as a third leg unchanged)
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    lex = SIM.lexical_jaccard_topk(docs.where(F.col("doc_id") < 10), docs, k=20)
    bm = SIM.bm25_topk(docs.where(F.col("doc_id") < 10), docs, k=20)
    vec = SIM.cosine_topk(emb.where(F.col("vec_id") < 10), emb, k=20).select(
        "query_id", "rank", F.col("neighbor_id").alias("item_id")
    )
    return SIM.rrf_fuse(
        [
            lex.select("query_id", "item_id", "rank"),
            bm.select("query_id", "item_id", "rank"),
            vec.select("query_id", "item_id", "rank"),
        ],
        k_rrf=60,
        top_n=10,
    )


def _sql_hybrid_search_trio(k1: float = 1.2, b: float = 0.75) -> str:
    """Three legs + RRF, unrolled: the X202 cosine and Jaccard CTEs,
    the X210 BM25 CTEs (identical parenthesization/9dp discipline),
    per-leg 1/(60+rank) contributions as DECIMAL(20,9), fused order
    (score desc, item asc) -> top-10 per query."""
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(e.v, e.v) > 0 "
        "THEN list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) "
        "ELSE NULL END"
    )
    idf = "ln(CAST(1.0 AS DOUBLE) + (st.N - f.df + CAST(0.5 AS DOUBLE)) / (f.df + CAST(0.5 AS DOUBLE)))"
    denom = (
        f"(c.tf + CAST({k1} AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST({b} AS DOUBLE) "
        f"+ CAST({b} AS DOUBLE) * c.dl / st.avgdl))"
    )
    contrib = f"round({idf} * c.tf * CAST({k1 + 1.0} AS DOUBLE) / {denom}, 9)"
    rrf_c = "CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(20,9))"
    return (
        f"WITH e AS ({SQL_EMB}), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10), "
        f"vs AS (SELECT q.query_id, e.vec_id AS item_id, {cos} AS cosine "
        "FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id), "
        "vr AS (SELECT query_id, item_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, item_id ASC) AS rank "
        "FROM vs WHERE cosine IS NOT NULL), "
        # lexical Jaccard leg (distinct token sets)
        "tk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
        "ELSE list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS t "
        "FROM documents WHERE text IS NOT NULL), "
        "qe AS (SELECT doc_id AS query_id, len(t) AS nq, unnest(t) AS tok FROM tk WHERE doc_id < 10), "
        "ce AS (SELECT doc_id AS item_id, len(t) AS nc, unnest(t) AS tok FROM tk), "
        "inter AS (SELECT query_id, item_id, count(*) AS i, any_value(nq) AS nq, any_value(nc) AS nc "
        "FROM qe JOIN ce USING (tok) WHERE query_id <> item_id GROUP BY 1, 2), "
        "lr AS (SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY CAST(i AS DOUBLE) / (nq + nc - i) DESC, item_id ASC) AS rank FROM inter), "
        # BM25 leg (bag-of-words tf; X210 CTE chain)
        "btk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "bd AS (SELECT doc_id AS item_id, t, len(t) AS dl FROM btk), "
        "bcx AS (SELECT item_id, unnest(t) AS term, dl FROM bd), "
        "bctf AS (SELECT item_id, term, count(*) AS tf, max(dl) AS dl FROM bcx GROUP BY 1, 2), "
        "bdft AS (SELECT term, count(*) AS df FROM bctf GROUP BY 1), "
        "bst AS (SELECT CAST(count(*) AS BIGINT) AS N, "
        "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM bd), "
        "bq AS (SELECT doc_id AS query_id, unnest(list_distinct(t)) AS term FROM btk WHERE doc_id < 10), "
        f"bj AS (SELECT bq.query_id, c.item_id, {contrib} AS contrib "
        "FROM bq JOIN bctf c ON bq.term = c.term JOIN bdft f ON bq.term = f.term "
        "CROSS JOIN bst st WHERE bq.query_id <> c.item_id), "
        "bs AS (SELECT query_id, item_id, sum(CAST(contrib AS DECIMAL(20,9))) AS s "
        "FROM bj GROUP BY 1, 2), "
        "br AS (SELECT query_id, item_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY s DESC, item_id ASC) AS rank FROM bs), "
        # RRF combine over the three legs
        f"allc AS (SELECT query_id, item_id, {rrf_c} AS c FROM lr WHERE rank <= 20 "
        f"UNION ALL SELECT query_id, item_id, {rrf_c} AS c FROM br WHERE rank <= 20 "
        f"UNION ALL SELECT query_id, item_id, {rrf_c} AS c FROM vr WHERE rank <= 20), "
        "sc AS (SELECT query_id, item_id, CAST(sum(c) AS DECIMAL(20,9)) AS s FROM allc GROUP BY 1, 2), "
        "rk AS (SELECT query_id, item_id, s, row_number() OVER (PARTITION BY query_id "
        "ORDER BY s DESC, item_id ASC) AS rank FROM sc) "
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, item_id, CAST(s AS DOUBLE) AS rrf_score "
        "FROM rk WHERE rank <= 10"
    )


def _sql_salted_segment_revenue() -> str:
    # the PLAIN join — certifying the salted path is a pure
    # partitioning artifact
    return (
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, "
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"
    )


def _sql_contamination_fraction(probes: list[str]) -> str:
    values = ", ".join(f"('{p}')" for p in probes)
    return (
        f"{SQL_SHINGLES}, "
        f"probes(probe) AS (VALUES {values}), "
        "ptoks AS (SELECT probe, CASE WHEN trim(probe) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(probe), '\\s+') END AS t FROM probes), "
        "psh AS (SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS s "
        "FROM ptoks CROSS JOIN unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)), "
        "tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY id), "
        "nh AS (SELECT sh.id, CAST(count(*) AS BIGINT) AS n_contaminated "
        "FROM sh JOIN psh USING (s) GROUP BY sh.id) "
        "SELECT d.doc_id, coalesce(t.n_shingles, 0) AS n_shingles, "
        "coalesce(nh.n_contaminated, 0) AS n_contaminated, "
        "CASE WHEN coalesce(t.n_shingles, 0) > 0 THEN "
        "round(CAST(coalesce(nh.n_contaminated, 0) AS DOUBLE) / t.n_shingles, 6) END "
        "AS contaminated_frac "
        "FROM documents d LEFT JOIN tot t ON d.doc_id = t.id "
        "LEFT JOIN nh ON d.doc_id = nh.id"
    )


def _sql_stratified_split(train_pct: int) -> str:
    return (
        "WITH r AS (SELECT doc_id, source, "
        "row_number() OVER (PARTITION BY source ORDER BY "
        "(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) + 1.0) / 4294967296.0 ASC, "
        "doc_id ASC) AS rn, "
        "CAST(floor((count(*) OVER (PARTITION BY source) * "
        f"{train_pct} + 99) / 100.0) AS BIGINT) AS q FROM documents) "
        "SELECT doc_id, source, CASE WHEN rn <= q THEN 'train' ELSE 'eval' END AS split FROM r"
    )


def _sql_record_linkage() -> str:
    """BRUTE-FORCE oracle for the cross-table Ed-Join: every (left,
    right) pair levenshtein-verified over the full cross join — a hash
    match certifies the engine's prefix filter misses NO pair."""
    pos = "CAST(hv % 16 AS INT)"
    return (
        "WITH h AS (SELECT c_custkey, "
        "substr(md5('id|' || CAST(c_custkey AS VARCHAR)), 1, 16) AS tok, "
        "CAST(CAST(('0x' || substr(md5('rl|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) AS hv "
        "FROM customer), "
        "v AS (SELECT DISTINCT CASE WHEN c_custkey % 3 = 0 "
        f"THEN substr(tok, 1, {pos}) || substr(tok, {pos} + 2) "
        "ELSE tok END AS value_r FROM h), "
        "l AS (SELECT DISTINCT tok AS value_l FROM h) "
        "SELECT value_l, value_r, CAST(levenshtein(value_l, value_r) AS INT) AS dist "
        "FROM l CROSS JOIN v WHERE levenshtein(value_l, value_r) <= 1"
    )


def _sql_hll_daily_users() -> str:
    """Day-DIRECT md5 HLL registers + harmonic/linear-counting finish —
    matching the engine's hour-partials-merged-to-day value certifies
    both engine determinism and max()-mergeability in one hash."""
    raw = "(47072.71267120224 / (sp + (256 - present)))"
    return (
        "WITH h AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day_start, "
        "md5(CAST(user_id AS VARCHAR)) AS h FROM events WHERE user_id IS NOT NULL), "
        "br AS (SELECT day_start, CAST(('0x' || substr(h, 1, 2)) AS INT) AS bucket, "
        "CAST(('0x' || substr(h, 3, 8)) AS UBIGINT) AS w FROM h), "
        "rr AS (SELECT day_start, bucket, max(33 - (CAST(w >= 1 AS INT) + CAST(w >= 2 AS INT) + CAST(w >= 4 AS INT) + CAST(w >= 8 AS INT) + CAST(w >= 16 AS INT) + CAST(w >= 32 AS INT) + CAST(w >= 64 AS INT) + CAST(w >= 128 AS INT) + CAST(w >= 256 AS INT) + CAST(w >= 512 AS INT) + CAST(w >= 1024 AS INT) + CAST(w >= 2048 AS INT) + CAST(w >= 4096 AS INT) + CAST(w >= 8192 AS INT) + CAST(w >= 16384 AS INT) + CAST(w >= 32768 AS INT) + CAST(w >= 65536 AS INT) + CAST(w >= 131072 AS INT) + CAST(w >= 262144 AS INT) + CAST(w >= 524288 AS INT) + CAST(w >= 1048576 AS INT) + CAST(w >= 2097152 AS INT) + CAST(w >= 4194304 AS INT) + CAST(w >= 8388608 AS INT) + CAST(w >= 16777216 AS INT) + CAST(w >= 33554432 AS INT) + CAST(w >= 67108864 AS INT) + CAST(w >= 134217728 AS INT) + CAST(w >= 268435456 AS INT) + CAST(w >= 536870912 AS INT) + CAST(w >= 1073741824 AS INT) + CAST(w >= 2147483648 AS INT))) AS r FROM br GROUP BY 1, 2), "
        "ag AS (SELECT day_start, CAST(count(*) AS BIGINT) AS present, "
        "sum(power(0.5, r)) AS sp FROM rr GROUP BY 1) "
        "SELECT day_start, present AS n_registers, "
        "floor((CASE WHEN " + raw + " <= 640.0 AND present < 256 "
        "THEN 256.0 * ln(256.0 / (256 - present)) ELSE " + raw + " END) * 1e4 + 0.5) / 1e4 "
        "AS ndv_estimate FROM ag"
    )


def _q_image_dhash_pairs(spark, sf):
    # X212 perceptual near-dup for the image modality: real-codec
    # round-trip -> integer-exact dHash (8x9 block grid, cross-
    # multiplied mean comparisons, two sign-safe 32-bit words) ->
    # pigeonhole-banded pair join with exact Hamming verify. The
    # oracle replays hash construction AND banding from the ORIGINAL
    # bytes (decode∘encode identity, the X183 image discipline).
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    # width=32: the 8-scanline minimum then needs only 256 bytes, so
    # the fixture's shorter planted duplicates participate (12 pairs
    # at sf0.01 vs 1 at width=64)
    media = MM.encode_png_media(docs, "doc_id", "payload", width=32)
    return MM.dhash_pairs(MM.image_dhash(media), max_hamming=3)


def _sql_image_dhash_pairs(width: int = 32, max_hamming: int = 3) -> str:
    """The dHash pipeline from the original bytes: pixel (r, c) =
    byte r·width+c of the length-truncated text (pure-ASCII fixture:
    UTF-8 bytes == payload bytes), floor-division 8×9 block grid,
    integer cross-multiplied gradient bits, two 32-bit words, 4
    pigeonhole bands, xor+bit_count Hamming — every step integer."""
    return (
        f"WITH l AS (SELECT doc_id, text, (length(text) // {width}) * {width} AS n, "
        f"(length(text) // {width}) AS h FROM documents "
        f"WHERE length(text) // {width} >= 8), "
        f"g AS (SELECT doc_id, h, (i - 1) // {width} AS r, (i - 1) % {width} AS c, "
        "ord(substr(text, CAST(i AS INT), 1)) AS p FROM l, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(n AS BIGINT))) AS t(i)), "
        f"blk AS (SELECT doc_id, (r * 8) // h AS rb, (c * 9) // {width} AS cb, "
        "CAST(sum(p) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS cnt "
        "FROM g GROUP BY 1, 2, 3), "
        "bits AS (SELECT a.doc_id, a.rb, a.cb, "
        "CASE WHEN a.s * b2.cnt > b2.s * a.cnt THEN 1 ELSE 0 END AS bit "
        "FROM blk a JOIN blk b2 ON a.doc_id = b2.doc_id AND a.rb = b2.rb "
        "AND b2.cb = a.cb + 1 WHERE a.cb < 8), "
        "words AS (SELECT doc_id, "
        "CAST(sum(CASE WHEN rb < 4 THEN bit * (CAST(1 AS BIGINT) << (rb * 8 + cb)) "
        "ELSE 0 END) AS BIGINT) AS w0, "
        "CAST(sum(CASE WHEN rb >= 4 THEN bit * (CAST(1 AS BIGINT) << ((rb - 4) * 8 + cb)) "
        "ELSE 0 END) AS BIGINT) AS w1 FROM bits GROUP BY 1), "
        "bands AS (SELECT doc_id, w0, w1, unnest([0 * 65536 + w0 // 65536, "
        "1 * 65536 + w0 % 65536, 2 * 65536 + w1 // 65536, "
        "3 * 65536 + w1 % 65536]) AS bk FROM words), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id) "
        "SELECT c.id_a, c.id_b, "
        "CAST(bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) AS BIGINT) AS hamming "
        "FROM cand c JOIN words wa ON c.id_a = wa.doc_id "
        "JOIN words wb ON c.id_b = wb.doc_id "
        "WHERE bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) "
        f"<= {max_hamming}"
    )


def _sql_multimodal_features(width: int) -> str:
    """Oracle from the ORIGINAL text bytes: the engine's pixel digest
    and stats only match if encode→PNG→decode is byte-identical.
    DuckDB sha256(substr(text,...)) hashes the UTF-8 bytes, which ARE
    the payload bytes on the pure-ASCII fixture (octet_length ==
    length, the audio/image-oracle precondition)."""
    return (
        f"WITH l AS (SELECT doc_id, text, (length(text) // {width}) * {width} AS n "
        f"FROM documents WHERE length(text) >= {width}), "
        "s AS (SELECT doc_id, CAST(sum(ord(substr(text, CAST(i AS INT), 1))) AS BIGINT) AS ps, "
        "CAST(count(*) AS BIGINT) AS n_samples FROM l, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(n AS BIGINT))) AS g(i) GROUP BY doc_id) "
        "SELECT l.doc_id AS media_id, "
        "sha256(substr(l.text, 1, CAST(l.n AS INT))) AS pixel_sha256, "
        "floor(CAST(s.ps AS DOUBLE) / s.n_samples * 1e6 + 0.5) / 1e6 AS mean_pixel, "
        "s.n_samples, "
        f"CAST({width} AS BIGINT) AS width, "
        f"CAST(s.n_samples // {width} AS BIGINT) AS height "
        "FROM l JOIN s USING (doc_id)"
    )


def _sql_langid_ctes() -> str:
    """Shared CTE prefix for the langid oracles: the fixture
    (md5-selected markers + md5 train coin), the smoothed (lang,
    ngram) log-prob table, and the exact-DECIMAL scored grid ranked
    per doc — a trained classifier unrolled for the hash channel,
    same discipline as the KMeans semantic-dedup oracle."""

    def mdint(tag_expr: str) -> str:
        return (
            f"CAST(CAST(('0x' || substr(md5({tag_expr}), 1, 8)) AS UBIGINT) AS BIGINT)"
        )

    marker_exprs = []
    for j in range(_LANGID_K):
        tag = "'lid" + str(j) + "|' || CAST(doc_id AS VARCHAR)"
        idx = f"({mdint(tag)} % 8)"
        arms = " ".join(
            "WHEN '{l}' THEN list_extract([{ws}], 1 + {i})".format(
                l=lang, ws=", ".join(f"'{w}'" for w in words), i=idx
            )
            for lang, words in _LANGID_MARKERS.items()
        )
        marker_exprs.append(f"CASE lang {arms} END")
    markers = ", ".join(marker_exprs)
    train_coin = mdint("'lidtrain|' || CAST(doc_id AS VARCHAR)")
    return (
        "WITH base AS (SELECT doc_id, lang, "
        f"lower(concat_ws(' ', text, {markers})) AS t, "
        f"({train_coin} % 2 = 0) AS is_train FROM documents), "
        # sliding char-3grams; generate_series(1,0) is empty in DuckDB
        # so sub-3-char docs contribute no grams (Spark guards the same)
        "tg AS (SELECT b.lang, substr(b.t, CAST(g.p AS INT), 3) AS ng "
        "FROM base b, unnest(generate_series(1, CAST(greatest(length(b.t) - 2, 0) AS BIGINT))) AS g(p) "
        "WHERE b.is_train), "
        "counts AS (SELECT lang, ng, count(*) AS c FROM tg GROUP BY 1, 2), "
        "totals AS (SELECT lang, CAST(sum(c) AS BIGINT) AS total FROM counts GROUP BY 1), "
        "vocab AS (SELECT CAST(count(DISTINCT ng) AS BIGINT) AS v FROM tg), "
        "model AS (SELECT c.lang, c.ng, "
        "CAST(round(ln((c.c + 1.0) / (t.total + vv.v)), 6) AS DECIMAL(38,6)) AS logp "
        "FROM counts c JOIN totals t USING (lang) CROSS JOIN vocab vv), "
        "floors AS (SELECT t.lang, "
        "CAST(round(ln(1.0 / (t.total + vv.v)), 6) AS DECIMAL(38,6)) AS fl "
        "FROM totals t CROSS JOIN vocab vv), "
        "dg AS (SELECT b.doc_id, substr(b.t, CAST(g.p AS INT), 3) AS ng "
        "FROM base b, unnest(generate_series(1, CAST(greatest(length(b.t) - 2, 0) AS BIGINT))) AS g(p)), "
        "m AS (SELECT b.doc_id, coalesce(c.m, 0) AS m FROM base b LEFT JOIN "
        "(SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM dg GROUP BY 1) c USING (doc_id)), "
        "matched AS (SELECT d.doc_id, mo.lang, "
        "CAST(sum(mo.logp) AS DECIMAL(38,6)) AS s, CAST(count(*) AS BIGINT) AS mc "
        "FROM dg d JOIN model mo ON d.ng = mo.ng GROUP BY 1, 2), "
        "scored AS (SELECT m.doc_id, f.lang, "
        "CAST(coalesce(ma.s, CAST(0 AS DECIMAL(38,6))) "
        "+ (m.m - coalesce(ma.mc, 0)) * f.fl AS DECIMAL(38,6)) AS score "
        "FROM m CROSS JOIN floors f "
        "LEFT JOIN matched ma ON ma.doc_id = m.doc_id AND ma.lang = f.lang), "
        "pred AS (SELECT doc_id, lang, score, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn "
        "FROM scored)"
    )


def _sql_lang_id_trained() -> str:
    """DuckDB twin of the char-3gram NB fit->score composition (CTEs
    shared with the margin query via _sql_langid_ctes)."""
    return (
        _sql_langid_ctes()
        + " SELECT b.doc_id, b.lang AS lang_true, b.is_train, "
        "p.lang AS lang_pred, CAST(p.score AS DOUBLE) AS score "
        "FROM base b JOIN pred p ON b.doc_id = p.doc_id AND p.rn = 1"
    )


def _sql_lang_id_margin() -> str:
    return (
        _sql_langid_ctes()
        + " SELECT doc_id, max(CASE WHEN rn = 1 THEN lang END) AS lang_pred, "
        "max(CASE WHEN rn = 2 THEN lang END) AS lang_second, "
        "coalesce(CAST(max(CASE WHEN rn = 1 THEN score END) "
        "- max(CASE WHEN rn = 2 THEN score END) AS DOUBLE), 0.0) AS margin "
        "FROM pred WHERE rn <= 2 GROUP BY doc_id"
    )


def _sql_langid_segments() -> str:
    """DuckDB twin of the X241 code-switch span query: the same NB
    model CTEs as lang_id_trained (fit replayed via _sql_langid_ctes;
    the unreferenced per-doc pred CTE prunes away), the md5-replayed
    paragraph fixture, per-(doc, paragraph) exact-DECIMAL scoring with
    the (score DESC, lang ASC) argmax, and the gaps-and-islands run
    merge — every span boundary hash-checked."""

    def mdint(tag_expr: str) -> str:
        return (
            f"CAST(CAST(('0x' || substr(md5({tag_expr}), 1, 8)) AS UBIGINT) AS BIGINT)"
        )

    langs = ", ".join(f"'{l}'" for l in _SEG_LANGS)
    lang_tag = "'segl' || CAST(j AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)"
    word_tag = (
        "'segw' || CAST(j AS VARCHAR) || '_' || CAST(k AS VARCHAR) "
        "|| '|' || CAST(doc_id AS VARCHAR)"
    )
    arms = " ".join(
        "WHEN '{l}' THEN list_extract([{ws}], CAST(1 + ({h} % 8) AS INT))".format(
            l=lang,
            ws=", ".join(f"'{w}'" for w in _LANGID_MARKERS[lang]),
            h=mdint(word_tag),
        )
        for lang in _SEG_LANGS
    )
    pslots = ", ".join(str(j) for j in range(_SEG_MAXP))
    kslots = ", ".join(str(k) for k in range(_SEG_K))
    return (
        _sql_langid_ctes() + ", "
        f"pb0 AS (SELECT doc_id, j, list_extract([{langs}], "
        f"CAST(1 + ({mdint(lang_tag)} % {len(_SEG_LANGS)}) AS INT)) AS plang "
        f"FROM documents, unnest([{pslots}]) AS tj(j) WHERE j < 2 + doc_id % 3), "
        f"pw AS (SELECT doc_id, j, k, CASE plang {arms} END AS w "
        f"FROM pb0, unnest([{kslots}]) AS tk(k)), "
        "pbx AS (SELECT doc_id, j AS para_idx, string_agg(w, ' ' ORDER BY k) AS ptext "
        "FROM pw GROUP BY 1, 2), "
        "pg AS (SELECT doc_id, para_idx, substr(lower(ptext), CAST(gp.p AS INT), 3) AS ng "
        "FROM pbx, unnest(generate_series(CAST(1 AS BIGINT), "
        "CAST(greatest(length(ptext) - 2, 0) AS BIGINT))) AS gp(p)), "
        "pm AS (SELECT doc_id, para_idx, "
        "CAST(greatest(length(ptext) - 2, 0) AS BIGINT) AS m FROM pbx), "
        "pmt AS (SELECT g.doc_id, g.para_idx, mo.lang, "
        "CAST(sum(mo.logp) AS DECIMAL(38,6)) AS s, CAST(count(*) AS BIGINT) AS mc "
        "FROM pg g JOIN model mo ON g.ng = mo.ng GROUP BY 1, 2, 3), "
        "psc AS (SELECT pm.doc_id, pm.para_idx, f.lang, "
        "CAST(coalesce(ma.s, CAST(0 AS DECIMAL(38,6))) "
        "+ (pm.m - coalesce(ma.mc, 0)) * f.fl AS DECIMAL(38,6)) AS score "
        "FROM pm CROSS JOIN floors f LEFT JOIN pmt ma "
        "ON ma.doc_id = pm.doc_id AND ma.para_idx = pm.para_idx AND ma.lang = f.lang), "
        "ppr AS (SELECT doc_id, para_idx, lang FROM "
        "(SELECT doc_id, para_idx, lang, row_number() OVER "
        "(PARTITION BY doc_id, para_idx ORDER BY score DESC, lang ASC) AS rn FROM psc) "
        "WHERE rn = 1), "
        "runs AS (SELECT doc_id, para_idx, lang, para_idx - row_number() OVER "
        "(PARTITION BY doc_id, lang ORDER BY para_idx) AS grp FROM ppr), "
        "segs AS (SELECT doc_id, lang, grp, min(para_idx) AS start_para, "
        "max(para_idx) AS end_para, CAST(count(*) AS BIGINT) AS n_paras "
        "FROM runs GROUP BY 1, 2, 3) "
        "SELECT doc_id, CAST(row_number() OVER "
        "(PARTITION BY doc_id ORDER BY start_para) AS INT) AS seg_idx, lang, "
        "CAST(start_para AS INT) AS start_para, CAST(end_para AS INT) AS end_para, "
        "n_paras FROM segs"
    )


def _sql_audio_fingerprint_pairs64(frames: int = 64, max_hamming: int = 3) -> str:
    """X214: the 32-bit audio-fingerprint oracle generalized to two
    words (bits 0-31 -> w0, 32-63 -> w1) with the dHash 4x16-bit band
    extraction — every step integer, replayed from the source bytes."""
    b = "ord(substr(text, CAST(i AS INT), 1)) + 256 * ord(substr(text, CAST(i AS INT) + 1, 1))"
    hi = "ord(substr(text, CAST(i AS INT) + 1, 1))"
    g = frames + 1
    return (
        "WITH l AS (SELECT doc_id, text, (length(text) // 2) * 2 AS nb, "
        f"length(text) // 2 AS n FROM documents WHERE length(text) // 2 >= {g}), "
        "s AS (SELECT doc_id, n, CAST((i - 1) // 2 AS BIGINT) AS sidx, "
        f"{b} - CASE WHEN {hi} >= 128 THEN 65536 ELSE 0 END AS x "
        "FROM l CROSS JOIN unnest(generate_series(CAST(1 AS BIGINT), "
        "CAST(nb - 1 AS BIGINT), CAST(2 AS BIGINT))) AS g(i)), "
        f"e AS (SELECT doc_id, (sidx * {g}) // n AS fb, "
        "CAST(sum(x * x) AS BIGINT) AS en, CAST(count(*) AS BIGINT) AS cnt "
        "FROM s GROUP BY 1, 2), "
        "bits AS (SELECT a.doc_id, a.fb, "
        "CASE WHEN a.en * b2.cnt > b2.en * a.cnt THEN 1 ELSE 0 END AS bit "
        "FROM e a JOIN e b2 ON a.doc_id = b2.doc_id AND b2.fb = a.fb + 1 "
        f"WHERE a.fb < {frames}), "
        "words AS (SELECT doc_id, "
        "CAST(sum(CASE WHEN fb < 32 THEN bit * (CAST(1 AS BIGINT) << fb) "
        "ELSE 0 END) AS BIGINT) AS w0, "
        "CAST(sum(CASE WHEN fb >= 32 THEN bit * (CAST(1 AS BIGINT) << (fb - 32)) "
        "ELSE 0 END) AS BIGINT) AS w1 FROM bits GROUP BY 1), "
        "bands AS (SELECT doc_id, w0, w1, unnest([0 * 65536 + w0 // 65536, "
        "1 * 65536 + w0 % 65536, 2 * 65536 + w1 // 65536, "
        "3 * 65536 + w1 % 65536]) AS bk FROM words), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id) "
        "SELECT c.id_a, c.id_b, "
        "CAST(bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) AS BIGINT) AS hamming "
        "FROM cand c JOIN words wa ON c.id_a = wa.doc_id "
        "JOIN words wb ON c.id_b = wb.doc_id "
        "WHERE bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) "
        f"<= {max_hamming}"
    )


def _sql_audio_fingerprint64(frames: int = 64) -> str:
    """X214a: the two-word fingerprint construction per clip — the
    words CTE of the pairs oracle, joined back for n_samples."""
    b = "ord(substr(text, CAST(i AS INT), 1)) + 256 * ord(substr(text, CAST(i AS INT) + 1, 1))"
    hi = "ord(substr(text, CAST(i AS INT) + 1, 1))"
    g = frames + 1
    return (
        "WITH l AS (SELECT doc_id, text, (length(text) // 2) * 2 AS nb, "
        f"length(text) // 2 AS n FROM documents WHERE length(text) // 2 >= {g}), "
        "s AS (SELECT doc_id, n, CAST((i - 1) // 2 AS BIGINT) AS sidx, "
        f"{b} - CASE WHEN {hi} >= 128 THEN 65536 ELSE 0 END AS x "
        "FROM l CROSS JOIN unnest(generate_series(CAST(1 AS BIGINT), "
        "CAST(nb - 1 AS BIGINT), CAST(2 AS BIGINT))) AS g(i)), "
        f"e AS (SELECT doc_id, (sidx * {g}) // n AS fb, "
        "CAST(sum(x * x) AS BIGINT) AS en, CAST(count(*) AS BIGINT) AS cnt "
        "FROM s GROUP BY 1, 2), "
        "bits AS (SELECT a.doc_id, a.fb, "
        "CASE WHEN a.en * b2.cnt > b2.en * a.cnt THEN 1 ELSE 0 END AS bit "
        "FROM e a JOIN e b2 ON a.doc_id = b2.doc_id AND b2.fb = a.fb + 1 "
        f"WHERE a.fb < {frames}), "
        "words AS (SELECT doc_id, "
        "CAST(sum(CASE WHEN fb < 32 THEN bit * (CAST(1 AS BIGINT) << fb) "
        "ELSE 0 END) AS BIGINT) AS w0, "
        "CAST(sum(CASE WHEN fb >= 32 THEN bit * (CAST(1 AS BIGINT) << (fb - 32)) "
        "ELSE 0 END) AS BIGINT) AS w1 FROM bits GROUP BY 1) "
        "SELECT w.doc_id AS media_id, CAST(l.n AS INT) AS n_samples, w.w0, w.w1 "
        "FROM words w JOIN l ON w.doc_id = l.doc_id"
    )


def _sql_bm25_rerank_cosine(
    n_stage1: int = 20, k: int = 5, k1: float = 1.2, b: float = 0.75
) -> str:
    """X215: the X210 BM25 CTE chain (identical parenthesization/9dp
    discipline) truncated at top-``n_stage1`` per query, then exact
    cosine over the candidate pairs only and a (cosine desc, item)
    top-``k`` — the two-stage retrieve-then-re-rank stack."""
    idf = "ln(CAST(1.0 AS DOUBLE) + (st.N - f.df + CAST(0.5 AS DOUBLE)) / (f.df + CAST(0.5 AS DOUBLE)))"
    denom = (
        f"(c.tf + CAST({k1} AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST({b} AS DOUBLE) "
        f"+ CAST({b} AS DOUBLE) * c.dl / st.avgdl))"
    )
    contrib = f"round({idf} * c.tf * CAST({k1 + 1.0} AS DOUBLE) / {denom}, 9)"
    cos = (
        "CASE WHEN list_dot_product(qe.v, qe.v) > 0 AND list_dot_product(ie.v, ie.v) > 0 "
        "THEN list_dot_product(qe.v, ie.v) / "
        "(sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ie.v, ie.v))) "
        "ELSE NULL END"
    )
    return (
        "WITH tk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "d AS (SELECT doc_id AS item_id, t, len(t) AS dl FROM tk), "
        "cx AS (SELECT item_id, unnest(t) AS term, dl FROM d), "
        "ctf AS (SELECT item_id, term, count(*) AS tf, max(dl) AS dl "
        "FROM cx GROUP BY 1, 2), "
        "dft AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS N, "
        "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM d), "
        "q AS (SELECT doc_id AS query_id, unnest(list_distinct(t)) AS term "
        "FROM tk WHERE doc_id < 8), "
        f"j AS (SELECT q.query_id, c.item_id, {contrib} AS contrib "
        "FROM q JOIN ctf c ON q.term = c.term JOIN dft f ON q.term = f.term "
        "CROSS JOIN st WHERE q.query_id <> c.item_id), "
        "sc AS (SELECT query_id, item_id, sum(CAST(contrib AS DECIMAL(20,9))) AS s "
        "FROM j GROUP BY 1, 2), "
        "r AS (SELECT query_id, item_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY s DESC, item_id ASC) AS rn FROM sc), "
        f"cand AS (SELECT query_id, item_id FROM r WHERE rn <= {n_stage1}), "
        f"e AS ({SQL_EMB}), "
        f"scored AS (SELECT c.query_id, c.item_id, {cos} AS cosine "
        "FROM cand c JOIN e qe ON c.query_id = qe.vec_id "
        "JOIN e ie ON c.item_id = ie.vec_id), "
        "nn AS (SELECT * FROM scored WHERE cosine IS NOT NULL), "
        "rr AS (SELECT query_id, item_id, cosine, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, item_id ASC) AS rn2 FROM nn) "
        f"SELECT query_id, CAST(rn2 AS BIGINT) AS rank, item_id, "
        f"round(cosine, 6) AS cosine FROM rr WHERE rn2 <= {k}"
    )


def _sql_nation_profit() -> str:
    return (
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) "
        "- p_retailprice * l_quantity / 10.0 AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_profit "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%gear%' GROUP BY 1, 2"
    )


def _sql_important_parts() -> str:
    return (
        "WITH rev AS (SELECT l_partkey, "
        "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS val "
        "FROM lineitem GROUP BY 1) "
        "SELECT p_partkey, p_name, round(CAST(val AS DOUBLE), 2) AS part_value "
        "FROM rev JOIN part ON l_partkey = p_partkey "
        "WHERE CAST(val AS DOUBLE) > 1.5 * CAST((SELECT sum(val) FROM rev) AS DOUBLE) "
        "/ (SELECT count(*) FROM rev)"
    )


def _sql_supplier_part_counts() -> str:
    return (
        "SELECT p_brand, p_type, p_size, "
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand <> 'Brand#13' AND p_size <= 20 "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3"
    )


def _sql_excess_shipments() -> str:
    return (
        "WITH q AS (SELECT l_suppkey, "
        "sum(CAST(l_quantity AS DECIMAL(38,6))) AS sq "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_type = 'SMALL' AND l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY 1 HAVING CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 50.0) "
        "SELECT s_suppkey, s_name, n_name AS nation, "
        "round(CAST(sq AS DOUBLE), 2) AS shipped_qty "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "JOIN q ON s_suppkey = l_suppkey WHERE n_regionkey = 0"
    )


def _sql_bootstrap_ci(replicates: int = 64, alpha: float = 0.05) -> str:
    # mirrors sampling.bootstrap_mean_ci on documents.n_chars: the
    # Poisson(1) inverse-CDF CASE chain embeds the SAME double
    # thresholds (shared builder), the coin is the standard md5-unit
    # replay, replicate means take the half-up 1e-6 snap, and the CI
    # is quantile_cont (Spark F.percentile's interpolation twin)
    from safedata_pipeline_spark.operators.sampling import poisson1_cum_thresholds

    cum = poisson1_cum_thresholds()
    whens = " ".join(f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(cum))
    coin = (
        "(CAST(('0x' || substr(md5('boot|' || CAST(doc_id AS VARCHAR) || '|' "
        "|| CAST(b AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) / 4294967296.0"
    )
    return (
        "WITH v AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS x FROM documents "
        "WHERE n_chars IS NOT NULL), "
        f"u AS (SELECT x, b, {coin} AS u FROM v, range({replicates}) AS t(b)), "
        f"w AS (SELECT x, b, CASE {whens} ELSE {len(cum)} END AS w FROM u), "
        "rep AS (SELECT b, floor(CAST(sum(CAST(round(w * x, 9) AS DECIMAL(38,9))) "
        "AS DOUBLE) / sum(w) * 1000000.0 + 0.5) / 1000000.0 AS m "
        "FROM w WHERE w > 0 GROUP BY b), "
        "pt AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "floor(CAST(sum(CAST(round(x, 9) AS DECIMAL(38,9))) AS DOUBLE) / count(*) "
        "* 1000000.0 + 0.5) / 1000000.0 AS mean FROM v), "
        "ci AS (SELECT CAST(count(*) AS BIGINT) AS n_replicates, "
        f"round(quantile_cont(m, {alpha / 2!r}), 6) AS ci_lo, "
        f"round(quantile_cont(m, {1 - alpha / 2!r}), 6) AS ci_hi FROM rep) "
        "SELECT n_rows, n_replicates, mean, ci_lo, ci_hi FROM pt CROSS JOIN ci"
    )


def _sql_snm_pairs(window: int = 8, max_dist: int = 1) -> str:
    return (
        "WITH r AS (SELECT c_name, c_custkey, "
        "row_number() OVER (ORDER BY c_name, c_custkey) AS rn "
        "FROM customer WHERE c_name IS NOT NULL) "
        "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, "
        "CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist "
        f"FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {window - 1} "
        f"WHERE levenshtein(a.c_name, b.c_name) <= {max_dist}"
    )


def _sql_embedding_drift() -> str:
    def gram(pred: str) -> str:
        return (
            f"(WITH e AS (SELECT embedding AS v FROM embeddings "
            f"WHERE embedding IS NOT NULL AND len(embedding) > 0 AND {pred}), "
            "p AS (SELECT unnest(flatten(list_transform(range(1, len(v) + 1), i -> "
            "list_transform(range(i, len(v) + 1), j -> "
            "{'i': i, 'j': j, 'p': round(CAST(v[i] AS DOUBLE) * CAST(v[j] AS DOUBLE), 9)})))) AS s FROM e) "
            "SELECT CAST(s.i - 1 AS INT) AS i, CAST(s.j - 1 AS INT) AS j, "
            "floor(round(CAST(sum(CAST(s.p AS DECIMAL(38,9))) AS DOUBLE), 6) / count(*) "
            "* 1000000.0 + 0.5) / 1000000.0 AS m FROM p GROUP BY 1, 2)"
        )

    return (
        f"WITH a AS {gram('vec_id % 2 = 0')}, b AS {gram('vec_id % 2 = 1')} "
        "SELECT coalesce(a.i, b.i) AS i, coalesce(a.j, b.j) AS j, "
        "a.m AS moment_a, b.m AS moment_b, "
        "round(coalesce(a.m, 0) - coalesce(b.m, 0), 6) AS delta "
        "FROM a FULL OUTER JOIN b ON a.i = b.i AND a.j = b.j"
    )


def _sql_embedding_gram() -> str:
    return (
        "WITH e AS (SELECT embedding AS v FROM embeddings "
        "WHERE embedding IS NOT NULL AND len(embedding) > 0), "
        "p AS (SELECT unnest(flatten(list_transform(range(1, len(v) + 1), i -> "
        "list_transform(range(i, len(v) + 1), j -> "
        "{'i': i, 'j': j, 'p': round(CAST(v[i] AS DOUBLE) * CAST(v[j] AS DOUBLE), 9)})))) AS s FROM e) "
        "SELECT CAST(s.i - 1 AS INT) AS i, CAST(s.j - 1 AS INT) AS j, "
        "round(CAST(sum(CAST(s.p AS DECIMAL(38,9))) AS DOUBLE), 6) AS gram, "
        "CAST(count(*) AS BIGINT) AS n_vectors FROM p GROUP BY 1, 2"
    )


def _sql_kn_logprob(d: float = 0.75) -> str:
    # mirrors text.kneser_ney_logprob: the ln argument's SQL
    # parenthesization matches the Spark expression tree exactly, so
    # the 6dp snap absorbs only libm-vs-Math.log ulp latitude
    p = (
        f"(ty.cbg - {d}) / fwd.cw1 + "
        f"({d} * fwd.n1fwd / fwd.cw1) * (bwd.n1bwd / nt.ntypes)"
    )
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "ex AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1, "
        "unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2 "
        "FROM toks WHERE len(t) >= 2), "
        "ty AS (SELECT w1, w2, count(*) AS cbg FROM ex GROUP BY 1, 2), "
        "fwd AS (SELECT w1, sum(cbg) AS cw1, count(*) AS n1fwd FROM ty GROUP BY 1), "
        "bwd AS (SELECT w2, count(*) AS n1bwd FROM ty GROUP BY 1), "
        "nt AS (SELECT count(*) AS ntypes FROM ty), "
        f"scored AS (SELECT ex.doc_id, CAST(round(-ln({p}), 6) AS DECIMAL(38,6)) AS nlp "
        "FROM ex JOIN ty USING (w1, w2) JOIN fwd USING (w1) JOIN bwd USING (w2) CROSS JOIN nt), "
        "per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "floor(CAST(sum(nlp) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_neg_logprob "
        "FROM scored GROUP BY doc_id) "
        "SELECT toks.doc_id, CAST(coalesce(per_doc.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
        "per_doc.avg_neg_logprob FROM toks LEFT JOIN per_doc USING (doc_id)"
    )


def _sql_c4_line_filter() -> str:
    """DuckDB twin of the C4 fixture reflow (8-word lines, periods on
    even line indices, the three modulo plants) + the line rules:
    terminal punctuation, >= 3 words, no 'javascript'; page drop on
    'lorem ipsum' / '{'. Every predicate a list_filter mirrored
    term-for-term."""
    keep = (
        "l -> regexp_matches(l, '[.!?\"]$') AND "
        "len(CASE WHEN trim(l) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(l), '\\s+') END) >= 3 AND "
        "NOT contains(lower(l), 'javascript')"
    )
    return (
        f"WITH tk AS ({SQL_TOKS}), "
        "ref0 AS (SELECT doc_id, string_agg(array_to_string(t[(i*8+1):((i+1)*8)], ' ') "
        "|| CASE WHEN i % 2 = 0 THEN '.' ELSE '' END, "
        "chr(10) ORDER BY i) AS body FROM tk, "
        "unnest(generate_series(CAST(0 AS BIGINT), CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)) AS g(i) "
        "GROUP BY doc_id), "
        "ref AS (SELECT tk.doc_id, coalesce(ref0.body, '') AS body "
        "FROM tk LEFT JOIN ref0 USING (doc_id)), "
        "fx AS (SELECT doc_id, body "
        "|| CASE WHEN doc_id % 11 = 3 THEN chr(10)||'the classic lorem ipsum dolor sit amet filler.' ELSE '' END "
        "|| CASE WHEN doc_id % 13 = 5 THEN chr(10)||'if (x) { return y; }' ELSE '' END "
        "|| CASE WHEN doc_id % 7 = 2 THEN chr(10)||'please enable javascript to continue reading this page.' ELSE '' END "
        "AS text FROM ref), "
        "ln AS (SELECT doc_id, text, "
        "list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lns, "
        "contains(lower(text), 'lorem ipsum') AS has_lorem, "
        "contains(text, '{') AS has_curly FROM fx), "
        f"k AS (SELECT doc_id, lns, has_lorem, has_curly, "
        "NOT has_lorem AND NOT has_curly AS page_kept, "
        f"list_filter(lns, {keep}) AS kept FROM ln) "
        "SELECT doc_id, CAST(len(lns) AS BIGINT) AS n_lines, "
        "CASE WHEN page_kept THEN CAST(len(kept) AS BIGINT) ELSE 0 END AS n_kept, "
        "has_lorem, has_curly, page_kept, "
        "CASE WHEN page_kept THEN array_to_string(kept, chr(10)) ELSE '' END AS text_clean "
        "FROM k"
    )


def _sql_reflow(plants: list) -> str:
    """Shared DuckDB reflow CTE chain (tk -> ref0 -> ref -> fx) — the
    verbatim twin of ``_reflow_lines``: 8-word lines, periods on even
    indices, per-doc modulo plants appended."""
    plant_sql = "".join(
        f" || CASE WHEN doc_id % {m} = {r} THEN chr(10)||'{ln}' ELSE '' END"
        for m, r, ln in plants
    )
    return (
        f"tk AS ({SQL_TOKS}), "
        "ref0 AS (SELECT doc_id, string_agg(array_to_string(t[(i*8+1):((i+1)*8)], ' ') "
        "|| CASE WHEN i % 2 = 0 THEN '.' ELSE '' END, "
        "chr(10) ORDER BY i) AS body FROM tk, "
        "unnest(generate_series(CAST(0 AS BIGINT), CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)) AS g(i) "
        "GROUP BY doc_id), "
        "ref AS (SELECT tk.doc_id, coalesce(ref0.body, '') AS body "
        "FROM tk LEFT JOIN ref0 USING (doc_id)), "
        f"fx AS (SELECT doc_id, body{plant_sql} AS text FROM ref)"
    )


def _sql_boilerplate_lines(min_doc_freq: int) -> str:
    """DuckDB twin of X233: the same reflow + footer plants + the
    paired sub-threshold plant, exact COUNT(DISTINCT doc) per line,
    order-preserving reassembly of the surviving lines."""
    plants = _sql_reflow(BOILER_PLANTS)
    return (
        f"WITH {plants}, "
        "fx2 AS (SELECT doc_id, text || chr(10) || "
        "'shared pair line ' || CAST(doc_id // 2 AS VARCHAR) || '.' AS text FROM fx), "
        "ln AS (SELECT doc_id, list_filter(string_split(text, chr(10)), "
        "l -> trim(l) <> '') AS lns FROM fx2), "
        "e AS (SELECT doc_id, i AS pos, lns[i] AS line FROM ln, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(len(lns) AS BIGINT))) AS g(i)), "
        "f AS (SELECT line, count(DISTINCT doc_id) AS df FROM e GROUP BY line), "
        "agg AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
        f"CAST(sum(CASE WHEN f.df >= {min_doc_freq} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler, "
        f"coalesce(string_agg(CASE WHEN f.df < {min_doc_freq} THEN e.line END, "
        "chr(10) ORDER BY e.pos), '') AS text_clean "
        "FROM e JOIN f USING (line) GROUP BY e.doc_id) "
        "SELECT d.doc_id, coalesce(a.n_lines, 0) AS n_lines, "
        "coalesce(a.n_boiler, 0) AS n_boiler, "
        "coalesce(a.text_clean, '') AS text_clean "
        "FROM documents d LEFT JOIN agg a USING (doc_id)"
    )


def _sql_char_entropy() -> str:
    """DuckDB twin of X234: the control-char plant, per-(doc, char)
    exact counts, 9dp DECIMAL entropy terms, 6dp floor snaps, and the
    exact-integer 0.8 binary gate."""
    return (
        "WITH fx AS (SELECT doc_id, text || CASE WHEN doc_id % 17 = 5 "
        "THEN repeat(chr(1), 60) ELSE '' END AS text FROM documents), "
        "ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch "
        "FROM fx WHERE length(text) > 0), "
        "c AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ch "
        "GROUP BY doc_id, ch), "
        "n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY doc_id), "
        "t AS (SELECT c.doc_id, c.c, "
        "CAST(round(-( (CAST(c.c AS DOUBLE) / n.n) * log2(CAST(c.c AS DOUBLE) / n.n) ), 9) "
        "AS DECIMAL(20,9)) AS term, "
        "CASE WHEN regexp_matches(c.ch, '^[\\x20-\\x7e\\n\\t]$') THEN c.c ELSE 0 END AS pc "
        "FROM c JOIN n USING (doc_id)) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars, "
        "CAST(count(*) AS BIGINT) AS n_distinct_chars, "
        "floor(CAST(sum(term) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS entropy, "
        "floor(CAST(sum(pc) AS DOUBLE) / sum(c) * 1e6 + 0.5) / 1e6 AS printable_ratio, "
        "5 * sum(pc) < 4 * sum(c) AS is_binary "
        "FROM t GROUP BY doc_id"
    )


def _sql_refinedweb_line_correct() -> str:
    """DuckDB twin of X236: the four line-removal rules in exact
    integer/regex form, the 10·removed > 3·total char budget, and the
    order-preserving reassembly."""
    plants = _sql_reflow(RW_PLANTS)
    rm = (
        "(length(regexp_replace(trim(line), '[^A-Za-z]', '', 'g')) >= 4 AND "
        "2 * length(regexp_replace(trim(line), '[^A-Z]', '', 'g')) > "
        "length(regexp_replace(trim(line), '[^A-Za-z]', '', 'g'))) OR "
        "(regexp_matches(trim(line), '^[0-9\\s.,%:/-]+$') AND "
        "regexp_matches(trim(line), '[0-9]')) OR "
        "regexp_matches(lower(trim(line)), "
        "'^[0-9]+ (likes|comments|shares|views|retweets)[.!]?$') OR "
        "NOT regexp_matches(trim(line), '\\s')"
    )
    return (
        f"WITH {plants}, "
        "ln AS (SELECT doc_id, list_filter(string_split(text, chr(10)), "
        "l -> trim(l) <> '') AS lns FROM fx), "
        "e AS (SELECT doc_id, i AS pos, lns[i] AS line FROM ln, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(len(lns) AS BIGINT))) AS g(i)), "
        f"r AS (SELECT doc_id, pos, line, ({rm}) AS rm, "
        "CAST(length(trim(line)) AS BIGINT) AS lc FROM e), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, "
        "CAST(sum(CASE WHEN rm THEN lc ELSE 0 END) AS BIGINT) AS rc, "
        "CAST(sum(lc) AS BIGINT) AS tc, "
        "coalesce(string_agg(CASE WHEN NOT rm THEN line END, chr(10) ORDER BY pos), '') AS clean "
        "FROM r GROUP BY doc_id) "
        "SELECT l.doc_id, coalesce(a.n_lines, 0) AS n_lines, "
        "coalesce(a.n_removed, 0) AS n_removed, "
        "CASE WHEN coalesce(a.tc, 0) > 0 THEN "
        "floor(CAST(a.rc AS DOUBLE) / a.tc * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS frac_removed, "
        "NOT (10 * coalesce(a.rc, 0) > 3 * coalesce(a.tc, 0)) AS doc_kept, "
        "CASE WHEN NOT (10 * coalesce(a.rc, 0) > 3 * coalesce(a.tc, 0)) "
        "THEN coalesce(a.clean, '') ELSE '' END AS text_clean "
        "FROM ln l LEFT JOIN agg a USING (doc_id)"
    )


def _sql_ngram_novelty(n: int) -> str:
    """DuckDB twin of X237: lowercased whitespace tokens, per-doc
    DISTINCT n-grams, exact corpus df, exact int/int novelty snap."""
    return (
        "WITH d AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        f"g AS (SELECT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS g "
        f"FROM d, unnest(generate_series(CAST(1 AS BIGINT), CAST(len(t) AS BIGINT) - {n - 1})) AS s(i) "
        f"WHERE len(t) >= {n}), "
        "dg AS (SELECT DISTINCT doc_id, g FROM g), "
        "f AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM dg GROUP BY g) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, "
        "floor(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) * 1e6 + 0.5) / 1e6 AS novelty "
        "FROM dg JOIN f USING (g) GROUP BY doc_id"
    )


def _sql_ngram_novelty_vs_ref(n: int) -> str:
    """DuckDB twin of X239: the even/odd doc_id split, per-doc
    DISTINCT n-grams, reference membership via one distinct-gram left
    join, exact int/int 6dp snap."""
    return (
        "WITH d AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        f"g AS (SELECT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS g "
        f"FROM d, unnest(generate_series(CAST(1 AS BIGINT), CAST(len(t) AS BIGINT) - {n - 1})) AS s(i) "
        f"WHERE len(t) >= {n}), "
        "dg AS (SELECT DISTINCT doc_id, g FROM g), "
        "newg AS (SELECT * FROM dg WHERE doc_id % 2 = 1), "
        "refg AS (SELECT DISTINCT g FROM dg WHERE doc_id % 2 = 0) "
        "SELECT newg.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN refg.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new, "
        "floor(CAST(sum(CASE WHEN refg.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) * 1e6 + 0.5) / 1e6 AS novelty_vs_ref "
        "FROM newg LEFT JOIN refg ON newg.g = refg.g GROUP BY newg.doc_id"
    )


def _sql_pq_parts(
    n_sub: int = 8, k: int = 8, iterations: int = 2, dim: int = 64
) -> list:
    """Shared unrolled-CTE chains replaying similarity.pq_fit exactly:
    per subspace s, the sliced data d{s}, the md5-seeded init s{s}c0,
    ``iterations`` rounds of rounded-argmin assignment -> 9dp DECIMAL
    centroid means, and the final assignment s{s}af(id, v, cid). The
    seeds are slices of the SAME md5-ordered rows on both engines, so
    every subspace trajectory replays bit-for-bit (the
    _sql_kmeans_parts discipline, prefixed per subspace)."""
    sub = dim // n_sub
    dist = "round(-2 * list_dot_product(d.v, c.c) + list_dot_product(c.c, c.c), 6)"
    parts = [
        "data AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v "
        "FROM embeddings WHERE embedding IS NOT NULL)"
    ]
    for s in range(n_sub):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(f"d{s} AS (SELECT id, v[{lo}:{hi}] AS v FROM data)")
        parts.append(
            f"s{s}c0 AS (SELECT CAST(row_number() OVER "
            "(ORDER BY md5(CAST(id AS VARCHAR))) - 1 AS INTEGER) AS cid, v AS c "
            f"FROM d{s} ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {k})"
        )
        assign = (
            "(SELECT id, v, cid FROM (SELECT d.id, d.v, c.cid, "
            f"row_number() OVER (PARTITION BY d.id ORDER BY {dist}, c.cid) AS rn "
            f"FROM d{s} d CROSS JOIN {{prev}} c) WHERE rn = 1)"
        )
        for t in range(1, iterations + 1):
            parts.append(f"s{s}a{t} AS " + assign.format(prev=f"s{s}c{t - 1}"))
            parts.append(
                f"s{s}u{t} AS (SELECT cid, g.p - 1 AS dim, "
                "round(CAST(sum(CAST(round(t.v[g.p], 9) AS DECIMAL(38,9))) AS DOUBLE) "
                "/ count(*), 9) AS m "
                f"FROM s{s}a{t} t CROSS JOIN unnest(generate_series(1, len(t.v))) AS g(p) "
                "GROUP BY cid, g.p)"
            )
            parts.append(
                f"s{s}n{t} AS (SELECT cid, list(m ORDER BY dim) AS c "
                f"FROM s{s}u{t} GROUP BY cid)"
            )
            parts.append(
                f"s{s}c{t} AS (SELECT p.cid, coalesce(nc.c, p.c) AS c "
                f"FROM s{s}c{t - 1} p LEFT JOIN s{s}n{t} nc USING (cid))"
            )
        parts.append(f"s{s}af AS " + assign.format(prev=f"s{s}c{iterations}"))
    codes = (
        "codes AS (SELECT s0af.id"
        + "".join(f", s{s}af.cid AS code_{s}" for s in range(n_sub))
        + " FROM s0af"
        + "".join(f" JOIN s{s}af ON s0af.id = s{s}af.id" for s in range(1, n_sub))
        + ")"
    )
    parts.append(codes)
    return parts


def _sql_pq_codes(n_sub: int = 8, k: int = 8, iterations: int = 2) -> str:
    parts = _sql_pq_parts(n_sub, k, iterations)
    cols = ", ".join(f"CAST(code_{s} AS INTEGER) AS code_{s}" for s in range(n_sub))
    return "WITH " + ", ".join(parts) + f" SELECT id AS vec_id, {cols} FROM codes"


def _sql_pq_reconstruction_error(
    n_sub: int = 8, k: int = 8, iterations: int = 2
) -> str:
    """DuckDB twin of the PQ reconstruction error: per-subspace
    rounded residuals off the final assignments, left-associated sum,
    DECIMAL(38,6) corpus mean with the 6dp half-up snap."""
    parts = _sql_pq_parts(n_sub, k, iterations)
    joins = "FROM s0af" + "".join(
        f" JOIN s{s}af ON s0af.id = s{s}af.id" for s in range(1, n_sub)
    )
    joins += "".join(
        f" JOIN s{s}c{iterations} cc{s} ON s{s}af.cid = cc{s}.cid"
        for s in range(n_sub)
    )
    terms = " + ".join(
        f"round(list_dot_product(s{s}af.v, s{s}af.v) "
        f"- 2 * list_dot_product(s{s}af.v, cc{s}.c) "
        f"+ list_dot_product(cc{s}.c, cc{s}.c), 6)"
        for s in range(n_sub)
    )
    parts.append(f"r AS (SELECT CAST(({terms}) AS DECIMAL(38,6)) AS e {joins})")
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT CAST(count(*) AS BIGINT) AS n_vecs, "
        "floor(CAST(sum(e) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 "
        "AS mean_sq_err FROM r"
    )


def _sql_ann_topk_pq_adc(
    topk: int = 5, n_sub: int = 8, k: int = 8, iterations: int = 2, dim: int = 64
) -> str:
    """DuckDB twin of the PQ-ADC top-k: full-precision query slices
    against the coded corpus' centroid lookups, the same rounded
    -2(q·c)+|c|² kernel per subspace, left-associated ADC sum,
    (adc ASC, id ASC) rank."""
    parts = _sql_pq_parts(n_sub, k, iterations, dim)
    sub = dim // n_sub
    parts.append(
        "q AS (SELECT id AS query_id, v AS qv FROM data WHERE id < 10)"
    )
    cjoins = "FROM codes" + "".join(
        f" JOIN s{s}c{iterations} cc{s} ON codes.code_{s} = cc{s}.cid"
        for s in range(n_sub)
    )
    parts.append(
        f"cw AS (SELECT codes.id{''.join(f', cc{s}.c AS c{s}' for s in range(n_sub))} {cjoins})"
    )
    pair_terms = " + ".join(
        f"round(-2 * list_dot_product(q.qv[{s * sub + 1}:{(s + 1) * sub}], cw.c{s}) "
        f"+ list_dot_product(cw.c{s}, cw.c{s}), 6)"
        for s in range(n_sub)
    )
    parts.append(
        f"p AS (SELECT q.query_id, cw.id, ({pair_terms}) AS adc "
        "FROM cw CROSS JOIN q WHERE cw.id <> q.query_id)"
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT query_id, CAST(rn AS BIGINT) AS rank, id AS neighbor_id, "
        "adc AS adc_dist FROM (SELECT *, row_number() OVER "
        "(PARTITION BY query_id ORDER BY adc ASC, id ASC) AS rn FROM p) "
        f"WHERE rn <= {topk}"
    )


def _sql_ann_topk_ivf_pq(
    topk: int = 5,
    num_cells: int = 8,
    coarse_iterations: int = 3,
    n_probe: int = 2,
    n_sub: int = 8,
    k: int = 8,
    pq_iterations: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB twin of the IVF-PQ composition: the coarse KMeans chain
    (_sql_kmeans_parts) + the per-subspace PQ chains (_sql_pq_parts,
    shared `data` CTE deduplicated) + the n_probe query expansion by
    the coarse kernel + the cell equi-join + the X256 ADC ranking."""
    parts, dist = _sql_kmeans_parts(num_cells, coarse_iterations)
    pq_parts = _sql_pq_parts(n_sub, k, pq_iterations, dim)
    parts.extend(pq_parts[1:])  # drop the duplicate `data` CTE
    parts.append(
        "qp AS (SELECT id AS query_id, v AS qv, cid AS cell FROM "
        "(SELECT d.id, d.v, c.cid, "
        f"row_number() OVER (PARTITION BY d.id ORDER BY {dist}, c.cid) AS rn "
        f"FROM data d CROSS JOIN c{coarse_iterations} c WHERE d.id < 10) "
        f"WHERE rn <= {n_probe})"
    )
    cjoins = "FROM codes JOIN af ON codes.id = af.id" + "".join(
        f" JOIN s{s}c{pq_iterations} cc{s} ON codes.code_{s} = cc{s}.cid"
        for s in range(n_sub)
    )
    parts.append(
        f"cw AS (SELECT codes.id, af.cid AS cell"
        f"{''.join(f', cc{s}.c AS c{s}' for s in range(n_sub))} {cjoins})"
    )
    sub = dim // n_sub
    pair_terms = " + ".join(
        f"round(-2 * list_dot_product(q.qv[{s * sub + 1}:{(s + 1) * sub}], cw.c{s}) "
        f"+ list_dot_product(cw.c{s}, cw.c{s}), 6)"
        for s in range(n_sub)
    )
    parts.append(
        f"p AS (SELECT q.query_id, cw.id, ({pair_terms}) AS adc "
        "FROM qp q JOIN cw ON q.cell = cw.cell AND q.query_id <> cw.id)"
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT query_id, CAST(rn AS BIGINT) AS rank, id AS neighbor_id, "
        "adc AS adc_dist FROM (SELECT *, row_number() OVER "
        "(PARTITION BY query_id ORDER BY adc ASC, id ASC) AS rn FROM p) "
        f"WHERE rn <= {topk}"
    )


def _sql_prototype_prune(
    keep_num: int = 1,
    keep_den: int = 2,
    num_cells: int = 8,
    iterations: int = 3,
) -> str:
    """DuckDB twin of X251: the shared unrolled-KMeans CTE chain
    (_sql_kmeans_parts — md5 seeds, 9dp centroid means, 6dp argmin
    kernel) + FULL squared distance to the assigned final centroid
    (|v|² − 2·v·c + |c|², same parenthesization) + the per-cell
    (dist DESC, id ASC) rank with the exact integer keep cutoff."""
    parts, _ = _sql_kmeans_parts(num_cells, iterations)
    parts.append(
        "dd AS (SELECT af.id, af.cid AS cell, "
        "round(list_dot_product(af.v, af.v) - 2 * list_dot_product(af.v, c.c) "
        "+ list_dot_product(c.c, c.c), 6) AS dist2 "
        f"FROM af JOIN c{iterations} c ON af.cid = c.cid)"
    )
    parts.append(
        "r AS (SELECT id, cell, dist2, "
        "row_number() OVER (PARTITION BY cell ORDER BY dist2 DESC, id ASC) AS rn, "
        "count(*) OVER (PARTITION BY cell) AS cn FROM dd)"
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT id AS vec_id, cell, dist2, CAST(rn AS BIGINT) AS rank_in_cell, "
        "CAST(cn AS BIGINT) AS cell_size FROM r "
        f"WHERE rn <= greatest(1, (cn * {keep_num}) // {keep_den})"
    )


def _sql_knn_label_consistency(k: int = 5, n_queries: int = 50) -> str:
    """DuckDB twin of X252: the ann_cosine_topk ranking verbatim over
    the fixed probe batch, neighbor/query label join, NULL-safe
    agreement (IS NOT DISTINCT FROM), exact int/int 6dp snap."""
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(e.v, e.v) > 0 "
        "THEN list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) "
        "ELSE NULL END"
    )
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings), "
        f"q AS (SELECT vec_id AS query_id, v AS qv, label FROM e WHERE vec_id < {n_queries}), "
        f"scored AS (SELECT q.query_id, q.label, e.vec_id AS id, e.label AS nlabel, {cos} AS cosine "
        "FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id), "
        "nn AS (SELECT * FROM (SELECT *, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, id ASC) AS rn "
        f"FROM scored WHERE cosine IS NOT NULL) WHERE rn <= {k}) "
        "SELECT query_id, label, CAST(count(*) AS BIGINT) AS k_used, "
        "CAST(sum(CASE WHEN label IS NOT DISTINCT FROM nlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_same, "
        "floor(CAST(sum(CASE WHEN label IS NOT DISTINCT FROM nlabel THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) * 1000000.0 + 0.5) / 1000000.0 AS consistency "
        "FROM nn GROUP BY query_id, label"
    )


def _sql_langid_confusion() -> str:
    """DuckDB twin of X253: the full X182 trained-langid replay
    (verbatim _sql_lang_id_trained) restricted to the held-out half,
    (truth, pred) cells + marginal shares as exact int/int snaps."""
    return (
        f"WITH t AS ({_sql_lang_id_trained()}), "
        "b AS (SELECT lang_true AS truth, lang_pred AS pred FROM t "
        "WHERE NOT is_train AND lang_true IS NOT NULL AND lang_pred IS NOT NULL), "
        "cells AS (SELECT truth, pred, count(*) AS n FROM b GROUP BY 1, 2), "
        "rt AS (SELECT truth, sum(n) AS rtot FROM cells GROUP BY 1), "
        "ct AS (SELECT pred, sum(n) AS ctot FROM cells GROUP BY 1) "
        "SELECT cells.truth, cells.pred, CAST(cells.n AS BIGINT) AS n, "
        "floor(CAST(cells.n AS DOUBLE) / rt.rtot * 1000000.0 + 0.5) / 1000000.0 AS frac_of_truth, "
        "floor(CAST(cells.n AS DOUBLE) / ct.ctot * 1000000.0 + 0.5) / 1000000.0 AS frac_of_pred "
        "FROM cells JOIN rt USING (truth) JOIN ct USING (pred)"
    )


def _sql_hard_negative_mine(skip_top: int = 2, n_neg: int = 8) -> str:
    """DuckDB twin of X248 — the ann_cosine_topk ranking verbatim
    (zero-norm NULL drop, raw-IEEE cosine order, id tiebreak), band
    filter rn in (skip, skip+n], neg_rank re-based."""
    cos = (
        "CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(e.v, e.v) > 0 "
        "THEN list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) "
        "ELSE NULL END"
    )
    return (
        f"WITH e AS ({SQL_EMB}), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10), "
        f"scored AS (SELECT q.query_id, e.vec_id AS id, {cos} AS cosine "
        "FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id), "
        "scored_nn AS (SELECT * FROM scored WHERE cosine IS NOT NULL), "
        "r AS (SELECT query_id, id, cosine, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cosine DESC, id ASC) AS rn FROM scored_nn) "
        f"SELECT query_id, CAST(rn - {skip_top} AS BIGINT) AS neg_rank, "
        "id AS negative_id, round(cosine, 6) AS cosine FROM r "
        f"WHERE rn > {skip_top} AND rn <= {skip_top + n_neg}"
    )


def _sql_matryoshka_error(
    dims: tuple[int, ...] = (8, 16, 32), query_id: int = 0, k: int = 10
) -> str:
    """DuckDB twin of X249: per-vector 6dp-snapped energy ratios
    (zero-norm excluded) DECIMAL-summed into the mean; top-k overlap
    via rank windows over the SAME guarded cosine expressions the
    engine evaluates (raw-IEEE order, id tiebreak)."""

    def pcos(p: int) -> str:
        qp, vp = f"qv[1:{p}]", f"v[1:{p}]"
        return (
            f"CASE WHEN sqrt(list_dot_product({qp}, {qp})) * "
            f"sqrt(list_dot_product({vp}, {vp})) > 0 "
            f"THEN list_dot_product({qp}, {vp}) / "
            f"(sqrt(list_dot_product({qp}, {qp})) * sqrt(list_dot_product({vp}, {vp}))) "
            "ELSE NULL END"
        )

    full = (
        "CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)) > 0 "
        "THEN list_dot_product(qv, v) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) "
        "ELSE NULL END"
    )
    ratio_cols = ", ".join(
        f"floor(list_dot_product(v[1:{p}], v[1:{p}]) / st * 1000000.0 + 0.5) "
        f"/ 1000000.0 AS r{p}"
        for p in dims
    )
    mean_cols = ", ".join(
        f"floor(CAST(sum(CAST(r{p} AS DECIMAL(38,6))) AS DOUBLE) / count(*) "
        f"* 1000000.0 + 0.5) / 1000000.0 AS e{p}"
        for p in dims
    )
    tops = ", ".join(
        f"t{p} AS (SELECT id FROM sc WHERE c{p} IS NOT NULL "
        f"ORDER BY c{p} DESC, id ASC LIMIT {k})"
        for p in dims
    )
    unions = " UNION ALL ".join(
        f"SELECT CAST({p} AS INTEGER) AS prefix_dim, en.n_vecs, en.e{p} AS energy_mean, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM t{p} JOIN tf USING (id)) AS overlap_at_k "
        "FROM en"
        for p in dims
    )
    return (
        f"WITH e AS ({SQL_EMB}), "
        "nz AS (SELECT vec_id, v, list_dot_product(v, v) AS st FROM e), "
        f"rt AS (SELECT {ratio_cols} FROM nz WHERE st > 0), "
        f"en AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs, {mean_cols} FROM rt), "
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id}), "
        f"c AS (SELECT e.vec_id AS id, e.v, q.qv FROM e CROSS JOIN q "
        f"WHERE e.vec_id <> {query_id}), "
        f"sc AS (SELECT id, {full} AS cfull, "
        + ", ".join(f"{pcos(p)} AS c{p}" for p in dims)
        + " FROM c), "
        f"tf AS (SELECT id FROM sc WHERE cfull IS NOT NULL "
        f"ORDER BY cfull DESC, id ASC LIMIT {k}), "
        f"{tops} {unions}"
    )


def _sql_token_budget_select(budget_num: int = 1, budget_den: int = 4) -> str:
    """DuckDB twin of X250: the X52 unigram-LM replay, the integer
    budget fraction over scored docs, one inclusive running-sum window
    on the (score, doc_id) total order, prefix filter."""
    return (
        f"WITH u AS ({_sql_unigram_logprob()}), "
        "h AS (SELECT * FROM u WHERE avg_neg_logprob IS NOT NULL), "
        f"b AS (SELECT (sum(n_tokens) * {budget_num}) // {budget_den} AS B FROM h), "
        "c AS (SELECT doc_id, n_tokens, avg_neg_logprob, "
        "sum(n_tokens) OVER (ORDER BY avg_neg_logprob ASC, doc_id ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, avg_neg_logprob, "
        "CAST(cum AS BIGINT) AS cum_tokens FROM c CROSS JOIN b WHERE cum <= B"
    )


def _sql_min_k_prob(k_pct: int = 20, d: float = 0.75) -> str:
    """DuckDB twin of X245: the X222 Kneser-Ney replay with a position
    column (t[i]/t[i+1] over a generate_series index — bit-identical
    values), a doc-partitioned rank on (nlp DESC, pos ASC), the exact
    integer (m·k)÷100 cutoff, and the standard 6dp mean snap."""
    p = (
        f"(ty.cbg - {d}) / fwd.cw1 + "
        f"({d} * fwd.n1fwd / fwd.cw1) * (bwd.n1bwd / nt.ntypes)"
    )
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "ex AS (SELECT doc_id, i AS pos, t[i] AS w1, t[i + 1] AS w2 FROM toks, "
        "unnest(generate_series(CAST(1 AS BIGINT), CAST(len(t) AS BIGINT) - 1)) AS s(i) "
        "WHERE len(t) >= 2), "
        "ty AS (SELECT w1, w2, count(*) AS cbg FROM ex GROUP BY 1, 2), "
        "fwd AS (SELECT w1, sum(cbg) AS cw1, count(*) AS n1fwd FROM ty GROUP BY 1), "
        "bwd AS (SELECT w2, count(*) AS n1bwd FROM ty GROUP BY 1), "
        "nt AS (SELECT count(*) AS ntypes FROM ty), "
        f"scored AS (SELECT ex.doc_id, ex.pos, CAST(round(-ln({p}), 6) AS DECIMAL(38,6)) AS nlp "
        "FROM ex JOIN ty USING (w1, w2) JOIN fwd USING (w1) JOIN bwd USING (w2) CROSS JOIN nt), "
        "r AS (SELECT doc_id, pos, nlp, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY nlp DESC, pos ASC) AS rn, "
        "count(*) OVER (PARTITION BY doc_id) AS m FROM scored), "
        f"sel AS (SELECT doc_id, max(m) AS m, CAST(count(*) AS BIGINT) AS k_used, "
        "floor(CAST(sum(nlp) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS min_k_score "
        f"FROM r WHERE rn <= greatest(1, (m * {k_pct}) // 100) GROUP BY doc_id) "
        "SELECT toks.doc_id, CAST(coalesce(sel.m, 0) AS BIGINT) AS n_bigrams, "
        "CAST(coalesce(sel.k_used, 0) AS BIGINT) AS k_used, sel.min_k_score "
        "FROM toks LEFT JOIN sel USING (doc_id)"
    )


def _sql_unimax_mixture(
    budget_num: int = 19, budget_den: int = 20, epoch_cap: int = 1
) -> str:
    """DuckDB twin of X246: per-source token sums, the integer budget
    fraction, the monotone cap predicate over the (cap, source)-ordered
    O(sources) frame, and the div/mod remainder top-up — BIGINT
    arithmetic end to end, mirrored term-for-term."""
    return (
        "WITH s AS (SELECT source, CAST(sum(len(CASE WHEN trim(coalesce(text, '')) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(coalesce(text, '')), '\\s+') END)) AS BIGINT) AS n_tokens "
        "FROM documents WHERE source IS NOT NULL GROUP BY source), "
        "g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS T, CAST(count(*) AS BIGINT) AS L FROM s), "
        f"b AS (SELECT s.source, s.n_tokens, CAST(s.n_tokens * {epoch_cap} AS BIGINT) AS cap, "
        f"CAST((g.T * {budget_num}) // {budget_den} AS BIGINT) AS B, g.L FROM s CROSS JOIN g), "
        "w AS (SELECT *, row_number() OVER (ORDER BY cap ASC, source ASC) AS rn, "
        "CAST(coalesce(sum(cap) OVER (ORDER BY cap ASC, source ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pfx FROM b), "
        "f AS (SELECT *, cap * (L - rn + 1) <= B - pfx AS capped FROM w), "
        "a AS (SELECT CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS K, "
        "CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0) AS BIGINT) AS capsum FROM f) "
        "SELECT f.source, f.n_tokens, f.cap, f.capped, "
        "CAST(CASE WHEN f.capped THEN f.cap "
        "WHEN f.rn - a.K <= (f.B - a.capsum) % greatest(f.L - a.K, 1) "
        "THEN (f.B - a.capsum) // greatest(f.L - a.K, 1) + 1 "
        "ELSE (f.B - a.capsum) // greatest(f.L - a.K, 1) END AS BIGINT) AS alloc "
        "FROM f CROSS JOIN a"
    )


def _sql_filter_funnel(min_words: int = 20) -> str:
    """DuckDB twin of X247: the three modulo plants, the four
    exact-integer rule predicates (cross-multiplied bands, 'g'-flagged
    regexp_replace for digit counting), CASE first-fail attribution,
    one aggregate row, four UNION ALL output rows."""
    flags = (
        f"len(t) < {min_words} AS f1, "
        "NOT (3 * len(t) <= chars AND chars <= 10 * len(t)) AS f2, "
        "5 * len(list_filter(t, w -> regexp_matches(w, '^[a-z]+$'))) < 4 * len(t) AS f3, "
        "5 * digits > chars AS f4"
    )
    row = (
        "SELECT CAST({i} AS INTEGER) AS rule_idx, '{name}' AS rule, "
        "CAST(nf{i} AS BIGINT) AS n_fail, CAST(ffa{i} AS BIGINT) AS n_first_fail, "
        "CAST(N - ({cum}) AS BIGINT) AS survivors_after FROM a"
    )
    rows = " UNION ALL ".join(
        row.format(
            i=i,
            name=name,
            cum=" + ".join(f"ffa{j}" for j in range(1, i + 1)),
        )
        for i, name in enumerate(
            ["too_short", "word_length", "low_alpha", "digit_heavy"], start=1
        )
    )
    return (
        "WITH fx AS (SELECT doc_id, text "
        f"|| CASE WHEN doc_id % {FF_LONGWORD_MOD} = {FF_LONGWORD_REM} "
        "THEN ' ' || repeat('a', 600) ELSE '' END "
        f"|| CASE WHEN doc_id % {FF_NUMWORDS_MOD} = {FF_NUMWORDS_REM} "
        f"THEN '{FF_NUMWORDS_PLANT}' ELSE '' END "
        f"|| CASE WHEN doc_id % {FF_DIGITS_MOD} = {FF_DIGITS_REM} "
        "THEN ' ' || repeat('1234567890', 20) ELSE '' END AS text FROM documents), "
        "tk AS (SELECT CASE WHEN trim(lower(coalesce(text, ''))) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+') END AS t FROM fx), "
        "m AS (SELECT t, coalesce(list_sum(list_transform(t, w -> length(w))), 0) AS chars, "
        "coalesce(list_sum(list_transform(t, "
        "w -> length(w) - length(regexp_replace(w, '[0-9]', '', 'g')))), 0) AS digits FROM tk), "
        f"fl AS (SELECT {flags} FROM m), "
        "ff AS (SELECT *, CASE WHEN f1 THEN 1 WHEN f2 THEN 2 WHEN f3 THEN 3 "
        "WHEN f4 THEN 4 ELSE 0 END AS ffi FROM fl), "
        "a AS (SELECT count(*) AS N, "
        + ", ".join(
            f"sum(CASE WHEN f{i} THEN 1 ELSE 0 END) AS nf{i}, "
            f"sum(CASE WHEN ffi = {i} THEN 1 ELSE 0 END) AS ffa{i}"
            for i in (1, 2, 3, 4)
        )
        + " FROM ff) "
        + rows
    )


def _sql_mmr_rerank(k: int, lam: float) -> str:
    """DuckDB twin of X238 — the greedy MMR selection UNROLLED to k
    steps (the KMeans/IVF/PageRank oracle discipline): each step
    re-scores the remaining candidates against the selected set
    (9dp-snapped cosines, 9dp-snapped combined score, id tiebreak) and
    takes LIMIT 1. The combined score is EXACT DECIMAL arithmetic
    (λ at DECIMAL(10,9), rel/pen recovered exactly from their snapped
    doubles, HALF_UP final round — away-from-zero on both engines),
    because a double-arithmetic score sits exactly on the .5e-9
    boundary for ~1 in 10 candidates."""
    assert k == 3, "oracle is unrolled for k=3"

    def cos(a, b):
        return (
            f"round(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 9)"
        )

    lam_d = f"CAST({lam:.9f} AS DECIMAL(10,9))"
    om_d = f"(CAST(1 AS DECIMAL(10,9)) - {lam_d})"
    score = (
        f"CAST(round({lam_d} * CAST(rel AS DECIMAL(12,9)) "
        f"- {om_d} * CAST(pen AS DECIMAL(12,9)), 9) AS DOUBLE)"
    )
    return (
        f"WITH e AS ({SQL_EMB}), "
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0), "
        "cand AS (SELECT e.vec_id AS id, e.v, "
        "round(CASE WHEN list_dot_product(q.qv, q.qv) > 0 AND list_dot_product(e.v, e.v) > 0 "
        "THEN list_dot_product(q.qv, e.v) / "
        "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) "
        "ELSE NULL END, 9) AS rel FROM e, q WHERE e.vec_id <> 0), "
        "c AS (SELECT * FROM cand WHERE rel IS NOT NULL), "
        f"s1 AS (SELECT id, v, rel, CAST(round({lam_d} * CAST(rel AS DECIMAL(12,9)) "
        f"- {om_d} * CAST(0.0 AS DECIMAL(12,9)), 9) AS DOUBLE) AS score "
        "FROM c ORDER BY score DESC, id ASC LIMIT 1), "
        f"p2 AS (SELECT c.id, c.v, c.rel, {cos('c.v', 's1.v')} AS pen "
        "FROM c, s1 WHERE c.id <> s1.id), "
        f"s2 AS (SELECT id, v, rel, {score} AS score FROM p2 "
        "ORDER BY score DESC, id ASC LIMIT 1), "
        f"p3 AS (SELECT c.id, c.v, c.rel, greatest({cos('c.v', 's1.v')}, {cos('c.v', 's2.v')}) AS pen "
        "FROM c, s1, s2 WHERE c.id <> s1.id AND c.id <> s2.id), "
        f"s3 AS (SELECT id, v, rel, {score} AS score FROM p3 "
        "ORDER BY score DESC, id ASC LIMIT 1) "
        "SELECT CAST(1 AS INT) AS rank, id AS vec_id, rel AS relevance, score AS mmr_score FROM s1 "
        "UNION ALL SELECT CAST(2 AS INT), id, rel, score FROM s2 "
        "UNION ALL SELECT CAST(3 AS INT), id, rel, score FROM s3"
    )


def _sql_doremi_weights(lr: float = 0.5) -> str:
    """DuckDB twin of X243: the replicated source-marker fixture, one
    (source, token) count frame feeding both LMs, 6dp-ln DECIMAL term
    sums (c kept decimal(12,0) — the DSIR multiply discipline), half-up
    6dp loss snaps, excess clamp, exp quantized to INTEGER 1e-9 units,
    weight = exact integer ratio snapped at 9dp."""
    return (
        "WITH fx AS (SELECT doc_id, source, text || "
        "repeat(' zsrc_' || source, CAST(1 + doc_id % 3 AS INT)) AS text "
        "FROM documents), "
        "tk AS (SELECT source, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM fx), "
        "ex AS (SELECT source, unnest(t) AS tok FROM tk), "
        "cs AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_s "
        "FROM ex GROUP BY 1, 2), "
        "cc AS (SELECT tok, CAST(sum(c_s) AS BIGINT) AS c FROM cs GROUP BY 1), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, "
        "CAST(count(*) AS BIGINT) AS vocab FROM cc), "
        "ts AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS total_s, "
        "CAST(count(*) AS BIGINT) AS vocab_s FROM cs GROUP BY 1), "
        "terms AS (SELECT cs.source, "
        "CAST(CAST(cs.c_s AS DECIMAL(12,0)) * CAST(round(-ln((cc.c + 1.0) "
        "/ (tot.total + tot.vocab)), 6) AS DECIMAL(20,6)) AS DECIMAL(38,6)) AS tc, "
        "CAST(CAST(cs.c_s AS DECIMAL(12,0)) * CAST(round(-ln((cs.c_s + 1.0) "
        "/ (ts.total_s + ts.vocab_s)), 6) AS DECIMAL(20,6)) AS DECIMAL(38,6)) AS tow "
        "FROM cs JOIN cc USING (tok) CROSS JOIN tot JOIN ts USING (source)), "
        "ps AS (SELECT source, CAST(sum(tc) AS DECIMAL(38,6)) AS sc, "
        "CAST(sum(tow) AS DECIMAL(38,6)) AS so FROM terms GROUP BY 1), "
        "nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM fx GROUP BY 1), "
        "lo AS (SELECT ps.source, nd.n_docs, ts.total_s AS n_tokens, "
        "floor(CAST(ps.sc AS DOUBLE) / ts.total_s * 1e6 + 0.5) / 1e6 AS corpus_loss, "
        "floor(CAST(ps.so AS DOUBLE) / ts.total_s * 1e6 + 0.5) / 1e6 AS own_loss "
        "FROM ps JOIN ts USING (source) JOIN nd USING (source)), "
        "exc AS (SELECT *, greatest(corpus_loss - own_loss, 0.0) AS excess FROM lo), "
        f"wu AS (SELECT *, CAST(floor(exp({lr} * excess) * 1e9 + 0.5) AS BIGINT) "
        "AS w_units FROM exc), "
        "tw AS (SELECT CAST(sum(w_units) AS BIGINT) AS tot_w FROM wu) "
        "SELECT source, n_docs, n_tokens, corpus_loss, own_loss, excess, "
        "floor(CAST(w_units AS DOUBLE) / tot_w * 1e9 + 0.5) / 1e9 AS weight "
        "FROM wu CROSS JOIN tw"
    )


def _sql_margin_bitext_mine(k: int = 4, threshold: float = 1.0) -> str:
    """DuckDB twin of X244: the even/odd embedding split, 9dp-DECIMAL
    cosine snap, exact DECIMAL neighborhood sums divided by the actual
    neighbor count, the 9dp margin floor-snap with the positive
    non-vanishing (> 1e-6) denominator guard, and the (margin DESC,
    tgt_id ASC) argmax."""
    cos = (
        "CASE WHEN list_dot_product(a.v, a.v) > 0 AND list_dot_product(b.v, b.v) > 0 "
        "THEN list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) "
        "ELSE NULL END"
    )
    return (
        f"WITH e AS ({SQL_EMB}), "
        "a AS (SELECT vec_id AS src_id, v FROM e WHERE vec_id % 2 = 0 AND vec_id < 200), "
        "b AS (SELECT vec_id AS tgt_id, v FROM e WHERE vec_id % 2 = 1), "
        f"p0 AS (SELECT a.src_id, b.tgt_id, {cos} AS c FROM a CROSS JOIN b), "
        "p AS (SELECT src_id, tgt_id, CAST(round(c, 9) AS DECIMAL(12,9)) AS c9 "
        "FROM p0 WHERE c IS NOT NULL), "
        "ra AS (SELECT src_id, c9, row_number() OVER (PARTITION BY src_id "
        "ORDER BY c9 DESC, tgt_id ASC) AS rn FROM p), "
        f"aa AS (SELECT src_id, CAST(sum(c9) AS DOUBLE) / count(*) AS avg_a "
        f"FROM ra WHERE rn <= {k} GROUP BY 1), "
        "rb AS (SELECT tgt_id, c9, row_number() OVER (PARTITION BY tgt_id "
        "ORDER BY c9 DESC, src_id ASC) AS rn FROM p), "
        f"bb AS (SELECT tgt_id, CAST(sum(c9) AS DOUBLE) / count(*) AS avg_b "
        f"FROM rb WHERE rn <= {k} GROUP BY 1), "
        "sc AS (SELECT p.src_id, p.tgt_id, p.c9, "
        "CASE WHEN (aa.avg_a + bb.avg_b) / 2 > 1e-6 THEN "
        "floor(CAST(p.c9 AS DOUBLE) / ((aa.avg_a + bb.avg_b) / 2) * 1e9 + 0.5) / 1e9 "
        "END AS margin "
        "FROM p JOIN aa USING (src_id) JOIN bb USING (tgt_id) "
        "WHERE margin IS NOT NULL), "
        "win AS (SELECT src_id, tgt_id, CAST(c9 AS DOUBLE) AS cosine, margin, "
        "row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS rn "
        "FROM sc) "
        "SELECT src_id, tgt_id, cosine, margin FROM win "
        f"WHERE rn = 1 AND margin >= {threshold}"
    )


def _sql_dsir_logweights(buckets: int) -> str:
    """DuckDB twin of X235: md5 slot hash (the documented
    md5_slot32 equivalent), add-one multinomial log-ratio per slot
    snapped at 9dp, integer × DECIMAL per-doc sum, 6dp final snap."""
    slot = (
        "CAST(CAST(('0x' || substr(md5('0:' || f), 1, 8)) AS UBIGINT) "
        f"% {buckets} AS BIGINT)"
    )
    return (
        "WITH d AS (SELECT doc_id, source = 'src0' AS is_target, "
        "CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t FROM documents), "
        "u AS (SELECT doc_id, is_target, unnest(t) AS f FROM d), "
        "b AS (SELECT doc_id, is_target, array_to_string(t[i:i+1], ' ') AS f "
        "FROM d, unnest(generate_series(CAST(1 AS BIGINT), CAST(len(t) AS BIGINT) - 1)) AS s(i) "
        "WHERE len(t) >= 2), "
        "feats AS (SELECT * FROM u UNION ALL SELECT * FROM b), "
        f"fb AS (SELECT doc_id, is_target, {slot} AS slot FROM feats), "
        "m AS (SELECT slot, CAST(count(*) AS BIGINT) AS cr, "
        "CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct "
        "FROM fb GROUP BY slot), "
        "tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM m), "
        f"lr AS (SELECT slot, CAST(round(ln(CAST(ct + 1 AS DOUBLE) / (nt + {buckets})) "
        f"- ln(CAST(cr + 1 AS DOUBLE) / (nr + {buckets})), 9) AS DECIMAL(20,9)) AS lr "
        "FROM m, tot), "
        "pd AS (SELECT doc_id, is_target, slot, CAST(count(*) AS BIGINT) AS c "
        "FROM fb GROUP BY doc_id, is_target, slot) "
        "SELECT pd.doc_id, pd.is_target, CAST(sum(pd.c) AS BIGINT) AS n_feats, "
        "floor(CAST(sum(CAST(pd.c AS DECIMAL(9,0)) * lr.lr) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS logweight "
        "FROM pd JOIN lr USING (slot) GROUP BY pd.doc_id, pd.is_target"
    )


def _sql_temperature_mix(budget: int, tau: float) -> str:
    """DuckDB twin of the quota-form temperature mix: the same Zipf
    source plant, ONE float snap (floor(pow·1e9 + 0.5) — pow's 1-ulp
    latitude only matters exactly on the half boundary), then pure
    integer arithmetic: // and % for floor-quota/remainder
    apportionment, row_number top-ups (rem DESC, source ASC), and the
    md5-unit per-source ranking coin."""
    md5u = (
        "(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
        "AS DOUBLE) + 1.0) / 4294967296.0"
    )
    return (
        "WITH src AS (SELECT doc_id, CASE WHEN doc_id % 16 < 8 THEN 'g0' "
        "WHEN doc_id % 16 < 12 THEN 'g1' WHEN doc_id % 16 < 14 THEN 'g2' "
        "WHEN doc_id % 16 < 15 THEN 'g3' ELSE 'g4' END AS source FROM documents), "
        "c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM src GROUP BY source), "
        "t AS (SELECT CAST(sum(n_s) AS BIGINT) AS N FROM c), "
        f"r AS (SELECT source, CAST(floor(pow(CAST(n_s AS DOUBLE) / N, {tau}) * 1e9 + 0.5) "
        "AS BIGINT) AS raw FROM c, t), "
        "dn AS (SELECT CAST(sum(raw) AS BIGINT) AS denom FROM r), "
        f"q0 AS (SELECT source, (CAST({budget} AS BIGINT) * raw) // denom AS fq, "
        f"(CAST({budget} AS BIGINT) * raw) % denom AS rem FROM r, dn), "
        "sp AS (SELECT CAST(sum(fq) AS BIGINT) AS spent FROM q0), "
        "qt AS (SELECT source, fq + CASE WHEN "
        "row_number() OVER (ORDER BY rem DESC, source ASC) "
        f"<= {budget} - spent THEN 1 ELSE 0 END AS quota FROM q0, sp), "
        "rk AS (SELECT source, doc_id, "
        f"row_number() OVER (PARTITION BY source ORDER BY {md5u} ASC, doc_id ASC) AS rn "
        "FROM src) "
        "SELECT rk.source, rk.doc_id, CAST(rn AS INT) AS smp_rank, "
        "CAST(quota AS BIGINT) AS quota "
        "FROM rk JOIN qt USING (source) WHERE rn <= quota"
    )


def _sql_ccnet_perplexity_buckets(d: float = 0.75) -> str:
    """DuckDB twin of the CCNet bucketing: the full Kneser-Ney replay
    (verbatim the X222 oracle) wrapped in a rank window — integer
    thresholds on a deterministic total order, no percentile
    interpolation anywhere."""
    kn = _sql_kn_logprob(d)
    return (
        f"WITH kn AS ({kn}), "
        "r AS (SELECT doc_id, n_bigrams, avg_neg_logprob, "
        "row_number() OVER (ORDER BY avg_neg_logprob ASC, doc_id ASC) AS rn, "
        "count(*) OVER () AS n FROM kn WHERE avg_neg_logprob IS NOT NULL) "
        "SELECT doc_id, n_bigrams, avg_neg_logprob, "
        "CASE WHEN rn <= n // 3 THEN 'head' WHEN rn <= (2 * n) // 3 THEN 'middle' "
        "ELSE 'tail' END AS bucket FROM r "
        "UNION ALL SELECT doc_id, n_bigrams, avg_neg_logprob, 'unscored' AS bucket "
        "FROM kn WHERE avg_neg_logprob IS NULL"
    )


def _sql_ngram_diversity() -> str:
    return (
        "WITH w AS (SELECT source, CASE WHEN trim(lower(text)) = '' THEN [] "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w FROM documents), "
        "g AS ("
        "SELECT source, 1 AS n, unnest(w) AS g FROM w "
        "UNION ALL SELECT source, 2 AS n, "
        "unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS g "
        "FROM w WHERE len(w) >= 2 "
        "UNION ALL SELECT source, 3 AS n, "
        "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g "
        "FROM w WHERE len(w) >= 3) "
        "SELECT source, CAST(n AS INT) AS n, CAST(count(*) AS BIGINT) AS total_ngrams, "
        "CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams, "
        "round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS distinct_ratio "
        "FROM g GROUP BY 1, 2"
    )


def _sql_min_cost_supplier() -> str:
    return (
        "WITH sup AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey = 1), "
        "pt AS (SELECT p_partkey, p_name FROM part WHERE p_size <= 5), "
        "cost AS (SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, "
        "min(l_extendedprice) AS c FROM lineitem "
        "JOIN pt ON l_partkey = p_partkey JOIN sup ON l_suppkey = s_suppkey "
        "GROUP BY 1, 2, 3, 4, 5, 6) "
        "SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name, "
        "round(c, 2) AS min_cost FROM cost "
        "WHERE c = (SELECT min(c) FROM cost c2 WHERE c2.p_partkey = cost.p_partkey)"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "limit_preview": (
            "SELECT * FROM lineitem ORDER BY "
            + ", ".join(c for c, _ in LINEITEM_SCHEMA)
            + " LIMIT 5"
        ),
        "project_quasi_ids": "SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal FROM customer",
        "row_count": "SELECT count(*) AS n_rows FROM lineitem",
        "value_counts": (
            "SELECT o_orderpriority, cnt, round(cnt / sum(cnt) OVER (), 6) AS freq "
            "FROM (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY o_orderpriority)"
        ),
        "null_profile": _sql_null_profile("customer", CUSTOMER_COLS),
        "distinct_count": _sql_distinct_count("customer", ["c_mktsegment", "c_nationkey"]),
        "numeric_profile": _sql_numeric_profile("lineitem", ["l_extendedprice", "l_discount", "l_quantity"]),
        "top_freq": _sql_top_freq("orders", ["o_orderpriority", "o_orderstatus"]),
        "basic_stats": _sql_basic_stats("lineitem", LINEITEM_SCHEMA),
        "checklist_score": _sql_checklist_score(),
        "sdc_suppress": _sql_sdc_suppress(),
        "generalize_numeric": _sql_generalize_numeric(
            "customer", "c_custkey", "c_acctbal", "acctbal_bin", 10
        ),
        "smart_suggest": _sql_smart_suggest(
            "customer",
            [
                ("c_custkey", "bigint"),
                ("c_name", "string"),
                ("c_nationkey", "int"),
                ("c_acctbal", "double"),
                ("c_mktsegment", "string"),
            ],
        ),
        # dp_noise / synthetic_sample are randomized → rows-only checks
        "ks_drift": _sql_ks(_SQL_DRIFT_BEFORE_PRICE, _SQL_DRIFT_AFTER_PRICE),
        "ks_drift_binned": _sql_ks_binned(_SQL_DRIFT_BEFORE_PRICE, _SQL_DRIFT_AFTER_PRICE),
        "chi2_drift": _sql_chi2(
            "SELECT o_orderpriority AS cat FROM orders WHERE o_orderkey % 2 = 0",
            "SELECT o_orderpriority AS cat FROM orders WHERE o_orderkey % 2 = 1",
        ),
        "distribution_drift": _sql_distribution_drift(),
        "standard_scale": _sql_standard_scale(),
        "one_hot": _sql_one_hot(),
        "knn_linkage_join": _sql_knn_linkage_join(),
        "linkage_risk_score": _sql_linkage_risk_score(),
        # model_utility is randomized (split + noise) → rows-only check
        "text_profile": _sql_text_profile(),
        "quality_score": _sql_quality_score(),
        "repetition_stats": _sql_repetition_stats(),
        "corpus_stats": _sql_corpus_stats(),
        "paragraph_dedup": _sql_paragraph_dedup(" "),
        "pack_sequences": _sql_pack_sequences(256, 8),
        "tfidf_top_terms": _sql_tfidf_top_terms(5),
        "quality_filter": _sql_quality_filter(0.5),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_qty, "
            "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_base_price, "
            "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_disc_price, "
            "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_charge, "
            "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS avg_qty, "
            "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS avg_price, "
            "round(CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS avg_disc, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "contamination_scan": _sql_contamination_scan(),
        # the Aho–Corasick path computes the identical result; same oracle
        "contamination_scan_many": _sql_contamination_scan(),
        "pii_scan": _sql_pii_scan(),
        "card_luhn_scan": _sql_card_luhn_scan(),
        "pii_redact": _sql_pii_redact(),
        "dedup_exact": _sql_dedup_exact(),
        "ngram_jaccard": _sql_ngram_jaccard(),
        "dedup_components": _sql_dedup_components(),
        "dedup_components_star": _sql_dedup_components(),
        "minhash_signatures": _sql_minhash_signatures(16),
        # banded LSH is md5-deterministic end to end — oracle-checked
        # even though it's the "approximate" path
        "minhash_lsh": _sql_minhash_lsh(16, 4, 0.5),
        # ann_cosine_topk_lsh/_ivf stay rows-only: float GEMM sign/argmin
        # ordering is not reproducible across engines — their
        # hash-checked siblings are the *_exactcells/*_exactbuckets
        # forms below (rounded pure-expression kernels)
        "simhash": _sql_simhash(32),
        "simhash_pairs": _sql_simhash_pairs(32, 4, 3),
        "embedding_centroids": _sql_embedding_centroids(),
        "contamination_ngram": _sql_contamination_ngram(CONTAMINATION_PROBES),
        "embedding_cosine_dedup": _sql_embedding_cosine_dedup(0.4),
        "ann_cosine_topk": _sql_ann_cosine_topk(5),
        "ann_cosine_topk_ivf_exactcells": _sql_ann_ivf_exactcells(),
        "ann_cosine_topk_lsh_exactbuckets": _sql_ann_lsh_exactbuckets(),
        "asof_last_click": _sql_asof_last_click(),
        "range_join_tiers": _sql_range_join_tiers(),
        "hypertable_rollup": _sql_hypertable_rollup(),
        "kmv_distinct": _sql_kmv_distinct(64),
        "kmv_distinct_prefilter": _sql_kmv_distinct_prefilter(64, 0.25),
        "length_histogram": _sql_length_histogram(),
        "unigram_logprob": _sql_unigram_logprob(),
        "source_mixture_sample": _sql_source_mixture_sample(MIXTURE_SHARES),
        "quality_deciles": _sql_quality_deciles(),
        "bm25_search": _sql_bm25_search(),
        "image_dhash_pairs": _sql_image_dhash_pairs(),
        "audio_fingerprint_pairs": _sql_audio_fingerprint_pairs(),
        "audio_fingerprint64": _sql_audio_fingerprint64(),
        "audio_fingerprint_pairs64": _sql_audio_fingerprint_pairs64(),
        "bm25_rerank_cosine": _sql_bm25_rerank_cosine(),
        "nation_profit": _sql_nation_profit(),
        "important_parts": _sql_important_parts(),
        "min_cost_supplier": _sql_min_cost_supplier(),
        "ngram_diversity": _sql_ngram_diversity(),
        "kn_logprob": _sql_kn_logprob(),
        "embedding_gram": _sql_embedding_gram(),
        "bootstrap_ci": _sql_bootstrap_ci(),
        "embedding_drift": _sql_embedding_drift(),
        "snm_pairs": _sql_snm_pairs(),
        "supplier_part_counts": _sql_supplier_part_counts(),
        "excess_shipments": _sql_excess_shipments(),
        "hybrid_search_trio": _sql_hybrid_search_trio(),
        "scored_documents": _sql_scored_documents(),
        "k_anonymity": _sql_k_anonymity(5),
        "l_diversity": _sql_l_diversity(3),
        "top_ngrams": _sql_top_ngrams(100),
        "source_lang_pivot": _sql_source_lang_pivot(DOC_LANGS),
        "dedup_incremental": _sql_dedup_incremental(100),
        "jaccard_prefix_join": _sql_jaccard_prefix(3, 0.7),
        "containment_join": _sql_containment_join(0.8),
        "dup_graph_pagerank": _sql_dup_graph_pagerank(0.85, 5),
        "count_min_words": _sql_count_min_words(CM_PROBE_WORDS, CM_DEPTH, CM_WIDTH),
        "weighted_quantiles": (
            "WITH g AS (SELECT l_extendedprice AS v, "
            "sum(CAST(round(CAST(l_quantity AS DOUBLE), 6) AS DECIMAL(38,6))) AS w "
            "FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity > 0 GROUP BY 1), "
            "c AS (SELECT v, sum(w) OVER (ORDER BY v) AS cw FROM g), "
            "t AS (SELECT CAST(sum(w) AS DOUBLE) AS tw FROM g) "
            "SELECT round(max(t.tw), 6) AS total_weight, "
            "min(CASE WHEN CAST(cw AS DOUBLE) >= 0.25 * t.tw THEN v END) AS p25, "
            "min(CASE WHEN CAST(cw AS DOUBLE) >= 0.5 * t.tw THEN v END) AS p50, "
            "min(CASE WHEN CAST(cw AS DOUBLE) >= 0.75 * t.tw THEN v END) AS p75 "
            "FROM c, t"
        ),
        "audio_frame_features": _sql_audio_frame_features(256),
        "cdc_chunks": _sql_cdc_chunks(32, 8),
        "heavy_hitter_words": (
            f"WITH toks AS ({SQL_TOKS}) "
            "SELECT w AS value, CAST(count(*) AS BIGINT) AS n "
            "FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w HAVING count(*) >= 500"
        ),
        "edit_distance_pairs": _sql_edit_distance_pairs(1, 7),
        "value_auc": _sql_value_auc(),
        "readability": _sql_readability(),
        "cusum_hourly": _sql_cusum_hourly(0.5),
        "benford_prices": _sql_benford_prices(),
        "auc_daily": _sql_auc_daily(),
        "calibration_bins": _sql_calibration_bins(10),
        "substring_dedup": _sql_substring_dedup(8),
        "substring_dedup_chars": _sql_substring_dedup_chars(40),
        "hll_daily_users": _sql_hll_daily_users(),
        "record_linkage": _sql_record_linkage(),
        "stratified_split": _sql_stratified_split(80),
        "salted_segment_revenue": _sql_salted_segment_revenue(),
        "contamination_fraction": _sql_contamination_fraction(CONTAMINATION_PROBES),
        "hybrid_search": _sql_hybrid_search(),
        "encode_tokens": _sql_encode_tokens(10),
        "token_count_vocab": _sql_token_count_vocab(10),
        "lang_id_trained": _sql_lang_id_trained(),
        "image_pixel_stats": _sql_image_pixel_stats(64),
        "jpeg_pixel_stats": _sql_jpeg_pixel_stats(16),
        "gopher_quality": _sql_gopher_quality(),
        "gopher_ngram_repetition": _sql_gopher_ngram_repetition(),
        "temperature_mix": _sql_temperature_mix(200, 0.7),
        "ccnet_perplexity_buckets": _sql_ccnet_perplexity_buckets(0.75),
        "c4_line_filter": _sql_c4_line_filter(),
        "boilerplate_lines": _sql_boilerplate_lines(3),
        "char_entropy": _sql_char_entropy(),
        "refinedweb_line_correct": _sql_refinedweb_line_correct(),
        "ngram_novelty": _sql_ngram_novelty(3),
        "dsir_logweights": _sql_dsir_logweights(64),
        "ngram_novelty_vs_ref": _sql_ngram_novelty_vs_ref(3),
        "mmr_rerank": _sql_mmr_rerank(3, 0.7),
        "decontaminate_fuzzy": _sql_decontaminate_fuzzy(0.5, 16, 4),
        "langid_segments": _sql_langid_segments(),
        "quality_signals": _sql_quality_signals(),
        "doremi_weights": _sql_doremi_weights(0.5),
        "margin_bitext_mine": _sql_margin_bitext_mine(4, 1.0),
        "min_k_prob": _sql_min_k_prob(20),
        "unimax_mixture": _sql_unimax_mixture(19, 20, 1),
        "filter_funnel": _sql_filter_funnel(20),
        "hard_negative_mine": _sql_hard_negative_mine(2, 8),
        "matryoshka_error": _sql_matryoshka_error((8, 16, 32), 0, 10),
        "token_budget_select": _sql_token_budget_select(1, 4),
        "prototype_prune": _sql_prototype_prune(1, 2, 8, 3),
        "knn_label_consistency": _sql_knn_label_consistency(5, 50),
        "langid_confusion": _sql_langid_confusion(),
        "pq_codes": _sql_pq_codes(8, 8, 2),
        "pq_reconstruction_error": _sql_pq_reconstruction_error(8, 8, 2),
        "ann_topk_pq_adc": _sql_ann_topk_pq_adc(5, 8, 8, 2, 64),
        "ann_topk_ivf_pq": _sql_ann_topk_ivf_pq(5, 8, 3, 2, 8, 8, 2, 64),
        "url_dedup": _sql_url_dedup(),
        "winnowing": _sql_winnowing(5, 4),
        "alpha_mixture": _sql_alpha_mixture("alpha"),
        "customer_order_histogram": _sql_customer_order_histogram(),
        "top_supplier": _sql_top_supplier(),
        "small_qty_revenue": _sql_small_qty_revenue(),
        "priority_lines": _sql_priority_lines(),
        "bloom_prefilter": _sql_bloom_prefilter(4096, 3),
        "winnowing_overlap": _sql_winnowing_overlap(5, 4, 2, 50),
        "repeated_ngrams": _sql_repeated_ngrams(),
        "pmi_pairs": _sql_pmi_pairs(5, 50),
        "lang_id_margin": _sql_lang_id_margin(),
        "leakage_free_split": _sql_leakage_free_split(0.8),
        "dedup_incremental_near": _sql_dedup_incremental_near(100),
        "cross_source_dup_matrix": _sql_cross_source_dup_matrix(),
        "take_per_source": _sql_take_per_source(5),
        "psi_drift": _sql_psi(_SQL_DRIFT_BEFORE_PRICE, _SQL_DRIFT_AFTER_PRICE, 10),
        "correlation_matrix": _sql_correlation_matrix(CORR_COLS),
        "corpus_cube": _sql_corpus_cube(),
        "events_sliding": _sql_events_sliding(),
        "winsorize": _sql_winsorize(0.01, 0.99),
        "robust_stats": _sql_robust_stats(CORR_COLS),
        "shipping_priority": _sql_shipping_priority(),
        "regional_volume": _sql_regional_volume(),
        "nation_trade": _sql_nation_trade("NATION_1", "NATION_2"),
        "priority_late_orders": _sql_priority_late_orders(),
        "sole_late_supplier": _sql_sole_late_supplier(),
        "market_share": _sql_market_share("NATION_1"),
        "disjunctive_revenue": _sql_disjunctive_revenue(),
        "event_transitions": _sql_event_transitions(),
        "roc_points": _sql_roc_points(100),
        "dup_graph_pagerank_weighted": _sql_dup_graph_pagerank(0.85, 5, weighted=True),
        "quantize_embeddings": _sql_quantize_embeddings(),
        "quantization_error": _sql_quantization_error(),
        "skew_report": _sql_skew_report("orders", "o_custkey"),
        "normalize_text": _sql_normalize_text(),
        "extract_text": _sql_extract_text(),
        "zipf_profile": _sql_zipf_profile(),
        "shipment_month_overlap": _sql_shipment_month_overlap(),
        "domain_stats": _sql_domain_stats(),
        "promo_revenue": _sql_promo_revenue(),
        "idle_rich_customers": _sql_idle_rich_customers(),
        "corpus_overlap": _sql_corpus_overlap(),
        "group_scale": _sql_group_scale(),
        "length_matched_sample": _sql_length_matched_sample(),
        "conversion_attribution": _sql_conversion_attribution(),
        "secrets_scan": _sql_secrets_scan(),
        "forecast_revenue": _sql_forecast_revenue(),
        "semantic_dedup": _sql_semantic_pairs(),
        "column_entropy": _sql_column_entropy("customer", ENTROPY_COLS),
        "dedup_best": _sql_dedup_best(),
        "table_diff": _sql_table_diff(),
        "bigram_logprob": _sql_bigram_logprob(),
        "jsd_drift": _sql_jsd(_SQL_DRIFT_BEFORE_PRICE, _SQL_DRIFT_AFTER_PRICE, 10),
        "k_anonymity_violations": _sql_k_anonymity_violations(10),
        "pack_stats": _sql_pack_stats(256, 8),
        "drift_timeline": _sql_drift_timeline(100),
        "events_hourly_users": _sql_events_hourly_users(),
        "decontaminate": _sql_decontaminate(),
        "pack_windows": _sql_pack_windows(256, 8),
        "returned_revenue": _sql_returned_revenue(),
        "large_orders": _sql_large_orders(300),
        "t_closeness": _sql_t_closeness(0.2),
        "mutual_information": _sql_mutual_information(),
        "rolling_user_stats": _sql_rolling_user_stats(3),
        "weighted_sample": _sql_weighted_sample(),
        "cluster_size_histogram": _sql_cluster_size_histogram(),
        "rolling_anomalies": _sql_rolling_anomalies(5, 3.0, 3),
        "session_funnel": _sql_session_funnel(("view", "click", "purchase"), 30),
        "hourly_retention": _sql_hourly_retention(),
        "drift_timeline_psi": _sql_drift_timeline_psi(100),
        "source_share": _sql_source_share(),
        "minhash_threshold_curve": _sql_minhash_threshold_curve(16, 4, 10),
        "quantile_rank": _sql_quantile_rank(),
        "group_quantiles": _sql_group_quantiles((0.25, 0.5, 0.75)),
        "enforce_k_anonymity": _sql_enforce_k_anonymity(10),
        "multimodal_meta": _sql_multimodal_meta(),
        # oracle-backed since r9: real PNG round-trip, decoded-content
        # digest + integer-exact stats checked against the source bytes
        "multimodal_features": _sql_multimodal_features(64),
        "compression_entropy": _sql_compression_entropy(),
        # zlib_ratio: deflate output size is zlib-build-specific, not
        # SQL-reproducible -> rows-only (stat-gated vs the entropy bound)
        "events_hourly": _sql_events_hourly(),
        "events_json": _sql_events_json(),
        "user_sessions": _sql_user_sessions(30),
        "impute": _sql_impute(),
        "quality_rules": _sql_check_rules("customer", QUALITY_RULES),
        "latest_events": _sql_latest_events(),
        "split_leakage": _sql_split_leakage(),
        # hll_user_rollup: Datasketches estimate is engine-specific → rows-only
        "rules_by_source": _sql_check_rules_by("documents", ["source"], DOC_RULES),
        "orphan_orders": _sql_orphan_orders(),
        "incremental_profile": _sql_incremental_profile("lineitem", INC_COLS),
        "user_value_trend": _sql_user_value_trend(),
        "hourly_value_bands": _sql_hourly_value_bands((0.5, 0.95, 0.99)),
        "orders_join_audit": _sql_orders_join_audit(),
        "chunk_documents": _sql_chunk_documents(200, 50),
        "fold_assign": _sql_fold_assign(5),
        "user_growth": _sql_user_growth(),
        "trending_hourly": _sql_trending_hourly(3),
        "iqr_outliers": _sql_iqr_outliers("lineitem", INC_COLS),
        "completeness_timeline": _sql_completeness_timeline(["value", "props"]),
        "incremental_percentiles": _sql_incremental_percentiles(
            "lineitem", "l_extendedprice", 100, (0.25, 0.5, 0.75)
        ),
        "vocab_top": _sql_vocab_top(500),
        "oov_rate": _sql_oov_rate(50),
        "session_concurrency": _sql_session_concurrency(30),
        "cohort_retention": _sql_cohort_retention(),
        "dedup_rate_by_source": _sql_dedup_rate_by_source(),
    }
