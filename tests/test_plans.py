"""Plan-shape tests: the scale guarantees are plan properties —
assert them instead of hoping."""

from pyspark.sql import functions as F

from safedata_pipeline_spark import plans
from safedata_pipeline_spark.operators import profile as P
from safedata_pipeline_spark.operators import protect as PR
from safedata_pipeline_spark.sources.tables import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 40).select("l_orderkey")
    pushed = plans.pushed_filters(li)
    assert any("l_quantity" in p for p in pushed)


def test_projection_prunes_read_schema(spark, sf_dir):
    li = P.project(load_table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_quantity"])
    cols = plans.read_schema_columns(li)
    assert cols == {"l_orderkey", "l_quantity"}


def test_basic_stats_reads_each_column_once_per_pass(spark, sf_dir):
    import re

    li = load_table(spark, sf_dir, "lineitem")
    # exact mode (r10): ONE visible parquet scan (the moments agg);
    # the grouping-sets counts frame is pinned (localCheckpoint), so
    # its single corpus scan happens once at materialization and every
    # downstream consumer (nunique/top/freq + percentiles + totals)
    # reads the in-memory blocks — "Scan ExistingRDD" nodes, not
    # additional parquet scans. Corpus reads total: exactly 2.
    plan = plans.formatted_plan(P.basic_stats(li))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Scan ExistingRDD" in plan
    # approx (100 TB) mode: no pin — exactly the two corpus scans
    plan2 = plans.formatted_plan(P.basic_stats(li, exact=False))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan2)) == 2
    assert "Scan ExistingRDD" not in plan2


def test_protect_chain_stays_codegen(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    out = PR.generalize_numeric(cust, ["c_acctbal"], bins=10)
    # binning is a CASE chain — no join/exchange/shuffle in the row pass
    plan = plans.formatted_plan(out)
    assert "Exchange" not in plan and "Join" not in plan
    # AQE hides codegen spans pre-execution; check with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out2 = PR.generalize_numeric(cust, ["c_acctbal"], bins=10)
        assert plans.scans_whole_stage_codegen(out2)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_sdc_suppress_row_pass_is_join_free(spark, sf_dir):
    # fit = one fused count pass; apply = pure CASE — the returned
    # frame's plan must have no join and no exchange, however many
    # columns are suppressed
    out = PR.sdc_suppress(
        load_table(spark, sf_dir, "customer"),
        ["c_mktsegment", "c_name"],
        threshold=5,
    )
    plan = plans.formatted_plan(out)
    assert "Join" not in plan and "Exchange" not in plan


def test_sdc_rare_values_is_one_scan(spark, sf_dir):
    import re

    cust = load_table(spark, sf_dir, "customer")
    melted = cust.select("c_mktsegment", "c_name").unpivot(
        [], ["c_mktsegment", "c_name"], "__sdc_name", "__sdc_value"
    )
    counts = melted.groupBy("__sdc_name", "__sdc_value").count()
    plan = plans.formatted_plan(counts)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_knn_broadcasts_real_side(spark, sf_dir):
    from safedata_pipeline_spark.operators import risk as RK

    cust = load_table(spark, sf_dir, "customer")
    real = cust.where(F.col("c_custkey") % 2 == 1)
    anon = cust.where(F.col("c_custkey") % 2 == 0)
    nn = RK.knn_linkage_join(anon, real, ["c_nationkey", "c_acctbal"], "c_custkey", "c_custkey")
    plan = plans.formatted_plan(nn)
    assert "BroadcastNestedLoopJoin" in plan
    # argmin is an aggregate with a map-side partial phase (min(struct)
    # compiles to SortAggregate — struct buffers aren't hash-able), and
    # crucially NOT an all-pairs window sort on a single partition
    assert "Window" not in plan
    assert "SortAggregate" in plan or "HashAggregate" in plan
    assert "partial_min" in plan


def test_asof_join_is_one_shuffle_no_join(spark, sf_dir):
    from safedata_pipeline_spark.operators import joins as J

    ev = load_table(spark, sf_dir, "events")
    out = J.asof_join(
        ev.where(F.col("event_type") == "error"),
        ev.where(F.col("event_type") == "click"),
        key="user_id",
        right_cols=["event_id"],
    )
    import re

    plan = plans.formatted_plan(out)
    # physically NOT a join: union + one key exchange + window
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" in plan and "Union" in plan


def test_distribution_drift_scans_inputs_twice_total(spark, sf_dir):
    import re

    from safedata_pipeline_spark.operators import drift as DR

    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
    b = li.select("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
    out = DR.distribution_drift(a, b)
    plan = plans.formatted_plan(out)
    # one melted pass per (input, column-kind), independent of how many
    # columns drift covers (the old per-column shape was 2 scans ×
    # #columns). The numeric melt's 2 parquet scans now run inside the
    # two-phase-ECDF checkpoint job and surface in the final plan as a
    # materialized-RDD scan; the categorical melt contributes the 2
    # parquet scans visible here.
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "ExistingRDD" in plan


def test_synthetic_sample_bootstrap_has_no_global_sort_window(spark, sf_dir):
    # the bootstrap row index (numeric AND categorical draws) must come
    # from the zipWithIndex reconstruction (broadcast offset join), never
    # an unpartitioned row_number / cumulative-sum window (single-task
    # global sort) — including for near-unique string columns like
    # c_name whose frequency table would be data-sized.
    cust = load_table(spark, sf_dir, "customer").select(
        "c_acctbal", "c_nationkey", "c_name", "c_mktsegment"
    )
    out = PR.synthetic_sample(cust, n=100, seed=7)
    plan = plans.formatted_plan(out)
    assert "Window" not in plan
    assert "row_number" not in plan


def test_range_join_extracts_bucket_equi_key(spark, sf_dir):
    from safedata_pipeline_spark.operators import joins as J

    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 10.0), ("high", 10.0, 100.0)], "tier string, lo double, hi double"
    )
    out = J.range_join_bucketed(ev, tiers, "value", bucket_width=10.0)
    plan = plans.formatted_plan(out)
    # the bucket id must become an equi-join key — a plain range
    # condition would degrade to BroadcastNestedLoopJoin
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__bucket" in plan


def test_corpus_stats_is_one_scan_no_join(spark, sf_dir):
    import re

    from safedata_pipeline_spark.operators import text as TX

    out = TX.corpus_stats(load_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(out)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_contamination_scan_many_is_one_arrow_pass(spark, sf_dir):
    import re

    from safedata_pipeline_spark.operators import text as TX

    out = TX.contamination_scan_many(
        load_table(spark, sf_dir, "documents"), ["key agg row", "zz"]
    )
    plan = plans.formatted_plan(out)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    # the probe join must broadcast, never shuffle the corpus side
    assert "SortMergeJoin" not in plan


def test_plans_md_covers_every_query():
    """PLANS.md is the plan-shape audit record — it must have a row for
    every registered query so the audit can't silently go stale when a
    new operator lands. (Regenerate with `python tools/audit_plans.py`;
    this test only checks coverage, it doesn't rebuild plans.)"""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    with open("/root/repo/PLANS.md") as f:
        text = f.read()
    rows = set(re.findall(r"^\| (\S+) \|", text, flags=re.M)) - {"query"}
    missing = sorted(set(entry.queries()) - rows)
    assert not missing, f"queries with no PLANS.md row (run tools/audit_plans.py): {missing}"
    errors = re.findall(r"^\| (\S+) \|.*error", text, flags=re.M)
    assert not errors, f"PLANS.md rows recording a plan-build error: {errors}"


def test_shipping_priority_broadcasts_dims_and_takeordered(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry._q_shipping_priority(spark, sf_dir)
    plan = plans.formatted_plan(df)
    # filtered dimension sides broadcast; the top-10 must be TakeOrdered
    # (bounded per-partition heaps), never a global Sort + collect
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert plans.pushed_filters(df)  # segment/date filters reach scans


def test_survey_inventory_covers_every_query():
    """SURVEY §2's operator inventory is the coverage checklist — every
    registered query must appear there by name, so the inventory can't
    silently go stale when a new operator lands."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    with open("/root/repo/SURVEY.md") as f:
        text = f.read()
    mentioned = set(re.findall(r"`([A-Za-z0-9_]+)`", text))
    missing = sorted(set(entry.queries()) - mentioned)
    assert not missing, f"queries with no SURVEY.md inventory row: {missing}"
