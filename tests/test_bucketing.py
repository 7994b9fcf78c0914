import re

from pyspark.sql import functions as F

from safedata_pipeline_spark import plans
from safedata_pipeline_spark.sources import bucketed as B
from safedata_pipeline_spark.sources.tables import load_table


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    B.write_bucketed(cust, "b_cust", str(tmp_path / "c"), ["c_custkey"], 8, ["c_custkey"])
    B.write_bucketed(orders, "b_ord", str(tmp_path / "o"), ["o_custkey"], 8, ["o_custkey"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.read_bucketed(spark, "b_cust").join(
            B.read_bucketed(spark, "b_ord"), F.col("c_custkey") == F.col("o_custkey")
        )
        plan = plans.formatted_plan(j)
        # co-located layout: the join consumes both scans directly
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
        assert "SortMergeJoin" in plan
        # and the result is the same join as the unbucketed one
        n_bucketed = j.count()
        n_plain = cust.join(orders, F.col("c_custkey") == F.col("o_custkey")).count()
        assert n_bucketed == n_plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_ord")
