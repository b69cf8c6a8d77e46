"""Bucketed co-located join tests: the persistent-shuffle-elimination
strategy for 100TB fact-fact joins."""

from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.plans import audit_plan
from incubator_flink_spark.sources.bucketed import bucketed_join, create_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    od = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderdate"
    )
    create_bucketed(li, "b_lineitem", "l_orderkey", 8)
    create_bucketed(od, "b_orders", "l_orderkey", 8)
    joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
    # disable auto-broadcast so the co-located SMJ path is what's planned
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined2 = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        rep = audit_plan(joined2)
        assert rep.sort_merge_joins >= 1
        assert rep.exchanges == 0, f"bucketed join must be exchange-free:\n{rep.raw[:800]}"
        # correctness: equals the plain join
        plain = li.join(od, "l_orderkey").count()
        assert joined2.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
