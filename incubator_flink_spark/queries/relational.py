"""Batch relational operator coverage (SURVEY.md §2.2-2.8, §2.10).

One registry entry per operator family so the driver's correctness gate
exercises each: joins (inner/left/right/full/semi/anti/cross/non-equi —
reference FlinkJoinType at flink-table-runtime/.../operators/join/
FlinkJoinType.java, batch exec nodes BatchExecHashJoin/SortMergeJoin/
NestedLoopJoin), set ops (Table.union/minus/intersect at
flink-table-api-java/.../api/Table.java:772-849), grouping sets / rollup /
cube (DecomposeGroupingSetsRule.scala), distinct aggs, OVER window
functions + frames (BatchExecOverAggregate.java:73 frames in
over/frame/), rank/top-n (BatchExecRank.java:43), dedup
(StreamExecDeduplicate.java:70 keep-first/keep-last, batch form),
UNNEST/correlate (LogicalUnnestRule.scala), Values, pivot.

All plans are declarative DataFrame/SQL — Catalyst supplies the physical
strategy (broadcast for the dim sides, sort-merge for fact-fact, Expand
for grouping sets, WindowExec for OVER).

STDDEV/VAR note: computed from exact decimal sums —
var = (sum_x2 - sum_x^2/n)/(n-1) — the same sum/count rewrite the
reference applies (WindowAggregateReduceFunctionsRule.scala), which also
makes Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register
from incubator_flink_spark.queries.tpch import dsum, ts

# --- joins ------------------------------------------------------------------

JOIN_INNER_ORACLE = """
SELECT c_custkey, c_name, n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_nationkey < 5
ORDER BY c_custkey
"""


@register("join_inner", JOIN_INNER_ORACLE)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").where(F.col("n_nationkey") < 5)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name")
        .orderBy("c_custkey")
    )


JOIN_LEFT_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00') o
  ON c.c_custkey = o.o_custkey
ORDER BY c_custkey, o_orderkey
"""


@register("join_left_outer", JOIN_LEFT_ORACLE)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-02-01 00:00:00"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


JOIN_RIGHT_ORACLE = """
SELECT o.o_orderkey, c.c_custkey, c.c_name
FROM (SELECT * FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00') o
RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY c_custkey, o_orderkey
"""


@register("join_right_outer", JOIN_RIGHT_ORACLE)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-02-01 00:00:00"))
    )
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .select("o_orderkey", "c_custkey", "c_name")
        .orderBy("c_custkey", "o_orderkey")
    )


JOIN_FULL_ORACLE = """
SELECT c.c_custkey, o.o_orderkey
FROM (SELECT * FROM customer WHERE c_nationkey < 13) c
FULL JOIN (SELECT * FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1997-03-01 00:00:00') o
  ON c.c_custkey = o.o_custkey
ORDER BY c_custkey, o_orderkey
"""


@register("join_full_outer", JOIN_FULL_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_nationkey") < 13)
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-03-01 00:00:00"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full")
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000)
ORDER BY c_custkey
"""


@register("join_semi", JOIN_SEMI_ORACLE)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name").orderBy("c_custkey")


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 400000)
ORDER BY c_custkey
"""


@register("join_anti", JOIN_ANTI_ORACLE)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name").orderBy("c_custkey")


JOIN_CROSS_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
"""


@register("join_cross", JOIN_CROSS_ORACLE)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


JOIN_NON_EQUI_ORACLE = """
SELECT a.n_nationkey AS key_lo, b.n_nationkey AS key_hi
FROM nation a JOIN nation b
  ON a.n_nationkey < b.n_nationkey AND a.n_regionkey = b.n_regionkey
ORDER BY key_lo, key_hi
"""


@register("join_non_equi", JOIN_NON_EQUI_ORACLE)
def join_non_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("a_key"), F.col("n_regionkey").alias("a_region")
    )
    b = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("b_key"), F.col("n_regionkey").alias("b_region")
    )
    return (
        a.join(b, (F.col("a_key") < F.col("b_key")) & (F.col("a_region") == F.col("b_region")))
        .select(F.col("a_key").alias("key_lo"), F.col("b_key").alias("key_hi"))
        .orderBy("key_lo", "key_hi")
    )


# --- set operations ---------------------------------------------------------

SET_UNION_ALL_ORACLE = """
SELECT x FROM (
  SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT s_nationkey AS x FROM supplier
) t ORDER BY x
"""


@register("set_union_all", SET_UNION_ALL_ORACLE)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("x"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.unionAll(s).orderBy("x")


SET_UNION_ORACLE = """
SELECT x FROM (
  SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 9000
  UNION
  SELECT s_nationkey AS x FROM supplier
) t ORDER BY x
"""


@register("set_union_distinct", SET_UNION_ORACLE)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("x"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.union(s).distinct().orderBy("x")


SET_INTERSECT_ORACLE = """
SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 9990
INTERSECT
SELECT s_nationkey AS x FROM supplier
ORDER BY x
"""


@register("set_intersect", SET_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9990).select(F.col("c_nationkey").alias("x"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.intersect(s).orderBy("x")


SET_INTERSECT_ALL_ORACLE = """
SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 9990
INTERSECT ALL
SELECT s_nationkey AS x FROM supplier
ORDER BY x
"""


@register("set_intersect_all", SET_INTERSECT_ALL_ORACLE)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9990).select(F.col("c_nationkey").alias("x"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.intersectAll(s).orderBy("x")


SET_EXCEPT_ORACLE = """
SELECT n_nationkey AS x FROM nation
EXCEPT
SELECT s_nationkey AS x FROM supplier
ORDER BY x
"""


@register("set_except", SET_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("x"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    return n.exceptAll(s).distinct().orderBy("x")


SET_EXCEPT_ALL_ORACLE = """
SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 9950
EXCEPT ALL
SELECT s_nationkey AS x FROM supplier
ORDER BY x
"""


@register("set_except_all", SET_EXCEPT_ALL_ORACLE)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9950).select(F.col("c_nationkey").alias("x"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.exceptAll(s).orderBy("x")


# --- grouping sets / rollup / cube / distinct agg / pivot -------------------

AGG_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS cnt, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


@register("agg_grouping_sets", AGG_GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS cnt, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS STRING) AS DOUBLE) AS total
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """
    )


AGG_ROLLUP_ORACLE = """
SELECT r_name, n_name, COUNT(*) AS cnt
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


@register("agg_rollup", AGG_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


AGG_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("agg_cube", AGG_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


AGG_DISTINCT_ORACLE = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey)  AS uniq_cust,
       COUNT(DISTINCT o_orderpriority) AS uniq_prio,
       COUNT(*) AS cnt
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@register("agg_distinct", AGG_DISTINCT_ORACLE)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("uniq_cust"),
            F.countDistinct("o_orderpriority").alias("uniq_prio"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("o_orderstatus")
    )


AGG_STATS_ORACLE = """
SELECT l_returnflag,
       SQRT((CAST(CAST(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)
             - CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)
               * CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) / COUNT(l_quantity))
            / (COUNT(l_quantity) - 1)) AS stddev_qty,
       (CAST(CAST(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)
        - CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)
          * CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) / COUNT(l_quantity))
       / (COUNT(l_quantity) - 1) AS var_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("agg_stats", AGG_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # STDDEV/VAR via the sum/count rewrite (the reference does the same:
    # WindowAggregateReduceFunctionsRule.scala) — exact and engine-agnostic.
    l = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sum_x = dsum(q).cast("double")
    sum_x2 = dsum(q * q).cast("double")
    n = F.count(q)
    var = (sum_x2 - sum_x * sum_x / n) / (n - F.lit(1))
    return (
        l.groupBy("l_returnflag")
        .agg(F.sqrt(var).alias("stddev_qty"), var.alias("var_qty"))
        .orderBy("l_returnflag")
    )


AGG_LISTAGG_ORACLE = """
SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


@register("agg_listagg", AGG_LISTAGG_ORACLE)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LISTAGG / collect_list (reference aggfunctions ListAggFunction,
    # CollectAggFunction) — sorted for deterministic comparison.
    n = load(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"))
        .orderBy("n_regionkey")
    )


AGG_PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS F,
       CAST(CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS O
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("agg_pivot", AGG_PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.col("l_quantity")))
        .orderBy("l_returnflag")
    )


# --- OVER window functions + frames ----------------------------------------

WINDOW_TOPN_ORACLE = """
SELECT * FROM (
  SELECT s_nationkey, s_suppkey, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier
) t WHERE rn <= 3 ORDER BY s_nationkey, rn
"""


@register("window_topn", WINDOW_TOPN_ORACLE)
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch Top-N (reference BatchExecRank.java:43 / RankOperator):
    # row_number + filter; Catalyst evaluates rank inside WindowExec
    # partition-locally after a single hash exchange.
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("s_nationkey", "s_suppkey", "s_acctbal", "rn")
        .orderBy("s_nationkey", "rn")
    )


WINDOW_RANKS_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice,
       RANK()       OVER (PARTITION BY p_brand ORDER BY p_size)   AS rnk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size)   AS drnk,
       NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_partkey) AS quartile,
       CAST(PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS DOUBLE) AS prank
FROM part WHERE p_brand IN ('Brand#11','Brand#12') ORDER BY p_brand, p_partkey
"""


@register("window_ranks", WINDOW_RANKS_ORACLE)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_brand").isin("Brand#11", "Brand#12"))
    wsize = W.partitionBy("p_brand").orderBy("p_size")
    wkey = W.partitionBy("p_brand").orderBy("p_partkey")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(wsize).alias("rnk"),
            F.dense_rank().over(wsize).alias("drnk"),
            F.ntile(4).over(wkey).alias("quartile"),
            F.percent_rank().over(wsize).alias("prank"),
        )
        .orderBy("p_brand", "p_partkey")
    )


WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
FROM orders WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


@register("window_running_sum", WINDOW_RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")).over(w).cast("double").alias("running_total"),
            F.count(F.lit(1)).over(w).alias("running_cnt"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_SLIDING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_sum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS DOUBLE) AS ahead_sum
FROM orders WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


@register("window_sliding_frame", WINDOW_SLIDING_ORACLE)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(30,8)")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec).over(base.rowsBetween(-2, W.currentRow)).cast("double").alias("sliding_sum"),
            F.sum(dec).over(base.rowsBetween(1, 2)).cast("double").alias("ahead_sum"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_RANGE_ORACLE = """
SELECT p_brand, p_partkey, p_size,
       COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS peers_within_5
FROM part WHERE p_brand IN ('Brand#11','Brand#12')
ORDER BY p_brand, p_partkey
"""


@register("window_range_frame", WINDOW_RANGE_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_brand").isin("Brand#11", "Brand#12"))
    w = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, W.currentRow)
    return (
        p.select("p_brand", "p_partkey", "p_size", F.count(F.lit(1)).over(w).alias("peers_within_5"))
        .orderBy("p_brand", "p_partkey")
    )


WINDOW_LEAD_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice)     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       LEAD(o_totalprice)    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
       LAG(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev2_price,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


@register("window_lead_lag", WINDOW_LEAD_LAG_ORACLE)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(wfull).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --- sort / limit / offset / dedup -----------------------------------------

SORT_LIMIT_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 5
"""


@register("sort_limit_offset", SORT_LIMIT_OFFSET_ORACLE)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Table.order_by/offset/fetch (reference Table.java:1341 area);
    # Catalyst: TakeOrderedAndProject with offset.
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(15)
    )


DEDUP_FIRST_BATCH_ORACLE = """
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn = 1 ORDER BY user_id, event_type
"""


@register("dedup_keep_first_batch", DEDUP_FIRST_BATCH_ORACLE)
def dedup_keep_first_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deduplicate keep-first (reference StreamExecDeduplicate.java:70,
    # ProcTimeDeduplicateKeepFirstRowFunction) — batch form.
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


DEDUP_LAST_BATCH_ORACLE = """
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1 ORDER BY user_id, event_type
"""


@register("dedup_keep_last_batch", DEDUP_LAST_BATCH_ORACLE)
def dedup_keep_last_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keep-last per key (reference RowTimeDeduplicateFunction keep-last).
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


# --- UNNEST / correlate / values -------------------------------------------

UNNEST_ORACLE = """
SELECT doc_id, pos, word
FROM (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 10
) t
ORDER BY doc_id, pos
"""


@register("unnest_words", UNNEST_ORACLE)
def unnest_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UNNEST / Correlate (reference StreamExecCorrelate.java:45,
    # LogicalUnnestRule.scala) → posexplode, Catalyst Generate node.
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 10)
    return (
        d.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")
        .orderBy("doc_id", "pos")
    )


VALUES_ORACLE = """
SELECT * FROM (VALUES (1, 'tumble'), (2, 'hop'), (3, 'session'), (4, 'cumulate')) AS t(id, kind)
ORDER BY id
"""


@register("values_inline", VALUES_ORACLE)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Values exec node (reference StreamExecValues/ValuesCodeGenerator).
    return spark.sql(
        "SELECT * FROM VALUES (1, 'tumble'), (2, 'hop'), (3, 'session'), (4, 'cumulate') AS t(id, kind) ORDER BY id"
    )


AGG_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("agg_percentiles", AGG_PERCENTILES_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact interpolated percentiles (reference: percentile via sort-agg;
    # both engines use the same linear-interpolation definition)
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 6).alias("median_qty"),
            F.round(F.percentile(F.col("l_quantity"), F.lit(0.9)), 6).alias("p90_qty"),
            F.round(F.percentile(F.col("l_extendedprice"), F.lit(0.25)), 6).alias("p25_price"),
        )
        .orderBy("l_returnflag")
    )


AGG_MULTISET_ORACLE = """
SELECT n_regionkey,
       array_to_string(list_sort(list_transform(
         map_entries(histogram(n_name)),
         e -> e.key || ':' || CAST(e.value AS VARCHAR))), ',') AS name_multiset
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


@register("agg_multiset", AGG_MULTISET_ORACLE)
def agg_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MULTISET/COLLECT (reference CollectAggFunction; SURVEY §1.5 maps
    # MULTISET to a count-map convention). Serialized as sorted k:v list
    # so the comparison is engine-agnostic.
    n = load(spark, sf_dir, "nation")
    counts = n.groupBy("n_regionkey", "n_name").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.concat_ws(":", F.col("n_name"), F.col("c")))), ","
            ).alias("name_multiset")
        )
        .orderBy("n_regionkey")
    )


# --- FIRST_VALUE / LAST_VALUE with IGNORE NULLS (reference supports the
# IGNORE NULLS modifier on its window aggregates: FirstValueWithRetract /
# LastValueAggFunction skip nulls; SQL spelling via Calcite) ------------------

WINDOW_IGNORE_NULLS_ORACLE = """
SELECT event_id,
       FIRST_VALUE(v IGNORE NULLS) OVER w AS first_click_v,
       LAST_VALUE(v IGNORE NULLS) OVER w AS last_click_v
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'click' THEN value END AS v
  FROM events WHERE user_id < 50) t
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


@register("window_ignore_nulls", WINDOW_IGNORE_NULLS_ORACLE)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running first/last non-null over a sparsely-populated column (the
    IGNORE NULLS modifier): rows before any click see NULL, rows after
    carry the first/latest click value forward."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 50)
    v = F.when(F.col("event_type") == "click", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e.select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            F.first("v", ignorenulls=True).over(w).alias("first_click_v"),
            F.last("v", ignorenulls=True).over(w).alias("last_click_v"),
        )
        .orderBy("event_id")
    )


# --- UNPIVOT (wide -> long; the inverse of agg_pivot) -------------------------

UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE) AS qty_f,
         CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE) AS qty_o
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, status, qty
FROM wide UNPIVOT INCLUDE NULLS (qty FOR status IN (qty_f AS 'F', qty_o AS 'O'))
ORDER BY l_returnflag, status
"""


@register("unpivot_quantities", UNPIVOT_ORACLE)
def unpivot_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — wide-to-long reshaping via the stack() table generator
    (Spark's Expand-backed unpivot; the Correlate/row-multiplier family
    of StreamExecExpand).  Inverse of agg_pivot: pivot the per-flag
    quantities wide, then melt them back to (flag, status, qty) rows."""
    l = load(spark, sf_dir, "lineitem")
    wide = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )
    return wide.select(
        "l_returnflag",
        F.expr("stack(2, 'F', qty_f, 'O', qty_o) AS (status, qty)"),
    ).orderBy("l_returnflag", "status")
