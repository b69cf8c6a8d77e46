"""Correlated-subquery breadth beyond the TPC-H spellings (q4/q21/q22):
scalar subqueries in SELECT, correlated EXISTS/NOT EXISTS, and NOT IN
with its three-valued NULL semantics.

Reference: the reference decorrelates these in
flink-table-planner/src/main/scala/org/apache/flink/table/planner/plan/
rules/logical/FlinkSubQueryRemoveRule.scala:1 (EXISTS/IN → semi/anti
join, with the null-aware variant for NOT IN) and
FlinkRewriteSubQueryRule.scala:1 (COUNT-scalar → EXISTS).  Spark-first
mapping: the SAME SQL text is handed to Catalyst, whose
RewriteCorrelatedScalarSubquery / RewritePredicateSubquery produce the
aggregate + left-outer join and (null-aware) semi/anti joins — the plan
shape is pinned in tests/test_plans.py.  The DuckDB oracle runs the
identical SQL, so the hash match proves the decorrelation semantics,
including the classic NOT-IN-with-NULL trap (one NULL in the subquery
makes every NOT IN predicate UNKNOWN → zero rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register

SUBQUERY_SCALAR_SQL = """
SELECT n_name,
       (SELECT COUNT(*) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey) AS n_custs,
       (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS STRING) AS DOUBLE)
        FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS total_bal
FROM nation n
ORDER BY n_name
"""


@register("subquery_scalar", SUBQUERY_SCALAR_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list (COUNT over an
    empty group must yield 0, SUM must yield NULL — the aggregate +
    left-outer-join decorrelation both engines perform)."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(SUBQUERY_SCALAR_SQL)


SUBQUERY_EXISTS_SQL = """
SELECT s.s_suppkey, s.s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_suppkey = s.s_suppkey
                    AND l2.l_returnflag = 'R' AND l2.l_quantity >= 50)
ORDER BY s.s_suppkey
"""


@register("subquery_exists_correlated", SUBQUERY_EXISTS_SQL)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (→ semi join) and NOT EXISTS (→ anti join) in
    one predicate — the FlinkSubQueryRemoveRule shapes beyond the q21
    spelling; plan pinned to semi+anti hash joins (no nested loop)."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SUBQUERY_EXISTS_SQL)


SUBQUERY_IN_NEGATED_SQL = """
SELECT
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                           WHERE o_totalprice > 150000)) AS cnt_not_in,
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                                       ELSE o_custkey END
                           FROM orders)) AS cnt_not_in_null,
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey IN (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                                   ELSE o_custkey END
                       FROM orders)) AS cnt_in_null
"""


@register("subquery_in_negated", SUBQUERY_IN_NEGATED_SQL)
def subquery_in_negated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued logic — the classic wrong-answer trap: the
    second count's subquery contains a NULL, so every ``NOT IN`` is
    UNKNOWN and the count must be exactly 0 (null-aware anti join),
    while ``IN`` against the same set still matches non-null elements.
    The first count is the plain (null-free) anti-join baseline."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SUBQUERY_IN_NEGATED_SQL)


SUBQUERY_ABOVE_GROUP_AVG_SQL = """
WITH ctr AS (
  SELECT o_custkey AS custkey, c_nationkey AS nationkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_return
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON c_custkey = o_custkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, c_nationkey)
SELECT c.custkey, c.nationkey,
       CAST(CAST(c.total_return AS STRING) AS DOUBLE) AS total_return
FROM ctr c
WHERE CAST(CAST(c.total_return AS STRING) AS DOUBLE) >
      1.2 * (SELECT CAST(CAST(SUM(c2.total_return) AS STRING) AS DOUBLE)
                    / COUNT(*)
             FROM ctr c2 WHERE c2.nationkey = c.nationkey)
ORDER BY c.custkey
"""


@register("subquery_above_group_avg", SUBQUERY_ABOVE_GROUP_AVG_SQL)
def subquery_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 signature: a correlated aggregate subquery in the WHERE
    clause at a DIFFERENT grain than the outer row — customers whose
    return volume exceeds 1.2x the average across their nation.  The
    planner must decorrelate to (group-average aggregate) JOIN (outer)
    on the correlation key — Catalyst's RewriteCorrelatedScalarSubquery,
    the FlinkSubQueryRemoveRule analog — so the CTE is computed once and
    re-aggregated, never re-executed per outer row.  The comparison is
    exact-decimal-sum/count in both engines (identical IEEE division and
    multiply), so the >1.2x cut is deterministic."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(SUBQUERY_ABOVE_GROUP_AVG_SQL)
