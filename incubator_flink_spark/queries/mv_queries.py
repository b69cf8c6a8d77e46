"""Incremental materialized-view maintenance queries — the batch form of
the reference's dynamic tables (SURVEY.md §1.3).

A deterministic CDC batch is derived from the orders table itself so the
oracle can reconstruct the post-change state in plain SQL:

- ``o_orderkey % 17 == 3`` → price revision that also MOVES the row to
  priority ``3-MEDIUM`` (emits -U in the old group, +U in the new — the
  cross-group retraction FlinkChangelogModeInferenceProgram forces
  retract mode for);
- ``o_orderkey % 17 == 5`` → delete (-D);
- ``o_orderkey % 17 == 9`` → insert (+I) of a synthetic follow-up order
  30 days later at the same price.

The Spark side maintains the standing MV *incrementally* (delta merge /
affected-group refresh — never re-aggregating the unchanged fact rows);
the DuckDB oracle recomputes the view from the post-change state.
Hash-equality proves incremental maintenance == full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.mv import mv_affected_refresh, mv_delta_merge
from incubator_flink_spark.queries.registry import register

def _rev():
    return F.col("o_orderkey") % 17 == 3


def _del():
    return F.col("o_orderkey") % 17 == 5


def _ins():
    return F.col("o_orderkey") % 17 == 9

# Post-change state, shared by both oracles.
_FINAL_STATE_SQL = """
  SELECT CASE WHEN o_orderkey % 17 = 3 THEN '3-MEDIUM' ELSE o_orderpriority END AS o_orderpriority,
         CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CASE WHEN o_orderkey % 17 = 3 THEN o_totalprice * 2 ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 17 <> 5
  UNION ALL
  SELECT o_orderpriority,
         CAST(year(o_orderdate + INTERVAL 30 DAY) AS BIGINT) AS order_year,
         o_totalprice
  FROM orders WHERE o_orderkey % 17 = 9
"""

MV_INCREMENTAL_ORACLE = f"""
WITH final AS ({_FINAL_STATE_SQL})
SELECT o_orderpriority, order_year,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(price AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_price
FROM final
GROUP BY o_orderpriority, order_year
ORDER BY o_orderpriority, order_year
"""


def _order_changelog(o: DataFrame) -> DataFrame:
    """The CDC batch as signed changelog rows (key cols + __sign + price)."""
    prio = F.col("o_orderpriority")
    yr = F.year("o_orderdate").cast("bigint")
    price = F.col("o_totalprice")
    minus_u = o.where(_rev()).select(
        prio.alias("o_orderpriority"), yr.alias("order_year"),
        F.lit(-1).alias("__sign"), price.alias("price"),
    )
    plus_u = o.where(_rev()).select(
        F.lit("3-MEDIUM").alias("o_orderpriority"), yr.alias("order_year"),
        F.lit(1).alias("__sign"), (price * 2).alias("price"),
    )
    minus_d = o.where(_del()).select(
        prio.alias("o_orderpriority"), yr.alias("order_year"),
        F.lit(-1).alias("__sign"), price.alias("price"),
    )
    plus_i = o.where(_ins()).select(
        prio.alias("o_orderpriority"),
        F.year(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("bigint").alias("order_year"),
        F.lit(1).alias("__sign"), price.alias("price"),
    )
    return minus_u.unionByName(plus_u).unionByName(minus_d).unionByName(plus_i)


@register("mv_incremental_orders", MV_INCREMENTAL_ORACLE)
def mv_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-maintainable MV (COUNT + exact-decimal SUM per priority×year)
    kept current under a CDC batch by delta merge: the delta reduces to
    per-key signed partials and lands on the standing MV with one
    key-sized outer join — O(|delta|), never a fact rescan.  The oracle
    recomputes the view from the post-change state; hash-equality proves
    incremental == recompute (GroupAggFunction.java:43 semantics)."""
    o = load(spark, sf_dir, "orders")
    dec = "decimal(30,8)"
    mv0 = o.groupBy(
        F.col("o_orderpriority"), F.year("o_orderdate").cast("bigint").alias("order_year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(dec)).alias("sum_price"),
    )
    delta = _order_changelog(o).withColumn(
        "sum_price", F.col("price").cast(dec)
    ).drop("price")
    merged = mv_delta_merge(
        mv0, delta, ["o_orderpriority", "order_year"], "n_orders", ["sum_price"]
    )
    return merged.select(
        "o_orderpriority", "order_year", "n_orders",
        F.col("sum_price").cast("double").alias("total_price"),
    ).orderBy("o_orderpriority", "order_year")


MV_AFFECTED_MAX_ORACLE = f"""
WITH final AS ({_FINAL_STATE_SQL})
SELECT o_orderpriority, order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(price) AS max_price
FROM final
GROUP BY o_orderpriority, order_year
ORDER BY o_orderpriority, order_year
"""


@register("mv_affected_group_max", MV_AFFECTED_MAX_ORACLE)
def mv_affected_group_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-self-maintainable MV (MAX): a delete can retract the standing
    extremum, so delta-touched groups are recomputed from the post-change
    fact — but ONLY those groups (broadcast semi-join bounds the scan);
    untouched groups carry over by anti-join.  The batch analog of the
    reference's MaxWithRetractAggFunction state discipline."""
    o = load(spark, sf_dir, "orders")
    prio = F.col("o_orderpriority")
    yr = F.year("o_orderdate").cast("bigint").alias("order_year")
    price = F.col("o_totalprice")

    mv0 = o.groupBy(prio, yr).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max(price).alias("max_price"),
    )
    # Post-change fact (what the upstream table looks like after the batch).
    unchanged = o.where(~_rev() & ~_del()).select(
        prio.alias("o_orderpriority"), yr, price.alias("price")
    )
    revised = o.where(_rev()).select(
        F.lit("3-MEDIUM").alias("o_orderpriority"), yr, (price * 2).alias("price")
    )
    inserted = o.where(_ins()).select(
        prio.alias("o_orderpriority"),
        F.year(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("bigint").alias("order_year"),
        price.alias("price"),
    )
    final_fact = unchanged.unionByName(revised).unionByName(inserted)
    delta_keys = _order_changelog(o).select("o_orderpriority", "order_year")
    out = mv_affected_refresh(
        mv0,
        final_fact,
        delta_keys,
        ["o_orderpriority", "order_year"],
        [
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.max("price").alias("max_price"),
        ],
    )
    return out.orderBy("o_orderpriority", "order_year")
