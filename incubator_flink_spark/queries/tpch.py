"""TPC-H query suite, adapted to the driver testdata schema.

The reference validates 22/22 TPC-H queries at SF 0.01 against qgen answers
(reference: flink-end-to-end-tests/test-scripts/test_tpch.sh:22, queries at
test-scripts/test-data/tpch/sink/q1.sql..q22.sql).  The driver testdata is a
TPC-H-ish subset: no ``partsupp`` table, and several columns are missing
(l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct, o_shippriority,
c_address/c_phone, p_mfgr/p_container).  Queries needing those are adapted
(noted per query).  q2/q11/q16/q20/q21 originally require partsupp and
q12/q21 require l_commitdate/l_receiptdate/l_shipmode; those five are
implemented as *shape-preserving adaptations*: the part-supplier relation
is derived from lineitem (``DISTINCT (l_partkey, l_suppkey)`` with
aggregated quantity/unit-cost standing in for ps_availqty/ps_supplycost),
and "late delivery" is ``l_shipdate > o_orderdate + N days``.  Each keeps
the original query's operator skeleton (correlated min subquery, HAVING
over a scalar subquery, conditional aggregation, distinct-count with
anti-join exclusion, nested semi-joins, multi-EXISTS self-join) so the
same plan features are exercised — full 22/22 suite coverage.

Every query is a declarative DataFrame plan: Catalyst chooses
broadcast-hash joins for the small dims (region/nation/supplier/part at
these ratios), sort-merge for the fact-fact joins, partial aggregation
map-side, and pushes every filter/projection into the parquet scan.

Determinism: see ``registry`` module docstring (exact decimal sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register


def dsum(col: Column) -> Column:
    """Exact, order-independent sum of a double expression.

    The sum itself runs over DECIMAL(30,8) (exact, order-independent); the
    result is final-cast to DOUBLE because the driver's correctness gate
    compares results through pandas, where DuckDB decimals arrive as float64
    but Spark decimals stay ``decimal.Decimal`` objects — a decimal output
    column would hash-mismatch even when value-exact.  Every oracle mirrors
    with ``CAST(CAST(SUM(CAST(x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)``.
    """
    return F.sum(col.cast("decimal(30,8)")).cast("double")


def davg(col: Column) -> Column:
    """Deterministic average: exact decimal sum / count, as double."""
    return dsum(col) / F.count(col)


def ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


# --- Q1: pricing summary report (reference sink/q1.sql) ------------------

# NOTE (engine-conversion discipline, found by the sf0.1 self-audit):
# DuckDB's direct DECIMAL->DOUBLE cast is not correctly rounded once the
# scaled integer exceeds 2^53 (1-ulp drift vs Spark's BigDecimal
# conversion); routing through VARCHAR uses the correctly-rounded strtod
# and matches Spark bit-for-bit at any magnitude.
Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)                                        AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)                                   AS sum_base_price,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity)            AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice)  AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount)            AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("tpch_q1", Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # factors quantized to their natural cent scale BEFORE multiplying
    # (the star.py discipline): the product-then-quantize form diverges
    # between engines ~1-in-1e5 terms (Spark rounds the double's
    # shortest repr, DuckDB the exact binary value) — visible as
    # last-ulp sum drift at sf0.1
    price_d = F.col("l_extendedprice").cast("decimal(10,2)")
    disc_price = price_d * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)"))
    return (
        l.where(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3: shipping priority (adapted: no o_shippriority column) -----------

Q3_ORACLE = """
SELECT l_orderkey,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("tpch_q3", Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < ts("1996-03-15 00:00:00"))
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > ts("1996-03-15 00:00:00"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- Q4: order priority checking (adapted: EXISTS uses l_shipdate >
#     o_orderdate because l_commitdate/l_receiptdate are absent) ----------

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("tpch_q4", Q4_ORACLE)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-07-01 00:00:00")) & (F.col("o_orderdate") < ts("1996-10-01 00:00:00"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q5: local supplier volume (full) -------------------------------------

Q5_ORACLE = """
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("tpch_q5", Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --- Q6: forecasting revenue change (full) --------------------------------

Q6_ORACLE = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# --- Q7: volume shipping (nations renamed NATION_*) ------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(SUM(CAST(volume AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7", Q7_ORACLE)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00")) & (F.col("l_shipdate") <= ts("1997-12-31 00:00:00"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share (adapted: p_type is single-word here) -------

Q8_ORACLE = """
SELECT o_year,
       CAST(CAST(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)
       / CAST(CAST(CAST(SUM(CAST(volume AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("tpch_q8", Q8_ORACLE)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00")) & (F.col("o_orderdate") <= ts("1997-12-31 00:00:00"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))).cast("double")
                / dsum(volume).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9: product type profit (adapted: no partsupp → profit omits
#     ps_supplycost; filter on p_name LIKE '%red%') -------------------------

Q9_ORACLE = """
SELECT nation, o_year, CAST(CAST(SUM(CAST(amount AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("tpch_q9", Q9_ORACLE)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"),
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"))
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --- Q10: returned item reporting (adapted: no c_address/c_phone/comment) --

Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10", Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-10-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- Q13: customer order distribution (adapted: no o_comment filter) -------

Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13", Q13_ORACLE)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q14: promotion effect (p_type single-word: prefix 'PROMO') ------------

Q14_ORACLE = """
SELECT 100.0 * (CAST(CAST(CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)
       / CAST(CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE)) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@register("tpch_q14", Q14_ORACLE)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-09-01 00:00:00")) & (F.col("l_shipdate") < ts("1996-10-01 00:00:00"))
    )
    p = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * (
                    dsum(F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0.0))).cast("double")
                    / dsum(disc_price).cast("double")
                )
            ).alias("promo_revenue")
        )
    )


# --- Q15: top supplier (view replaced by window max — same semantics) -------

Q15_ORACLE = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""


@register("tpch_q15", Q15_ORACLE)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:

    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00")) & (F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
    )
    s = load(spark, sf_dir, "supplier")
    rev0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    # broadcast 1-row max instead of a keyless window: no WindowExec at
    # all — the filter rides the supplier-keyed aggregate map-side
    mx = rev0.agg(F.max("total_revenue").alias("max_rev"))
    rev = (
        rev0.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .drop("max_rev")
    )
    return (
        rev.join(F.broadcast(s), rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q17: small-quantity-order revenue (adapted: brand only, no container) --

Q17_ORACLE = """
SELECT CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < (
    SELECT 0.2 * (CAST(CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@register("tpch_q17", Q17_ORACLE)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    # Correlated scalar subquery → aggregate-then-join (shuffle once on
    # l_partkey, broadcast the per-part thresholds).
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * davg(F.col("l_quantity"))).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresholds, l.l_partkey == thresholds.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# --- Q18: large volume customer --------------------------------------------

Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@register("tpch_q18", Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("big_qty"))
        .where(F.col("big_qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(big, l.l_orderkey == big.big_orderkey, "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(100)
    )


# --- Q19: discounted revenue (adapted: brand/size/quantity disjunction) -----

Q19_ORACLE = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19", Q19_ORACLE)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- Q22: global sales opportunity (adapted: cntrycode → nationkey) ---------

Q22_ORACLE = """
SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > (
    SELECT CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0.00 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntry
"""


@register("tpch_q22", Q22_ORACLE)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = [1, 3, 5, 7, 9, 11, 13]
    c = load(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(keys))
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") >= ts("2000-08-01 00:00:00"))
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal")).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))  # scalar subquery → 1-row cross broadcast
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("cntry")
    )


# --- Q2: minimum cost supplier (adapted: part-supplier relation derived
#     from lineitem; unit cost MIN(l_extendedprice/l_quantity) stands in
#     for ps_supplycost.  Shape preserved: region-filtered multi-join with
#     a correlated per-part MIN subquery) --------------------------------

PS_CTE = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS ps_availqty
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""

Q2_ORACLE = f"""
WITH ps AS ({PS_CTE})
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part p
JOIN ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE p.p_size = 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def _part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem-derived stand-in for the missing partsupp table."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        dsum(F.col("l_quantity")).alias("ps_availqty"),
    )


@register("tpch_q2", Q2_ORACLE)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    p = load(spark, sf_dir, "part").where((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # Correlated MIN subquery -> regional ps + per-part window min: one
    # shuffle on ps_partkey instead of a rescan per outer row.
    regional = (
        _part_supplier(spark, sf_dir)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("min_cost", F.min("ps_supplycost").over(W.partitionBy("ps_partkey")))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
    )
    return (
        regional.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q11: important stock identification (adapted: value = sum of
#     extendedprice per (part, supplier) from lineitem; nation filter.
#     Shape preserved: GROUP BY + HAVING over a scalar subquery of the
#     same aggregation) ---------------------------------------------------

Q11_ORACLE = f"""
WITH ps AS ({PS_CTE}),
nat_ps AS (
  SELECT ps_partkey, CAST(ps_supplycost * CAST(ps_availqty AS DOUBLE) AS DECIMAL(30,8)) AS value
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_1')
SELECT ps_partkey, CAST(CAST(SUM(value) AS VARCHAR) AS DOUBLE) AS value
FROM nat_ps
GROUP BY ps_partkey
HAVING CAST(CAST(SUM(value) AS VARCHAR) AS DOUBLE) > (
  SELECT CAST(CAST(SUM(value) AS VARCHAR) AS DOUBLE) * 0.001 FROM nat_ps)
ORDER BY value DESC, ps_partkey
"""


@register("tpch_q11", Q11_ORACLE)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    nat_ps = (
        _part_supplier(spark, sf_dir)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty").cast("double"))
            .cast("decimal(30,8)")
            .alias("value"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(F.sum("value").cast("double").alias("value"))
    total = nat_ps.agg((F.sum("value").cast("double") * F.lit(0.001)).alias("threshold"))
    # Scalar subquery -> 1-row broadcast cross join (no driver collect).
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value").cast("double") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


# --- Q12: shipping priority classes (adapted: l_returnflag stands in for
#     l_shipmode; "late" = shipped after order date.  Shape preserved:
#     join + conditional aggregation on order priority) -------------------

Q12_ORACLE = """
SELECT l_returnflag AS shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY shipmode
"""


@register("tpch_q12", Q12_ORACLE)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


# --- Q16: parts/supplier relationship (adapted: part-supplier pairs from
#     lineitem; suppliers with negative account balance stand in for the
#     '%Customer%Complaints%' exclusion.  Shape preserved: anti-join
#     exclusion + COUNT(DISTINCT) per part attribute group) ---------------

Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#11' AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("tpch_q16", Q16_ORACLE)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    sizes = [1, 9, 14, 19, 23, 36, 45, 49]
    ps = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey"))
        .distinct()
    )
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#11")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(sizes)
    )
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- Q20: potential part promotion (adapted: available quantity per
#     (part, supplier) from lineitem totals; 'red%' parts, 1996 shipments.
#     Shape preserved: nested IN subqueries -> chained semi-joins) ---------

Q20_ORACLE = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey)
SELECT s_name, s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_2'
  AND s.s_suppkey IN (
    SELECT l_suppkey FROM shipped
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND CAST(total_qty AS DOUBLE) > 50.0)
ORDER BY s_name
"""


@register("tpch_q20", Q20_ORACLE)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = load(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty").cast("double") > 50.0)
    )
    qualifying = shipped.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- Q21: suppliers who kept orders waiting (adapted: "late" =
#     l_shipdate > o_orderdate + 60 days.  Shape preserved: EXISTS
#     (another supplier on the order) + NOT EXISTS (another *late*
#     supplier), implemented as one per-order distinct-count aggregate
#     instead of two correlated rescans of lineitem) ----------------------

Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_3'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("tpch_q21", Q21_ORACLE)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # One shuffle on orderkey computes both EXISTS conditions:
    #   EXISTS other supplier          <=> n_supp >= 2
    #   NOT EXISTS other late supplier <=> n_late_supp = 1 (l1 itself late)
    lines = l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate", late.alias("is_late")
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        lines.where(F.col("is_late"))
        .join(per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)), "l_orderkey", "left_semi")
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
