"""TPC-DS-shaped star-schema queries over the existing TPC-H-ish tables
(the driver ships no TPC-DS data, so these exercise the SIGNATURE shape
instead: a fact scanned once, many broadcast dims, grouping sets and
windowed ranking stacked in one plan).

Reference bar: the reference proves 103 TPC-DS variants end-to-end
(flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-86
over the 24-table schema of TpcdsSchemaProvider.java); the plan
discipline these two queries pin — one shuffle per fact, every dim
broadcast, no nested loop — is what makes that workload viable at scale.

Determinism: revenue quantizes each FACTOR to its natural 2-decimal
scale and multiplies in decimal (exact, order-independent in both
engines) rather than quantizing the double product at 8 decimals — the
product-then-quantize form disagrees between engines about 1-in-1e5
terms (Spark rounds the shortest-repr of the double, DuckDB the exact
binary value; at the 8th decimal of a 4-decimal-exact product those can
straddle).

Scale design: broadcast is reserved for TRUE dimensions — tables whose
size is independent of the fact (nation, region, and at TPC-H-like
ratios part/supplier, which grow ~100-5000× slower than lineitem).
orders and customer grow WITH the fact, so they join via shuffle
(AQE picks broadcast at small SFs on its own; hinting it would make the
plan a broadcast-size failure at larger SFs).  The aggregate then takes
one fact-sized shuffle — for the rollup, Spark's Expand feeds partial
aggregation so the exchange carries pre-aggregated rows; for the
rankings, the window runs over the dim-cardinality aggregate output,
never over the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register

STAR_SALES_ROLLUP_ORACLE = """
SELECT r_name, n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(grouping(r_name) AS BIGINT) AS g_region,
       CAST(grouping(n_name) AS BIGINT) AS g_nation,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT))
ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST, o_year NULLS FIRST
"""


@register("star_sales_rollup", STAR_SALES_ROLLUP_ORACLE)
def star_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → dim chain → 3-level ROLLUP (region, nation, order-year)
    with GROUPING markers — the TPC-DS q5/q18 family shape.  orders and
    customer are fact-proportional, so they join by shuffle (AQE may
    still choose broadcast at small SFs); nation/region are true dims
    and broadcast unconditionally.  The rollup itself is one fact
    shuffle (Expand → partial agg → exchange → final agg)."""
    from incubator_flink_spark.catalog import spread

    # spread the fact scan: single-row-group parquet reads as ONE split,
    # serializing the broadcast-join + Expand(4x) + decimal partial-agg
    # pipeline on one core (measured 3.5s -> 1.7s; guide §2.5 input
    # skew).  No-op at scale (a real fact scan has thousands of splits).
    li = spread(load(spark, sf_dir, "lineitem"))
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
    )
    return (
        joined.rollup("r_name", "n_name", "o_year")
        .agg(
            F.grouping("r_name").cast("bigint").alias("g_region"),
            F.grouping("n_name").cast("bigint").alias("g_nation"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .select("r_name", "n_name", "o_year", "g_region", "g_nation", "n_items", "revenue")
        .orderBy(
            "g_region",
            "g_nation",
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
            F.col("o_year").asc_nulls_first(),
        )
    )


STAR_RANK_BY_DIM_ORACLE = """
WITH rev AS (
  SELECT n_name, p_type,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  GROUP BY n_name, p_type)
SELECT n_name, p_type, revenue, n_items, rnk FROM (
  SELECT n_name, p_type, revenue, n_items,
         CAST(RANK() OVER (PARTITION BY n_name ORDER BY revenue DESC, p_type) AS BIGINT) AS rnk
  FROM rev) t
WHERE rnk <= 3
ORDER BY n_name, rnk, p_type
"""


@register("star_rank_by_dim", STAR_RANK_BY_DIM_ORACLE)
def star_rank_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → broadcast dims → aggregate → top-3 window rank per nation
    (the TPC-DS q3/q70 ranking shape).  The window runs over the
    aggregate's dim-cardinality output, never over the fact."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("n_name", "p_type")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    w = W.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("p_type"))
    return (
        rev.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk", "p_type")
    )


STAR_SHARE_OF_TOTAL_ORACLE = """
WITH rev AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT r_name, n_name, revenue,
       ROUND(revenue / SUM(revenue) OVER (PARTITION BY r_name), 6) AS region_share,
       CAST(RANK() OVER (PARTITION BY r_name ORDER BY revenue DESC, n_name) AS BIGINT) AS rnk
FROM rev
ORDER BY r_name, rnk, n_name
"""


@register("star_share_of_total", STAR_SHARE_OF_TOTAL_ORACLE)
def star_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total within a dimension (the TPC-DS q70 RATIO_TO_REPORT
    shape): fact joined through shuffle (orders, customer — both
    fact-proportional, never hinted broadcast) and broadcast true dims
    (nation, region) into a (region, nation) aggregate; BOTH window
    functions (the share denominator and the rank) run over the
    dim-cardinality aggregate output partitioned the same way — one
    window exchange, never the fact."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w_share = W.partitionBy("r_name")
    w_rank = W.partitionBy("r_name").orderBy(F.col("revenue").desc(), F.col("n_name"))
    return (
        rev.withColumn("region_share", F.round(F.col("revenue") / F.sum("revenue").over(w_share), 6))
        .withColumn("rnk", F.rank().over(w_rank).cast("bigint"))
        .orderBy("r_name", "rnk", "n_name")
    )


STAR_MULTICHANNEL_CTE_ORACLE = """
WITH dim AS (
  SELECT n_nationkey, n_name, r_name
  FROM nation JOIN region ON n_regionkey = r_regionkey),
ch AS (
  SELECT 'lineitem' AS channel, o_custkey AS custkey,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4)) AS amount
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'orders' AS channel, o_custkey AS custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4)) AS amount
  FROM orders)
SELECT channel, r_name, n_name, COUNT(*) AS n_rows,
       CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS amount
FROM ch
JOIN customer ON custkey = c_custkey
JOIN dim ON c_nationkey = n_nationkey
GROUP BY channel, r_name, n_name
ORDER BY channel, r_name, n_name
"""


@register("star_multichannel_cte", STAR_MULTICHANNEL_CTE_ORACLE)
def star_multichannel_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-channel UNION-of-facts with a shared dimension CTE — the
    TPC-DS q14/q23 signature (store/catalog/web sales unioned, every
    channel joined to the same date/customer dims).  Channels here:
    lineitem net revenue and orders totalprice, tagged and UNION ALLed
    BEFORE the dim joins so the customer->nation->region chain and the
    final aggregate are planned once over the union (the shared-CTE
    discipline; Spark additionally reuses the orders scan across the
    two channels via exchange/subplan reuse).

    Scale: the union is fact-sized and flows through one shuffle join
    with customer (fact-proportional — never broadcast-hinted) and
    broadcast nation/region into a single (channel, region, nation)
    aggregate — one fact-sized exchange for the join, one
    pre-aggregated exchange for the groupBy, regardless of channel
    count."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    amount_li = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(30,4)")
    ch1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.lit("lineitem").alias("channel"),
            F.col("o_custkey").alias("custkey"),
            amount_li.alias("amount"),
        )
    )
    ch2 = o.select(
        F.lit("orders").alias("channel"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(30,4)").alias("amount"),
    )
    dim = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    return (
        ch1.unionAll(ch2)
        .join(c, F.col("custkey") == c.c_custkey)
        .join(F.broadcast(dim), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("channel", "r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount").cast("double").alias("amount"),
        )
        .orderBy("channel", "r_name", "n_name")
    )


STAR_CHANNEL_INTERSECT_ORACLE = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
  AND EXISTS (
        SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = c_custkey AND l_returnflag = 'R')
ORDER BY c_custkey
"""


@register("star_channel_intersect", STAR_CHANNEL_INTERSECT_ORACLE)
def star_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact EXISTS intersection — the TPC-DS q23a shape
    (customers appearing in BOTH the catalog and web channels).  Here:
    customers with at least one urgent order AND at least one returned
    line item.  Each EXISTS is a semi-join against a filtered,
    pre-distinct fact — the filters cut each fact before its shuffle,
    the per-channel DISTINCT collapses each side to at most one row per
    customer BEFORE the semi-join (candidate-proportional, no fact×fact
    blowup), and the two semi-joins chain on the same c_custkey key so
    the second reuses the first's partitioning."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return (
        c.join(urgent, c.c_custkey == urgent.custkey, "left_semi")
        .join(returned, c.c_custkey == returned.custkey, "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


STAR_DATE_OFFSET_COMPARE_ORACLE = """
WITH monthly AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), CAST(EXTRACT(month FROM o_orderdate) AS BIGINT))
SELECT cur.n_name, cur.o_year, cur.o_month,
       cur.revenue, prev.revenue AS prev_revenue,
       ROUND(cur.revenue / prev.revenue, 6) AS mom_ratio
FROM monthly cur
JOIN monthly prev
  ON cur.n_name = prev.n_name
 AND (cur.o_year * 12 + cur.o_month) = (prev.o_year * 12 + prev.o_month) + 1
ORDER BY cur.n_name, cur.o_year, cur.o_month
"""


@register("star_date_offset_compare", STAR_DATE_OFFSET_COMPARE_ORACLE)
def star_date_offset_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same aggregate joined to itself at two date offsets — the
    TPC-DS q39 shape (consecutive-month inventory statistics joined per
    item/warehouse).  Month-over-month revenue per nation: the fact is
    scanned and aggregated ONCE into a (nation, year, month) table; the
    consecutive-month comparison is a self-join of that dim-cardinality
    aggregate on a linearized month key — the offset join never touches
    fact rows, and Spark reuses the aggregate's exchange on both sides
    of the self-join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
    )
    cur = monthly.alias("cur")
    prev = monthly.alias("prev")
    key_cur = F.col("cur.o_year") * 12 + F.col("cur.o_month")
    key_prev = F.col("prev.o_year") * 12 + F.col("prev.o_month")
    return (
        cur.join(
            prev,
            (F.col("cur.n_name") == F.col("prev.n_name")) & (key_cur == key_prev + 1),
        )
        .select(
            F.col("cur.n_name").alias("n_name"),
            F.col("cur.o_year").alias("o_year"),
            F.col("cur.o_month").alias("o_month"),
            F.col("cur.revenue").alias("revenue"),
            F.col("prev.revenue").alias("prev_revenue"),
            F.round(F.col("cur.revenue") / F.col("prev.revenue"), 6).alias("mom_ratio"),
        )
        .orderBy("n_name", "o_year", "o_month")
    )


STAR_ROLLUP_WINDOW_ORACLE = """
WITH agg AS (
  SELECT r_name, n_name,
         CAST(grouping(n_name) AS BIGINT) AS g_nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), ROLLUP (n_name))
SELECT r_name, n_name, g_nation, o_year, revenue, rnk FROM (
  SELECT r_name, n_name, g_nation, o_year, revenue,
         CAST(RANK() OVER (PARTITION BY r_name, g_nation
                           ORDER BY revenue DESC, o_year, n_name NULLS FIRST) AS BIGINT) AS rnk
  FROM agg) t
WHERE rnk <= 3
ORDER BY r_name, g_nation, rnk, o_year, n_name NULLS FIRST
"""


@register("star_rollup_window", STAR_ROLLUP_WINDOW_ORACLE)
def star_rollup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank OVER a rollup's output — the TPC-DS q67 shape (rank
    items inside every rollup level of the sales cube).  The rollup is
    the one fact shuffle; the rank partitions by (region, grouping
    level) over the dim-cardinality rollup output, so the window
    exchange never carries fact rows, subtotal rows rank in their own
    partition, and detail rows in theirs."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
    )
    agg = (
        joined.rollup("r_name", "o_year", "n_name")
        .agg(
            F.grouping("n_name").cast("bigint").alias("g_nation"),
            F.grouping("r_name").cast("bigint").alias("__gr"),
            F.grouping("o_year").cast("bigint").alias("__gy"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
        # Spark's rollup(a, b, c) includes levels the SQL "GROUP BY a, b,
        # ROLLUP(c)" does not — keep only (a, b, c) and (a, b) levels
        .where((F.col("__gr") == 0) & (F.col("__gy") == 0))
    )
    w = W.partitionBy("r_name", "g_nation").orderBy(
        F.col("revenue").desc(), F.col("o_year"), F.col("n_name").asc_nulls_first()
    )
    return (
        agg.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("r_name", "n_name", "g_nation", "o_year", "revenue", "rnk")
        .orderBy(
            "r_name", "g_nation", "rnk", "o_year", F.col("n_name").asc_nulls_first()
        )
    )


STAR_CUMULATIVE_COMPARE_ORACLE = """
WITH a AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 12 + CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
b AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 12 + CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
ac AS (
  SELECT n_name, ym,
         CAST(SUM(rev) OVER (PARTITION BY n_name ORDER BY ym) AS DOUBLE) AS cum_ship
  FROM a),
bc AS (
  SELECT n_name, ym,
         CAST(SUM(rev) OVER (PARTITION BY n_name ORDER BY ym) AS DOUBLE) AS cum_book
  FROM b)
SELECT COALESCE(ac.n_name, bc.n_name) AS n_name,
       COALESCE(ac.ym, bc.ym) AS ym,
       ac.cum_ship, bc.cum_book,
       CASE WHEN ac.cum_ship IS NOT NULL AND bc.cum_book IS NOT NULL
                 AND ac.cum_ship > bc.cum_book
            THEN 1 ELSE 0 END AS ship_ahead
FROM ac FULL OUTER JOIN bc ON ac.n_name = bc.n_name AND ac.ym = bc.ym
ORDER BY n_name, ym
"""


@register("star_cumulative_compare", STAR_CUMULATIVE_COMPARE_ORACLE)
def star_cumulative_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two channels' cumulative series FULL OUTER joined — the TPC-DS
    q51 shape (web vs store cumulative sales compared per item/date).
    Channels: shipped lineitem revenue vs booked order totals, each
    aggregated to (nation, month), running-summed per nation (window
    over the dim-cardinality aggregate, decimal-exact so the cumsum is
    order-independent), then full-outer joined on (nation, month) to
    flag months where shipments run ahead of bookings.  Each fact is
    scanned and shuffled once; every window/join after that is
    aggregate-sized."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    ym = (F.year("o_orderdate").cast("bigint") * 12 + F.month("o_orderdate").cast("bigint")).alias("ym")
    a = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", ym)
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("decimal(30,4)")
            ).alias("rev")
        )
    )
    b = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", ym)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(30,4)")).alias("rev"))
    )
    wcum = W.partitionBy("n_name").orderBy("ym")
    ac = a.select(
        F.col("n_name").alias("a_n"), F.col("ym").alias("a_ym"),
        F.sum("rev").over(W.partitionBy("n_name").orderBy("ym")).cast("double").alias("cum_ship"),
    )
    bc = b.select(
        F.col("n_name").alias("b_n"), F.col("ym").alias("b_ym"),
        F.sum("rev").over(wcum).cast("double").alias("cum_book"),
    )
    return (
        ac.join(bc, (ac.a_n == bc.b_n) & (ac.a_ym == bc.b_ym), "full_outer")
        .select(
            F.coalesce("a_n", "b_n").alias("n_name"),
            F.coalesce("a_ym", "b_ym").alias("ym"),
            "cum_ship",
            "cum_book",
            F.when(
                F.col("cum_ship").isNotNull()
                & F.col("cum_book").isNotNull()
                & (F.col("cum_ship") > F.col("cum_book")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("ship_ahead"),
        )
        .orderBy("n_name", "ym")
    )


STAR_CHANNEL_BUCKETS_ORACLE = """
SELECT
  CAST(SUM(CASE WHEN l_quantity <= 10 AND l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
  CAST(SUM(CASE WHEN l_quantity <= 10 AND l_discount >  0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
  CAST(SUM(CASE WHEN l_quantity > 10 AND l_quantity <= 20 AND l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
  CAST(SUM(CASE WHEN l_quantity > 10 AND l_quantity <= 20 AND l_discount >  0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
  CAST(SUM(CASE WHEN l_quantity > 20 AND l_quantity <= 35 AND l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b5,
  CAST(SUM(CASE WHEN l_quantity > 20 AND l_quantity <= 35 AND l_discount >  0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b6,
  CAST(SUM(CASE WHEN l_quantity > 35 AND l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b7,
  CAST(SUM(CASE WHEN l_quantity > 35 AND l_discount >  0.05 THEN 1 ELSE 0 END) AS BIGINT) AS b8
FROM lineitem
WHERE l_returnflag IN ('N', 'R')
"""


@register("star_channel_buckets", STAR_CHANNEL_BUCKETS_ORACLE)
def star_channel_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 signature: eight independent bucket counts that a
    naive plan evaluates as eight scalar subqueries — eight scans of the
    fact — fused into ONE scan with conditional aggregation (the fusion
    IS the query's point; tests/test_plans.py pins the single scan).
    Reference bar: TpcdsTestProgram.java:76-86 includes q88's 8-way
    time-slot count matrix.

    Scale: one fact scan, all eight counts partial-aggregated map-side
    into a single 1-row exchange — at 100 TB this is scan-bound with no
    skew surface at all (no keys)."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("N", "R")
    )
    q, d = F.col("l_quantity"), F.col("l_discount")
    lo_d, hi_d = d <= 0.05, d > 0.05
    bands = [
        (q <= 10) & lo_d,
        (q <= 10) & hi_d,
        (q > 10) & (q <= 20) & lo_d,
        (q > 10) & (q <= 20) & hi_d,
        (q > 20) & (q <= 35) & lo_d,
        (q > 20) & (q <= 35) & hi_d,
        (q > 35) & lo_d,
        (q > 35) & hi_d,
    ]
    return li.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"b{i + 1}")
            for i, cond in enumerate(bands)
        ]
    )


STAR_YOY_CUSTOMER_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'fast' ELSE 'slow' END AS channel,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3),
pv AS (
  SELECT o_custkey,
         MAX(CASE WHEN channel = 'fast' AND yr = 1995 THEN total END) AS fast1,
         MAX(CASE WHEN channel = 'fast' AND yr = 1996 THEN total END) AS fast2,
         MAX(CASE WHEN channel = 'slow' AND yr = 1995 THEN total END) AS slow1,
         MAX(CASE WHEN channel = 'slow' AND yr = 1996 THEN total END) AS slow2
  FROM per GROUP BY o_custkey)
SELECT p.o_custkey AS custkey, c_name,
       CAST(fast1 AS DOUBLE) AS fast1, CAST(fast2 AS DOUBLE) AS fast2,
       CAST(slow1 AS DOUBLE) AS slow1, CAST(slow2 AS DOUBLE) AS slow2
FROM pv p JOIN customer ON p.o_custkey = c_custkey
WHERE fast1 IS NOT NULL AND fast2 IS NOT NULL
  AND slow1 IS NOT NULL AND slow2 IS NOT NULL
  AND fast2 * slow1 > fast1 * slow2
ORDER BY custkey
"""


@register("star_yoy_customer", STAR_YOY_CUSTOMER_ORACLE)
def star_yoy_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74/q11 signature: per-customer year-over-year totals in
    two channels, keeping customers whose growth ratio in the fast
    channel beats the slow channel.  The ratio compare is cross-
    multiplied in DECIMAL (fast2/fast1 > slow2/slow1 with positive
    denominators ⇔ fast2*slow1 > fast1*slow2) so the predicate is exact
    in both engines — no float-boundary rows.

    Scale: one fact scan → one (custkey, yr, channel) partial-agg
    shuffle, pivoted to one row per customer by a second custkey-keyed
    agg that AQE coalesces with the customer join's shuffle; no window
    over the fact, no self-join of the fact (q74's naive form is a
    4-way self-join)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    per = (
        o.where(F.year("o_orderdate").isin(1995, 1996))
        .withColumn("yr", F.year("o_orderdate").cast("bigint"))
        .withColumn(
            "channel",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "fast"
            ).otherwise("slow"),
        )
        .groupBy("o_custkey", "yr", "channel")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
    )
    pick = lambda ch, yr: F.max(  # noqa: E731
        F.when((F.col("channel") == ch) & (F.col("yr") == yr), F.col("total"))
    )
    pv = per.groupBy("o_custkey").agg(
        pick("fast", 1995).alias("fast1"),
        pick("fast", 1996).alias("fast2"),
        pick("slow", 1995).alias("slow1"),
        pick("slow", 1996).alias("slow2"),
    )
    return (
        pv.where(
            F.col("fast1").isNotNull()
            & F.col("fast2").isNotNull()
            & F.col("slow1").isNotNull()
            & F.col("slow2").isNotNull()
            & (F.col("fast2") * F.col("slow1") > F.col("fast1") * F.col("slow2"))
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            "c_name",
            F.col("fast1").cast("double").alias("fast1"),
            F.col("fast2").cast("double").alias("fast2"),
            F.col("slow1").cast("double").alias("slow1"),
            F.col("slow2").cast("double").alias("slow2"),
        )
        .orderBy("custkey")
    )


STAR_MONTHLY_DEVIATION_ORACLE = """
WITH monthly AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mth,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
         COUNT(*) AS n_items
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2, 3),
w AS (
  SELECT n_name, yr, mth, rev, n_items,
         SUM(rev) OVER (PARTITION BY n_name, yr) AS yr_total,
         CAST(COUNT(*) OVER (PARTITION BY n_name, yr) AS BIGINT) AS yr_months,
         LAG(rev)  OVER (PARTITION BY n_name ORDER BY yr, mth) AS prev_rev,
         LEAD(rev) OVER (PARTITION BY n_name ORDER BY yr, mth) AS next_rev
  FROM monthly)
SELECT n_name, yr, mth,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(yr_total AS DOUBLE) / yr_months, 6) AS yr_avg,
       CAST(prev_rev AS DOUBLE) AS prev_rev,
       CAST(next_rev AS DOUBLE) AS next_rev
FROM w
WHERE ABS(rev * yr_months - yr_total) > CAST(0.2 AS DECIMAL(3,1)) * yr_total
ORDER BY n_name, yr, mth
"""


@register("star_monthly_deviation", STAR_MONTHLY_DEVIATION_ORACLE)
def star_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47/q57 signature: a dim-grouped monthly time series with
    a same-year average window, LAG/LEAD neighbors, and a deviation
    filter (months >20% off their year's mean).  The deviation predicate
    is kept in exact decimal arithmetic — |rev*months − total| >
    0.2*total avoids dividing (both engines agree bit-for-bit), and the
    displayed yr_avg is derived once, as double, for output only.

    Scale: the windows run over the (nation × month) AGGREGATE (tiny),
    never over the fact — the fact contributes exactly one shuffle into
    the monthly rollup; nation broadcasts; orders/customer shuffle
    (fact-proportional, see module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mth"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    yr_w = W.partitionBy("n_name", "yr")
    seq_w = W.partitionBy("n_name").orderBy("yr", "mth")
    w = monthly.select(
        "n_name",
        "yr",
        "mth",
        "rev",
        "n_items",
        F.sum("rev").over(yr_w).alias("yr_total"),
        F.count(F.lit(1)).over(yr_w).cast("bigint").alias("yr_months"),
        F.lag("rev").over(seq_w).alias("prev_rev"),
        F.lead("rev").over(seq_w).alias("next_rev"),
    )
    return (
        w.where(
            F.abs(F.col("rev") * F.col("yr_months") - F.col("yr_total"))
            > F.lit(0.2).cast("decimal(3,1)") * F.col("yr_total")
        )
        .select(
            "n_name",
            "yr",
            "mth",
            F.col("rev").cast("double").alias("revenue"),
            F.round(F.col("yr_total").cast("double") / F.col("yr_months"), 6).alias(
                "yr_avg"
            ),
            F.col("prev_rev").cast("double").alias("prev_rev"),
            F.col("next_rev").cast("double").alias("next_rev"),
        )
        .orderBy("n_name", "yr", "mth")
    )


# --- wave 5: q93 returns-adjustment, q54 first-purchase cohort, q10/q35
# multi-EXISTS customer profile ------------------------------------------------

STAR_RETURNS_NET_ORACLE = """
WITH returns AS (
  SELECT l_orderkey, l_linenumber, l_quantity AS r_qty
  FROM lineitem WHERE l_returnflag = 'R'),
net AS (
  SELECT o_custkey,
         CAST(l_quantity AS DECIMAL(18,2)) - COALESCE(CAST(r.r_qty AS DECIMAL(18,2)), 0) AS net_qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS gross
  FROM lineitem l
  LEFT JOIN returns r USING (l_orderkey, l_linenumber)
  JOIN orders ON l_orderkey = o_orderkey)
SELECT o_custkey AS custkey,
       CAST(CAST(SUM(net_qty) AS VARCHAR) AS DOUBLE) AS net_quantity,
       CAST(CAST(SUM(CASE WHEN net_qty > 0 THEN gross ELSE 0 END) AS VARCHAR) AS DOUBLE) AS kept_revenue
FROM net GROUP BY o_custkey
ORDER BY kept_revenue DESC, custkey LIMIT 20
"""


@register("star_returns_net", STAR_RETURNS_NET_ORACLE)
def star_returns_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 signature: the sales fact LEFT-joined against a
    returns fact (here the 'R'-flagged subset of lineitem) on the
    composite line key, quantities netted before aggregation.  This is
    the fact-to-fact join shape — both sides fact-proportional, so it
    must sort-merge on the composite key, never broadcast — followed by
    one customer-keyed aggregate and a top-k."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    returns = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("r_qty")
    )
    net = (
        li.join(returns, ["l_orderkey", "l_linenumber"], "left")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_custkey",
            (
                F.col("l_quantity").cast("decimal(18,2)")
                - F.coalesce(F.col("r_qty").cast("decimal(18,2)"), F.lit(0))
            ).alias("net_qty"),
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("gross"),
        )
    )
    return (
        net.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum("net_qty").cast("double").alias("net_quantity"),
            F.sum(F.when(F.col("net_qty") > 0, F.col("gross")).otherwise(F.lit(0)))
            .cast("double")
            .alias("kept_revenue"),
        )
        .orderBy(F.col("kept_revenue").desc(), "custkey")
        .limit(20)
    )


STAR_COHORT_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders GROUP BY o_custkey),
cohort AS (
  SELECT o_custkey, CAST(EXTRACT(month FROM first_dt) AS BIGINT) AS cohort_month
  FROM firsts WHERE EXTRACT(year FROM first_dt) = 1995)
SELECT cohort_month, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders o JOIN cohort c ON o.o_custkey = c.o_custkey
GROUP BY cohort_month, o_year
ORDER BY cohort_month, o_year
"""


@register("star_first_purchase_cohort", STAR_COHORT_ORACLE)
def star_first_purchase_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 signature: an aggregate DERIVES a dimension (each
    customer's first-purchase month), which then joins back onto the
    same fact to lay out lifetime revenue by acquisition cohort.  The
    first-purchase aggregate and the back-join share the o_custkey
    partitioning, so the plan is two fact-keyed exchanges total and the
    cohort table (customer-sized) joins without touching lineitem."""
    o = load(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    cohort = firsts.where(F.year("first_dt") == 1995).select(
        "o_custkey", F.month("first_dt").cast("bigint").alias("cohort_month")
    )
    return (
        o.join(cohort, "o_custkey")
        .groupBy("cohort_month", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .orderBy("cohort_month", "o_year")
    )


STAR_MULTI_EXISTS_ORACLE = """
SELECT n_name, COUNT(*) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND EXTRACT(year FROM o_orderdate) = 1996)
  AND (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderpriority = '1-URGENT')
       OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 400000))
GROUP BY n_name ORDER BY n_name
"""


@register("star_multi_exists_profile", STAR_MULTI_EXISTS_ORACLE)
def star_multi_exists_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10/q35 signature: a dimension row qualifies through a
    CONJUNCTION of correlated EXISTS over the fact (active in 1996 AND
    (ever urgent OR ever high-value)).  Each EXISTS becomes a semi-join
    against a filtered fact projection; the OR of two EXISTS unions the
    two key sets (distinct) before the final semi-join, so the fact is
    never joined wide — only distinct key sets flow."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    active96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.where(F.col("o_totalprice") > 400000).select("o_custkey")
    either = urgent.unionByName(high).distinct()
    qual = (
        c.join(active96, c.c_custkey == active96.o_custkey, "semi")
        .join(either, c.c_custkey == either.o_custkey, "semi")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        qual.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_acctbal"),
        )
        .orderBy("n_name")
    )


STAR_RETURN_REBUY_ORACLE = """
WITH sales AS (
  SELECT l_partkey, o_custkey, o_orderdate,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS net
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
returned AS (
  SELECT DISTINCT l_partkey, o_custkey, o_orderdate AS ret_date
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R')
SELECT r.o_custkey AS custkey, r.l_partkey AS partkey,
       COUNT(*) AS n_rebuys,
       CAST(CAST(SUM(s.net) AS VARCHAR) AS DOUBLE) AS rebuy_revenue
FROM returned r
JOIN sales s ON s.l_partkey = r.l_partkey AND s.o_custkey = r.o_custkey
            AND s.o_orderdate > r.ret_date
GROUP BY r.o_custkey, r.l_partkey
ORDER BY rebuy_revenue DESC, custkey, partkey LIMIT 20
"""


@register("star_return_rebuy", STAR_RETURN_REBUY_ORACLE)
def star_return_rebuy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17/q29 signature: THREE instances of the fact in one
    plan — items returned (fact #1 filtered) matched against the same
    customer's LATER purchases of the same part (fact #2), both sides
    first resolved through orders (fact #3's role).  The join is equi on
    (partkey, custkey) with the date inequality layered on top, so it
    shuffles once per side on the composite key and the non-equi
    predicate filters inside the join — never a nested loop over
    facts."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    sales = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_partkey",
        "o_custkey",
        "o_orderdate",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("net"),
    )
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("l_partkey", "o_custkey", F.col("o_orderdate").alias("ret_date"))
        .distinct()
    )
    j = returned.join(
        sales.withColumnRenamed("l_partkey", "p2").withColumnRenamed("o_custkey", "c2"),
        (F.col("l_partkey") == F.col("p2"))
        & (F.col("o_custkey") == F.col("c2"))
        & (F.col("o_orderdate") > F.col("ret_date")),
    )
    return (
        j.groupBy(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("n_rebuys"),
            F.sum("net").cast("double").alias("rebuy_revenue"),
        )
        .orderBy(F.col("rebuy_revenue").desc(), "custkey", "partkey")
        .limit(20)
    )


STAR_GROWTH_COMPARE_ORACLE = """
WITH rev AS (
  SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
  GROUP BY n_name, yr)
SELECT a.n_name,
       CAST(a.revenue AS DOUBLE) AS rev_1996,
       CAST(b.revenue AS DOUBLE) AS rev_1997,
       CAST(CASE WHEN b.revenue * 10 > a.revenue * 11 THEN 1 ELSE 0 END AS INTEGER) AS grew_10pct
FROM rev a JOIN rev b ON a.n_name = b.n_name AND a.yr = 1996 AND b.yr = 1997
ORDER BY a.n_name
"""


@register("star_growth_compare", STAR_GROWTH_COMPARE_ORACLE)
def star_growth_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 signature: the same dimension-grouped aggregate joined
    to itself at two periods with a GROWTH-RATIO predicate — evaluated
    by exact-decimal cross-multiplication (b*10 > a*11 is '>10% growth')
    so no division touches the compare.  One fact aggregate, dim-sized
    self-join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(30,2)").alias("revenue"))
    )
    a = rev.where(F.col("yr") == 1996).select("n_name", F.col("revenue").alias("ra"))
    b = rev.where(F.col("yr") == 1997).select("n_name", F.col("revenue").alias("rb"))
    return (
        a.join(b, "n_name")
        .select(
            "n_name",
            F.col("ra").cast("double").alias("rev_1996"),
            F.col("rb").cast("double").alias("rev_1997"),
            F.when(F.col("rb") * 10 > F.col("ra") * 11, 1).otherwise(0).cast("int").alias("grew_10pct"),
        )
        .orderBy("n_name")
    )


STAR_WEEKLY_COMPARE_ORACLE = """
WITH wk AS (
  SELECT o_orderpriority AS channel,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS wk,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2, 3)
SELECT a.channel, a.wk,
       a.revenue AS rev_1996, b.revenue AS rev_1997,
       ROUND(b.revenue - a.revenue, 2) AS delta
FROM wk a JOIN wk b ON a.channel = b.channel AND a.wk = b.wk
                   AND a.yr = 1996 AND b.yr = 1997
ORDER BY a.channel, a.wk
"""


@register("star_weekly_compare", STAR_WEEKLY_COMPARE_ORACLE)
def star_weekly_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 signature: per-channel weekly revenue series joined to
    itself one year apart (same ISO week), reporting the year-over-year
    delta per (channel, week).  One fact aggregate; the self-join runs
    over the (channel, year, week)-sized output."""
    o = load(spark, sf_dir, "orders")
    wk = (
        o.where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.col("o_orderpriority").alias("channel"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.weekofyear("o_orderdate").cast("bigint").alias("wk"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
    )
    a = wk.where(F.col("yr") == 1996).select("channel", "wk", F.col("revenue").alias("rev_1996"))
    b = wk.where(F.col("yr") == 1997).select("channel", "wk", F.col("revenue").alias("rev_1997"))
    return (
        a.join(b, ["channel", "wk"])
        .select(
            "channel",
            "wk",
            "rev_1996",
            "rev_1997",
            F.round(F.col("rev_1997") - F.col("rev_1996"), 2).alias("delta"),
        )
        .orderBy("channel", "wk")
    )


STAR_RETURN_RATE_RANK_ORACLE = """
WITH base AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedited'
              ELSE 'standard' END AS channel,
         l_partkey,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DECIMAL(30,2)) AS ret_qty,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS tot_qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >= 100),
ranked AS (
  SELECT channel, l_partkey AS partkey,
         ROUND(CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE), 6) AS return_rate,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY channel
           ORDER BY CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) DESC, l_partkey
         ) AS BIGINT) AS rnk
  FROM base)
SELECT channel, partkey, return_rate, rnk
FROM ranked WHERE rnk <= 10
ORDER BY channel, rnk
"""


@register("star_return_rate_rank", STAR_RETURN_RATE_RANK_ORACLE)
def star_return_rate_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 signature: per-channel worst-return-rate ranking — the
    fact is aggregated once per (channel, item) with a volume floor,
    rates computed as one IEEE division of exact decimals, and each
    channel's top-10 ranked independently.  The window runs over the
    aggregate's dim-sized output, never fact rows."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    channel = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedited"
    ).otherwise("standard")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(channel.alias("channel"), "l_partkey")
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R", F.col("l_quantity").cast("decimal(18,2)")
                ).otherwise(F.lit(0))
            )
            .cast("decimal(30,2)")
            .alias("ret_qty"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(30,2)").alias("tot_qty"),
        )
        .where(F.col("tot_qty") >= 100)
    )
    rate = F.col("ret_qty").cast("double") / F.col("tot_qty").cast("double")
    w = W.partitionBy("channel").orderBy(rate.desc(), "l_partkey")
    return (
        base.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 10)
        .select(
            "channel",
            F.col("l_partkey").alias("partkey"),
            F.round(rate, 6).alias("return_rate"),
            "rnk",
        )
        .orderBy("channel", "rnk")
    )


STAR_RFM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_order,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey,
         CAST(NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT) AS r,
         CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f,
         CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m
  FROM cust)
SELECT r, f, m, COUNT(*) AS n_customers
FROM scored GROUP BY r, f, m ORDER BY r, f, m
"""


@register("star_rfm_segments", STAR_RFM_ORACLE)
def star_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing layout: per-customer
    recency/frequency/monetary quintiles (rank-based NTILE with
    deterministic custkey tiebreaks so both engines cut identically),
    reported as segment-cell counts.  One customer-keyed fact aggregate;
    the quintiles come from three ``ntile_exact`` passes (range
    partition + offset cumsum, operators/rank.py) — bit-identical to
    the oracle's NTILE but with no single-partition window, so the
    customer table never funnels through one task at any scale."""
    from incubator_flink_spark.operators.rank import ntile_exact

    o = load(spark, sf_dir, "orders")
    # pin the customer aggregate: the first ntile_exact's range
    # partitioner SAMPLES its input (one job) before shuffling it
    # (another), so without the pin the orders aggregation executed
    # twice (guide §5 persist-when-reused)
    cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(30,2)").alias("monetary"),
    ).localCheckpoint(eager=True)
    scored = cust
    for col, key in (("r", "last_order"), ("f", "frequency"), ("m", "monetary")):
        scored = ntile_exact(scored, [F.col(key).desc(), "o_custkey"], 5, col)
    scored = scored.select("r", "f", "m")
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r", "f", "m")
    )


STAR_BASKET_RULES_ORACLE = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
c1 AS (SELECT l_partkey, COUNT(*) AS c1 FROM items GROUP BY 1),
c12 AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons, COUNT(*) AS c12
  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT ante, cons, c12 AS pair_orders,
       ROUND(CAST(c12 AS DOUBLE) / n.n_orders, 6) AS support,
       ROUND(CAST(c12 AS DOUBLE) / a1.c1, 6) AS confidence,
       ROUND((CAST(c12 AS DOUBLE) * n.n_orders) / (CAST(a1.c1 AS DOUBLE) * a2.c1), 6) AS lift
FROM c12 JOIN c1 a1 ON a1.l_partkey = c12.ante
         JOIN c1 a2 ON a2.l_partkey = c12.cons, n
ORDER BY lift DESC, ante, cons LIMIT 25
"""


@register("star_basket_rules", STAR_BASKET_RULES_ORACLE)
def star_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (public: Agrawal & Srikant 1994,
    one-level): directed part pairs co-bought in >= 3 orders with
    support / confidence / lift, top-25 by lift.  The pair join is
    order-keyed (candidates ~ basket-size² per order, never parts²);
    marginals and the order count broadcast back onto the
    pair-cardinality table."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    c1 = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c1"))
    a = items.withColumnRenamed("l_partkey", "ante")
    b = items.withColumnRenamed("l_partkey", "cons")
    c12 = (
        a.join(b, "l_orderkey")
        .where(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .where(F.col("pair_orders") >= 3)
    )
    j = (
        c12.join(F.broadcast(c1.withColumnRenamed("l_partkey", "ante").withColumnRenamed("c1", "ca")), "ante")
        .join(F.broadcast(c1.withColumnRenamed("l_partkey", "cons").withColumnRenamed("c1", "cc")), "cons")
        .crossJoin(F.broadcast(n))
    )
    return (
        j.select(
            "ante",
            "cons",
            "pair_orders",
            F.round(F.col("pair_orders").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("pair_orders").cast("double") / F.col("ca"), 6).alias("confidence"),
            F.round(
                (F.col("pair_orders").cast("double") * F.col("n_orders"))
                / (F.col("ca").cast("double") * F.col("cc")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "ante", "cons")
        .limit(25)
    )


# --- wave 6 (round 5): q64 chained two-date fact join, q78 channel-minus-
# returns ratio, q80 three-channel returns-netted rollup ----------------------

STAR_REPEAT_PURCHASE_ORACLE = """
WITH leg95 AS (
  SELECT o_custkey AS custkey, l_partkey AS partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(30,4)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE EXTRACT(year FROM o_orderdate) = 1995
  GROUP BY 1, 2),
leg96 AS (
  SELECT o_custkey AS custkey, l_partkey AS partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(30,4)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE EXTRACT(year FROM o_orderdate) = 1996
  GROUP BY 1, 2)
SELECT p_brand, COUNT(*) AS n_repeat_pairs,
       CAST(CAST(SUM(a.qty) AS VARCHAR) AS DOUBLE) AS qty_1995,
       CAST(CAST(SUM(b.qty) AS VARCHAR) AS DOUBLE) AS qty_1996,
       CAST(CAST(SUM(a.rev) AS VARCHAR) AS DOUBLE) AS rev_1995,
       CAST(CAST(SUM(b.rev) AS VARCHAR) AS DOUBLE) AS rev_1996
FROM leg95 a
JOIN leg96 b ON a.custkey = b.custkey AND a.partkey = b.partkey
JOIN part ON p_partkey = a.partkey
GROUP BY p_brand ORDER BY p_brand
"""


@register("star_repeat_purchase_chain", STAR_REPEAT_PURCHASE_ORACLE)
def star_repeat_purchase_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 signature: the SAME fact→fact→dim chain instantiated
    at two dates and joined on the (customer, item) pair — customers who
    bought a part in 1995 and bought it AGAIN in 1996, rolled up to the
    brand with both years' quantity and revenue side by side.

    Scale: each leg is one (custkey, partkey) pre-aggregate (partial agg
    rides the lineitem⋈orders shuffle, year filter pushed to both
    scans), so the chained self-join runs over two pair-cardinality
    aggregates — never raw fact against raw fact; part is a true dim
    and broadcasts onto the joined pairs."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )

    def leg(yr: int) -> DataFrame:
        return (
            li.join(o.where(F.year("o_orderdate") == yr), li.l_orderkey == o.o_orderkey)
            .groupBy(
                F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey")
            )
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(30,2)").alias("qty"),
                F.sum(rev).cast("decimal(30,4)").alias("rev"),
            )
        )

    a = leg(1995)
    b = leg(1996).withColumnsRenamed({"qty": "qty_b", "rev": "rev_b"})
    return (
        a.join(b, ["custkey", "partkey"])
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_repeat_pairs"),
            F.sum("qty").cast("double").alias("qty_1995"),
            F.sum("qty_b").cast("double").alias("qty_1996"),
            F.sum("rev").cast("double").alias("rev_1995"),
            F.sum("rev_b").cast("double").alias("rev_1996"),
        )
        .orderBy("p_brand")
    )


STAR_CHANNEL_EXCLUSIVE_ORACLE = """
WITH returns AS (
  SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'),
kept AS (
  SELECT l.l_orderkey, l.l_extendedprice, l.l_discount
  FROM lineitem l LEFT JOIN returns r USING (l_orderkey, l_linenumber)
  WHERE r.l_orderkey IS NULL),
ch AS (
  SELECT o_custkey AS custkey,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'fast' ELSE 'slow' END AS channel,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(30,4)) AS rev
  FROM kept JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2)
SELECT f.custkey,
       CAST(CAST(f.rev AS VARCHAR) AS DOUBLE) AS fast_rev,
       CAST(CAST(s.rev AS VARCHAR) AS DOUBLE) AS slow_rev,
       ROUND(CAST(CAST(f.rev AS VARCHAR) AS DOUBLE) / CAST(CAST(s.rev AS VARCHAR) AS DOUBLE), 6) AS ratio
FROM ch f JOIN ch s ON f.custkey = s.custkey
WHERE f.channel = 'fast' AND s.channel = 'slow' AND s.rev > 0
ORDER BY ratio DESC, f.custkey LIMIT 25
"""


@register("star_channel_exclusive", STAR_CHANNEL_EXCLUSIVE_ORACLE)
def star_channel_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 signature: sales with their returns EXCLUDED (the
    LEFT-JOIN-returns-IS-NULL pattern — planned as an anti join on the
    composite line key), aggregated per customer per channel, and the
    two channels ratio-compared per customer (q78's store-vs-web ratio
    rank).  Top-25 by fast/slow ratio.

    Scale: the anti join is the only fact-fact exchange; both channel
    aggregates come out of ONE (custkey, channel) shuffle, and the
    channel self-join runs on the customer-sized aggregate."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    returns = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_linenumber")
    kept = li.join(returns, ["l_orderkey", "l_linenumber"], "left_anti")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    ch = (
        kept.join(o, kept.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "fast")
            .otherwise("slow")
            .alias("channel"),
        )
        .agg(F.sum(rev).cast("decimal(30,4)").alias("rev"))
    )
    f = ch.where(F.col("channel") == "fast").select("custkey", F.col("rev").alias("frev"))
    s = ch.where((F.col("channel") == "slow") & (F.col("rev") > 0)).select(
        "custkey", F.col("rev").alias("srev")
    )
    return (
        f.join(s, "custkey")
        .select(
            "custkey",
            F.col("frev").cast("double").alias("fast_rev"),
            F.col("srev").cast("double").alias("slow_rev"),
            F.round(F.col("frev").cast("double") / F.col("srev").cast("double"), 6).alias("ratio"),
        )
        .orderBy(F.col("ratio").desc(), "custkey")
        .limit(25)
    )


STAR_CHANNEL_RETURNS_ROLLUP_ORACLE = """
WITH returns AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS r_amt
  FROM lineitem WHERE l_returnflag = 'R'),
legs AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'web'
              WHEN o_orderpriority = '2-HIGH' THEN 'catalog'
              ELSE 'store' END AS channel,
         l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS gross,
         COALESCE(r.r_amt, 0) AS returned
  FROM lineitem l
  LEFT JOIN returns r USING (l_orderkey, l_linenumber)
  JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT channel, p_brand,
       CAST(grouping(channel) AS BIGINT) AS g_channel,
       CAST(grouping(p_brand) AS BIGINT) AS g_brand,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(gross) AS VARCHAR) AS DOUBLE) AS gross_sales,
       CAST(CAST(SUM(returned) AS VARCHAR) AS DOUBLE) AS returns_amt,
       CAST(CAST(SUM(gross - returned) AS VARCHAR) AS DOUBLE) AS net_sales
FROM legs JOIN part ON p_partkey = l_partkey
GROUP BY ROLLUP (channel, p_brand)
ORDER BY g_channel, g_brand, channel NULLS FIRST, p_brand NULLS FIRST
"""


@register("star_channel_returns_rollup", STAR_CHANNEL_RETURNS_ROLLUP_ORACLE)
def star_channel_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q80 signature: three channel legs (priority-derived
    web/catalog/store — disjoint filters pushed to each leg's scan),
    each netted against its returns, UNION ALLed into a
    ROLLUP(channel, brand) with gross / returned / net and GROUPING
    markers.

    Scale: the legs union BEFORE the shared returns join, so there is
    ONE fact-fact exchange on the composite line key regardless of
    channel count (in real TPC-DS each channel joins its own returns
    fact — the same plan replicated per leg); part broadcasts, and the
    rollup is one Expand→partial-agg exchange."""
    from incubator_flink_spark.catalog import spread

    # spread the fact scan (4 consumers: 3 channel legs + returns): the
    # single-row-group parquet read serializes every leg's broadcast-join
    # pipeline on one core (measured 2.6s -> 1.7s; guide §2.5)
    li = spread(load(spark, sf_dir, "lineitem"))
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    amt = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    returns = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", amt.alias("r_amt")
    )

    def channel_leg(name: str, pred) -> DataFrame:
        return li.join(o.where(pred), li.l_orderkey == o.o_orderkey).select(
            F.lit(name).alias("channel"),
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            amt.alias("gross"),
        )

    legs = (
        channel_leg("web", F.col("o_orderpriority") == "1-URGENT")
        .unionAll(channel_leg("catalog", F.col("o_orderpriority") == "2-HIGH"))
        .unionAll(
            channel_leg("store", ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        )
    )
    netted = (
        legs.join(returns, ["l_orderkey", "l_linenumber"], "left")
        .withColumn("returned", F.coalesce(F.col("r_amt"), F.lit(0).cast("decimal(18,2)")))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    )
    return (
        netted.rollup("channel", "p_brand")
        .agg(
            F.grouping("channel").cast("bigint").alias("g_channel"),
            F.grouping("p_brand").cast("bigint").alias("g_brand"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("gross").cast("double").alias("gross_sales"),
            F.sum("returned").cast("double").alias("returns_amt"),
            F.sum(F.col("gross") - F.col("returned")).cast("double").alias("net_sales"),
        )
        .orderBy("g_channel", "g_brand", F.col("channel").asc_nulls_first(), F.col("p_brand").asc_nulls_first())
    )


# --- TPC-DS q95 shape: two-hop EXISTS chain ------------------------------------

STAR_TWO_HOP_EXISTS_ORACLE = """
WITH multi AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2),
ret AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
SELECT COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND o_orderkey IN (SELECT l_orderkey FROM multi)
  AND o_orderkey NOT IN (SELECT l_orderkey FROM ret)
"""


@register("star_two_hop_exists", STAR_TWO_HOP_EXISTS_ORACLE)
def star_two_hop_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 signature (TpcdsTestProgram.java:76-86): orders shipped
    from >= 2 distinct suppliers (q95's ws_wh self-join EXISTS — rewritten
    to the equivalent one-shuffle COUNT(DISTINCT) HAVING, which is how the
    two-hop subquery should execute at scale) that were never returned
    (NOT EXISTS -> anti join), over a one-year window.  Plan: one
    orderkey-grain aggregate on the fact + semi + anti join, all sharing
    the orderkey partitioning; no nested loop, 1-row output."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    ret = li.where(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    sel = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    kept = sel.join(
        multi, sel["o_orderkey"] == multi["l_orderkey"], "left_semi"
    ).join(ret, sel["o_orderkey"] == ret["l_orderkey"], "left_anti")
    return kept.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast("double").alias("total_price"),
    )


# --- wave 7 (round 6): q72 inventory-shortage week chain, q75 three-channel
# year-over-year decline -------------------------------------------------------

STAR_SHORTAGE_WEEKS_ORACLE = """
WITH s AS (
  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS sd, l_quantity AS sq
  FROM lineitem),
r AS (
  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS rd, l_quantity AS rq
  FROM lineitem),
pairs AS (
  SELECT s.pk,
         CAST(FLOOR(DATE_DIFF('day', DATE '1992-01-01', s.sd) / 7) AS BIGINT) AS wk,
         s.sd
  FROM s JOIN r ON s.pk = r.pk
   AND r.rd >= s.sd + INTERVAL 1 DAY AND r.rd <= s.sd + INTERVAL 5 DAY
   AND r.rq < s.sq)
SELECT p_brand, wk,
       CAST(SUM(CASE WHEN p_size <= 5 THEN 0 ELSE 1 END) AS BIGINT) AS no_promo,
       CAST(SUM(CASE WHEN p_size <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS promo,
       COUNT(*) AS total_cnt
FROM pairs JOIN part ON p_partkey = pk
GROUP BY p_brand, wk
ORDER BY total_cnt DESC, p_brand, wk LIMIT 50
"""


@register("star_shortage_weeks", STAR_SHORTAGE_WEEKS_ORACLE)
def star_shortage_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 signature (TpcdsTestProgram.java:76-86): the fact
    joined against a second fact-grain table on item + a FORWARD date
    window (q72's catalog_sales x inventory "is there stock in the week
    after the sale" probe), with an inequality shortage condition
    (inv_quantity_on_hand < cs_quantity -> restock qty < sale qty), a
    LEFT promotion join whose NULL side is counted separately, and a
    (brand, week) count rollup — the reference's hardest join-order
    case.

    Scale: the date-RANGE join is rewritten as a candidate-proportional
    EQUI join — the <=5-day forward window spans at most two 7-day
    buckets, so the probe side explodes to <=2 (partkey, week-bucket)
    keys and the join runs on that composite key with the exact date +
    quantity predicates as residual filters.  Never a broadcast NLJ
    range join: key cardinality (part x week) grows with the fact, so
    the shuffle stays fine-grained and skew-free; part (true dim)
    broadcasts for brand and the promo flag."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    epoch = F.lit("1992-01-01").cast("date")
    s = li.select(
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").cast("date").alias("sd"),
        F.col("l_quantity").alias("sq"),
    )
    r = li.select(
        F.col("l_partkey").alias("rk"),
        F.col("l_shipdate").cast("date").alias("rd"),
        F.col("l_quantity").alias("rq"),
    ).withColumn("rbucket", F.floor(F.datediff(F.col("rd"), epoch) / 7))
    probe = s.withColumn(
        "sbucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.datediff(F.date_add(F.col("sd"), 1), epoch) / 7),
                    F.floor(F.datediff(F.date_add(F.col("sd"), 5), epoch) / 7),
                )
            )
        ),
    )
    pairs = probe.join(
        r,
        (F.col("pk") == F.col("rk"))
        & (F.col("sbucket") == F.col("rbucket"))
        & (F.col("rd") >= F.date_add(F.col("sd"), 1))
        & (F.col("rd") <= F.date_add(F.col("sd"), 5))
        & (F.col("rq") < F.col("sq")),
    )
    promo_flag = F.when(F.col("p_size") <= 5, F.lit(1)).otherwise(F.lit(0))
    return (
        pairs.join(F.broadcast(p), F.col("pk") == p.p_partkey)
        .groupBy(
            "p_brand",
            F.floor(F.datediff(F.col("sd"), epoch) / 7).alias("wk"),
        )
        .agg(
            F.sum(F.lit(1) - promo_flag).alias("no_promo"),
            F.sum(promo_flag).alias("promo"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
        .orderBy(F.col("total_cnt").desc(), "p_brand", "wk")
        .limit(50)
    )


STAR_YOY_DECLINE_ORACLE = """
WITH returns AS (
  SELECT l_orderkey, l_linenumber, l_quantity AS r_qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS r_amt
  FROM lineitem WHERE l_returnflag = 'R'),
legs AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'web'
              WHEN o_orderpriority = '2-HIGH' THEN 'catalog'
              ELSE 'store' END AS channel,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         p_brand, p_type,
         l.l_quantity - COALESCE(r.r_qty, 0) AS net_qty,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
           - COALESCE(r.r_amt, 0) AS net_amt
  FROM lineitem l
  LEFT JOIN returns r USING (l_orderkey, l_linenumber)
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part ON p_partkey = l.l_partkey
  WHERE EXTRACT(year FROM o_orderdate) IN (1998, 1999)),
all_sales AS (
  SELECT yr, p_brand, p_type,
         CAST(SUM(CAST(net_qty AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS sales_cnt,
         CAST(SUM(CAST(net_amt AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS sales_amt
  FROM legs GROUP BY yr, p_brand, p_type)
SELECT c.p_brand, c.p_type,
       CAST(CAST(prev.sales_cnt AS VARCHAR) AS DOUBLE) AS prev_cnt,
       CAST(CAST(c.sales_cnt AS VARCHAR) AS DOUBLE) AS curr_cnt,
       ROUND(CAST(CAST(c.sales_cnt AS VARCHAR) AS DOUBLE)
             / CAST(CAST(prev.sales_cnt AS VARCHAR) AS DOUBLE), 6) AS cnt_ratio,
       CAST(CAST(c.sales_cnt - prev.sales_cnt AS VARCHAR) AS DOUBLE) AS cnt_diff,
       CAST(CAST(c.sales_amt - prev.sales_amt AS VARCHAR) AS DOUBLE) AS amt_diff
FROM all_sales c JOIN all_sales prev
  ON c.p_brand = prev.p_brand AND c.p_type = prev.p_type
WHERE c.yr = 1999 AND prev.yr = 1998 AND c.sales_cnt < prev.sales_cnt
ORDER BY cnt_diff, c.p_brand, c.p_type LIMIT 50
"""


@register("star_yoy_decline", STAR_YOY_DECLINE_ORACLE)
def star_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 signature (TpcdsTestProgram.java:76-86): three channel
    legs (priority-derived web/catalog/store), each netted against its
    returns AT LINE GRAIN (LEFT join on the composite line key, qty and
    amount both netted), UNION ALLed into one (year, brand, type)
    aggregate, and the aggregate self-joined prev-year (1998) vs curr-year (1999)
    keeping only DECLINING groups (curr sales_cnt < prev) — reported as
    ratio + absolute qty/amount deltas, worst declines first.

    Scale: legs union BEFORE the shared returns join so there is ONE
    fact-fact exchange on the line key regardless of channel count;
    part broadcasts; the (yr, brand, type) aggregate rides one shuffle
    with partial agg, and the year-over-year self-join runs on the
    group-cardinality aggregate, never on the fact."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    amt = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    returns = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("r_qty"),
        amt.alias("r_amt"),
    )

    def channel_leg(name: str, pred) -> DataFrame:
        sel = o.where(pred & F.year("o_orderdate").isin(1998, 1999))
        return li.join(sel, li.l_orderkey == o.o_orderkey).select(
            F.lit(name).alias("channel"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.col("l_quantity").alias("qty"),
            amt.alias("gross"),
        )

    legs = (
        channel_leg("web", F.col("o_orderpriority") == "1-URGENT")
        .unionAll(channel_leg("catalog", F.col("o_orderpriority") == "2-HIGH"))
        .unionAll(
            channel_leg("store", ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        )
    )
    netted = (
        legs.join(returns, ["l_orderkey", "l_linenumber"], "left")
        .withColumn("net_qty", F.col("qty") - F.coalesce(F.col("r_qty"), F.lit(0.0)))
        .withColumn(
            "net_amt",
            F.col("gross").cast("decimal(30,4)")
            - F.coalesce(F.col("r_amt").cast("decimal(30,4)"), F.lit(0).cast("decimal(30,4)")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    )
    all_sales = netted.groupBy("yr", "p_brand", "p_type").agg(
        F.sum(F.col("net_qty").cast("decimal(18,2)")).cast("decimal(30,2)").alias("sales_cnt"),
        F.sum("net_amt").cast("decimal(30,4)").alias("sales_amt"),
    )
    c = all_sales.where(F.col("yr") == 1999).alias("c")
    prev = all_sales.where(F.col("yr") == 1998).alias("p")
    return (
        c.join(
            prev,
            (F.col("c.p_brand") == F.col("p.p_brand"))
            & (F.col("c.p_type") == F.col("p.p_type"))
            & (F.col("c.sales_cnt") < F.col("p.sales_cnt")),
        )
        .select(
            F.col("c.p_brand").alias("p_brand"),
            F.col("c.p_type").alias("p_type"),
            F.col("p.sales_cnt").cast("double").alias("prev_cnt"),
            F.col("c.sales_cnt").cast("double").alias("curr_cnt"),
            F.round(
                F.col("c.sales_cnt").cast("double") / F.col("p.sales_cnt").cast("double"), 6
            ).alias("cnt_ratio"),
            (F.col("c.sales_cnt") - F.col("p.sales_cnt")).cast("double").alias("cnt_diff"),
            (F.col("c.sales_amt") - F.col("p.sales_amt")).cast("double").alias("amt_diff"),
        )
        .orderBy("cnt_diff", "p_brand", "p_type")
        .limit(50)
    )
