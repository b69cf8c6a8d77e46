"""Nexmark-shaped streaming SQL queries (public benchmark: Tucker et
al., "NEXMark — A Benchmark for Queries over Data Streams", and the
nexmark-benchmark suite used by Flink) mapped onto the ``events`` table:

- auctions := ``signup`` events (auction_id = event_id, seller =
  user_id, category = user_id % 5, open = ts, expires = open + 7 days)
- bids     := ``click``/``view`` events (price = value, bid time = ts)
- persons  := distinct user_ids (registration = signup, activity =
  purchase)

Each entry is the BATCH form, value-exact against the DuckDB oracle;
tests/test_nexmark.py proves the streaming executions (watermarked
stream-stream interval join, update-mode windowed aggs, windowed
stream-stream equi join) produce the same final state — the reference
runs these same shapes through its streaming SQL planner
(flink-table/flink-table-planner — StreamExecIntervalJoin,
StreamExecWindowAggregate, StreamExecWindowRank, StreamExecWindowJoin).

Scale notes per query in the docstrings; none of the four shuffles more
than the key/window grain, and no window function ever runs unkeyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.windows import hop, tumble
from incubator_flink_spark.queries.registry import register

DAY = 86400


def _auctions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("auction_id"),
        (F.col("user_id") % 5).alias("category"),
        F.col("user_id").alias("seller"),
        F.col("ts").alias("open_ts"),
        (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("expires"),
    )


def _bids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("user_id").alias("bid_seller"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )


NEXMARK_Q4_ORACLE = """
WITH a AS (
  SELECT event_id AS auction_id, user_id % 5 AS category, user_id AS seller,
         ts AS open_ts, ts + INTERVAL 7 DAY AS expires
  FROM events WHERE event_type = 'signup'),
b AS (
  SELECT user_id AS bid_seller, value AS price, ts AS bts
  FROM events WHERE event_type IN ('click', 'view')),
win AS (
  SELECT auction_id, category, MAX(price) AS final
  FROM a JOIN b ON a.seller = b.bid_seller
   AND b.bts >= a.open_ts AND b.bts < a.expires
  GROUP BY 1, 2)
SELECT category, COUNT(*) AS n_auctions,
       ROUND(CAST(CAST(SUM(CAST(final AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             / COUNT(*), 6) AS avg_final
FROM win GROUP BY category ORDER BY category
"""


@register("nexmark_q4", NEXMARK_Q4_ORACLE)
def nexmark_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q4 (average final price per category): bids interval-
    joined to their auction's open window (the streaming form is a
    watermarked stream-stream join — StreamExecIntervalJoin), winning
    bid = MAX(price) per auction, averaged per category.

    Scale: the join is EQUI on the seller key with the time range as a
    residual predicate (never a range NLJ); the per-auction max rides
    one (auction) shuffle with partial agg, and the category average
    runs over the auction-cardinality aggregate.  The average divides
    an exact decimal sum — order-independent in both engines."""
    a = _auctions(spark, sf_dir)
    b = _bids(spark, sf_dir)
    win = (
        a.join(
            b,
            (a.seller == b.bid_seller)
            & (b.bts >= a.open_ts)
            & (b.bts < a.expires),
        )
        .groupBy("auction_id", "category")
        .agg(F.max("price").alias("final"))
    )
    return (
        win.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_auctions"),
            F.round(
                F.sum(F.col("final").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_final"),
        )
        .orderBy("category")
    )


NEXMARK_Q5_ORACLE = """
WITH b AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
w AS (
  SELECT user_id, (epoch_us(ts) // 21600000000 - i.i) * 21600 AS start_s
  FROM b, (SELECT unnest([0, 1, 2, 3]) AS i) i
  WHERE epoch_us(ts) >= (epoch_us(ts) // 21600000000 - i.i) * 21600 * 1000000
    AND epoch_us(ts) <  ((epoch_us(ts) // 21600000000 - i.i) * 21600 + 86400) * 1000000),
c AS (SELECT start_s, user_id, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
m AS (SELECT start_s, MAX(cnt) AS mx FROM c GROUP BY 1)
SELECT CAST(to_timestamp(c.start_s) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(c.start_s + 86400) AS TIMESTAMP) AS window_end,
       c.user_id AS item, c.cnt
FROM c JOIN m ON c.start_s = m.start_s AND c.cnt = m.mx
ORDER BY window_start, item
"""


@register("nexmark_q5", NEXMARK_Q5_ORACLE)
def nexmark_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q5 (hot items): bid count per item per SLIDING window
    (1 day size / 6 h slide), keeping every item whose count equals the
    window maximum (q5 keeps all ties — no nondeterministic rank cut).

    Scale: the hop assigner is a fixed ×4 row expansion fused into the
    (window, item) count shuffle (partial agg rides it); the per-window
    max is a window function KEYED by window_start over the aggregate
    (window-cardinality input, never the raw bid stream)."""
    b = load(spark, sf_dir, "events").where(F.col("event_type") == "click")
    c = (
        hop(b, "ts", DAY, 21600)
        .groupBy("window_start", "window_end", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mx = F.max("cnt").over(W.partitionBy("window_start"))
    return (
        c.withColumn("mx", mx)
        .where(F.col("cnt") == F.col("mx"))
        .select(
            "window_start", "window_end", F.col("user_id").alias("item"), "cnt"
        )
        .orderBy("window_start", "item")
    )


NEXMARK_Q7_ORACLE = """
WITH b AS (
  SELECT user_id, value AS price, (epoch_us(ts) // 86400000000) * 86400 AS start_s
  FROM events WHERE event_type = 'click'),
m AS (SELECT start_s, MAX(price) AS mx FROM b GROUP BY 1)
SELECT DISTINCT CAST(to_timestamp(b.start_s) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(b.start_s + 86400) AS TIMESTAMP) AS window_end,
       b.user_id AS bidder, b.price
FROM b JOIN m ON b.start_s = m.start_s AND b.price = m.mx
ORDER BY window_start, bidder
"""


@register("nexmark_q7", NEXMARK_Q7_ORACLE)
def nexmark_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q7 (highest bid per window): tumbling 1-day windows over
    bids, returning the bidder(s) holding the window's maximum price
    (all ties, as q7's price = MAX(price) self-join does).

    Scale: one (window, bidder, price) distinct shuffle; the max is a
    window function keyed by window_start over per-window rows — the
    reference plans the same shape as StreamExecWindowRank with a
    value-equality predicate instead of a row cut."""
    b = tumble(
        load(spark, sf_dir, "events").where(F.col("event_type") == "click"),
        "ts",
        DAY,
    )
    rows = b.select(
        "window_start", "window_end", F.col("user_id").alias("bidder"), F.col("value").alias("price")
    ).distinct()
    mx = F.max("price").over(W.partitionBy("window_start"))
    return (
        rows.withColumn("mx", mx)
        .where(F.col("price") == F.col("mx"))
        .select("window_start", "window_end", "bidder", "price")
        .orderBy("window_start", "bidder")
    )


NEXMARK_Q8_ORACLE = """
WITH s AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // 86400000000) * 86400 AS start_s
  FROM events WHERE event_type = 'signup'),
p AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // 86400000000) * 86400 AS start_s
  FROM events WHERE event_type = 'purchase')
SELECT CAST(to_timestamp(s.start_s) AS TIMESTAMP) AS window_start,
       s.user_id
FROM s JOIN p USING (user_id, start_s)
ORDER BY window_start, user_id
"""


@register("nexmark_q8", NEXMARK_Q8_ORACLE)
def nexmark_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q8 (new users active in the same window): users who
    signed up AND purchased inside the same tumbling 1-day window — the
    canonical windowed stream-stream equi join (StreamExecWindowJoin;
    streaming form joins two watermarked streams on (user, window)).

    Scale: both sides reduce to distinct (user, window) BEFORE the
    join, so the join input is bounded by key-grain cardinality and the
    equi join shares one (user_id, window) partitioning."""
    e = load(spark, sf_dir, "events")
    s = (
        tumble(e.where(F.col("event_type") == "signup"), "ts", DAY)
        .select("user_id", "window_start")
        .distinct()
    )
    p = (
        tumble(e.where(F.col("event_type") == "purchase"), "ts", DAY)
        .select("user_id", "window_start")
        .distinct()
    )
    return (
        s.join(p, ["user_id", "window_start"])
        .select("window_start", "user_id")
        .orderBy("window_start", "user_id")
    )


NEXMARK_Q6_ORACLE = """
WITH a AS (
  SELECT event_id AS auction_id, user_id AS seller,
         ts AS open_ts, ts + INTERVAL 7 DAY AS expires
  FROM events WHERE event_type = 'signup'),
b AS (
  SELECT user_id AS bid_seller, value AS price, ts AS bts
  FROM events WHERE event_type IN ('click', 'view')),
win AS (
  SELECT auction_id, seller, open_ts, MAX(price) AS final
  FROM a JOIN b ON a.seller = b.bid_seller
   AND b.bts >= a.open_ts AND b.bts < a.expires
  GROUP BY 1, 2, 3),
o AS (
  SELECT seller, final,
         ROW_NUMBER() OVER (PARTITION BY seller
                            ORDER BY open_ts DESC, auction_id DESC) AS rn
  FROM win)
SELECT seller, COUNT(*) AS n_last,
       ROUND(CAST(CAST(SUM(CAST(final AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             / COUNT(*), 6) AS avg_last10
FROM o WHERE rn <= 10 GROUP BY seller ORDER BY seller
"""


@register("nexmark_q6", NEXMARK_Q6_ORACLE)
def nexmark_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q6 (average selling price of a seller's LAST 10 closed
    auctions): winning bid per auction (same interval join + per-auction
    max as q4), then a per-seller recency rank keeps the 10 newest wins
    and averages them — the final state of q6's ROWS 9 PRECEDING running
    average.

    Scale: the rank window is KEYED by seller and runs over the
    auction-cardinality winning-bid aggregate, never the raw bid
    stream; the average divides an exact decimal sum."""
    a = _auctions(spark, sf_dir)
    b = _bids(spark, sf_dir)
    win = (
        a.join(
            b,
            (a.seller == b.bid_seller)
            & (b.bts >= a.open_ts)
            & (b.bts < a.expires),
        )
        .groupBy("auction_id", "seller", "open_ts")
        .agg(F.max("price").alias("final"))
    )
    rn = F.row_number().over(
        W.partitionBy("seller").orderBy(F.col("open_ts").desc(), F.col("auction_id").desc())
    )
    return (
        win.withColumn("rn", rn)
        .where(F.col("rn") <= 10)
        .groupBy("seller")
        .agg(
            F.count(F.lit(1)).alias("n_last"),
            F.round(
                F.sum(F.col("final").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_last10"),
        )
        .orderBy("seller")
    )


NEXMARK_Q9_ORACLE = """
WITH a AS (
  SELECT event_id AS auction_id, user_id % 5 AS category, user_id AS seller,
         ts AS open_ts, ts + INTERVAL 7 DAY AS expires
  FROM events WHERE event_type = 'signup'),
b AS (
  SELECT user_id AS bid_seller, event_id AS bid_id, value AS price, ts AS bts
  FROM events WHERE event_type IN ('click', 'view')),
ranked AS (
  SELECT a.auction_id, a.category, a.seller, b.bid_id, b.price, b.bts,
         ROW_NUMBER() OVER (PARTITION BY a.auction_id
                            ORDER BY b.price DESC, b.bts ASC, b.bid_id ASC) AS rn
  FROM a JOIN b ON a.seller = b.bid_seller
   AND b.bts >= a.open_ts AND b.bts < a.expires)
SELECT auction_id, category, seller, bid_id, price, bts
FROM ranked WHERE rn = 1
ORDER BY auction_id
"""


@register("nexmark_q9", NEXMARK_Q9_ORACLE)
def nexmark_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q9 (winning bids): emit the (auction, winning bid) JOIN
    ROW itself — highest price, earliest-bid tiebreak — rather than the
    aggregate q4/q6 consume (the reference plans this as
    StreamExecIntervalJoin + StreamExecRank with rank=1, i.e. a per-key
    argmax DEDUP at row grain).

    Scale: the interval join is EQUI on the seller key with the time
    range residual; the rank window is KEYED by auction_id over the
    joined bid set (one shuffle), and rank=1 means the window state is
    a single running argmax per auction — never an unkeyed sort."""
    a = _auctions(spark, sf_dir)
    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("user_id").alias("bid_seller"),
        F.col("event_id").alias("bid_id"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )
    joined = a.join(
        b,
        (a.seller == b.bid_seller) & (b.bts >= a.open_ts) & (b.bts < a.expires),
    )
    rn = F.row_number().over(
        W.partitionBy("auction_id").orderBy(
            F.col("price").desc(), F.col("bts").asc(), F.col("bid_id").asc()
        )
    )
    return (
        joined.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("auction_id", "category", "seller", "bid_id", "price", "bts")
        .orderBy("auction_id")
    )


NEXMARK_Q1_ORACLE = """
SELECT user_id AS auction, event_id AS bidder,
       CAST(CAST(value AS DECIMAL(18,6)) * CAST(0.908 AS DECIMAL(4,3)) AS DOUBLE) AS price_eur,
       ts AS bid_ts
FROM events WHERE event_type IN ('click', 'view')
ORDER BY bidder
"""


@register("nexmark_q1", NEXMARK_Q1_ORACLE)
def nexmark_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q1 (currency conversion): a pure per-row projection over
    the bid stream — dollars to euros at a fixed rate.  The reference
    plans this as a stateless Calc; here it is a narrow map with the
    multiply in decimal so both engines round identically.

    Scale: zero shuffles (plan is scan -> project); the only cost is
    scan width."""
    b = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    rate = F.lit("0.908").cast("decimal(4,3)")  # decimal x decimal: exact product
    return b.select(
        F.col("user_id").alias("auction"),
        F.col("event_id").alias("bidder"),
        (F.col("value").cast("decimal(18,6)") * rate).cast("double").alias("price_eur"),
        F.col("ts").alias("bid_ts"),
    ).orderBy("bidder")


NEXMARK_Q2_ORACLE = """
SELECT user_id AS auction, event_id AS bid_id, value AS price
FROM events
WHERE event_type IN ('click', 'view') AND user_id % 123 = 0
ORDER BY bid_id
"""


@register("nexmark_q2", NEXMARK_Q2_ORACLE)
def nexmark_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q2 (selection): bids for a sparse set of auctions
    (auction % 123 = 0) — a stateless filter the reference plans as a
    Calc with the predicate pushed to the source.

    Scale: the modulo predicate reaches the parquet scan as a pushed
    filter; zero shuffles."""
    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view") & (F.col("user_id") % 123 == 0)
    )
    return b.select(
        F.col("user_id").alias("auction"),
        F.col("event_id").alias("bid_id"),
        F.col("value").alias("price"),
    ).orderBy("bid_id")


NEXMARK_Q3_ORACLE = """
WITH p AS (
  SELECT DISTINCT user_id,
         user_id % 50 AS city, user_id % 3 AS state
  FROM events WHERE event_type = 'signup'),
a AS (
  SELECT event_id AS auction_id, user_id AS seller, user_id % 5 AS category
  FROM events WHERE event_type = 'signup')
SELECT p.user_id AS seller, p.city AS city, p.state AS state, a.auction_id AS auction_id
FROM a JOIN p ON a.seller = p.user_id
WHERE a.category = 2 AND p.state IN (0, 1)
ORDER BY auction_id
"""


@register("nexmark_q3", NEXMARK_Q3_ORACLE)
def nexmark_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q3 (local item suggestion): auctions in one category
    joined to their sellers filtered by location — the reference's
    canonical INCREMENTAL two-sided join (materialize both sides keyed
    by seller, emit on either side's arrival).  Batch form here; the
    streaming two-sided append join is proven in
    tests/test_stream_stream.py.

    Scale: both predicates push below the join (auction category,
    person state), so the join touches only the filtered slices; the
    person side is a distinct over signups (auction-cardinality) and
    broadcasts when small."""
    ev = load(spark, sf_dir, "events")
    p = (
        ev.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            (F.col("user_id") % 50).alias("city"),
            (F.col("user_id") % 3).alias("state"),
        )
        .distinct()
    )
    a = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("auction_id"),
        F.col("user_id").alias("seller"),
        (F.col("user_id") % 5).alias("category"),
    )
    return (
        a.where(F.col("category") == 2)
        .join(p.where(F.col("state").isin(0, 1)), a.seller == p.user_id)
        .select(
            F.col("user_id").alias("seller"), "city", "state", "auction_id"
        )
        .orderBy("auction_id")
    )


NEXMARK_Q11_ORACLE = """
WITH b AS (
  SELECT user_id AS bidder, ts, event_id
  FROM events WHERE event_type IN ('click', 'view')),
marked AS (
  SELECT bidder, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM b
  WINDOW w AS (PARTITION BY bidder ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY bidder ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT bidder, MIN(ts) AS session_start, MAX(ts) + INTERVAL 1800 SECOND AS session_end,
       COUNT(*) AS bid_count
FROM numbered GROUP BY bidder, session_id
ORDER BY bidder, session_start
"""


@register("nexmark_q11", NEXMARK_Q11_ORACLE)
def nexmark_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q11 (user sessions): bids per bidder per SESSION window
    (30 min gap) — the reference plans this as a session-window
    aggregate with merging window state; here the batch session
    assignment is the gaps-and-islands composition
    (operators/windows.session_col), one keyed shuffle.

    Scale: sessionization is a window function over (bidder, ts) — one
    shuffle on the bidder key, no self-join."""
    from incubator_flink_spark.operators.windows import session_col

    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(F.col("user_id").alias("bidder"), "ts")
    return (
        b.groupBy(session_col("ts", 1800).alias("w"), F.col("bidder"))
        .agg(F.count(F.lit(1)).alias("bid_count"))
        .select(
            "bidder",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "bid_count",
        )
        .orderBy("bidder", "session_start")
    )


NEXMARK_Q15_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS total_bids,
       COUNT(DISTINCT user_id) AS distinct_bidders,
       COUNT(DISTINCT event_id % 997) AS distinct_auctions
FROM events WHERE event_type IN ('click', 'view')
GROUP BY 1 ORDER BY day
"""


@register("nexmark_q15", NEXMARK_Q15_ORACLE)
def nexmark_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q15 (bidding statistics report): per-day bid totals with
    MULTIPLE DISTINCT aggregates (bidders, auctions) — the reference
    plans distinct aggregates with a split-distinct expansion; Catalyst
    does the same expand + two-phase aggregation automatically.

    Scale: one expand + keyed aggregation; no joins."""
    b = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    return (
        b.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("total_bids"),
            F.countDistinct("user_id").alias("distinct_bidders"),
            F.countDistinct(F.col("event_id") % 997).alias("distinct_auctions"),
        )
        .orderBy("day")
    )


NEXMARK_Q18_ORACLE = """
SELECT bidder, auction, price, bts
FROM (
  SELECT user_id AS bidder, event_id % 211 AS auction, value AS price, ts AS bts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_id % 211
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type IN ('click', 'view')
) t WHERE rn = 1
ORDER BY bidder, auction
"""


@register("nexmark_q18", NEXMARK_Q18_ORACLE)
def nexmark_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q18 (find the LAST bid per bidder+auction): keep-last
    dedup — the reference plans this as a Deduplicate (order by rowtime
    desc, keep first) with per-key state; the batch form is a keyed
    rank=1.

    Scale: one shuffle on the (bidder, auction) key; rank=1 state is a
    single row per key in the streaming form
    (streaming/stateful.keep_last_dedup)."""
    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("user_id").alias("bidder"),
        (F.col("event_id") % 211).alias("auction"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
        "event_id",
    )
    rn = F.row_number().over(
        W.partitionBy("bidder", "auction").orderBy(F.col("bts").desc(), F.col("event_id").desc())
    )
    return (
        b.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("bidder", "auction", "price", "bts")
        .orderBy("bidder", "auction")
    )


NEXMARK_Q19_ORACLE = """
SELECT auction, bid_id, price, bts
FROM (
  SELECT event_id % 97 AS auction, event_id AS bid_id, value AS price, ts AS bts,
         ROW_NUMBER() OVER (PARTITION BY event_id % 97
                            ORDER BY value DESC, ts ASC, event_id ASC) AS rn
  FROM events WHERE event_type IN ('click', 'view')
) t WHERE rn <= 10
ORDER BY auction, rn
"""


@register("nexmark_q19", NEXMARK_Q19_ORACLE)
def nexmark_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q19 (auction TOP-10 prices): per-auction top-10 bids —
    the reference's Rank operator with top-N state (keeps 10 rows per
    key).  Batch form: keyed rank <= 10, never a global sort.

    Scale: one shuffle on the auction key; the rank window is keyed so
    WindowExec state is bounded by the per-auction bid count (and the
    streaming form, streaming/stateful.streaming_topn, keeps exactly
    the live top list)."""
    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        (F.col("event_id") % 97).alias("auction"),
        F.col("event_id").alias("bid_id"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )
    rn = F.row_number().over(
        W.partitionBy("auction").orderBy(F.col("price").desc(), F.col("bts").asc(), F.col("bid_id").asc())
    )
    return (
        b.withColumn("rn", rn)
        .where(F.col("rn") <= 10)
        .select("auction", "bid_id", "price", "bts")
        .orderBy("auction", "rn")
        .drop("rn")
    )


# --- round-8 additions: the remaining oracle-able public Nexmark
# queries (q13/q14/q16/q17/q20/q21/q22 of the nexmark-benchmark suite
# the reference's streaming SQL planner is exercised with).  Same
# events-table mapping as above; each docstring carries the scale note.

NEXMARK_Q13_ORACLE = """
WITH b AS (
  SELECT event_id AS bid_id, event_id % 97 AS auction, user_id AS bidder,
         value AS price, ts AS bts
  FROM events WHERE event_type IN ('click', 'view')),
s AS (SELECT i AS skey, concat('side-', CAST(i AS VARCHAR)) AS svalue
      FROM range(0, 10) t(i))
SELECT b.bid_id, b.auction, b.bidder, b.price, b.bts, s.svalue
FROM b JOIN s ON b.auction % 10 = s.skey
ORDER BY b.bid_id
"""


@register("nexmark_q13", NEXMARK_Q13_ORACLE)
def nexmark_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q13 (bounded side input join): every bid enriched from a
    small static side table keyed by auction mod — the reference plans
    this as a lookup/temporal join against the bounded side input
    (StreamExecLookupJoin; streaming/lookup.py is the streaming form).

    Scale: the side table is broadcast (10 rows — never a shuffle of
    the bid stream); the bid scan stays map-only."""
    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("event_id").alias("bid_id"),
        (F.col("event_id") % 97).alias("auction"),
        F.col("user_id").alias("bidder"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )
    # Side table built in the JVM (spark.range + concat): the previous
    # spark.createDataFrame(10 rows) parallelized a PythonRDD over 32
    # slices, so the broadcast build paid 32 Python-worker round trips —
    # profiled at 27.7 task-seconds late in the bench sequence (the r10
    # q13 regression).  Guide §4.1: no Python boundary for 10 constant
    # rows.  Identical values/schema (skey bigint, svalue string).
    side = spark.range(10).select(
        F.col("id").alias("skey"),
        F.concat(F.lit("side-"), F.col("id").cast("string")).alias("svalue"),
    )
    return (
        b.join(F.broadcast(side), (F.col("auction") % 10) == F.col("skey"))
        .select("bid_id", "auction", "bidder", "price", "bts", "svalue")
        .orderBy("bid_id")
    )


NEXMARK_Q14_ORACLE = """
SELECT event_id AS bid_id, event_id % 97 AS auction, user_id AS bidder,
       0.908 * value AS price,
       CASE WHEN extract(hour FROM ts) >= 8 AND extract(hour FROM ts) <= 18 THEN 'dayTime'
            WHEN extract(hour FROM ts) <= 6 OR extract(hour FROM ts) >= 20 THEN 'nightTime'
            ELSE 'otherTime' END AS bidtimetype,
       ts AS bts, props,
       length(props) - length(replace(props, 'k', '')) AS c_counts
FROM events
WHERE event_type IN ('click', 'view')
  AND (0.908 * value > 150 OR 0.908 * value < 50)
ORDER BY bid_id
"""


@register("nexmark_q14", NEXMARK_Q14_ORACLE)
def nexmark_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q14 (calculation): price conversion, a day/night bucket
    from the bid hour, and a character count over the extra payload —
    the reference's Calc with a scalar UDF (countChar); here the char
    count stays a built-in expression (no Python UDF in the plan).

    Scale: map-only — single scan, filter pushed, no exchange.  The
    0.908 * value product is one IEEE double multiply, bit-identical
    in both engines."""
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    price = F.lit(0.908) * F.col("value")
    hour = F.hour("ts")
    return (
        e.where((price > 150) | (price < 50))
        .select(
            F.col("event_id").alias("bid_id"),
            (F.col("event_id") % 97).alias("auction"),
            F.col("user_id").alias("bidder"),
            price.alias("price"),
            F.when((hour >= 8) & (hour <= 18), "dayTime")
            .when((hour <= 6) | (hour >= 20), "nightTime")
            .otherwise("otherTime")
            .alias("bidtimetype"),
            F.col("ts").alias("bts"),
            "props",
            (F.length("props") - F.length(F.replace(F.col("props"), F.lit("k"), F.lit("")))).alias(
                "c_counts"
            ),
        )
        .orderBy("bid_id")
    )


NEXMARK_Q16_ORACLE = """
SELECT event_type AS channel, strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS total_bids,
       count(*) FILTER (WHERE value < 50) AS rank1_bids,
       count(*) FILTER (WHERE value >= 50 AND value < 150) AS rank2_bids,
       count(*) FILTER (WHERE value >= 150) AS rank3_bids,
       count(DISTINCT user_id) AS total_bidders,
       count(DISTINCT user_id) FILTER (WHERE value < 50) AS rank1_bidders,
       count(DISTINCT user_id) FILTER (WHERE value >= 50 AND value < 150) AS rank2_bidders,
       count(DISTINCT user_id) FILTER (WHERE value >= 150) AS rank3_bidders,
       count(DISTINCT event_id % 97) AS total_auctions,
       count(DISTINCT event_id % 97) FILTER (WHERE value < 50) AS rank1_auctions,
       count(DISTINCT event_id % 97) FILTER (WHERE value >= 50 AND value < 150) AS rank2_auctions,
       count(DISTINCT event_id % 97) FILTER (WHERE value >= 150) AS rank3_auctions
FROM events WHERE event_type IN ('click', 'view')
GROUP BY channel, day
ORDER BY channel, day
"""


@register("nexmark_q16", NEXMARK_Q16_ORACLE)
def nexmark_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q16 (channel statistics report): per channel+day bid
    counts plus price-band conditional counts and THREE families of
    conditional COUNT(DISTINCT ...) — the reference splits these with
    SplitAggregateRule into distinct views; Spark plans the same
    multi-distinct through Expand.

    Scale: one grouping shuffle; Expand multiplies rows by the distinct
    count but each replica carries only its grouping columns, and the
    partial aggregate runs map-side."""
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    v = F.col("value")
    lo, mid, hi = v < 50, (v >= 50) & (v < 150), v >= 150
    bidder, auction = F.col("user_id"), F.col("event_id") % 97
    return (
        e.groupBy(
            F.col("event_type").alias("channel"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_bids"),
            F.count(F.when(lo, 1)).alias("rank1_bids"),
            F.count(F.when(mid, 1)).alias("rank2_bids"),
            F.count(F.when(hi, 1)).alias("rank3_bids"),
            F.countDistinct(bidder).alias("total_bidders"),
            F.countDistinct(F.when(lo, bidder)).alias("rank1_bidders"),
            F.countDistinct(F.when(mid, bidder)).alias("rank2_bidders"),
            F.countDistinct(F.when(hi, bidder)).alias("rank3_bidders"),
            F.countDistinct(auction).alias("total_auctions"),
            F.countDistinct(F.when(lo, auction)).alias("rank1_auctions"),
            F.countDistinct(F.when(mid, auction)).alias("rank2_auctions"),
            F.countDistinct(F.when(hi, auction)).alias("rank3_auctions"),
        )
        .orderBy("channel", "day")
    )


NEXMARK_Q17_ORACLE = """
SELECT event_id % 97 AS auction, strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS total_bids,
       count(*) FILTER (WHERE value < 50) AS rank1_bids,
       count(*) FILTER (WHERE value >= 50 AND value < 150) AS rank2_bids,
       count(*) FILTER (WHERE value >= 150) AS rank3_bids,
       min(value) AS min_price, max(value) AS max_price,
       ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             / count(*), 6) AS avg_price,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM events WHERE event_type IN ('click', 'view')
GROUP BY auction, day
ORDER BY auction, day
"""


@register("nexmark_q17", NEXMARK_Q17_ORACLE)
def nexmark_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q17 (auction statistics report): per auction+day bid
    counts, price-band counts, and min/max/avg/sum price — a plain
    keyed aggregate in both engines.

    Scale: one (auction, day) shuffle with map-side partial agg; the
    money sum rides an exact decimal so the average is order-
    independent."""
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    v = F.col("value")
    dsum = F.sum(v.cast("decimal(18,2)")).cast("double")
    return (
        e.groupBy(
            (F.col("event_id") % 97).alias("auction"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_bids"),
            F.count(F.when(v < 50, 1)).alias("rank1_bids"),
            F.count(F.when((v >= 50) & (v < 150), 1)).alias("rank2_bids"),
            F.count(F.when(v >= 150, 1)).alias("rank3_bids"),
            F.min(v).alias("min_price"),
            F.max(v).alias("max_price"),
            F.round(dsum / F.count(F.lit(1)), 6).alias("avg_price"),
            dsum.alias("sum_price"),
        )
        .orderBy("auction", "day")
    )


NEXMARK_Q20_ORACLE = """
WITH a AS (
  SELECT event_id AS auction_id, user_id % 5 AS category, user_id AS seller,
         ts AS open_ts, ts + INTERVAL 7 DAY AS expires
  FROM events WHERE event_type = 'signup'),
b AS (
  SELECT event_id AS bid_id, user_id AS bid_seller, value AS price, ts AS bts
  FROM events WHERE event_type IN ('click', 'view'))
SELECT b.bid_id, b.price, b.bts, a.auction_id, a.seller, a.category, a.open_ts, a.expires
FROM b JOIN a ON b.bid_seller = a.seller
WHERE a.category = 2
ORDER BY b.bid_id, a.auction_id
"""


@register("nexmark_q20", NEXMARK_Q20_ORACLE)
def nexmark_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q20 (expand bid with auction): bids joined to their
    auction's full row, filtered to one category — the reference's
    streaming two-sided join with the dimension filter pushed below
    the join.

    Scale: equi join on the seller key with the category filter pushed
    to the auction scan (plan-visible PushedFilters); both sides
    shuffle once on the key."""
    a = _auctions(spark, sf_dir).where(F.col("category") == 2)
    b = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("event_id").alias("bid_id"),
        F.col("user_id").alias("bid_seller"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )
    return (
        b.join(a, b.bid_seller == a.seller)
        .select("bid_id", "price", "bts", "auction_id", "seller", "category", "open_ts", "expires")
        .orderBy("bid_id", "auction_id")
    )


NEXMARK_Q21_ORACLE = """
SELECT event_id AS bid_id, event_id % 97 AS auction, user_id AS bidder, value AS price,
       CASE WHEN event_type = 'click' THEN '0'
            WHEN event_type = 'view' THEN '1'
            ELSE regexp_extract(props, '"k": ([0-9]+)', 1) END AS channel_id
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
ORDER BY bid_id
"""


@register("nexmark_q21", NEXMARK_Q21_ORACLE)
def nexmark_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q21 (add channel id): known channels map to fixed ids,
    the rest extract the id from the payload by regex — the reference's
    Calc with CASE + REGEXP_EXTRACT.

    Scale: map-only, one scan; the regex runs inside codegen (never a
    Python UDF)."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    return e.select(
        F.col("event_id").alias("bid_id"),
        (F.col("event_id") % 97).alias("auction"),
        F.col("user_id").alias("bidder"),
        F.col("value").alias("price"),
        F.when(F.col("event_type") == "click", "0")
        .when(F.col("event_type") == "view", "1")
        .otherwise(F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1))
        .alias("channel_id"),
    ).orderBy("bid_id")


NEXMARK_Q22_ORACLE = """
SELECT bid_id, auction, bidder, price,
       split_part(url, '/', 2) AS dir1,
       split_part(url, '/', 3) AS dir2,
       split_part(url, '/', 4) AS dir3
FROM (
  SELECT event_id AS bid_id, event_id % 97 AS auction, user_id AS bidder, value AS price,
         concat('/channel_', event_type, '/user_', CAST(user_id AS VARCHAR),
                '/item_', CAST(event_id % 97 AS VARCHAR)) AS url
  FROM events WHERE event_type IN ('click', 'view')) b
ORDER BY bid_id
"""


@register("nexmark_q22", NEXMARK_Q22_ORACLE)
def nexmark_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q22 (get URL directories): SPLIT_INDEX over the bid URL —
    the reference's Flink-only scalar (SPLIT_INDEX is 0-based; the
    DuckDB oracle's split_part is 1-based, hence k+1).  Pins the
    functions/compat.py implementation behind the driver's oracle gate.

    Scale: map-only, one scan, codegen string ops."""
    from incubator_flink_spark.functions import compat

    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    url = F.concat(
        F.lit("/channel_"), F.col("event_type"),
        F.lit("/user_"), F.col("user_id").cast("string"),
        F.lit("/item_"), (F.col("event_id") % 97).cast("string"),
    )
    b = e.select(
        F.col("event_id").alias("bid_id"),
        (F.col("event_id") % 97).alias("auction"),
        F.col("user_id").alias("bidder"),
        F.col("value").alias("price"),
        url.alias("url"),
    )
    return b.select(
        "bid_id", "auction", "bidder", "price",
        compat.split_index(F.col("url"), "/", 1).alias("dir1"),
        compat.split_index(F.col("url"), "/", 2).alias("dir2"),
        compat.split_index(F.col("url"), "/", 3).alias("dir3"),
    ).orderBy("bid_id")
