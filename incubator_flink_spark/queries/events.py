"""Event-time operator coverage on the ``events`` table — the batch forms
of the reference's streaming SQL operators (SURVEY.md §2.3-2.5, §2.9).
The streaming executions of the same operators (readStream + watermark)
are exercised by tests/test_streaming.py; these registry entries prove the
window/join/dedup semantics against the DuckDB oracle.

Operator ↔ reference mapping:
- tumble/hop windows  → StreamExecWindowAggregate + SliceAssigners
  (tumbling:60, hopping:76)
- session windows     → EventTimeSessionWindows + MergingWindowAssigner
- cumulate windows    → SliceAssigners.cumulative:93 (custom operator)
- count windows       → KeyedStream.countWindow:696 (custom operator)
- interval join       → TimeIntervalJoin (flink-table-runtime/.../join/
  interval/TimeIntervalJoin.java:51)
- as-of temporal join → TemporalRowTimeJoinOperator.java:78
- window top-n        → StreamExecWindowRank.java:67
- streaming OVER agg  → RowTimeRangeBoundedPrecedingFunction.java (range
  frame over event time, batch form)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.asof import asof_join
from incubator_flink_spark.operators.windows import count_window, cumulate, hop, session_col, tumble
from incubator_flink_spark.queries.registry import register
from incubator_flink_spark.queries.tpch import dsum

# DuckDB helper: epoch-aligned bucket start of width `w` seconds.
# (to_timestamp yields TIMESTAMPTZ; session TimeZone is UTC, cast back.)


WINDOW_TUMBLE_ORACLE = """
SELECT CAST(to_timestamp((epoch_us(ts) // 600000000) * 600) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp((epoch_us(ts) // 600000000) * 600 + 600) AS TIMESTAMP) AS window_end,
       event_type,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@register("window_tumble", WINDOW_TUMBLE_ORACLE)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tumble(load(spark, sf_dir, "events"), "ts", 600)
    return (
        e.groupBy("window_start", "window_end", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("total"))
        .orderBy("window_start", "event_type")
    )


WINDOW_HOP_ORACLE = """
SELECT CAST(to_timestamp(start_s) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(start_s + 600) AS TIMESTAMP) AS window_end,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM (
  SELECT e.*, (epoch_us(ts) // 300000000 - i.i) * 300 AS start_s
  FROM events e, (SELECT unnest([0, 1]) AS i) i
  WHERE epoch_us(ts) >= (epoch_us(ts) // 300000000 - i.i) * 300 * 1000000
    AND epoch_us(ts) <  ((epoch_us(ts) // 300000000 - i.i) * 300 + 600) * 1000000
) t
GROUP BY 1, 2
ORDER BY window_start
"""


@register("window_hop", WINDOW_HOP_ORACLE)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = hop(load(spark, sf_dir, "events"), "ts", 600, 300)
    return (
        e.groupBy("window_start", "window_end")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("total"))
        .orderBy("window_start")
    )


WINDOW_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 300 SECOND AS session_end,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("window_session", WINDOW_SESSION_ORACLE)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(session_col("ts", 300).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
            "total",
        )
        .orderBy("user_id", "session_start")
    )


WINDOW_CUMULATE_ORACLE = """
SELECT CAST(to_timestamp(bucket_s) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(bucket_s + k * 300) AS TIMESTAMP) AS window_end,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM (
  SELECT e.*, (epoch_us(ts) // 1200000000) * 1200 AS bucket_s, k.k
  FROM events e, (SELECT unnest([1, 2, 3, 4]) AS k) k
  WHERE epoch_us(ts) < ((epoch_us(ts) // 1200000000) * 1200 + k.k * 300) * 1000000
) t
GROUP BY 1, 2
ORDER BY window_start, window_end
"""


@register("window_cumulate", WINDOW_CUMULATE_ORACLE)
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = cumulate(load(spark, sf_dir, "events"), "ts", 300, 1200)
    return (
        e.groupBy("window_start", "window_end")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("total"))
        .orderBy("window_start", "window_end")
    )


WINDOW_CUMULATE_TVF_SQL_ORACLE = """
SELECT CAST(to_timestamp(bucket_s) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(bucket_s + k * 300) AS TIMESTAMP) AS window_end,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM (
  SELECT e.*, (epoch_us(ts) // 1200000000) * 1200 AS bucket_s, k.k
  FROM events e, (SELECT unnest([1, 2, 3, 4]) AS k) k
  WHERE epoch_us(ts) < ((epoch_us(ts) // 1200000000) * 1200 + k.k * 300) * 1000000
) t
GROUP BY 1, 2
ORDER BY window_start, window_end
"""


@register("window_cumulate_tvf_sql", WINDOW_CUMULATE_TVF_SQL_ORACLE)
def window_cumulate_tvf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUMULATE window TVF through the SQL TEXT surface — the query
    executes via TableEnvironment.sql_query over the TVF grammar
    (reference: StreamExecWindowTableFunction.java:49; rewrite:
    api/tvf.py), so the driver gate pins the TVF rewrite path itself,
    not just the underlying window operator (same window spec and
    decimal-sum convention as `window_cumulate`).

    Scale: the rewrite is driver-side string work; the resulting plan is
    the same map-side cumulate assignment + one keyed aggregation."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("events_tvf")
    return env.sql_query(
        """
        SELECT window_start, window_end, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total
        FROM TABLE(CUMULATE(TABLE events_tvf, DESCRIPTOR(ts),
                            INTERVAL '5' MINUTE, INTERVAL '20' MINUTE))
        GROUP BY window_start, window_end
        ORDER BY window_start, window_end
        """
    ).to_df()


COUNT_WINDOW_ORACLE = """
SELECT user_id, window_id, COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event
FROM (
  SELECT user_id, value, event_id,
         CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 5 AS BIGINT) AS window_id
  FROM events
) t
GROUP BY user_id, window_id
ORDER BY user_id, window_id
"""


@register("count_window_agg", COUNT_WINDOW_ORACLE)
def count_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = count_window(load(spark, sf_dir, "events"), "user_id", order_by=["ts", "event_id"], size=5)
    return (
        e.groupBy("user_id", "window_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("value")).alias("total"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("user_id", "window_id")
    )


INTERVAL_JOIN_ORACLE = """
SELECT a.event_id AS click_id, b.event_id AS next_id, a.user_id, b.event_type AS next_type
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type IN ('purchase', 'signup')
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 600 SECOND
ORDER BY click_id, next_id
"""


@register("interval_join", INTERVAL_JOIN_ORACLE)
def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-bounded two-stream join (TimeIntervalJoin.java:51). Batch plan:
    # equi-join on user_id + residual time-range predicate; in streaming
    # the same condition bounds state retention via watermarks.
    e = load(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("a_ts")
    )
    b = e.where(F.col("event_type").isin("purchase", "signup")).select(
        F.col("event_id").alias("next_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("next_type"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 600 SECOND")),
        )
        .select("click_id", "next_id", "user_id", "next_type")
        .orderBy("click_id", "next_id")
    )


COUNT_WINDOW_SLIDING_ORACLE = """
WITH r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS total
  FROM events),
x AS (
  SELECT user_id, value,
         unnest(generate_series(
           GREATEST(CAST(ceil(rn / 3.0) AS BIGINT), 1),
           LEAST((rn + 5) // 3, total // 3))) AS window_id
  FROM r)
SELECT user_id, window_id,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM x GROUP BY user_id, window_id
ORDER BY user_id, window_id
"""


@register("count_window_sliding", COUNT_WINDOW_SLIDING_ORACLE)
def count_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding count windows (KeyedStream.countWindow(size, slide): fire
    every 3 elements over the last 6 per user), aggregated per window."""
    from incubator_flink_spark.operators.windows import sliding_count_window

    e = load(spark, sf_dir, "events")
    win = sliding_count_window(e, "user_id", order_by=["ts", "event_id"], size=6, slide=3)
    return (
        win.groupBy("user_id", "window_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("value")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "window_id")
    )


INTERVAL_JOIN_LEFT_ORACLE = """
SELECT a.event_id AS click_id, b.event_id AS next_id, a.user_id, b.event_type AS next_type
FROM (SELECT * FROM events WHERE event_type = 'click') a
LEFT JOIN (SELECT * FROM events WHERE event_type IN ('purchase','signup')) b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 600 SECOND
ORDER BY click_id, next_id
"""


@register("interval_join_left", INTERVAL_JOIN_LEFT_ORACLE)
def interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join (TimeIntervalJoin.java outer emission:
    unmatched left rows surface with NULL right side once the interval
    can no longer be met). Batch form: the same equi+range join with
    how='left'."""
    e = load(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("a_ts")
    )
    b = e.where(F.col("event_type").isin("purchase", "signup")).select(
        F.col("event_id").alias("next_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("next_type"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 600 SECOND")),
            "left",
        )
        .select("click_id", "next_id", "user_id", "next_type")
        .orderBy("click_id", "next_id")
    )


ASOF_JOIN_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, s.event_id AS version_id, s.value AS version_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id
"""


@register("asof_temporal_join", ASOF_JOIN_ORACLE)
def asof_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Event-time temporal join (TemporalRowTimeJoinOperator.java:78):
    # purchases probe the signup stream as a versioned table. The DuckDB
    # oracle uses its native ASOF JOIN — an independent implementation.
    e = load(spark, sf_dir, "events")
    probe = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    build = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"), F.col("user_id"), F.col("ts").alias("s_ts"), F.col("value")
    )
    return (
        asof_join(
            probe,
            build,
            keys=["user_id"],
            probe_ts="ts",
            build_ts="s_ts",
            payload={"s_event_id": "version_id", "value": "version_value"},
        )
        .select("event_id", "user_id", "ts", "version_id", "version_value")
        .orderBy("event_id")
    )


TEMPORAL_JOIN_SQL_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, s.event_id AS version_id, s.value AS version_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
WHERE p.value > 100
ORDER BY p.event_id
"""


@register("temporal_join_sql", TEMPORAL_JOIN_SQL_ORACLE)
def temporal_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's SQL spelling of the event-time temporal join —
    # ``JOIN <versioned> FOR SYSTEM_TIME AS OF p.ts`` (flink-table-planner
    # StreamExecTemporalJoin; versioned table = PRIMARY KEY + WATERMARK
    # DDL). api/temporal.py rewrites the fragment onto the same sort-merge
    # as-of operator as asof_temporal_join (INNER variant: probe rows with
    # no valid version drop), then Spark SQL runs the surrounding query
    # untouched. DuckDB's native ASOF JOIN is the independent oracle.
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    e.where(F.col("event_type") == "purchase").createOrReplaceTempView("__tj_purchases")
    env.create_versioned_view(
        "__tj_signups",
        env.from_dataframe(e.where(F.col("event_type") == "signup")),
        time_attr="ts",
        primary_key="user_id",
    )
    return env.sql_query(
        """
        SELECT p.event_id, p.user_id, p.ts,
               s.event_id AS version_id, s.value AS version_value
        FROM __tj_purchases p
        JOIN __tj_signups FOR SYSTEM_TIME AS OF p.ts AS s
          ON p.user_id = s.user_id
        WHERE p.value > 100
        ORDER BY p.event_id
        """
    ).to_df()


WINDOW_TOPN_EVENTS_ORACLE = """
SELECT window_start, user_id, event_id, value, rn FROM (
  SELECT CAST(to_timestamp((epoch_us(ts) // 3600000000) * 3600) AS TIMESTAMP) AS window_start,
         user_id, event_id, value,
         ROW_NUMBER() OVER (
           PARTITION BY (epoch_us(ts) // 3600000000), user_id
           ORDER BY value DESC, event_id) AS rn
  FROM events
) t WHERE rn <= 2
ORDER BY window_start, user_id, rn
"""


@register("window_topn_events", WINDOW_TOPN_EVENTS_ORACLE)
def window_topn_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window rank / top-n per window (StreamExecWindowRank.java:67): after a
    # tumbling window closes, emit the top 2 events per (window, user).
    e = tumble(load(spark, sf_dir, "events"), "ts", 3600)
    w = W.partitionBy("window_start", "user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("window_start", "user_id", "event_id", "value", "rn")
        .orderBy("window_start", "user_id", "rn")
    )


OVER_RANGE_TIME_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_10m,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS cnt_10m
FROM events
ORDER BY event_id
"""


@register("over_range_time", OVER_RANGE_TIME_ORACLE)
def over_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Event-time RANGE OVER aggregation, the batch form of
    # RowTimeRangeBoundedPrecedingFunction.java:296 (10-minute preceding
    # frame per key). Range frame keyed on epoch micros.
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, W.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(30,8)")).over(w).cast("double").alias("sum_10m"),
            F.count(F.lit(1)).over(w).alias("cnt_10m"),
        )
        .orderBy("event_id")
    )


WINDOW_JOIN_ORACLE = """
WITH w AS (
  SELECT *, (epoch_us(ts) // 3600000000) * 3600 AS win_s FROM events
)
SELECT CAST(to_timestamp(a.win_s) AS TIMESTAMP) AS window_start,
       a.user_id, a.event_id AS view_id, b.event_id AS click_id
FROM (SELECT * FROM w WHERE event_type = 'view') a
JOIN (SELECT * FROM w WHERE event_type = 'click') b
  ON a.win_s = b.win_s AND a.user_id = b.user_id
ORDER BY window_start, a.user_id, view_id, click_id
"""


@register("window_join", WINDOW_JOIN_ORACLE)
def window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window join (reference StreamExecWindowJoin.java:58 → WindowJoinOperator):
    # both sides in the same tumbling window; the join key is
    # (window, user) so state/shuffle are bounded per window.
    e = tumble(load(spark, sf_dir, "events"), "ts", 3600)
    a = e.where(F.col("event_type") == "view").select(
        F.col("window_start"), F.col("user_id"), F.col("event_id").alias("view_id")
    )
    b = e.where(F.col("event_type") == "click").select(
        F.col("window_start").alias("b_ws"), F.col("user_id").alias("b_user"), F.col("event_id").alias("click_id")
    )
    return (
        a.join(b, (F.col("window_start") == F.col("b_ws")) & (F.col("user_id") == F.col("b_user")))
        .select("window_start", "user_id", "view_id", "click_id")
        .orderBy("window_start", "user_id", "view_id", "click_id")
    )


WINDOW_JOIN_SEMI_ORACLE = """
WITH w AS (
  SELECT *, (epoch_us(ts) // 3600000000) * 3600 AS win_s FROM events
)
SELECT CAST(to_timestamp(a.win_s) AS TIMESTAMP) AS window_start,
       a.user_id, a.event_id AS view_id
FROM (SELECT * FROM w WHERE event_type = 'view') a
WHERE EXISTS (
  SELECT 1 FROM (SELECT * FROM w WHERE event_type = 'click') b
  WHERE a.win_s = b.win_s AND a.user_id = b.user_id)
ORDER BY window_start, a.user_id, view_id
"""


@register("window_join_semi", WINDOW_JOIN_SEMI_ORACLE)
def window_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI window join (WindowJoinOperator join-type breadth: views that
    had a same-window click, emitted once). Same (window, key) join
    shape, how='left_semi'."""
    e = tumble(load(spark, sf_dir, "events"), "ts", 3600)
    a = e.where(F.col("event_type") == "view").select(
        F.col("window_start"), F.col("user_id"), F.col("event_id").alias("view_id")
    )
    b = e.where(F.col("event_type") == "click").select(
        F.col("window_start").alias("b_ws"), F.col("user_id").alias("b_user")
    )
    return (
        a.join(b, (F.col("window_start") == F.col("b_ws")) & (F.col("user_id") == F.col("b_user")), "left_semi")
        .select("window_start", "user_id", "view_id")
        .orderBy("window_start", "user_id", "view_id")
    )


SESSION_DYNAMIC_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'error' THEN 600 ELSE 300 END AS gap_s
  FROM events
), ends AS (
  -- session extent is the RUNNING MAX of member ends (a large-gap event
  -- dominates later small-gap ones — interval merge, not row chaining),
  -- and windows are half-open so ts == end opens a NEW session
  SELECT *, MAX(epoch_us(ts) + gap_s * 1000000) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM g
), marked AS (
  SELECT *, CASE WHEN prev_end IS NULL OR epoch_us(ts) >= prev_end
                 THEN 1 ELSE 0 END AS new_session
  FROM ends
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts + gap_s * INTERVAL 1 SECOND) AS session_end,
       COUNT(*) AS cnt
FROM numbered GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("window_session_dynamic", SESSION_DYNAMIC_ORACLE)
def window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dynamic-gap session windows (reference DynamicEventTimeSessionWindows
    # / SessionWindowTimeGapExtractor): gap is a per-row expression.
    e = load(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("600 seconds")).otherwise(F.lit("300 seconds"))
    return (
        e.groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
        )
        .orderBy("user_id", "session_start")
    )


# A deterministic CDC interpretation of the events table so the changelog
# operators get oracle-checked (signup→+I, error→-D, other→+U).
_CDC_SELECT = """
SELECT user_id AS k, ts, event_id,
       value,
       CASE event_type WHEN 'signup' THEN '+I' WHEN 'error' THEN '-D' ELSE '+U' END AS __rowkind
FROM events
"""

CHANGELOG_NORMALIZE_ORACLE = f"""
WITH cdc AS ({_CDC_SELECT}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC, event_id DESC) AS rn
  FROM cdc WHERE __rowkind <> '-U'
)
SELECT k, ts, event_id, value
FROM ranked WHERE rn = 1 AND __rowkind <> '-D'
ORDER BY k
"""


@register("changelog_normalize_batch", CHANGELOG_NORMALIZE_ORACLE)
def changelog_normalize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ChangelogNormalize (StreamExecChangelogNormalize.java:61): current
    # state of an upsert/CDC stream — latest row per key, deleted keys gone.
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    e = load(spark, sf_dir, "events")
    cdc = e.select(
        F.col("user_id").alias("k"),
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", "+I")
        .when(F.col("event_type") == "error", "-D")
        .otherwise("+U")
        .alias("__rowkind"),
    )
    return changelog_normalize(cdc, ["k"], "ts", "event_id").orderBy("k")


RETRACT_AGG_ORACLE = f"""
WITH cdc AS ({_CDC_SELECT})
SELECT k,
       CAST(CAST(SUM(CAST((CASE WHEN __rowkind IN ('+I','+U') THEN 1 ELSE -1 END) * value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_value,
       CAST(SUM(CASE WHEN __rowkind IN ('+I','+U') THEN 1 ELSE -1 END) AS BIGINT) AS live_rows
FROM cdc
GROUP BY k
HAVING SUM(CASE WHEN __rowkind IN ('+I','+U') THEN 1 ELSE -1 END) > 0
ORDER BY k
"""


@register("retract_aggregate_batch", RETRACT_AGG_ORACLE)
def retract_aggregate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Retractable aggregation (GroupAggFunction.java:43): signed
    # contributions with empty-group elimination, exact decimal sums.
    e = load(spark, sf_dir, "events")
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    return (
        e.groupBy(F.col("user_id").alias("k"))
        .agg(
            F.sum((sign * F.col("value")).cast("decimal(30,8)")).cast("double").alias("sum_value"),
            F.sum(sign).cast("bigint").alias("live_rows"),
        )
        .where(F.col("live_rows") > 0)
        .orderBy("k")
    )


# --- retention matrix ---------------------------------------------------------

RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
cells AS (
  SELECT CAST(date_diff('day', DATE '1995-01-01', f.first_day) // 7 AS BIGINT) AS cohort_week,
         CAST(date_diff('day', f.first_day, CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week_offset,
         e.user_id
  FROM events e JOIN firsts f USING (user_id))
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM cells GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("retention_matrix", RETENTION_ORACLE)
def retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic product-analytics retention: users bucketed by first-seen
    week (cohort), each cell counting distinct users active N weeks
    later.  The first-seen aggregate and the back-join share the
    user_id partitioning (one keyed shuffle each); the distinct-count
    runs on the (cohort, offset, user) projection — dim-sized output."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    cells = e.join(firsts, "user_id").select(
        F.floor(
            F.datediff(F.col("first_day"), F.lit("1995-01-01").cast("date")) / 7
        ).cast("bigint").alias("cohort_week"),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.col("first_day")) / 7
        ).cast("bigint").alias("week_offset"),
        "user_id",
    )
    return (
        cells.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- per-user session statistics ---------------------------------------------

SESSION_STATS_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         -- second-boundary diff (not raw interval): matches the Spark
         -- side's epoch-second cast exactly even if timestamps ever
         -- carry sub-second precision
         CASE WHEN date_diff('second',
                             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             ts) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked),
per AS (
  SELECT user_id, sess_id, COUNT(*) AS n_events,
         CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur_s
  FROM sess GROUP BY user_id, sess_id)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(dur_s) AS BIGINT) AS max_session_s,
       CAST(SUM(dur_s) AS BIGINT) AS total_active_s
FROM per GROUP BY user_id ORDER BY user_id
"""


@register("session_stats", SESSION_STATS_ORACLE)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization summary (30-minute gap): session count,
    event volume, longest and total active time — the gaps-and-islands
    composition reported at the USER grain (window_session reports the
    per-session grain).  One user-keyed shuffle carries the lag, the
    running session id, and both aggregates."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    # (ts, event_id) ordering in BOTH windows: a bare ts order leaves
    # tied rows in partition order, nondeterministically splitting a
    # session when a gap-opener shares its timestamp with another event
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    per = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("dur_s"),
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.max("dur_s").cast("bigint").alias("max_session_s"),
            F.sum("dur_s").cast("bigint").alias("total_active_s"),
        )
        .orderBy("user_id")
    )


# --- last-touch marketing attribution ----------------------------------------

ATTRIBUTION_ORACLE = """
WITH rel AS (
  SELECT user_id, ts, event_id, event_type, value FROM events
  WHERE event_type IN ('click', 'view', 'signup', 'purchase')),
w AS (
  SELECT user_id, ts, event_type, value,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN CAST(epoch(ts) AS BIGINT) END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_s
  FROM rel),
conv AS (
  SELECT CASE WHEN touch_type IS NOT NULL
                   AND CAST(epoch(ts) AS BIGINT) - touch_s <= 604800
              THEN touch_type ELSE 'direct' END AS channel, value
  FROM w WHERE event_type = 'purchase')
SELECT channel, COUNT(*) AS n_conversions,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM conv GROUP BY channel ORDER BY channel
"""


@register("attribution_last_touch", ATTRIBUTION_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent preceding touch (click/view/signup) within a 7-day
    lookback, else to 'direct'.  The carry-forward is the streaming
    last-non-null pattern (the same keyed-state shape as the reference's
    TemporalRowTimeJoinOperator.java:78 latest-version lookup), expressed
    as one user-keyed window — a single shuffle on user_id, then a
    channel-grain aggregate.  The event_type IN (...) filter is pushed to
    the parquet scan; 'error' events are neither touch nor conversion.
    Scale: window partitions are per-user (bounded), the final aggregate
    has 4-key cardinality — no hot partition at any corpus size."""
    from incubator_flink_spark.queries.tpch import dsum

    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_s = F.when(F.col("event_type") != "purchase", F.col("ts").cast("long"))
    enriched = e.select(
        "event_type",
        "ts",
        "value",
        F.last(touch_type, ignorenulls=True).over(w).alias("touch_type"),
        F.last(touch_s, ignorenulls=True).over(w).alias("touch_s"),
    )
    conv = enriched.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_type").isNotNull()
            & (F.col("ts").cast("long") - F.col("touch_s") <= 604800),
            F.col("touch_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return (
        conv.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            dsum(F.col("value")).alias("revenue"),
        )
        .orderBy("channel")
    )


# --- time-series gap-fill / forward-fill resample ----------------------------

GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS avg_value
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds),
joined AS (
  SELECT g.event_type, g.hour,
         COALESCE(h.n_events, 0) AS n_events, h.avg_value,
         CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END AS is_gap
  FROM grid g
  LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour)
SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events,
       COALESCE(last_value(avg_value IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
         AS filled_value,
       CAST(is_gap AS BIGINT) AS is_gap
FROM joined ORDER BY event_type, hour
"""


@register("timeseries_gapfill", GAPFILL_ORACLE)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample with forward-fill: hourly averages per event
    type, densified onto the full [min,max] hour grid (gap hours get
    n_events=0 and carry the last observed average forward).  The grid is
    generated per-key with ``sequence()`` — size is time-span-bounded, not
    event-count-bounded, so densification never amplifies the data volume;
    the fill is a per-key last-non-null window (bounded partitions: one per
    event type x span).  At 100 TB the hourly pre-aggregate shrinks the
    event stream to the grid size BEFORE the window runs — the only
    event-proportional step is the first map-side-combined aggregate."""
    from incubator_flink_spark.queries.tpch import dsum

    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (dsum(F.col("value")) / F.count(F.lit(1))).alias("avg_value"),
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    joined = grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        "avg_value",
        F.when(F.col("n_events").isNull(), 1).otherwise(0).cast("bigint").alias("is_gap"),
    )
    fill_w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "hour",
        "n_events",
        F.coalesce(
            F.last("avg_value", ignorenulls=True).over(fill_w), F.lit(0.0)
        ).alias("filled_value"),
        "is_gap",
    ).orderBy("event_type", "hour")


# --- robust outlier detection (median / MAD) ---------------------------------

ZSCORE_ORACLE = """
WITH v AS (SELECT event_type, event_id, value FROM events),
rk AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v),
med AS (
  SELECT event_type,
         CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS med
  FROM rk
  WHERE rn IN (CAST(FLOOR((n+1)/2) AS BIGINT), CAST(FLOOR((n+2)/2) AS BIGINT))
  GROUP BY event_type),
dev AS (
  SELECT v.event_type, v.event_id, ABS(v.value - med.med) AS dev, med.med
  FROM v JOIN med USING (event_type)),
rk2 AS (
  SELECT event_type, dev, med,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev),
mad AS (
  SELECT event_type,
         CAST(CAST(SUM(CAST(dev AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS mad
  FROM rk2
  WHERE rn IN (CAST(FLOOR((n+1)/2) AS BIGINT), CAST(FLOOR((n+2)/2) AS BIGINT))
  GROUP BY event_type)
SELECT d.event_type, COUNT(*) AS n, MIN(d.med) AS med, MIN(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.dev > 4.4478 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       MAX(CASE WHEN d.dev > 4.4478 * m.mad THEN d.dev END) AS max_dev
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
"""


@register("event_outliers_mad", ZSCORE_ORACLE)
def event_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-key outlier detection: exact median and MAD (median
    absolute deviation), then |x-med| > 3*1.4826*MAD flags outliers — the
    standard robust z-score with the Gaussian consistency constant
    (written as the single literal 4.4478 in BOTH engines so the flag
    comparison is the identical IEEE expression).  The median is the exact
    two-middle-rank definition (decimal-sum of the one or two middle
    values / count), NOT an interpolating percentile — bit-identical
    across engines and partitionings.  Both ranking passes partition by
    event_type; at skewed key cardinality the grouped ntile_exact
    discipline (operators/rank.py) is the drop-in remedy, as
    perplexity_buckets does."""
    from incubator_flink_spark.queries.tpch import dsum

    e = load(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def two_middle_median(df, col):
        w = W.partitionBy("event_type").orderBy(col, "event_id")
        wn = W.partitionBy("event_type")
        rk = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        mid = rk.where(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint"))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2).cast("bigint"))
        )
        return mid.groupBy("event_type").agg(
            (dsum(F.col(col)) / F.count(F.lit(1))).alias(f"med_{col}")
        )

    med = two_middle_median(e, "value").withColumnRenamed("med_value", "med")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        "med",
    )
    mad = two_middle_median(dev, "dev").withColumnRenamed("med_dev", "mad")
    flagged = dev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.max(F.when(F.col("dev") > F.lit(4.4478) * F.col("mad"), F.col("dev"))).alias(
                "max_dev"
            ),
        )
        .orderBy("event_type")
    )


# --- event-type transition matrix (clickstream path analysis) ----------------

TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events),
cnt AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type), 6) AS prob
FROM cnt ORDER BY from_type, to_type
"""


@register("event_transition_matrix", TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (clickstream path analysis): count and row-normalized
    probability of each (event_type -> next event_type) step.  One
    user-keyed shuffle carries the LEAD; the count table is
    type-cardinality-sized, so the normalizing window is trivially
    small.  The probability is integer-count division (exact inputs,
    identical IEEE divide) rounded to 6 places in both engines."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    cnt = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("from_type")),
            6,
        ).alias("prob"),
    ).orderBy("from_type", "to_type")


# --- signup -> first-purchase conversion latency -----------------------------

CONVERSION_LATENCY_ORACLE = """
WITH su AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts
  GROUP BY e.user_id),
u AS (
  SELECT su.user_id,
         CAST(FLOOR(date_diff('day', DATE '2024-01-01',
                              CAST(su.signup_ts AS DATE)) / 7) AS BIGINT)
           AS cohort_week,
         CAST(date_diff('second', su.signup_ts, fp.first_purchase_ts) AS BIGINT)
           AS lat_s
  FROM su LEFT JOIN fp ON su.user_id = fp.user_id),
rk AS (
  SELECT cohort_week, lat_s, user_id,
         ROW_NUMBER() OVER (PARTITION BY cohort_week ORDER BY lat_s, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY cohort_week) AS n
  FROM u WHERE lat_s IS NOT NULL),
med AS (
  SELECT cohort_week,
         CAST(CAST(SUM(CAST(lat_s AS DECIMAL(30,8))) AS STRING) AS DOUBLE)
           / COUNT(*) AS median_latency_s
  FROM rk
  WHERE rn IN (CAST(FLOOR((n+1)/2) AS BIGINT), CAST(FLOOR((n+2)/2) AS BIGINT))
  GROUP BY cohort_week)
SELECT u.cohort_week,
       COUNT(*) AS n_signups,
       CAST(SUM(CASE WHEN u.lat_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       ROUND(CAST(SUM(CASE WHEN u.lat_s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS conversion_rate,
       MIN(med.median_latency_s) AS median_latency_s
FROM u LEFT JOIN med ON u.cohort_week = med.cohort_week
GROUP BY u.cohort_week ORDER BY u.cohort_week
"""


@register("conversion_latency_cohorts", CONVERSION_LATENCY_ORACLE)
def conversion_latency_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel analytics: per signup-week cohort, the
    conversion rate and the exact median signup->first-purchase latency
    (two-middle-rank median — the same bit-exact discipline as
    event_outliers_mad, no interpolating percentile).  Both aggregates
    are user-grain (bounded by distinct users); the ranking partitions
    by cohort week.  The survival-analysis complement to
    retention_matrix's activity view."""
    from incubator_flink_spark.queries.tpch import dsum

    e = load(spark, sf_dir, "events")
    su = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    u = su.join(fp, "user_id", "left").select(
        "user_id",
        F.floor(
            F.datediff(F.col("signup_ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
        )
        .cast("bigint")
        .alias("cohort_week"),
        (
            F.col("first_purchase_ts").cast("long") - F.col("signup_ts").cast("long")
        ).alias("lat_s"),
    )
    conv = u.where(F.col("lat_s").isNotNull())
    w = W.partitionBy("cohort_week").orderBy("lat_s", "user_id")
    wn = W.partitionBy("cohort_week")
    rk = conv.select(
        "cohort_week",
        "lat_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        rk.where(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint"))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2).cast("bigint"))
        )
        .groupBy("cohort_week")
        .agg((dsum(F.col("lat_s")) / F.count(F.lit(1))).alias("median_latency_s"))
    )
    return (
        u.groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.when(F.col("lat_s").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_converted"),
            F.round(
                F.sum(F.when(F.col("lat_s").isNotNull(), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("conversion_rate"),
        )
        .join(F.broadcast(med), "cohort_week", "left")
        .select(
            "cohort_week", "n_signups", "n_converted", "conversion_rate", "median_latency_s"
        )
        .orderBy("cohort_week")
    )


# --- SCD2 versioned-dimension build --------------------------------------------
# The construction side of the temporal-join story: the AS OF operators
# above PROBE a versioned table; this builds one.  Purchase events are a
# change history of a per-user spend tier; consecutive same-tier rows
# compress into one version (gaps-and-islands), then each version gets
# its validity interval.  Both windows partition by user_id — the
# dimension key — so there is no global sort at any grain.

_TIER_SQL = "CASE WHEN value < 100 THEN 'bronze' WHEN value < 300 THEN 'silver' ELSE 'gold' END"

SCD2_ORACLE = f"""
WITH h AS (
  SELECT user_id, ts, event_id, {_TIER_SQL} AS tier
  FROM events WHERE event_type = 'purchase'),
lagged AS (
  SELECT *, LAG(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier FROM h),
ver AS (
  SELECT *, SUM(CASE WHEN prev_tier IS NULL OR tier <> prev_tier THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS version
  FROM lagged),
grp AS (
  SELECT user_id, CAST(version AS BIGINT) AS version, MIN(ts) AS valid_from,
         MIN(tier) AS tier, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM ver GROUP BY user_id, version)
SELECT user_id, version, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       tier, n_rows,
       CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM grp ORDER BY user_id, version
"""


@register("scd2_dimension_build", SCD2_ORACLE)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-compressed SCD2 dimension from the purchase history: one row
    per (user, tier-version) with [valid_from, valid_to) intervals and a
    current flag — the versioned table the AS OF joins probe
    (TemporalRowTimeJoinOperator.java:78).  Consecutive unchanged-tier
    rows collapse, so version count is change-bounded, not event-bounded."""
    from incubator_flink_spark.operators.scd import scd2_build

    e = load(spark, sf_dir, "events")
    h = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") < 100, "bronze")
        .when(F.col("value") < 300, "silver")
        .otherwise("gold")
        .alias("tier"),
    )
    return scd2_build(h, "user_id", "ts", "event_id", ["tier"]).orderBy(
        "user_id", "version"
    )


# --- directional as-of with tolerance (merge_asof surface) ----------------------

ASOF_NEAREST_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
b AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
cand AS (
  SELECT p.event_id, b.click_id, b.click_ts,
         abs(epoch_us(p.ts) // 1000000 - epoch_us(b.click_ts) // 1000000) AS delta_s,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(p.ts) // 1000000 - epoch_us(b.click_ts) // 1000000),
                    b.click_ts, b.click_id) AS rn
  FROM p JOIN b ON p.user_id = b.user_id
  WHERE abs(epoch_us(p.ts) // 1000000 - epoch_us(b.click_ts) // 1000000) <= 1800)
SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts, c.delta_s
FROM p LEFT JOIN (SELECT event_id, click_id, click_ts, delta_s FROM cand WHERE rn = 1) c
  USING (event_id)
ORDER BY p.event_id
"""


@register("asof_nearest_tolerance", ASOF_NEAREST_ORACLE)
def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional as-of with tolerance (the pandas merge_asof surface,
    direction='nearest'): each purchase matched to its nearest click
    within 30 minutes, ties to the earlier click.  One keyed shuffle +
    two window passes (operators/asof.asof_join_nearest) — the oracle is
    an independent formulation (banded candidate join + ROW_NUMBER pick)
    of the same semantics."""
    from incubator_flink_spark.operators.asof import asof_join_nearest

    e = load(spark, sf_dir, "events")
    probe = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    build = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("b_eid"), "user_id", F.col("ts").alias("b_ts")
    )
    j = asof_join_nearest(
        probe,
        build,
        keys=["user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        payload={"b_eid": "click_id", "b_ts": "click_ts"},
        direction="nearest",
        tolerance_s=1800,
        tiebreak="b_eid",
    )
    delta = F.abs(F.col("ts").cast("long") - F.col("click_ts").cast("long"))
    return j.select(
        "event_id", "user_id", "ts", "click_id", "click_ts", delta.alias("delta_s")
    ).orderBy("event_id")


# --- histogram-sketch quantiles (batch registry form) --------------------------
# The mergeable fixed-bin quantile sketch (streaming form:
# streaming/sketches.windowed_histogram) at corpus grain: 50 bins over
# [0, 500) with under/overflow cells, quantiles read as the lower edge
# of the first bin whose cumulative count reaches ceil(q*n).  The cell
# build is one map-side-combined aggregate bounded at n_bins+2 cells
# per task; the quantile extraction runs over sketch-sized metadata.

_HQ_LO, _HQ_HI, _HQ_BINS = 0.0, 500.0, 50

HISTOGRAM_QUANTILES_ORACLE = f"""
WITH b AS (
  SELECT CAST(CASE WHEN value < {_HQ_LO} THEN -1
              WHEN value >= {_HQ_HI} THEN {_HQ_BINS}
              ELSE FLOOR((value - {_HQ_LO}) / {_HQ_HI - _HQ_LO} * {_HQ_BINS}) END + 1 AS INT) AS bin
  FROM events),
cells AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin),
cum AS (
  SELECT bin, cnt,
         SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS n
  FROM cells),
qs AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q)
SELECT q,
       (SELECT CASE WHEN c.bin = 0 THEN {_HQ_LO} - {(_HQ_HI - _HQ_LO) / _HQ_BINS}
                    ELSE least({_HQ_LO} + (c.bin - 1) * {(_HQ_HI - _HQ_LO) / _HQ_BINS}, {_HQ_HI}) END
        FROM cum c WHERE c.cum >= CEIL(q * c.n) ORDER BY c.bin LIMIT 1) AS quantile_est
FROM qs ORDER BY q
"""


@register("histogram_quantiles", HISTOGRAM_QUANTILES_ORACLE)
def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from the fixed-bin counting histogram (the mergeable
    sketch the streaming windowed_histogram maintains): p50/p90/p99 of
    event value with error bounded by one bin width, deterministic bin
    arithmetic identical in both engines."""
    from incubator_flink_spark.operators.sketch import histogram_quantile

    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    raw = F.floor((v - F.lit(_HQ_LO)) / F.lit(_HQ_HI - _HQ_LO) * F.lit(_HQ_BINS))
    b = (
        F.when(v < _HQ_LO, F.lit(-1)).when(v >= _HQ_HI, F.lit(_HQ_BINS)).otherwise(raw) + 1
    ).cast("int")
    cells = e.select(b.alias("bin")).groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    return histogram_quantile(cells, [0.5, 0.9, 0.99], _HQ_LO, _HQ_HI, _HQ_BINS).orderBy("q")


WINDOW_SESSION_TVF_SQL_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS window_start,
       MAX(ts) + INTERVAL 300 SECOND AS window_end,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, window_start
"""


@register("window_session_tvf_sql", WINDOW_SESSION_TVF_SQL_ORACLE)
def window_session_tvf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SESSION window TVF through the SQL TEXT surface (PARTITION BY
    key form — StreamExecWindowTableFunction.java:49 / the FLIP-145
    session TVF grammar): pins api/tvf.py's SESSION branch — keyed
    gaps-and-islands merge, window_end = last event + gap — behind the
    driver's oracle gate the way window_cumulate_tvf_sql pins CUMULATE.

    Scale: keyed sessions run at full parallelism (one window partition
    per user); no keyless window exists in the plan."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("events_stvf")
    return env.sql_query(
        """
        SELECT user_id, window_start, window_end, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total
        FROM TABLE(SESSION(TABLE events_stvf PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        GROUP BY user_id, window_start, window_end
        ORDER BY user_id, window_start
        """
    ).to_df()
