"""Driver-gated streaming semantics (VERDICT-r8 item 2): the
pytest-only §2.9 operators — per-batch-refresh lookup join
(streaming/lookup.py), CountTrigger early firing and allowed-lateness
side output (streaming/triggers.py) — re-registered as registry queries
whose execution path IS the streaming module (a real Structured
Streaming query over file-replay micro-batches), with closed-form batch
oracles DuckDB can verify exactly.

Determinism rules used throughout (so the driver's value-hash matches):

- money/value columns are quantized to integer cents
  (``CAST(x * 100 AS BIGINT)``) BEFORE any streaming aggregation, so
  every running/partial sum is an exact integer — independent of
  association order in Spark, pandas, and DuckDB alike;
- micro-batch boundaries are pinned by construction: one file per
  intended batch, written sequentially with strictly increasing mtimes
  (FileStreamSource orders by modification time), or two separate
  checkpointed runs where the batch boundary is the run boundary;
- every query output carries a total ORDER BY with a unique tiebreak.

Reference parity: StreamExecLookupJoin.java:43 (FOR SYSTEM_TIME AS OF
proc-time against a refreshable dimension), CountTrigger.java:31 +
WindowOperator early firing, WindowedStream.allowedLateness:108 +
sideOutputLateData:124.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register


def _workdir(prefix: str) -> str:
    """mkdtemp + atexit cleanup: the returned DataFrames read their result
    parquet lazily, so the directory must outlive the query call — but
    repeated driver/check runs are separate processes, so cleaning at
    interpreter exit keeps /tmp stable across runs (VERDICT r9 hygiene)."""
    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def _bump_mtimes(root: str, seq: int) -> None:
    """Force strictly increasing file mtimes per replay step so the file
    stream source's modification-time order equals the intended batch
    order even on coarse-mtime filesystems."""
    base = 1_700_000_000 + seq * 10
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            os.utime(p, (base, base))


def _run_stream(writer, checkpoint: str) -> None:
    q = (
        writer.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    # availableNow drains all currently-visible files then stops; generous
    # deadline with isActive polling (slow-host hardening, VERDICT-r8 #8)
    deadline = time.time() + 600
    while q.isActive and time.time() < deadline:
        q.awaitTermination(5)
    if q.isActive:  # pragma: no cover — genuine hang
        q.stop()
        raise TimeoutError(f"streaming query did not drain: {q.lastProgress}")


# --------------------------------------------------------------------------
# (a) lookup join with per-batch dimension refresh: two snapshot epochs
# --------------------------------------------------------------------------

LOOKUP_JOIN_REFRESH_ORACLE = """
SELECT o.o_orderkey % 2 AS epoch,
       c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o.o_custkey) AS n_custs,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) + 100000 * (o.o_orderkey % 2)) AS BIGINT) AS bal_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
ORDER BY epoch, mktsegment
"""


@register("lookup_join_refresh", LOOKUP_JOIN_REFRESH_ORACLE)
def lookup_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch-refresh lookup join (streaming/lookup.py
    lookup_join_per_batch; reference StreamExecLookupJoin.java:43 — FOR
    SYSTEM_TIME AS OF PROCTIME() re-reads the dimension every batch):

    Two genuine snapshot epochs drive the proof.  Run 1: the stream
    source dir holds only the even-orderkey orders file and the dimension
    path holds snapshot v0 (bal_cents = acctbal cents).  Run 2 resumes
    the SAME checkpoint after the dimension was overwritten with snapshot
    v1 (cents + 100000) and the odd-orderkey file appeared — the file
    source replays only the new file, and the freshly loaded dimension is
    joined by the module's broadcast per-batch join.  Rows therefore
    carry v0 values iff their orderkey is even — exactly the oracle's
    `epoch = o_orderkey % 2` reconstruction; any stale-dimension reuse or
    re-processing of epoch-0 rows breaks the hash.

    Scale: the dimension is broadcast per micro-batch (small-dim side),
    the stream side is an ordinary file-source scan — no keyed shuffle at
    all; this is the reference's recommended shape for slowly-changing
    small dimensions."""
    from incubator_flink_spark.streaming.lookup import lookup_join_per_batch

    root = _workdir("lookup_refresh_")
    src = os.path.join(root, "src")
    dim_path = os.path.join(root, "dim")
    res = os.path.join(root, "res")
    cp = os.path.join(root, "ckpt")

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer")

    def dim_snapshot(version: int) -> DataFrame:
        return customer.select(
            F.col("c_custkey").alias("o_custkey"),
            "c_mktsegment",
            F.floor(F.col("c_acctbal") * 100).cast("bigint") + F.lit(100000 * version).cast("bigint"),
        ).toDF("o_custkey", "mktsegment", "bal_cents")

    def sink(joined: DataFrame, _batch_id: int) -> None:
        joined.write.mode("append").parquet(res)

    def dim_loader(s: SparkSession) -> DataFrame:
        return s.read.parquet(dim_path)

    # epoch 0: even orderkeys against dimension snapshot v0
    dim_snapshot(0).write.mode("overwrite").parquet(dim_path)
    orders.where(F.col("o_orderkey") % 2 == 0).write.parquet(os.path.join(src, "b0"))
    _bump_mtimes(src, 0)
    stream = spark.readStream.schema(orders.schema).parquet(src + "/b*")
    writer = lookup_join_per_batch(stream, dim_loader, ["o_custkey"], "left", sink)
    _run_stream(writer, cp)

    # epoch 1: dimension refreshed to v1, odd orderkeys arrive; the same
    # checkpoint resumes so only the new file is processed
    dim_snapshot(1).write.mode("overwrite").parquet(dim_path)
    orders.where(F.col("o_orderkey") % 2 == 1).write.parquet(os.path.join(src, "b1"))
    _bump_mtimes(os.path.join(src, "b1"), 1)
    writer = lookup_join_per_batch(stream, dim_loader, ["o_custkey"], "left", sink)
    _run_stream(writer, cp)

    out = spark.read.parquet(res)
    return (
        out.groupBy(
            (F.col("o_orderkey") % 2).alias("epoch"), F.col("mktsegment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.sum("bal_cents").alias("bal_cents"),
        )
        .orderBy("epoch", "mktsegment")
    )


# --------------------------------------------------------------------------
# (b) CountTrigger early firing: every-n-th-row prefix aggregates
# --------------------------------------------------------------------------

COUNT_TRIGGER_EARLY_FIRE_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(to_timestamp((epoch_us(ts) // 86400000000) * 86400) AS TIMESTAMP) AS window_start,
         CAST(to_timestamp((epoch_us(ts) // 86400000000) * 86400 + 86400) AS TIMESTAMP) AS window_end,
         ROW_NUMBER() OVER w AS rn,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY event_type, epoch_us(ts) // 86400000000
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS run_cents
  FROM events
  WINDOW w AS (PARTITION BY event_type, epoch_us(ts) // 86400000000 ORDER BY ts, event_id)
)
SELECT event_type, window_start, window_end,
       rn AS cnt, run_cents AS total_cents
FROM c
WHERE rn % 5 = 0
ORDER BY event_type, window_start, cnt
"""


@register("count_trigger_early_fire", COUNT_TRIGGER_EARLY_FIRE_ORACLE)
def count_trigger_early_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountTrigger early firing through the stateful streaming operator
    (streaming/triggers.py early_firing_tumble_agg; reference
    CountTrigger.java:31 — fire on every n-th element of the window,
    without purging): the events table replays as ONE micro-batch, so the
    watermark is still at the sentinel during processing and the operator
    emits ONLY the early fires — every 5th row of each (event_type, day)
    window in (ts, event_id) arrival order, each carrying the running
    (cnt, sum) prefix aggregate.  The oracle is the closed form: prefix
    sums over the same total order, rows where rn % 5 = 0.  Values are
    integer cents so running sums are exact in every engine.

    Scale: state is O(open windows) per key and emission is ∝ fires;
    keys shard across the state store like every stateful op here."""
    from incubator_flink_spark.streaming.source import replay_table
    from incubator_flink_spark.streaming.triggers import early_firing_tumble_agg

    root = _workdir("count_trig_")
    events = load(spark, sf_dir, "events")
    # quantize BEFORE streaming: integral doubles sum exactly
    prep = events.select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )
    stream_dir = os.path.join(root, "replay")
    prep.coalesce(1).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema(prep.schema)
        .parquet(stream_dir)
        .withWatermark("ts", "1 minute")
    )
    fired = early_firing_tumble_agg(
        stream, ["event_type"], "ts", "event_id", "cents", size_s=86400, every_n=5
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(F.col("fire_kind") == "early")
        .select(
            "event_type",
            "window_start",
            "window_end",
            F.col("cnt"),
            F.col("total").cast("bigint").alias("total_cents"),
        )
        .orderBy("event_type", "window_start", "cnt")
    )


# --------------------------------------------------------------------------
# (c) allowed lateness: late_update re-fires + late side-output accounting
# --------------------------------------------------------------------------

# Replay construction (mirrored EXACTLY by the oracle's scalar subqueries):
#   file 0: ts < CUT and NOT held      (the on-time bulk)
#   file 1: ts >= CUT                  (advances the watermark to T1)
#   file 2: held rows (event_id % 97 = 0 and ts < CUT) — now late
# With delay 0: the true watermark while file 2 processes is T1 (global
# max ts), and a held row's window [W, We) is
#   - side output ('late_dropped')  iff We + lateness <= T1
#   - re-fire ('late_update')       iff not dropped and We <= T0
#     (T0 = max on-time ts before CUT: the window had already fired final
#      while file 1 processed)
#   - silently added otherwise (its final fires later and is not part of
#     this query's late accounting)
_LATE_CUT = "TIMESTAMP '2024-01-16 00:00:00'"
_LATE_LATENESS_S = 16 * 86400

ALLOWED_LATENESS_ACCOUNTING_ORACLE = f"""
WITH held AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         (epoch_us(ts) // 86400000000) * 86400 AS w_s
  FROM events
  WHERE event_id % 97 = 0 AND ts < {_LATE_CUT}
),
t0 AS (
  SELECT MAX(ts) AS v FROM events
  WHERE ts < {_LATE_CUT} AND NOT (event_id % 97 = 0)
),
t1 AS (SELECT MAX(ts) AS v FROM events),
base AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) * 86400 AS w_s,
         COUNT(*) AS base_cnt,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS base_cents
  FROM events
  WHERE ts < {_LATE_CUT} AND NOT (event_id % 97 = 0)
  GROUP BY 1, 2
),
tagged AS (
  SELECT h.*,
         CASE
           WHEN (h.w_s + 86400 + {_LATE_LATENESS_S}) * 1000000 <= epoch_us(t1.v) THEN 'dropped'
           WHEN (h.w_s + 86400) * 1000000 <= epoch_us(t0.v) THEN 'update'
           ELSE 'silent'
         END AS regime
  FROM held h, t0, t1
)
SELECT g.event_type,
       CAST(to_timestamp(g.w_s) AS TIMESTAMP) AS window_start,
       COUNT(*) FILTER (WHERE g.regime = 'dropped') AS n_dropped,
       CAST(COALESCE(SUM(g.cents) FILTER (WHERE g.regime = 'dropped'), 0) AS BIGINT) AS dropped_cents,
       COUNT(*) FILTER (WHERE g.regime = 'update') AS n_updates,
       CASE WHEN COUNT(*) FILTER (WHERE g.regime = 'update') > 0
            THEN MAX(b.base_cnt) + COUNT(*) FILTER (WHERE g.regime = 'update')
            ELSE NULL END AS last_update_cnt,
       CAST(CASE WHEN COUNT(*) FILTER (WHERE g.regime = 'update') > 0
            THEN MAX(b.base_cents) + SUM(g.cents) FILTER (WHERE g.regime = 'update')
            ELSE NULL END AS BIGINT) AS last_update_cents
FROM tagged g
LEFT JOIN base b ON b.event_type = g.event_type AND b.w_s = g.w_s
WHERE g.regime IN ('dropped', 'update')
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("allowed_lateness_accounting", ALLOWED_LATENESS_ACCOUNTING_ORACLE)
def allowed_lateness_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allowed lateness + late side output through the stateful operator
    (streaming/triggers.py tumble_agg_with_lateness; reference
    WindowedStream.allowedLateness:108 / sideOutputLateData:124): three
    pinned micro-batches — on-time bulk, watermark advancer, held-back
    late rows — make every held row fall into one of the reference's
    three regimes: beyond end+lateness (side output 'late_dropped'),
    within lateness on an already-final window (re-fire 'late_update'
    with the corrected running aggregate), or pre-final (silently merged;
    excluded from this accounting, as in the reference where such rows
    are simply not late).  The query returns the per-window late ledger:
    side-output row count + cents, update count, and the LAST update's
    corrected (cnt, cents) = on-time base plus all held rows.

    The oracle reconstructs the watermark cutoffs as scalar subqueries
    (T0 = max on-time ts before the cut, T1 = global max ts) — the exact
    values the operator's reconstructed event-time watermark takes while
    each file processes.

    Scale: same applyInPandasWithState sharding as the other stateful
    ops; the replay fixture is the test harness, not the operator."""
    from incubator_flink_spark.streaming.triggers import tumble_agg_with_lateness

    root = _workdir("lateness_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    held = F.col("event_id") % 97 == 0
    files = [
        prep.where((F.col("ts") < cut) & ~held),
        prep.where(F.col("ts") >= cut),
        prep.where((F.col("ts") < cut) & held),
    ]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    fired = tumble_agg_with_lateness(
        stream,
        ["event_type"],
        "ts",
        "event_id",
        "cents",
        size_s=86400,
        lateness_s=_LATE_LATENESS_S,
        delay_s=0,
        side_slack_s=365 * 86400,
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res).where(
        F.col("fire_kind").isin("late_dropped", "late_update")
    )
    upd = F.col("fire_kind") == "late_update"
    drp = F.col("fire_kind") == "late_dropped"
    return (
        out.groupBy("event_type", "window_start")
        .agg(
            F.sum(drp.cast("long")).alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(drp, F.col("total").cast("bigint"))), F.lit(0)
            ).alias("dropped_cents"),
            F.sum(upd.cast("long")).alias("n_updates"),
            F.max(F.when(upd, F.col("cnt"))).alias("last_update_cnt"),
            F.max(F.when(upd, F.col("total").cast("bigint"))).alias("last_update_cents"),
        )
        .orderBy("event_type", "window_start")
    )


# --------------------------------------------------------------------------
# (d) CountEvictor: final fires aggregate only the last N rows of the window
# --------------------------------------------------------------------------

COUNT_EVICTOR_FINAL_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         CAST(to_timestamp((epoch_us(ts) // 86400000000) * 86400) AS TIMESTAMP) AS window_start,
         CAST(to_timestamp((epoch_us(ts) // 86400000000) * 86400 + 86400) AS TIMESTAMP) AS window_end,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, epoch_us(ts) // 86400000000
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT event_type, window_start, window_end,
       COUNT(*) AS cnt,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM ranked
WHERE rn <= 4
GROUP BY 1, 2, 3
ORDER BY event_type, window_start
"""


@register("count_evictor_final", COUNT_EVICTOR_FINAL_ORACLE)
def count_evictor_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountEvictor.of(N) semantics through the stateful streaming operator
    (streaming/triggers.py early_firing_tumble_agg with evict_last_n;
    reference flink-streaming-java/.../windowing/evictors/CountEvictor.java
    — keep only the last N elements of the window buffer, so the FINAL
    fire aggregates the last 4 rows by (ts, event_id)):

    Three pinned micro-batches: the full events table, then two
    far-future flusher rows per key (the watermark lags one batch, so the
    second flusher batch is where every real window's final fires and the
    flusher rows themselves are excluded by the window_start cutoff).
    Values are integer cents so the 4-element ring sums exactly.

    The oracle is the closed form: rank each window's rows descending by
    (ts, event_id), keep rank <= 4, count + sum."""
    from incubator_flink_spark.streaming.triggers import early_firing_tumble_agg

    root = _workdir("evict_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )
    kinds = [r.event_type for r in prep.select("event_type").distinct().collect()]

    def flusher(year: int) -> DataFrame:
        return spark.createDataFrame(
            [(-(year * 1000) - j, f"{year}-01-01 00:00:00", k, 0.0) for j, k in enumerate(kinds)],
            "event_id long, ts_s string, event_type string, cents double",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "cents")

    files = [prep, flusher(2033), flusher(2034)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )
    fired = early_firing_tumble_agg(
        stream,
        ["event_type"],
        "ts",
        "event_id",
        "cents",
        size_s=86400,
        every_n=10**9,  # no early fires: this query pins the EVICTOR
        evict_last_n=4,
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(
            (F.col("fire_kind") == "final")
            & (F.col("window_start") < F.lit("2030-01-01").cast("timestamp"))
        )
        .select(
            "event_type",
            "window_start",
            "window_end",
            "cnt",
            F.col("total").cast("bigint").alias("total_cents"),
        )
        .orderBy("event_type", "window_start")
    )


# --------------------------------------------------------------------------
# (e) side outputs: OutputTag splits (multi-tag emission + __main fallback)
# --------------------------------------------------------------------------

SIDE_OUTPUTS_SPLIT_ORACLE = """
WITH t AS (
  SELECT event_type, value,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT tag, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM (
  SELECT 'high_value' AS tag, cents FROM t WHERE value > 90.0
  UNION ALL
  SELECT 'purchases' AS tag, cents FROM t WHERE event_type = 'purchase'
  UNION ALL
  SELECT '__main' AS tag, cents FROM t
  WHERE NOT (value > 90.0) AND NOT (event_type = 'purchase')
) s
GROUP BY tag
ORDER BY tag
"""


@register("side_outputs_split", SIDE_OUTPUTS_SPLIT_ORACLE)
def side_outputs_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side outputs (reference OutputTag / ctx.output — SURVEY §2.9) through
    streaming/lookup.side_outputs: a row matching several tags is emitted
    to EACH of them (the reference allows multi-tag emission); rows
    matching none land in '__main'.  The oracle is the same predicate
    algebra spelled as UNION ALL branches.

    Scale: each tagged output is an independent narrow filter over the
    same scan — no shuffle until the per-tag aggregate."""
    from incubator_flink_spark.streaming.lookup import side_outputs

    events = load(spark, sf_dir, "events").select(
        "event_type", "value", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    )
    outs = side_outputs(
        events,
        {
            "high_value": F.col("value") > 90.0,
            "purchases": F.col("event_type") == "purchase",
        },
    )
    parts = [
        df.select(F.lit(tag).alias("tag"), "cents") for tag, df in sorted(outs.items())
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return (
        un.groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
        .orderBy("tag")
    )


# --------------------------------------------------------------------------
# (f) DeltaTrigger early firing (round 10)
# --------------------------------------------------------------------------

# The trigger chain is inherently sequential (aux = the LAST TRIGGERING
# element's value, seeded by the window's first element), so the oracle
# walks each window's rows with a recursive CTE: step k joins row rn=k+1
# against the chain state of rn=k.  Rows are subsampled (event_id % 3 = 0)
# to bound the recursion depth at the bench scale factor.
DELTA_TRIGGER_EARLY_FIRE_ORACLE = """
WITH RECURSIVE ordered AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CAST(FLOOR(value * 100) AS DOUBLE) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) AS rn,
         SUM(CAST(FLOOR(value * 100) AS DOUBLE)) OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_total
  FROM events
  WHERE event_id % 3 = 0
),
chain AS (
  SELECT event_type, window_start, rn, cents AS aux, FALSE AS fired, run_total
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.window_start, o.rn,
         CASE WHEN ABS(o.cents - c.aux) > 20000 THEN o.cents ELSE c.aux END,
         ABS(o.cents - c.aux) > 20000,
         o.run_total
  FROM chain c
  JOIN ordered o
    ON o.event_type = c.event_type
   AND o.window_start = c.window_start
   AND o.rn = c.rn + 1
)
SELECT event_type, window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       rn AS cnt,
       CAST(run_total AS BIGINT) AS total_cents
FROM chain
WHERE fired
ORDER BY event_type, window_start, cnt
"""


@register("delta_trigger_early_fire", DELTA_TRIGGER_EARLY_FIRE_ORACLE)
def delta_trigger_early_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeltaTrigger early firing through the generalized trigger operator
    (streaming/triggers.py tumble_agg_triggered + DeltaTrigger; reference
    flink-streaming-java/.../windowing/triggers/DeltaTrigger.java:44 —
    fire when delta(last_triggering_element, element) > threshold, then
    remember the element): the subsampled events table replays as ONE
    micro-batch (watermark at the sentinel), so the operator emits ONLY
    the early fires — each carrying the window's running (cnt, sum)
    prefix at the fire, in (ts, event_id) order.  The oracle replays the
    aux chain with a recursive CTE (see above).  Values are integer cents
    so prefix sums are exact.

    Scale: state is O(open-window elements) per key (the reference's
    evicting WindowOperator buffers the same); the recursion is oracle-
    side only."""
    from incubator_flink_spark.streaming.triggers import DeltaTrigger, tumble_agg_triggered

    root = _workdir("delta_trig_")
    events = load(spark, sf_dir, "events")
    prep = events.where(F.col("event_id") % 3 == 0).select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )
    stream_dir = os.path.join(root, "replay")
    prep.coalesce(1).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema(prep.schema)
        .parquet(stream_dir)
        .withWatermark("ts", "1 minute")
    )
    fired = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "cents",
        size_s=86400, trigger=DeltaTrigger(20000.0),
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(F.col("fire_kind") == "early")
        .select(
            "event_type",
            "window_start",
            "window_end",
            "cnt",
            F.col("total").cast("bigint").alias("total_cents"),
        )
        .orderBy("event_type", "window_start", "cnt")
    )


# --------------------------------------------------------------------------
# (g) TimeEvictor final semantics (round 10)
# --------------------------------------------------------------------------

TIME_EVICTOR_FINAL_ORACLE = """
WITH w AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         ts,
         CAST(FLOOR(value * 100) AS DOUBLE) AS cents,
         MAX(ts) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS mx
  FROM events
)
SELECT event_type, window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       COUNT(*) AS cnt,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM w
WHERE ts > mx - INTERVAL 6 HOUR
GROUP BY 1, 2
ORDER BY event_type, window_start
"""


@register("time_evictor_final", TIME_EVICTOR_FINAL_ORACLE)
def time_evictor_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeEvictor.of(6h) semantics through the generalized trigger
    operator (streaming/triggers.py tumble_agg_triggered + TimeEvictor;
    reference flink-streaming-java/.../windowing/evictors/TimeEvictor.java
    — evict buffered elements older than keep_s before the buffer's max
    timestamp, at fire time): three pinned micro-batches (events, then
    two far-future flusher batches — the watermark lags one batch), no
    trigger, so each window fires exactly once at watermark close and the
    FINAL fire aggregates only the rows in the window's trailing 6 event-
    time hours.  The oracle is the closed form: per window keep rows with
    ts > max(ts) - 6h, count + sum of integer cents."""
    from incubator_flink_spark.streaming.triggers import TimeEvictor, tumble_agg_triggered

    root = _workdir("time_evict_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )
    kinds = [r.event_type for r in prep.select("event_type").distinct().collect()]

    def flusher(year: int) -> DataFrame:
        return spark.createDataFrame(
            [(-(year * 1000) - j, f"{year}-01-01 00:00:00", k, 0.0) for j, k in enumerate(kinds)],
            "event_id long, ts_s string, event_type string, cents double",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "cents")

    files = [prep, flusher(2033), flusher(2034)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )
    fired = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "cents",
        size_s=86400, evictor=TimeEvictor(6 * 3600),
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(
            (F.col("fire_kind") == "final")
            & (F.col("window_start") < F.lit("2030-01-01").cast("timestamp"))
        )
        .select(
            "event_type",
            "window_start",
            "window_end",
            "cnt",
            F.col("total").cast("bigint").alias("total_cents"),
        )
        .orderBy("event_type", "window_start")
    )


# --------------------------------------------------------------------------
# (h) CEP timed-out partial matches: the timeout ledger (round 10)
# --------------------------------------------------------------------------

# A signup opens a partial funnel; it COMPLETES iff any purchase by the
# same user follows it (in (ts, event_id) order) within 2 event-time
# hours (within: last.ts - first.ts <= 7200s, inclusive).  Every
# incomplete signup's window expires under the flusher-advanced
# watermark and surfaces exactly once on the timeout side output.
CEP_TIMEOUT_LEDGER_ORACLE = """
SELECT s.user_id, s.event_id AS signup_id
FROM events s
WHERE s.event_type = 'signup'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = s.user_id
      AND p.event_type = 'purchase'
      AND (p.ts > s.ts OR (p.ts = s.ts AND p.event_id > s.event_id))
      AND p.ts <= s.ts + INTERVAL 2 HOUR
  )
ORDER BY s.user_id, signup_id
"""


@register("cep_timeout_ledger", CEP_TIMEOUT_LEDGER_ORACLE)
def cep_timeout_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP timed-out partial matches as a first-class side output
    (streaming/cep_stream.py match_pattern_stream timeout_fn; reference
    CepOperator's TimedOutPartialMatchHandler + PatternStream.flatSelect
    timeout variant): signup -> purchase within 2h per user over the
    events table, replayed as (events, flusher, flusher) micro-batches.
    The flushers push the watermark past every deadline, so each signup
    that never completes emits exactly one timeout row through the
    per-key event-time timers.  The oracle is the closed-form
    non-completion predicate (NOT EXISTS purchase in the window)."""
    from incubator_flink_spark.cep import Pattern
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    root = _workdir("cep_timeout_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select("event_id", "ts", "user_id", "event_type")

    def flusher(year: int) -> DataFrame:
        return spark.createDataFrame(
            [(-(year * 1000), f"{year}-01-01 00:00:00", -1, "x")],
            "event_id long, ts_s string, user_id long, event_type string",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type")

    files = [prep, flusher(2033), flusher(2034)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )

    pattern = (
        Pattern.begin("signup")
        .where(lambda e: e["event_type"] == "signup")
        .followed_by("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(7200)
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "signup_id": int(m["signup"][0]["event_id"]),
            "timed_out": False,
        }

    def timeout(key, p):
        return {
            "user_id": int(key["user_id"]),
            "signup_id": int(p["signup"][0]["event_id"]),
            "timed_out": True,
        }

    matched = match_pattern_stream(
        stream, ["user_id"], "ts", pattern, select,
        "user_id BIGINT, signup_id BIGINT, timed_out BOOLEAN",
        tiebreak="event_id", timeout_fn=timeout,
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(matched.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(F.col("timed_out"))
        .select("user_id", "signup_id")
        .orderBy("user_id", "signup_id")
    )


# --------------------------------------------------------------------------
# (i) retract-emitting streaming join: net state == batch join (round 10)
# --------------------------------------------------------------------------

RETRACT_JOIN_NET_STATE_ORACLE = """
SELECT o.o_custkey AS k,
       o.o_orderkey AS left_id,
       CAST(FLOOR(o.o_totalprice * 100) AS DOUBLE) AS left_value,
       c.c_custkey AS right_id,
       CAST(FLOOR(c.c_acctbal * 100) AS DOUBLE) AS right_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 20 = 0
  AND o.o_orderkey % 60 <> 0
  AND c.c_custkey % 7 <> 0
ORDER BY k, left_id
"""


@register("retract_join_net_state", RETRACT_JOIN_NET_STATE_ORACLE)
def retract_join_net_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The +I/-D retract-emitting streaming join (streaming/retract_join.py
    retracting_join_stream; reference StreamingJoinOperator.java:136-190
    retract pseudo-code) driven over a three-batch changelog built from
    orders x customer: batch 0 inserts all (surviving) customers and half
    the order subset, batch 1 the other half, batch 2 DELETES a third of
    the orders and every 7th customer — each delete retracting its live
    matches.  Folding the emitted +I/-D stream (net count per joined
    pair) must reproduce the batch inner join of the NET tables, which is
    the oracle."""
    from incubator_flink_spark.streaming.changelog import DELETE, INSERT, ROWKIND
    from incubator_flink_spark.streaming.retract_join import retracting_join_stream

    root = _workdir("rjoin_gate_")
    src = os.path.join(root, "src")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.floor(F.col("o_totalprice") * 100).cast("double").alias("v"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_custkey").alias("id"),
        F.floor(F.col("c_acctbal") * 100).cast("double").alias("v"),
    )

    def tag(df: DataFrame, kind: str, side: str) -> DataFrame:
        return df.select(
            F.lit(kind).alias(ROWKIND), "k", F.lit(side).alias("side"), "id", "v"
        )

    files = [
        # batch 0: ALL customers (the %7 ones are deleted again in batch
        # 2), then half the orders
        tag(cust, INSERT, "right").unionByName(
            tag(orders.where(F.col("id") % 40 == 0), INSERT, "left")
        ),
        # batch 1: the other half of the orders
        tag(orders.where(F.col("id") % 40 != 0), INSERT, "left"),
        # batch 2: deletes — orders first, then customers (same batch)
        tag(orders.where(F.col("id") % 60 == 0), DELETE, "left").unionByName(
            tag(cust.where(F.col("k") % 7 == 0), DELETE, "right")
        ),
    ]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    schema = files[0].schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/b*")
    )
    joined = retracting_join_stream(stream, ["k"], "side", "id", "v")
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(joined.writeStream.outputMode("update").foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.groupBy("k", "left_id", "left_value", "right_id", "right_value")
        .agg(
            F.sum(F.when(F.col(ROWKIND) == INSERT, 1).otherwise(-1)).alias("__net")
        )
        .where(F.col("__net") > 0)
        .select("k", "left_id", "left_value", "right_id", "right_value")
        .orderBy("k", "left_id")
    )


# --------------------------------------------------------------------------
# (j) streaming Top-N over a retracting changelog: folded state == batch
# --------------------------------------------------------------------------

STREAMING_TOPN_NET_ORACLE = """
WITH net AS (
  SELECT event_type,
         event_id AS id,
         CAST(FLOOR(value * 100) AS DOUBLE) AS cents
  FROM events
  WHERE (event_id % 4 = 0 AND NOT (event_id % 3 = 0)) OR event_id % 4 = 1
),
ranked AS (
  SELECT event_type, id, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents DESC, id) AS rnk
  FROM net
)
SELECT event_type, CAST(rnk AS INTEGER) AS rank, id, cents AS value
FROM ranked
WHERE rnk <= 5
ORDER BY event_type, rank
"""


@register("streaming_topn_net", STREAMING_TOPN_NET_ORACLE)
def streaming_topn_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retract-consuming streaming Top-N (streaming/stateful.streaming_topn
    with op_col; reference RetractableTopNFunction.java — -D/-U retract
    the exact (value, id) entry, retractions can promote entries back
    INTO the top-N): batch 0 inserts one event subset, batch 1 retracts
    a third of it and inserts a second subset.  The emitted delta stream
    is folded by LAST EVENT PER (key, id) — present iff that event is
    +I, at that event's rank — which must equal the batch Top-5 of the
    net entries (the oracle)."""
    from pyspark.sql import Window as W

    from incubator_flink_spark.streaming.stateful import streaming_topn

    root = _workdir("topn_gate_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").alias("id"),
        F.floor(F.col("value") * 100).cast("double").alias("cents"),
    )
    ins0 = events.where(F.col("id") % 4 == 0).select(
        F.lit("+I").alias("op"), "event_type", "id", "cents"
    )
    dels = events.where((F.col("id") % 4 == 0) & (F.col("id") % 3 == 0)).select(
        F.lit("-D").alias("op"), "event_type", "id", "cents"
    )
    ins1 = events.where(F.col("id") % 4 == 1).select(
        F.lit("+I").alias("op"), "event_type", "id", "cents"
    )
    files = [ins0, dels.unionByName(ins1)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(files[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    deltas = streaming_topn(stream, ["event_type"], "id", "cents", n=5, op_col="op")
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, bid: int) -> None:
        # (bid, seq) gives per-key emission order for the fold; seq is
        # per-partition monotonic, and one key's batch output lives in one
        # partition, so it orders correctly where it matters
        bdf.withColumn("bid", F.lit(bid)).withColumn(
            "seq", F.monotonically_increasing_id()
        ).write.mode("append").parquet(res)

    _run_stream(deltas.writeStream.outputMode("update").foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    w = W.partitionBy("event_type", "id").orderBy(F.desc("bid"), F.desc("seq"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("__rowkind") == "+I"))
        .select("event_type", "rank", "id", "value")
        .orderBy("event_type", "rank")
    )


# --------------------------------------------------------------------------
# (k) async I/O ordered enrichment == plain join (round 10)
# --------------------------------------------------------------------------

ASYNC_LOOKUP_ENRICH_ORACLE = """
SELECT e.event_id, n.n_name AS nation_name
FROM events e
JOIN nation n ON e.user_id % 25 = n.n_nationkey
ORDER BY e.event_id
"""


@register("async_lookup_enrich", ASYNC_LOOKUP_ENRICH_ORACLE)
def async_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async I/O enrichment (operators/async_io.async_map; reference
    AsyncDataStream.orderedWait / AsyncWaitOperator.java:78): every event
    row issues a (thread-pooled) lookup of user_id % 25 against the
    25-row nation dimension, ORDERED mode, capacity 8 — a narrow
    no-shuffle map pass whose result must equal the plain broadcast join
    (the oracle).  The dimension is collected driver-side (25 rows, the
    reference's async client state) and closed over by the lookup fn."""
    from incubator_flink_spark.operators.async_io import async_map

    nation = {
        int(r.n_nationkey): r.n_name
        for r in load(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    }

    def lookup(row: dict) -> dict:
        return {
            "event_id": int(row["event_id"]),
            "nation_name": nation[int(row["user_id"]) % 25],
        }

    events = load(spark, sf_dir, "events").select("event_id", "user_id")
    out = async_map(
        events, lookup, "event_id long, nation_name string", capacity=8, ordered=True
    )
    return out.orderBy("event_id")


# --------------------------------------------------------------------------
# (l) ContinuousEventTimeTrigger periodic early firing (round 10, cont.)
# --------------------------------------------------------------------------

# Replay walks the watermark through the month in weekly chunks (files
# split at fixed day boundaries), so each chunk's LAST day is still open
# when the next batch's watermark arrives just below the boundary — that
# window takes exactly one periodic early fire (boundaries crossed inside
# one batch coalesce; a window closing in the same batch suppresses the
# early).  Closed form: a window fires early iff the FIRST chunk
# watermark >= its first 6h boundary is still before the window's end.
CONTINUOUS_TRIGGER_ORACLE = """
WITH d AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         ts,
         CAST(FLOOR(value * 100) AS DOUBLE) AS cents
  FROM events
),
w AS (
  SELECT event_type, window_start,
         COUNT(*) AS cnt,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(to_timestamp((FLOOR(epoch(MIN(ts)) / 21600) + 1) * 21600) AS TIMESTAMP)
           AS first_fire
  FROM d GROUP BY 1, 2
),
chunk_wm AS (
  SELECT (SELECT max(ts) FROM events WHERE ts < b.boundary)
           - INTERVAL 60 SECOND AS wm
  FROM (VALUES (TIMESTAMP '2024-01-08'), (TIMESTAMP '2024-01-15'),
               (TIMESTAMP '2024-01-22'), (TIMESTAMP '2024-01-29'),
               (TIMESTAMP '2034-01-01')) b(boundary)
),
early AS (
  SELECT w.event_type, w.window_start, w.cnt, w.total_cents,
         (SELECT min(c.wm) FROM chunk_wm c WHERE c.wm >= w.first_fire) AS wm_star
  FROM w
  WHERE w.first_fire < w.window_start + INTERVAL 1 DAY
)
SELECT event_type, window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       cnt, total_cents, 'early' AS fire_kind
FROM early
WHERE wm_star IS NOT NULL AND wm_star < window_start + INTERVAL 1 DAY
UNION ALL
SELECT event_type, window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       cnt, total_cents, 'final' AS fire_kind
FROM w
ORDER BY event_type, window_start, fire_kind
"""


@register("continuous_trigger_periodic", CONTINUOUS_TRIGGER_ORACLE)
def continuous_trigger_periodic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ContinuousEventTimeTrigger(6h) through the generalized trigger
    operator (streaming/triggers.py tumble_agg_triggered; reference
    flink-streaming-java/.../windowing/triggers/
    ContinuousEventTimeTrigger.java — register the first interval boundary
    at/after the first element, fire and re-register as the watermark
    passes it): the events table replays in FIVE chronological chunks
    split at fixed day boundaries plus two far-future sentinel batches, so
    the watermark walks the month week by week.  Each chunk's trailing day
    is open when the following batch's watermark lands just below the
    split boundary and takes exactly one coalesced periodic early fire
    (full-day content — chunks split at day boundaries); every window also
    fires final at close.  The oracle computes, per window, the first
    chunk watermark at/after its first 6h boundary and keeps the early
    fire iff that watermark precedes the window end (a window closing in
    the same batch suppresses the early fire, exactly like the operator).

    Scale: state is O(open-window elements) per key — the watermark walk
    bounds open windows to one day per key at a time."""
    from incubator_flink_spark.streaming.triggers import (
        ContinuousEventTimeTrigger,
        tumble_agg_triggered,
    )

    root = _workdir("cont_trig_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )
    bounds = ["2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29"]
    chunks = [prep.where(F.col("ts") < bounds[0])]
    for lo, hi in zip(bounds, bounds[1:]):
        chunks.append(prep.where((F.col("ts") >= lo) & (F.col("ts") < hi)))
    chunks.append(prep.where(F.col("ts") >= bounds[-1]))

    def sentinel(year: int) -> DataFrame:
        return spark.createDataFrame(
            [(-year, f"{year}-01-01 00:00:00", "__flush", 0.0)],
            "event_id long, ts_s string, event_type string, cents double",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "cents")

    files = [*chunks, sentinel(2033), sentinel(2034)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )
    fired = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "cents",
        size_s=86400, trigger=ContinuousEventTimeTrigger(21600),
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where((F.col("event_type") != "__flush") & (F.col("window_start") < "2030-01-01"))
        .select(
            "event_type", "window_start", "window_end", "cnt",
            F.col("total").cast("bigint").alias("total_cents"), "fire_kind",
        )
        .orderBy("event_type", "window_start", "fire_kind")
    )


# --------------------------------------------------------------------------
# (m) DeltaEvictor final semantics (round 10, cont.)
# --------------------------------------------------------------------------

DELTA_EVICTOR_FINAL_ORACLE = """
WITH w AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CAST(FLOOR(value * 100) AS DOUBLE) AS cents,
         LAST_VALUE(CAST(FLOOR(value * 100) AS DOUBLE)) OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_cents
  FROM events
)
SELECT event_type, window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       COUNT(*) AS cnt,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM w
WHERE ABS(cents - last_cents) < 15000
GROUP BY 1, 2
ORDER BY event_type, window_start
"""


@register("delta_evictor_final", DELTA_EVICTOR_FINAL_ORACLE)
def delta_evictor_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeltaEvictor semantics through the generalized trigger operator
    (streaming/triggers.py tumble_agg_triggered + DeltaEvictor; reference
    flink-streaming-java/.../windowing/evictors/DeltaEvictor.java — at
    fire time, evict every buffered element whose delta against the LAST
    buffered element reaches the threshold): one data batch plus two
    far-future sentinel batches, no trigger, so each daily window fires
    exactly once at watermark close and the FINAL fire aggregates only
    the rows within 15000 cents of the window's last element in
    (ts, event_id) order.  The oracle is the closed form over LAST_VALUE."""
    from incubator_flink_spark.streaming.triggers import DeltaEvictor, tumble_agg_triggered

    root = _workdir("delta_evict_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )

    def sentinel(year: int) -> DataFrame:
        return spark.createDataFrame(
            [(-year, f"{year}-01-01 00:00:00", "__flush", 0.0)],
            "event_id long, ts_s string, event_type string, cents double",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "cents")

    files = [prep, sentinel(2033), sentinel(2034)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )
    fired = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "cents",
        size_s=86400, evictor=DeltaEvictor(15000.0),
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(
            (F.col("fire_kind") == "final")
            & (F.col("event_type") != "__flush")
            & (F.col("window_start") < "2030-01-01")
        )
        .select(
            "event_type", "window_start", "window_end", "cnt",
            F.col("total").cast("bigint").alias("total_cents"),
        )
        .orderBy("event_type", "window_start")
    )


# --------------------------------------------------------------------------
# (n) Keyed-state TTL with observable tombstones (round 10, cont.)
# --------------------------------------------------------------------------

STATE_TTL_TOMBSTONES_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         event_id,
         CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
win AS (
  SELECT event_type, day, event_id, ts, cents FROM (
    SELECT e.*, ROW_NUMBER() OVER (
      PARTITION BY event_type, day ORDER BY ts DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
g AS (
  SELECT max(CAST(date_trunc('second', ts) AS TIMESTAMP))
           + INTERVAL 3540 SECOND AS wm
  FROM events
)
SELECT event_type, day, event_id, ts, cents FROM win
UNION ALL
SELECT w.event_type, w.day, CAST(-1 AS BIGINT),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT)
FROM win w, g
WHERE w.ts + INTERVAL 864000 SECOND <= g.wm
ORDER BY event_type, day, event_id
"""


@register("state_ttl_tombstones", STATE_TTL_TOMBSTONES_ORACLE)
def state_ttl_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed-state TTL through streaming/stateful.keep_last_dedup_ttl
    (reference StateTtlConfig + StreamExecDeduplicate state retention —
    a key's winner state is dropped once the watermark passes
    last_update + ttl, observable here as an emitted tombstone row with
    tiebreak = -1): events keyed by (event_type, day) replay as one data
    batch plus two flusher batches that advance the watermark 1h past the
    table's max timestamp.  Every key emits its keep-last winner in the
    data batch; keys whose last activity is more than the 10-day TTL
    before the final watermark (max + 1h - 1min) additionally emit the
    TTL tombstone — so late-month keys survive and early-month keys
    expire, at every scale factor.  Timestamps are second-truncated so
    the ms-granular timeout clock is exact on both sides."""
    from incubator_flink_spark.streaming.stateful import keep_last_dedup_ttl

    root = _workdir("state_ttl_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.select(
        F.col("event_type"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_id"),
        F.date_trunc("second", F.col("ts")).alias("ts"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    max_ts = prep.agg(F.max("ts")).collect()[0][0]

    def flusher(offset_s: int) -> DataFrame:
        import datetime

        t = max_ts + datetime.timedelta(seconds=offset_s)
        return spark.createDataFrame(
            [("__flush", "2033-01-01 00:00:00", -offset_s, t.strftime("%Y-%m-%d %H:%M:%S"), 0)],
            "event_type string, day_s string, event_id long, ts_s string, cents long",
        ).select(
            "event_type",
            F.col("day_s").cast("timestamp").alias("day"),
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "cents",
        )

    files = [prep, flusher(3600), flusher(7200)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )
    deduped = keep_last_dedup_ttl(
        stream, ["event_type", "day"], "ts", "event_id", ttl_s=864000
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(deduped.writeStream.outputMode("update").foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where(F.col("event_type") != "__flush")
        .select("event_type", "day", "event_id", "ts", "cents")
        .orderBy("event_type", "day", "event_id")
    )


# --------------------------------------------------------------------------
# (o) PurgingTrigger (FIRE_AND_PURGE) chunked fires (round 10, cont.)
# --------------------------------------------------------------------------

# PurgingTrigger(CountTrigger(5)): every 5th element fires AND purges the
# pane, so fires aggregate DISJOINT 5-row chunks in (ts, event_id) order;
# the watermark-close fire emits the remainder (< 5 rows) and nothing at
# all for an empty pane.  Closed form: chunk = floor(row_index / 5); a
# complete chunk (5 rows) is an 'early' fire, the incomplete tail chunk
# is the 'final' fire.
PURGING_TRIGGER_ORACLE = """
WITH ordered AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CAST(FLOOR(value * 100) AS DOUBLE) AS cents,
         CAST(FLOOR((ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) - 1) / 5) AS BIGINT) AS chunk
  FROM events
  WHERE event_id % 3 = 0
)
SELECT event_type, window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       COUNT(*) AS cnt,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CASE WHEN COUNT(*) = 5 THEN 'early' ELSE 'final' END AS fire_kind
FROM ordered
GROUP BY event_type, window_start, chunk
ORDER BY event_type, window_start, fire_kind, total_cents
"""


@register("purging_trigger_chunks", PURGING_TRIGGER_ORACLE)
def purging_trigger_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PurgingTrigger semantics through the generalized trigger operator
    (streaming/triggers.py tumble_agg_triggered purging=True; reference
    flink-streaming-java/.../windowing/triggers/PurgingTrigger.java —
    wraps any trigger, turning FIRE into FIRE_AND_PURGE so the pane is
    cleared after each fire): CountTrigger(5) over daily windows on the
    subsampled events stream fires disjoint 5-row chunk aggregates; the
    final watermark fire carries only the remainder rows, and exact
    5-multiples leave an empty pane that (like the reference's null
    contents) emits nothing at close.  The oracle groups each window's
    rows into chunks of five in (ts, event_id) order."""
    from incubator_flink_spark.streaming.triggers import CountTrigger, tumble_agg_triggered

    root = _workdir("purging_trig_")
    src = os.path.join(root, "src")
    events = load(spark, sf_dir, "events")
    prep = events.where(F.col("event_id") % 3 == 0).select(
        "event_id", "ts", "event_type", F.floor(F.col("value") * 100).cast("double").alias("cents")
    )

    def sentinel(year: int) -> DataFrame:
        return spark.createDataFrame(
            [(-year, f"{year}-01-01 00:00:00", "__flush", 0.0)],
            "event_id long, ts_s string, event_type string, cents double",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "cents")

    files = [prep, sentinel(2033), sentinel(2034)]
    for i, f in enumerate(files):
        d = os.path.join(src, f"b{i}")
        f.coalesce(1).write.parquet(d)
        _bump_mtimes(d, i)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .withWatermark("ts", "1 minute")
    )
    fired = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "cents",
        size_s=86400, trigger=CountTrigger(5), purging=True,
    )
    res = os.path.join(root, "res")

    def sink(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("append").parquet(res)

    _run_stream(fired.writeStream.foreachBatch(sink), os.path.join(root, "ckpt"))
    out = spark.read.parquet(res)
    return (
        out.where((F.col("event_type") != "__flush") & (F.col("window_start") < "2030-01-01"))
        .select(
            "event_type", "window_start", "window_end", "cnt",
            F.col("total").cast("bigint").alias("total_cents"), "fire_kind",
        )
        .orderBy("event_type", "window_start", "fire_kind", "total_cents")
    )
