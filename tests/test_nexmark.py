"""Streaming executions of the Nexmark-shaped queries
(incubator_flink_spark/queries/nexmark.py): each batch registry entry is
oracle-exact; these tests prove the STREAMING form — watermarked
stream-stream interval join (q4), update-mode sliding/tumbling windowed
aggregation (q5/q7), windowed stream-stream equi join (q8) — reaches the
same final state as the batch query when the stream is replayed to
completion (the reference's nexmark ITCase pattern through its streaming
SQL planner: StreamExecIntervalJoin / StreamExecWindowAggregate /
StreamExecWindowJoin)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.queries import REGISTRY
from incubator_flink_spark.queries.nexmark import DAY, _auctions, _bids
from incubator_flink_spark.streaming.source import replay_table
from incubator_flink_spark.streaming.windows import hop_agg, tumble_agg
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir():
    d = tempfile.mkdtemp(prefix="nexmark_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def drain(stream_df, collect, mode="update"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda bdf, bid: collect(bdf, bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)


def test_nexmark_q4_stream_interval_join_matches_batch(spark, replay_dir):
    """q4 streaming = watermarked stream-stream interval join; the
    per-auction winning bid is folded in foreachBatch (Structured
    Streaming allows one aggregation per query; the category average is
    the window-fire projection) and the finalized per-category averages
    must equal the batch registry entry."""
    a = (
        replay_table(spark, SF, "events", replay_dir + "/q4a", n_files=3)
        .where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("auction_id"),
            (F.col("user_id") % 5).alias("category"),
            F.col("user_id").alias("seller"),
            F.col("ts").alias("open_ts"),
            (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("expires"),
        )
        .withWatermark("open_ts", "1 hour")
    )
    b = (
        replay_table(spark, SF, "events", replay_dir + "/q4b", n_files=3)
        .where(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("bid_seller"),
            F.col("value").alias("price"),
            F.col("ts").alias("bts"),
        )
        .withWatermark("bts", "1 hour")
    )
    joined = a.join(
        b,
        (F.col("seller") == F.col("bid_seller"))
        & (F.col("bts") >= F.col("open_ts"))
        & (F.col("bts") < F.col("expires")),
    )
    best: dict[int, tuple[int, float]] = {}

    def collect(bdf, _bid):
        for r in bdf.groupBy("auction_id", "category").agg(
            F.max("price").alias("p")
        ).collect():
            cur = best.get(r.auction_id)
            if cur is None or r.p > cur[1]:
                best[r.auction_id] = (r.category, r.p)

    drain(joined, collect, mode="append")

    from collections import defaultdict

    agg = defaultdict(list)
    for cat, p in best.values():
        agg[cat].append(p)
    got = {
        cat: (len(ps), round(sum(ps) / len(ps), 6)) for cat, ps in agg.items()
    }
    expected = {
        r.category: (r.n_auctions, round(r.avg_final, 6))
        for r in REGISTRY["nexmark_q4"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q5_stream_hot_items_matches_batch(spark, replay_dir):
    """q5 streaming = update-mode hop-window count per item; the hot-item
    cut (cnt == window max) is the window-fire projection over the final
    per-window counts."""
    stream = replay_table(spark, SF, "events", replay_dir + "/q5", n_files=4).where(
        F.col("event_type") == "click"
    )
    agg = hop_agg(
        stream, "ts", DAY, 21600, 3600, ["user_id"],
        [F.count(F.lit(1)).alias("cnt")],
    )
    counts = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            counts[(r.window_start, r.window_end, r.user_id)] = r.cnt

    drain(agg, collect, mode="update")

    from collections import defaultdict

    mx = defaultdict(int)
    for (ws, _we, _u), c in counts.items():
        mx[ws] = max(mx[ws], c)
    got = {
        (ws, we, u, c) for (ws, we, u), c in counts.items() if c == mx[ws]
    }
    expected = {
        (r.window_start, r.window_end, r.item, r.cnt)
        for r in REGISTRY["nexmark_q5"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q7_stream_highest_bid_matches_batch(spark, replay_dir):
    """q7 streaming = update-mode tumble-window max per (window, bidder);
    the highest-bid cut is the window-fire projection."""
    stream = replay_table(spark, SF, "events", replay_dir + "/q7", n_files=4).where(
        F.col("event_type") == "click"
    )
    agg = tumble_agg(
        stream, "ts", DAY, 3600, ["user_id"],
        [F.max("value").alias("price")],
    )
    by_bidder = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            by_bidder[(r.window_start, r.window_end, r.user_id)] = r.price

    drain(agg, collect, mode="update")

    from collections import defaultdict

    mx = defaultdict(float)
    for (ws, _we, _u), p in by_bidder.items():
        mx[ws] = max(mx[ws], p)
    got = {
        (ws, we, u, p) for (ws, we, u), p in by_bidder.items() if p == mx[ws]
    }
    expected = {
        (r.window_start, r.window_end, r.bidder, r.price)
        for r in REGISTRY["nexmark_q7"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q8_stream_window_join_matches_batch(spark, replay_dir):
    """q8 streaming = windowed stream-stream equi join: both watermarked
    streams derive their tumble window column and join on (user, window)
    — Spark plans the window-equality as the join's state time bound."""
    from incubator_flink_spark.operators.windows import tumble

    s = tumble(
        replay_table(spark, SF, "events", replay_dir + "/q8s", n_files=3).where(
            F.col("event_type") == "signup"
        ).withWatermark("ts", "1 hour"),
        "ts",
        DAY,
    ).select("user_id", "window_start")
    p = tumble(
        replay_table(spark, SF, "events", replay_dir + "/q8p", n_files=3).where(
            F.col("event_type") == "purchase"
        ).withWatermark("ts", "1 hour"),
        "ts",
        DAY,
    ).select(F.col("user_id").alias("p_user"), F.col("window_start").alias("p_ws"))
    joined = s.join(
        p, (F.col("user_id") == F.col("p_user")) & (F.col("window_start") == F.col("p_ws"))
    ).select("window_start", "user_id")
    got = set()
    drain(joined, lambda b, _i: got.update((r.window_start, r.user_id) for r in b.collect()), mode="append")

    expected = {
        (r.window_start, r.user_id)
        for r in REGISTRY["nexmark_q8"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q6_stream_last10_matches_batch(spark, replay_dir):
    """q6 streaming = the q4 interval join with per-(auction, seller,
    open_ts) winning-bid folding; the last-10-per-seller average is the
    window-fire projection over the folded state."""
    a = (
        replay_table(spark, SF, "events", replay_dir + "/q6a", n_files=3)
        .where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("auction_id"),
            F.col("user_id").alias("seller"),
            F.col("ts").alias("open_ts"),
            (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("expires"),
        )
        .withWatermark("open_ts", "1 hour")
    )
    b = (
        replay_table(spark, SF, "events", replay_dir + "/q6b", n_files=3)
        .where(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("bid_seller"),
            F.col("value").alias("price"),
            F.col("ts").alias("bts"),
        )
        .withWatermark("bts", "1 hour")
    )
    joined = a.join(
        b,
        (F.col("seller") == F.col("bid_seller"))
        & (F.col("bts") >= F.col("open_ts"))
        & (F.col("bts") < F.col("expires")),
    )
    best: dict[int, tuple[int, object, float]] = {}

    def collect(bdf, _bid):
        for r in bdf.groupBy("auction_id", "seller", "open_ts").agg(
            F.max("price").alias("p")
        ).collect():
            cur = best.get(r.auction_id)
            if cur is None or r.p > cur[2]:
                best[r.auction_id] = (r.seller, r.open_ts, r.p)

    drain(joined, collect, mode="append")

    from collections import defaultdict

    wins = defaultdict(list)  # seller -> [(open_ts, auction_id, final)]
    for auction_id, (seller, open_ts, p) in best.items():
        wins[seller].append((open_ts, auction_id, p))
    got = {}
    for seller, rows in wins.items():
        rows.sort(key=lambda r: (r[0], r[1]), reverse=True)
        last = rows[:10]
        got[seller] = (len(last), round(sum(p for _, _, p in last) / len(last), 6))
    expected = {
        r.seller: (r.n_last, round(r.avg_last10, 6))
        for r in REGISTRY["nexmark_q6"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q9_stream_winning_bid_rows_match_batch(spark, replay_dir):
    """q9 streaming = the same watermarked interval join as q4 in append
    mode, with the per-auction ARGMAX (price desc, bts asc, bid_id asc)
    folded incrementally in foreachBatch — the StreamExecRank rank=1
    state discipline at row grain.  The finalized winning-bid ROWS must
    equal the batch registry entry."""
    a = (
        replay_table(spark, SF, "events", replay_dir + "/q9a", n_files=3)
        .where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("auction_id"),
            (F.col("user_id") % 5).alias("category"),
            F.col("user_id").alias("seller"),
            F.col("ts").alias("open_ts"),
            (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("expires"),
        )
        .withWatermark("open_ts", "1 hour")
    )
    b = (
        replay_table(spark, SF, "events", replay_dir + "/q9b", n_files=3)
        .where(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("bid_seller"),
            F.col("event_id").alias("bid_id"),
            F.col("value").alias("price"),
            F.col("ts").alias("bts"),
        )
        .withWatermark("bts", "1 hour")
    )
    joined = a.join(
        b,
        (F.col("seller") == F.col("bid_seller"))
        & (F.col("bts") >= F.col("open_ts"))
        & (F.col("bts") < F.col("expires")),
    )
    # per-auction argmax state: (price desc, bts asc, bid_id asc)
    best: dict[int, tuple] = {}

    def collect(bdf, _bid):
        for r in bdf.select(
            "auction_id", "category", "seller", "bid_id", "price", "bts"
        ).collect():
            key = (-r.price, r.bts, r.bid_id)
            cur = best.get(r.auction_id)
            if cur is None or key < cur[0]:
                best[r.auction_id] = (key, (r.category, r.seller, r.bid_id, r.price, r.bts))

    drain(joined, collect, mode="append")

    got = {aid: v for aid, (_, v) in best.items()}
    expected = {
        r.auction_id: (r.category, r.seller, r.bid_id, r.price, r.bts)
        for r in REGISTRY["nexmark_q9"].fn(spark, SF).collect()
    }
    assert got == expected and len(got) > 0


def test_nexmark_q11_stream_sessions_match_batch(spark, replay_dir):
    """q11 streaming = per-bidder SESSION windows (30 min gap) in append
    mode; a far-future sentinel bidder in the final replay file pushes
    the closing watermark past every real session, so the emitted set is
    the COMPLETE session table and must equal the batch registry entry
    (the reference's merging session-window state, StreamExecWindowAggregate)."""
    import datetime as _dt

    from incubator_flink_spark.streaming.windows import session_agg

    d = replay_dir + "/q11"
    stream = replay_table(spark, SF, "events", d, n_files=3)
    # sentinel file: one event a decade out flushes all session state
    spark.createDataFrame(
        [(-1, _dt.datetime(2035, 1, 1), -1, "click", 0.0, None)],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/__file=9")

    bids = stream.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("bidder"), "ts"
    )
    agg = session_agg(bids, "ts", 1800, 120, ["bidder"], [F.count(F.lit(1)).alias("bid_count")])
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            if r.bidder == -1:
                continue
            got[(r.bidder, r.window_start)] = (r.window_end, r.bid_count)

    drain(agg, collect, mode="append")
    expected = {
        (r.bidder, r.session_start): (r.session_end, r.bid_count)
        for r in REGISTRY["nexmark_q11"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q15_stream_multi_distinct_matches_batch(spark, replay_dir):
    """q15 streaming = exact incremental multi-distinct per day via
    per-key distinct-set state (streaming_multi_distinct — the
    SplitAggregateRule distinct-view analog); the final update per day
    must equal the batch multi-distinct aggregate."""
    from incubator_flink_spark.streaming.stateful import streaming_multi_distinct

    stream = replay_table(spark, SF, "events", replay_dir + "/q15", n_files=4).where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("user_id"),
        (F.col("event_id") % 997).alias("auction"),
    )
    agg = streaming_multi_distinct(stream, ["day"], ["user_id", "auction"], total_col="total_bids")
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[r.day] = (r.total_bids, r.distinct_user_id, r.distinct_auction)

    drain(agg, collect, mode="update")
    expected = {
        r.day: (r.total_bids, r.distinct_bidders, r.distinct_auctions)
        for r in REGISTRY["nexmark_q15"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q18_stream_keep_last_matches_batch(spark, replay_dir):
    """q18 streaming = keep-last dedup per (bidder, auction)
    (StreamExecDeduplicate keep-last state); the final winner per key
    must equal the batch rank=1 form."""
    from incubator_flink_spark.streaming.stateful import keep_last_dedup

    stream = replay_table(spark, SF, "events", replay_dir + "/q18", n_files=4).where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("user_id").alias("bidder"),
        (F.col("event_id") % 211).alias("auction"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
        "event_id",
    )
    out = keep_last_dedup(stream, ["bidder", "auction"], "bts", "event_id")
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[(r.bidder, r.auction)] = (r.price, r.bts)

    drain(out, collect, mode="update")
    expected = {
        (r.bidder, r.auction): (r.price, r.bts)
        for r in REGISTRY["nexmark_q18"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q19_stream_topn_matches_batch(spark, replay_dir):
    """q19 streaming = per-auction top-10 with retract-tagged deltas
    (streaming_topn, the RetractableTopNFunction analog): replaying the
    -D/+I delta stream into per-auction sets must reconstruct exactly the
    batch keyed rank<=10 rows (event_id order == event-time order here,
    so the tiebreaks coincide)."""
    from collections import defaultdict

    from incubator_flink_spark.streaming.stateful import streaming_topn

    stream = replay_table(spark, SF, "events", replay_dir + "/q19", n_files=4).where(
        F.col("event_type").isin("click", "view")
    ).select(
        (F.col("event_id") % 97).alias("auction"),
        F.col("event_id").alias("bid_id"),
        F.col("value").alias("price"),
    )
    out = streaming_topn(stream, ["auction"], "bid_id", "price", 10)
    live = defaultdict(set)

    def collect(bdf, _bid):
        rows = [r.asDict() for r in bdf.collect()]
        for r in rows:  # retractions first, then inserts
            if r["__rowkind"] == "-D":
                live[r["auction"]].discard((r["id"], r["value"]))
        for r in rows:
            if r["__rowkind"] == "+I":
                live[r["auction"]].add((r["id"], r["value"]))

    drain(out, collect, mode="update")
    got = {a: s for a, s in live.items() if s}
    expected = defaultdict(set)
    for r in REGISTRY["nexmark_q19"].fn(spark, SF).collect():
        expected[r.auction].add((r.bid_id, r.price))
    assert got == dict(expected)


# --- round 8: the three non-oracle-able public Nexmark queries --------
# q0 (passthrough), q10 (partitioned file-system sink), q12
# (processing-time tumbling count).  These have no deterministic batch
# oracle (q0/q10 are identity/sink shapes, q12 windows on wall-clock),
# so each is proven by its defining invariant instead.

BID_TYPES = ("click", "view")


def _bid_stream(spark, replay_dir, tag, n_files=4):
    return replay_table(spark, SF, "events", f"{replay_dir}/{tag}", n_files=n_files).where(
        F.col("event_type").isin(*BID_TYPES)
    ).select(
        F.col("user_id").alias("bid_seller"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )


def test_nexmark_q0_stream_passthrough(spark, replay_dir):
    """q0: the bid stream passes through unchanged — output multiset
    equals the batch table exactly (the reference's q0 is the no-op
    baseline that pins serialization overhead)."""
    stream = _bid_stream(spark, replay_dir, "q0", n_files=8)
    got = []
    drain(stream, lambda b, _i: got.extend(b.collect()), mode="append")
    want = sorted(tuple(r) for r in _bids(spark, SF).collect())
    assert sorted(tuple(r) for r in got) == want


def test_nexmark_q10_partitioned_file_sink(spark, replay_dir, tmp_path):
    """q10: bids logged to a partitioned file-system sink (dt/hm
    partitions).  The streaming writer lays out dt=/hm= directories, the
    read-back equals the batch input exactly, and a dt filter prunes to
    the partition (PartitionFilters in the scan) — the reference's
    FileSystemTableSink with partition commit."""
    import tempfile

    def with_parts(df):
        return df.select(
            "bid_seller", "price", "bts",
            F.date_format("bts", "yyyy-MM-dd").alias("dt"),
            F.date_format("bts", "HH").alias("hm"),
        )

    out = str(tmp_path / "q10_sink")
    stream = with_parts(_bid_stream(spark, replay_dir, "q10"))
    q = (
        stream.writeStream.format("parquet")
        .partitionBy("dt", "hm")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    bids = with_parts(_bids(spark, SF))
    # directory partition values round-trip through Spark's partition
    # TYPE INFERENCE (dt -> date, hm -> int): normalize both sides back
    # to the written strings before comparing
    back = spark.read.parquet(out).select(
        "bid_seller", "price", "bts",
        F.col("dt").cast("string").alias("dt"),
        F.lpad(F.col("hm").cast("string"), 2, "0").alias("hm"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, bids.collect()))
    one_dt = bids.select("dt").first()["dt"]
    pruned = back.where(F.col("dt") == one_dt)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "dt" in plan.split("PartitionFilters")[1][:120]
    assert pruned.count() == bids.where(F.col("dt") == one_dt).count()


def test_nexmark_q12_processing_time_window_invariant(spark, replay_dir):
    """q12: per-bidder bid counts over PROCESSING-TIME tumbling windows.
    Wall-clock window boundaries are non-deterministic, so the proof is
    the defining invariant: every bid lands in exactly one window, so
    the per-bidder sum across all emitted windows equals the batch
    count, and every window start sits on the 10s grid."""
    stream = _bid_stream(spark, replay_dir, "q12")
    windowed = (
        stream.withColumn("pt", F.current_timestamp())
        .groupBy(F.window("pt", "10 seconds").alias("w"), "bid_seller")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = []
    drain(windowed, lambda b, _i: rows.extend(b.collect()), mode="update")
    final = {}
    for r in rows:
        # update mode re-emits a (window, bidder) pair as it grows: keep the last
        final[(r["w"]["start"], r["bid_seller"])] = r["cnt"]
        assert r["w"]["start"].second % 10 == 0 and r["w"]["start"].microsecond == 0
    per_bidder = {}
    for (_w, bidder), cnt in final.items():
        per_bidder[bidder] = per_bidder.get(bidder, 0) + cnt
    want = {
        r["bid_seller"]: r["cnt"]
        for r in _bids(spark, SF).groupBy("bid_seller").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert per_bidder == want


# --- round 8: streaming==batch proofs for the new registry entries ----


def test_nexmark_q13_stream_lookup_join_matches_batch(spark, replay_dir):
    """q13 streaming = the bid stream joined to the BOUNDED side input
    as a stream-static broadcast join (the reference's lookup join over
    a bounded side input); the appended multiset must equal the batch
    registry entry."""
    stream = replay_table(spark, SF, "events", replay_dir + "/q13", n_files=4).where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("event_id").alias("bid_id"),
        (F.col("event_id") % 97).alias("auction"),
        F.col("user_id").alias("bidder"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )
    side = spark.createDataFrame(
        [(i, f"side-{i}") for i in range(10)], "skey bigint, svalue string"
    )
    joined = stream.join(F.broadcast(side), (F.col("auction") % 10) == F.col("skey")).select(
        "bid_id", "auction", "bidder", "price", "bts", "svalue"
    )
    got = []
    drain(joined, lambda b, _i: got.extend(map(tuple, b.collect())), mode="append")
    want = [tuple(r) for r in REGISTRY["nexmark_q13"].fn(spark, SF).collect()]
    assert sorted(got) == sorted(want)


def _calc_stream_matches_batch(spark, replay_dir, tag, name, exprs, where=None):
    stream = replay_table(spark, SF, "events", f"{replay_dir}/{tag}", n_files=4)
    s = stream.where(where) if where is not None else stream
    out = s.select(*exprs)
    got = []
    drain(out, lambda b, _i: got.extend(map(tuple, b.collect())), mode="append")
    want = [tuple(r) for r in REGISTRY[name].fn(spark, SF).collect()]
    assert sorted(got, key=repr) == sorted(want, key=repr)


def test_nexmark_q14_stream_calc_matches_batch(spark, replay_dir):
    """q14 streaming: the Calc is stateless, so the appended stream must
    equal the batch registry entry row-for-row."""
    price = F.lit(0.908) * F.col("value")
    hour = F.hour("ts")
    _calc_stream_matches_batch(
        spark, replay_dir, "q14s", "nexmark_q14",
        [
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
            (F.length("props") - F.length(F.replace(F.col("props"), F.lit("k"), F.lit("")))).alias("c_counts"),
        ],
        where=F.col("event_type").isin("click", "view") & ((price > 150) | (price < 50)),
    )


def test_nexmark_q21_stream_calc_matches_batch(spark, replay_dir):
    """q21 streaming: stateless CASE + REGEXP_EXTRACT channel mapping."""
    _calc_stream_matches_batch(
        spark, replay_dir, "q21s", "nexmark_q21",
        [
            F.col("event_id").alias("bid_id"),
            (F.col("event_id") % 97).alias("auction"),
            F.col("user_id").alias("bidder"),
            F.col("value").alias("price"),
            F.when(F.col("event_type") == "click", "0")
            .when(F.col("event_type") == "view", "1")
            .otherwise(F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1))
            .alias("channel_id"),
        ],
        where=F.col("event_type").isin("click", "view", "purchase"),
    )


def test_nexmark_q22_stream_calc_matches_batch(spark, replay_dir):
    """q22 streaming: stateless SPLIT_INDEX directory extraction."""
    from incubator_flink_spark.functions import compat

    url = F.concat(
        F.lit("/channel_"), F.col("event_type"),
        F.lit("/user_"), F.col("user_id").cast("string"),
        F.lit("/item_"), (F.col("event_id") % 97).cast("string"),
    )
    _calc_stream_matches_batch(
        spark, replay_dir, "q22s", "nexmark_q22",
        [
            F.col("event_id").alias("bid_id"),
            (F.col("event_id") % 97).alias("auction"),
            F.col("user_id").alias("bidder"),
            F.col("value").alias("price"),
            compat.split_index(url, "/", 1).alias("dir1"),
            compat.split_index(url, "/", 2).alias("dir2"),
            compat.split_index(url, "/", 3).alias("dir3"),
        ],
        where=F.col("event_type").isin("click", "view"),
    )


def test_nexmark_q16_stream_conditional_distinct_matches_batch(spark, replay_dir):
    """q16 streaming = exact incremental conditional multi-distinct: the
    price-band conditions project to NULL outside the band, and the
    distinct-set state ignores NULLs, so distinct-of-banded-column IS
    the conditional COUNT(DISTINCT) (and banded event_id distincts give
    the conditional plain counts, event_id being unique).  The final
    update per (channel, day) must equal the batch registry entry."""
    from incubator_flink_spark.streaming.stateful import streaming_multi_distinct

    v = F.col("value")
    lo, mid, hi = v < 50, (v >= 50) & (v < 150), v >= 150
    bidder, auction = F.col("user_id"), F.col("event_id") % 97
    stream = replay_table(spark, SF, "events", replay_dir + "/q16s", n_files=4).where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("event_type").alias("channel"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.when(lo, F.col("event_id")).alias("id_lo"),
        F.when(mid, F.col("event_id")).alias("id_mid"),
        F.when(hi, F.col("event_id")).alias("id_hi"),
        bidder.alias("bidder"),
        F.when(lo, bidder).alias("bidder_lo"),
        F.when(mid, bidder).alias("bidder_mid"),
        F.when(hi, bidder).alias("bidder_hi"),
        auction.alias("auction"),
        F.when(lo, auction).alias("auction_lo"),
        F.when(mid, auction).alias("auction_mid"),
        F.when(hi, auction).alias("auction_hi"),
    )
    agg = streaming_multi_distinct(
        stream, ["channel", "day"],
        ["id_lo", "id_mid", "id_hi", "bidder", "bidder_lo", "bidder_mid", "bidder_hi",
         "auction", "auction_lo", "auction_mid", "auction_hi"],
        total_col="total_bids",
    )
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[(r.channel, r.day)] = (
                r.total_bids, r.distinct_id_lo, r.distinct_id_mid, r.distinct_id_hi,
                r.distinct_bidder, r.distinct_bidder_lo, r.distinct_bidder_mid, r.distinct_bidder_hi,
                r.distinct_auction, r.distinct_auction_lo, r.distinct_auction_mid, r.distinct_auction_hi,
            )

    drain(agg, collect, mode="update")
    expected = {
        (r.channel, r.day): (
            r.total_bids, r.rank1_bids, r.rank2_bids, r.rank3_bids,
            r.total_bidders, r.rank1_bidders, r.rank2_bidders, r.rank3_bidders,
            r.total_auctions, r.rank1_auctions, r.rank2_auctions, r.rank3_auctions,
        )
        for r in REGISTRY["nexmark_q16"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q17_stream_native_agg_matches_batch(spark, replay_dir):
    """q17 streaming = a NATIVE update-mode grouped aggregate (counts,
    conditional counts via count(when), min/max, exact-decimal sum —
    Structured Streaming handles all of these without custom state);
    the final update per (auction, day) must equal the batch entry."""
    stream = replay_table(spark, SF, "events", replay_dir + "/q17s", n_files=4).where(
        F.col("event_type").isin("click", "view")
    )
    v = F.col("value")
    dsum = F.sum(v.cast("decimal(18,2)")).cast("double")
    agg = stream.groupBy(
        (F.col("event_id") % 97).alias("auction"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("total_bids"),
        F.count(F.when(v < 50, 1)).alias("rank1_bids"),
        F.count(F.when((v >= 50) & (v < 150), 1)).alias("rank2_bids"),
        F.count(F.when(v >= 150, 1)).alias("rank3_bids"),
        F.min(v).alias("min_price"),
        F.max(v).alias("max_price"),
        F.round(dsum / F.count(F.lit(1)), 6).alias("avg_price"),
        dsum.alias("sum_price"),
    )
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[(r.auction, r.day)] = tuple(r)[2:]

    drain(agg, collect, mode="update")
    expected = {
        (r.auction, r.day): tuple(r)[2:]
        for r in REGISTRY["nexmark_q17"].fn(spark, SF).collect()
    }
    assert got == expected


def test_nexmark_q20_stream_expand_join_matches_batch(spark, replay_dir):
    """q20 streaming = the bid stream joined to the auction DIMENSION as
    a stream-static join with the category filter on the static side
    (the reference plans the same filter below the join); the appended
    multiset must equal the batch registry entry."""
    from incubator_flink_spark.queries.nexmark import _auctions as batch_auctions

    a = batch_auctions(spark, SF).where(F.col("category") == 2)
    stream = replay_table(spark, SF, "events", replay_dir + "/q20s", n_files=4).where(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("event_id").alias("bid_id"),
        F.col("user_id").alias("bid_seller"),
        F.col("value").alias("price"),
        F.col("ts").alias("bts"),
    )
    joined = stream.join(a, stream.bid_seller == a.seller).select(
        "bid_id", "price", "bts", "auction_id", "seller", "category", "open_ts", "expires"
    )
    got = []
    drain(joined, lambda b, _i: got.extend(map(tuple, b.collect())), mode="append")
    want = [tuple(r) for r in REGISTRY["nexmark_q20"].fn(spark, SF).collect()]
    assert sorted(got, key=repr) == sorted(want, key=repr)
