"""Structured Streaming semantics tests (the reference's stream ITCase
analog — SURVEY.md §5.3): replay the events table as an ordered file
stream, run watermarked windows / stateful operators, and compare the
final state against the batch ground truth."""

import shutil
import tempfile

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.windows import tumble
from incubator_flink_spark.streaming.source import replay_table
from incubator_flink_spark.streaming.stateful import (
    count_window_counts,
    keep_last_dedup,
    streaming_topn,
)
from incubator_flink_spark.streaming.windows import tumble_agg
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir():
    d = tempfile.mkdtemp(prefix="replay_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_to_completion(stream_df, collect, mode="update"):
    """Drive a streaming query with availableNow, folding each micro-batch
    into `collect(batch_df, batch_id)`."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda bdf, bid: collect(bdf, bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)


def test_streaming_tumble_agg_matches_batch(spark, replay_dir):
    stream = replay_table(spark, SF, "events", replay_dir + "/tumble", n_files=4)
    agg = tumble_agg(
        stream, "ts", 600, 120, ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total")],
    )
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.window_start, r.window_end, r.event_type)] = (r.cnt, round(r.total, 6))

    run_to_completion(agg, collect, mode="update")

    batch = (
        tumble(load(spark, SF, "events"), "ts", 600)
        .groupBy("window_start", "window_end", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total"))
    )
    expected = {
        (r.window_start, r.window_end, r.event_type): (r.cnt, round(r.total, 6)) for r in batch.collect()
    }
    assert state == expected


def test_streaming_cumulate_agg_matches_batch(spark, replay_dir):
    from incubator_flink_spark.operators.windows import cumulate
    from incubator_flink_spark.streaming.windows import cumulate_agg

    stream = replay_table(spark, SF, "events", replay_dir + "/cumulate", n_files=4)
    agg = cumulate_agg(
        stream, "ts", 300, 1200, 120, ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total")],
    )
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.window_start, r.window_end, r.event_type)] = (r.cnt, round(r.total, 6))

    run_to_completion(agg, collect, mode="update")

    batch = (
        cumulate(load(spark, SF, "events"), "ts", 300, 1200)
        .groupBy("window_start", "window_end", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total"))
    )
    expected = {
        (r.window_start, r.window_end, r.event_type): (r.cnt, round(r.total, 6)) for r in batch.collect()
    }
    assert state == expected

    # append mode works at all <=> the watermark survived the k-expansion
    # (no watermark -> AnalysisException; no eviction -> nothing emits);
    # closed slices must agree with the batch truth
    stream2 = replay_table(spark, SF, "events", replay_dir + "/cumulate2", n_files=4)
    agg2 = cumulate_agg(
        stream2, "ts", 300, 1200, 120, ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total")],
    )
    emitted = []

    def collect2(bdf, _bid):
        emitted.extend(bdf.collect())

    run_to_completion(agg2, collect2, mode="append")
    assert emitted, "append mode must emit watermark-closed cumulate slices"
    for r in emitted:
        assert expected[(r.window_start, r.window_end, r.event_type)] == (r.cnt, round(r.total, 6))


def test_streaming_session_dynamic_gap_matches_batch(spark, replay_dir):
    from incubator_flink_spark.streaming.windows import session_agg_dynamic

    gap = F.when(F.col("event_type") == "error", F.lit("600 seconds")).otherwise(F.lit("300 seconds"))
    stream = replay_table(spark, SF, "events", replay_dir + "/sess_dyn", n_files=4)
    agg = session_agg_dynamic(
        stream, "ts", gap, 120, ["user_id"], [F.count(F.lit(1)).alias("cnt")]
    )
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.user_id, r.window_start)] = (r.window_end, r.cnt)

    # update mode is rejected for session aggs — append emits closed
    # sessions only; every emission must match the batch session set
    run_to_completion(agg, collect, mode="append")

    batch = (
        load(spark, SF, "events")
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    expected = {
        (r.user_id, r.w.start): (r.w.end, r.cnt) for r in batch.collect()
    }
    assert state and set(state) <= set(expected)
    assert all(expected[k] == v for k, v in state.items())


def test_streaming_append_mode_drops_open_windows(spark, replay_dir):
    # In append mode only watermark-closed windows emit; the final windows
    # (beyond max event time - delay) must be absent.
    stream = replay_table(spark, SF, "events", replay_dir + "/append", n_files=4)
    agg = tumble_agg(stream, "ts", 600, 120, [], [F.count(F.lit(1)).alias("cnt")])
    emitted = []

    def collect(bdf, _bid):
        emitted.extend(bdf.collect())

    run_to_completion(agg, collect, mode="append")
    max_ts = load(spark, SF, "events").agg(F.max("ts")).first()[0]
    assert emitted, "append mode should emit closed windows"
    assert all(r.window_end <= max_ts for r in emitted)
    # closed windows match batch counts exactly
    batch = {
        (r.window_start, r.window_end): r.cnt
        for r in tumble(load(spark, SF, "events"), "ts", 600)
        .groupBy("window_start", "window_end")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in emitted:
        assert batch[(r.window_start, r.window_end)] == r.cnt


def test_keep_last_dedup_stream_matches_batch(spark, replay_dir):
    stream = replay_table(spark, SF, "events", replay_dir + "/dedup", n_files=4)
    dedup = keep_last_dedup(stream, ["user_id", "event_type"], "ts", "event_id")
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.user_id, r.event_type)] = r.event_id

    run_to_completion(dedup, collect, mode="update")

    e = load(spark, SF, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expected = {
        (r.user_id, r.event_type): r.event_id
        for r in e.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    assert state == expected


def test_streaming_topn_deltas_reconstruct_batch_topn(spark, replay_dir):
    stream = replay_table(spark, SF, "events", replay_dir + "/topn", n_files=4)
    deltas = streaming_topn(stream, ["user_id"], "event_id", "value", 3)
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            if r["__rowkind"] == "+I":
                state[(r.user_id, r.id)] = r.value
            elif r["__rowkind"] == "-D":
                state.pop((r.user_id, r.id), None)

    run_to_completion(deltas, collect, mode="update")

    e = load(spark, SF, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    expected = {
        (r.user_id, r.event_id): r.value
        for r in e.withColumn("rn", F.row_number().over(w)).where("rn <= 3").collect()
    }
    assert state == expected


def test_count_window_stream_counts(spark, replay_dir):
    stream = replay_table(spark, SF, "events", replay_dir + "/cw", n_files=4)
    out = count_window_counts(stream, ["user_id"], "ts", "event_id", "value", 5)
    rows = []

    def collect(bdf, _bid):
        rows.extend(bdf.collect())

    run_to_completion(out, collect, mode="append")
    # every closed window has exactly `size` rows, and the number of closed
    # windows per user equals floor(user_rows/5)
    assert rows and all(r.cnt == 5 for r in rows)
    per_user = load(spark, SF, "events").groupBy("user_id").count().collect()
    expected_windows = {r.user_id: r["count"] // 5 for r in per_user}
    got: dict = {}
    for r in rows:
        got[r.user_id] = got.get(r.user_id, 0) + 1
    assert got == {u: n for u, n in expected_windows.items() if n > 0}


def test_stream_static_join(spark, replay_dir):
    # stream-static broadcast join (reference lookup-join shape)
    stream = replay_table(spark, SF, "events", replay_dir + "/ss", n_files=2)
    users = load(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment")
    )
    joined = stream.join(F.broadcast(users), "user_id", "left")
    seen = []

    def collect(bdf, _bid):
        seen.extend(bdf.collect())

    run_to_completion(joined, collect, mode="append")
    n_events = load(spark, SF, "events").count()
    assert len(seen) == n_events


def test_streaming_over_range_matches_batch(spark, replay_dir):
    from incubator_flink_spark.streaming.stateful import streaming_over_range

    stream = replay_table(spark, SF, "events", replay_dir + "/over", n_files=4)
    out = streaming_over_range(stream, ["user_id"], "ts", "event_id", "value", 600)
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[r.id] = (round(r.sum_range, 6), r.cnt_range)

    run_to_completion(out, collect, mode="append")

    # batch ground truth: RANGE OVER 10 minutes preceding (events replay is
    # globally ts-ordered, so per-key arrival order == event-time order)
    e = load(spark, SF, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, W.currentRow)
    )
    expected = {
        r.event_id: (round(r.s, 6), r.c)
        for r in e.select(
            "event_id",
            F.round(F.sum("value").over(w), 6).alias("s"),
            F.count(F.lit(1)).over(w).alias("c"),
        ).collect()
    }
    assert got == expected


def test_temporal_join_stream_matches_batch_asof(spark, replay_dir):
    from incubator_flink_spark.operators.asof import asof_join
    from incubator_flink_spark.streaming.stateful import temporal_join_stream

    stream = replay_table(spark, SF, "events", replay_dir + "/temporal", n_files=4)
    tagged = stream.where(F.col("event_type").isin("purchase", "signup")).withColumn(
        "side", F.when(F.col("event_type") == "signup", "build").otherwise("probe")
    )
    out = temporal_join_stream(tagged, ["user_id"], "ts", "side", "event_id", "value")
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[r.probe_id] = r.version_id

    run_to_completion(out, collect, mode="append")

    e = load(spark, SF, "events")
    probe = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    build = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"), F.col("user_id"), F.col("ts").alias("s_ts"), F.col("value")
    )
    expected = {
        r.event_id: r.version_id
        for r in asof_join(
            probe, build, keys=["user_id"], probe_ts="ts", build_ts="s_ts",
            payload={"s_event_id": "version_id"},
        ).collect()
    }
    assert got == expected


def test_keep_last_dedup_ttl_expires_state(spark, replay_dir):
    # file 0: key 1 winner at 10:00. file 1: another key at 13:00 pushes
    # the watermark past 10:00+TTL(30min) → key 1's state expires and a
    # tombstone (id=-1) is emitted on the next trigger. Key 2's TTL
    # deadline (13:30) stays beyond the final watermark → no tombstone.
    from incubator_flink_spark.streaming.stateful import keep_last_dedup_ttl

    base = replay_dir + "/ttl"
    schema = "k BIGINT, ts TIMESTAMP, id BIGINT"

    def write_file(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(f"{base}/__file={i}")

    from datetime import datetime

    t = datetime.fromisoformat
    write_file(0, [(1, t("2024-01-01 10:00:00"), 100)])
    write_file(1, [(2, t("2024-01-01 13:00:00"), 200)])  # advances watermark past 10:30
    write_file(2, [(2, t("2024-01-01 13:10:00"), 201)])  # extra trigger so the timer fires

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/__file=*")
        .withWatermark("ts", "1 second")
    )
    out = keep_last_dedup_ttl(stream, ["k"], "ts", "id", ttl_s=1800)
    emitted = []

    def collect(bdf, bid):
        emitted.extend((bid, r.k, r.id) for r in bdf.collect())

    run_to_completion(out, collect, mode="update")
    key1_ids = [i for _, k, i in emitted if k == 1]
    key2_ids = [i for _, k, i in emitted if k == 2]
    assert 100 in key1_ids  # original winner emitted
    assert -1 in key1_ids, f"TTL tombstone not observed: {emitted}"  # state expired
    assert -1 not in key2_ids  # key 2 never expired


def test_checkpoint_recovery_resumes_state(spark, replay_dir):
    # the reference's recovery e2e analog: stop a stateful query, append
    # more input, restart from the SAME checkpoint — state must carry
    # over (no re-emission of already-processed winners, correct final state)
    import os
    from datetime import datetime

    base = replay_dir + "/ckptrec"
    ckpt = replay_dir + "/ckptrec_ckpt"
    schema = "k BIGINT, ts TIMESTAMP, id BIGINT"
    t = datetime.fromisoformat

    def write_file(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(f"{base}/__file={i}")

    def run_once():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(base + "/__file=*")
        out = keep_last_dedup(stream, ["k"], "ts", "id")
        emitted = []
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda b, i: emitted.extend((r.k, r.id) for r in b.collect()))
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        drain_stream(q)
        return emitted

    write_file(0, [(1, t("2024-01-01 10:00:00"), 100), (2, t("2024-01-01 10:00:00"), 200)])
    first = run_once()
    assert set(first) == {(1, 100), (2, 200)}

    # append: newer winner for k=1, OLDER row for k=2 (must lose to
    # state recovered from the checkpoint, not re-emit)
    write_file(1, [(1, t("2024-01-01 11:00:00"), 101), (2, t("2024-01-01 09:00:00"), 199)])
    second = run_once()
    assert set(second) == {(1, 101)}  # k=2's older row suppressed by recovered state


def test_streaming_hop_and_session_match_batch(spark, replay_dir):
    from incubator_flink_spark.operators.windows import hop
    from incubator_flink_spark.streaming.windows import hop_agg, session_agg

    stream = replay_table(spark, SF, "events", replay_dir + "/hop", n_files=3)
    agg = hop_agg(stream, "ts", 600, 300, 120, [], [F.count(F.lit(1)).alias("cnt")])
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[(r.window_start, r.window_end)] = r.cnt

    run_to_completion(agg, collect, mode="update")
    expected = {
        (r.window_start, r.window_end): r.cnt
        for r in hop(load(spark, SF, "events"), "ts", 600, 300)
        .groupBy("window_start", "window_end")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected

    # session windows: update mode is rejected by Spark — append emits
    # closed sessions only; every emission must match the batch session set
    stream2 = replay_table(spark, SF, "events", replay_dir + "/sess", n_files=3)
    sagg = session_agg(stream2, "ts", 300, 120, ["user_id"], [F.count(F.lit(1)).alias("cnt")])
    got2 = {}

    def collect2(bdf, _bid):
        for r in bdf.collect():
            got2[(r.user_id, r.window_start)] = (r.window_end, r.cnt)

    run_to_completion(sagg, collect2, mode="append")
    expected2 = {
        (r.user_id, r["w"]["start"]): (r["w"]["end"], r.cnt)
        for r in load(spark, SF, "events")
        .groupBy(F.session_window("ts", "300 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got2 and set(got2) <= set(expected2)
    assert all(expected2[k] == v for k, v in got2.items())


def test_streaming_cep_matches_batch_closed_region(spark, replay_dir):
    from incubator_flink_spark.catalog import load
    from incubator_flink_spark.cep import Pattern
    from incubator_flink_spark.cep.nfa import find_matches
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    def make_pattern():
        return (
            Pattern.begin("signup")
            .where(lambda e: e["event_type"] == "signup")
            .followed_by("purchase")
            .where(lambda e: e["event_type"] == "purchase")
            .within(3600)
        )

    stream = (
        replay_table(spark, SF, "events", replay_dir + "/cep", n_files=4)
        .withWatermark("ts", "120 seconds")
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "signup_id": int(m["signup"][0]["event_id"]),
            "purchase_id": int(m["purchase"][0]["event_id"]),
        }

    out = match_pattern_stream(
        stream, ["user_id"], "ts", make_pattern(), select,
        "user_id BIGINT, signup_id BIGINT, purchase_id BIGINT", tiebreak="event_id",
    )
    got = set()

    def collect(bdf, _bid):
        got.update((r.user_id, r.signup_id, r.purchase_id) for r in bdf.collect())

    run_to_completion(out, collect, mode="append")

    # batch ground truth restricted to matches closed by the final watermark
    e = load(spark, SF, "events")
    rows = e.collect()
    max_ts = max(r.ts for r in rows)
    import pandas as pd

    final_wm = max_ts - pd.Timedelta(seconds=120)
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(
            {"ts": r.ts, "event_type": r.event_type, "event_id": r.event_id}
        )
    expected = set()
    for uid, evs in per_user.items():
        evs.sort(key=lambda x: (x["ts"], x["event_id"]))
        for m in find_matches(make_pattern(), evs, ts_key="ts"):
            last = max(x["ts"] for v in m.values() for x in v)
            if last <= final_wm:
                expected.add((uid, m["signup"][0]["event_id"], m["purchase"][0]["event_id"]))
    assert got == expected and len(expected) > 0


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_protobuf(), reason="transformWithStateInPandas needs google.protobuf")
def test_keep_last_dedup_tws_matches_legacy(spark, replay_dir):
    # the transformWithStateInPandas implementation must agree with the
    # applyInPandasWithState one (and therefore with batch keep-last)
    from incubator_flink_spark.streaming.stateful import keep_last_dedup_tws

    stream = replay_table(spark, SF, "events", replay_dir + "/tws", n_files=3)
    out = keep_last_dedup_tws(stream, ["user_id", "event_type"], "ts", "event_id")
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.user_id, r.event_type)] = r.event_id

    run_to_completion(out, collect, mode="update")
    e = load(spark, SF, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expected = {
        (r.user_id, r.event_type): r.event_id
        for r in e.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    assert state == expected


def test_upsert_sink_materializes_latest_table(spark, replay_dir):
    import tempfile as tf

    from incubator_flink_spark.streaming.sinks import upsert_sink
    from incubator_flink_spark.streaming.stateful import keep_last_dedup

    stream = replay_table(spark, SF, "events", replay_dir + "/upsert", n_files=3)
    latest = keep_last_dedup(stream, ["user_id", "event_type"], "ts", "event_id")
    table_path = replay_dir + "/upsert_table"
    q = (
        upsert_sink(latest, table_path, ["user_id", "event_type"])
        .trigger(availableNow=True)
        .option("checkpointLocation", tf.mkdtemp())
        .start()
    )
    drain_stream(q)

    # the materialized parquet table equals batch keep-last
    got = {
        (r.user_id, r.event_type): r.event_id for r in spark.read.parquet(table_path).collect()
    }
    e = load(spark, SF, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expected = {
        (r.user_id, r.event_type): r.event_id
        for r in e.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    assert got == expected


def test_temporal_join_version_gc(spark, replay_dir):
    # with version_ttl_s, old versions are pruned but the newest
    # pre-horizon version survives so probe results are unchanged
    from incubator_flink_spark.operators.asof import asof_join
    from incubator_flink_spark.streaming.stateful import temporal_join_stream

    stream = replay_table(spark, SF, "events", replay_dir + "/tgc", n_files=4)
    tagged = stream.where(F.col("event_type").isin("purchase", "signup")).withColumn(
        "side", F.when(F.col("event_type") == "signup", "build").otherwise("probe")
    )
    out = temporal_join_stream(tagged, ["user_id"], "ts", "side", "event_id", "value", version_ttl_s=3600)
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[r.probe_id] = r.version_id

    run_to_completion(out, collect, mode="append")

    e = load(spark, SF, "events")
    probe = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    build = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"), F.col("user_id"), F.col("ts").alias("s_ts"), F.col("value")
    )
    expected = {
        r.event_id: r.version_id
        for r in asof_join(
            probe, build, keys=["user_id"], probe_ts="ts", build_ts="s_ts",
            payload={"s_event_id": "version_id"},
        ).collect()
    }
    assert got == expected


def test_streaming_cep_timeout_side_output(spark, replay_dir):
    """Timed-out partial matches surface via timeout_fn when the watermark
    passes start+within (reference: TimedOutPartialMatchHandler). Files are
    fed one at a time with processAllAvailable so watermark advancement is
    deterministic."""
    import os
    from datetime import datetime

    import pandas as pd

    from incubator_flink_spark.cep import Pattern
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    files = [
        [  # batch 1: both signups + the completing purchase
            (1, t("2024-01-01 00:00:00"), 100, "signup"),
            (2, t("2024-01-01 00:00:10"), 200, "signup"),
            (3, t("2024-01-01 00:10:00"), 200, "purchase"),
        ],
        [  # batch 2: wm -> 00:08:00 (purchase not yet closed)
            (4, t("2024-01-01 02:00:00"), 100, "x"),
            (5, t("2024-01-01 02:00:01"), 200, "x"),
        ],
        [  # batch 3: wm -> 01:58:01 (> deadline 01:00 and > purchase)
            (6, t("2024-01-01 03:00:00"), 100, "x"),
            (7, t("2024-01-01 03:00:01"), 200, "x"),
        ],
    ]
    src_dir = replay_dir + "/cep_timeout_src"
    os.makedirs(src_dir, exist_ok=True)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "120 seconds")
    )

    pattern = (
        Pattern.begin("signup")
        .where(lambda e: e["event_type"] == "signup")
        .followed_by("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(3600)
    )

    def select(key, m):
        return {"user_id": int(key["user_id"]), "signup_id": int(m["signup"][0]["event_id"]), "timed_out": False}

    def timeout(key, p):
        return {"user_id": int(key["user_id"]), "signup_id": int(p["signup"][0]["event_id"]), "timed_out": True}

    out = match_pattern_stream(
        stream, ["user_id"], "ts", pattern, select,
        "user_id BIGINT, signup_id BIGINT, timed_out BOOLEAN",
        tiebreak="event_id", timeout_fn=timeout,
    )
    got = set()
    import tempfile as _tf

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: got.update(
            (r.user_id, r.signup_id, r.timed_out) for r in bdf.collect()
        ))
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_"))
        .start()
    )
    try:
        for i, rows in enumerate(files):
            pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
            spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(src_dir)
            q.processAllAvailable()
    finally:
        q.stop()
    assert (200, 2, False) in got           # completed funnel
    assert (100, 1, True) in got            # timed-out partial
    assert (100, 1, False) not in got and (200, 2, True) not in got


def test_streaming_match_recognize_sql(spark, replay_dir):
    """Streaming MATCH_RECOGNIZE with SQL-text clauses: the V-shape
    pattern over a replayed stream equals the batch SQL result on the
    watermark-closed region."""
    from incubator_flink_spark.cep.match_recognize import match_recognize_stream_sql

    stream = (
        replay_table(spark, SF, "events", replay_dir + "/mr_sql", n_files=4)
        .withWatermark("ts", "120 seconds")
    )
    out = match_recognize_stream_sql(
        stream,
        partition_by=["user_id"],
        order_by="ts",
        pattern="S P",
        define={
            "S": "S.event_type = 'signup'",
            "P": "P.event_type = 'purchase'",
        },
        measures={
            "signup_id": "S.event_id",
            "purchase_id": "P.event_id",
        },
        output_schema="user_id BIGINT, signup_id BIGINT, purchase_id BIGINT",
        within=3600,
        tiebreak="event_id",
    )
    got = set()

    def collect(bdf, _bid):
        got.update((r.user_id, r.signup_id, r.purchase_id) for r in bdf.collect())

    run_to_completion(out, collect, mode="append")

    # batch truth on the closed region, via the batch SQL surface + the
    # same strict-contiguity pattern semantics
    from incubator_flink_spark.cep.nfa import find_matches
    from incubator_flink_spark.cep.sql_expr import compile_define
    from incubator_flink_spark.cep.match_recognize import parse_pattern

    import pandas as pd

    e = load(spark, SF, "events")
    rows = e.collect()
    final_wm = max(r.ts for r in rows) - pd.Timedelta(seconds=120)
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(
            {"ts": r.ts, "event_type": r.event_type, "event_id": r.event_id}
        )
    defs = {
        "S": compile_define("S", "S.event_type = 'signup'"),
        "P": compile_define("P", "P.event_type = 'purchase'"),
    }
    pat = parse_pattern("S P", defs, strict=True).within(3600)
    expected = set()
    for uid, evs in per_user.items():
        evs.sort(key=lambda x: (x["ts"], x["event_id"]))
        for m in find_matches(pat, evs, ts_key="ts"):
            last = max(x["ts"] for v in m.values() for x in v)
            if last <= final_wm:
                expected.add((uid, m["S"][0]["event_id"], m["P"][0]["event_id"]))
    assert got == expected and len(expected) > 0


def test_incremental_dedup_stream_equals_batch(spark, replay_dir):
    """Streaming ingest dedup vs static reference: the union of per-batch
    match tables equals the one-shot batch result (matches depend only
    on (row, static reference)), and the reference is signed once."""
    from incubator_flink_spark.operators.dedup import incremental_dedup
    from incubator_flink_spark.streaming.sinks import incremental_dedup_stream

    d = load(spark, SF, "documents")
    ref = d.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    new = d.where(F.col("doc_id") % 3 != 0).select("doc_id", "text").unionAll(
        d.where(F.col("doc_id") % 15 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xq zv qt")).alias("text"),
        )
    )
    new_dir = replay_dir + "/incdedup_new"
    new.write.mode("overwrite").parquet(new_dir)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    got = {}

    def on_batch(matches, _bid):
        for r in matches.collect():
            got[r.doc_id] = (r.ref_id, r.jaccard)

    q = incremental_dedup_stream(stream, ref, on_batch, threshold=0.8)
    drain_stream(q)
    expected = {
        r.doc_id: (r.ref_id, r.jaccard)
        for r in incremental_dedup(new, ref, threshold=0.8).collect()
    }
    assert got == expected and len(got) > 0


def test_windowed_cms_stream_matches_batch_and_estimates(spark, replay_dir):
    """Streaming per-window CMS cells fold micro-batch-incrementally into
    exactly the batch-built cells (sketch mergeability IS partial
    aggregation), and the resulting per-window estimates never
    underestimate the true windowed counts."""
    from incubator_flink_spark.operators.sketch import cms_estimate
    from incubator_flink_spark.streaming.sketches import windowed_cms

    stream = replay_table(spark, SF, "events", replay_dir + "/cms", n_files=4)
    cells = windowed_cms(stream, "ts", 3600, "event_type")
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.window_start, r.window_end, r.row, r.bucket)] = r.cell

    run_to_completion(cells, collect, mode="update")

    batch_cells = windowed_cms(load(spark, SF, "events"), "ts", 3600, "event_type")
    expected = {
        (r.window_start, r.window_end, r.row, r.bucket): r.cell for r in batch_cells.collect()
    }
    assert state == expected

    # estimates from one window's cells vs that window's true counts
    some_window = next(iter(expected))[0]
    ev = load(spark, SF, "events").where(
        F.window("ts", "3600 seconds").start == F.lit(some_window)
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    sketch = spark.createDataFrame(
        [(k[2], k[3], v) for k, v in state.items() if k[0] == some_window],
        "row INT, bucket LONG, cell LONG",
    )
    got = {r["event_type"]: r["est"] for r in cms_estimate(sketch, exact, "event_type").collect()}
    truth = {r["event_type"]: r["exact_cnt"] for r in exact.collect()}
    assert truth and all(got[k] >= v for k, v in truth.items())


def test_windowed_hll_stream_matches_batch(spark, replay_dir):
    """Streaming per-window HLL registers (max-rho cells) fold into
    exactly the batch registers, and the derived estimate equals the
    batch estimate for every window."""
    from incubator_flink_spark.operators.sketch import hll_estimate
    from incubator_flink_spark.streaming.sketches import windowed_hll

    stream = replay_table(spark, SF, "events", replay_dir + "/hll", n_files=4)
    regs = windowed_hll(stream, "ts", 7200, "user_id")
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.window_start, r.bucket)] = r.reg

    run_to_completion(regs, collect, mode="update")

    batch = windowed_hll(load(spark, SF, "events"), "ts", 7200, "user_id")
    expected = {(r.window_start, r.bucket): r.reg for r in batch.collect()}
    assert state == expected

    some_window = next(iter(expected))[0]
    cells = spark.createDataFrame(
        [(b, v) for (w0, b), v in state.items() if w0 == some_window],
        "bucket LONG, reg INT",
    )
    est = hll_estimate(cells).collect()[0]
    batch_cells = batch.where(F.col("window_start") == F.lit(some_window)).select("bucket", "reg")
    want = hll_estimate(batch_cells).collect()[0]
    assert est["est"] == want["est"] and est["denom_scaled"] == want["denom_scaled"]


def test_streaming_cep_timeout_fires_for_silent_key(spark, replay_dir):
    """A key that never receives another row still emits its timed-out
    partial when OTHER keys advance the watermark past its deadline —
    the per-key event-time timer semantics of the reference's
    CepOperator (previously a documented divergence: timeouts surfaced
    only at the key's next activity)."""
    import os
    from datetime import datetime

    import pandas as pd

    from incubator_flink_spark.cep import Pattern
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    files = [
        [(1, t("2024-01-01 00:00:00"), 100, "signup")],            # key 100, then silence
        [(2, t("2024-01-01 03:00:00"), 999, "x")],                 # other key moves wm
        [(3, t("2024-01-01 04:00:00"), 999, "x")],                 # one more batch so timers fire
    ]
    src_dir = replay_dir + "/cep_silent_src"
    os.makedirs(src_dir, exist_ok=True)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "120 seconds")
    )
    pattern = (
        Pattern.begin("signup")
        .where(lambda e: e["event_type"] == "signup")
        .followed_by("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(3600)
    )
    select = lambda key, m: {"user_id": int(key["user_id"]), "timed_out": False}  # noqa: E731
    timeout = lambda key, p: {"user_id": int(key["user_id"]), "timed_out": True}  # noqa: E731
    out = match_pattern_stream(
        stream, ["user_id"], "ts", pattern, select,
        "user_id BIGINT, timed_out BOOLEAN", tiebreak="event_id", timeout_fn=timeout,
    )
    got = set()
    import tempfile as _tf

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: got.update((r.user_id, r.timed_out) for r in bdf.collect()))
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_"))
        .start()
    )
    try:
        for rows in files:
            pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
            spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(src_dir)
            q.processAllAvailable()
    finally:
        q.stop()
    assert (100, True) in got


def test_bloom_membership_is_stateless_streaming_safe(spark, replay_dir):
    """The bloom membership test is a pure map-side expression, so it
    drops blocklisted rows from a STREAM with no state and no shuffle —
    the stream keeps only rows whose key misses the bloom or fails the
    exact broadcast verify."""
    from incubator_flink_spark.operators.bloom import bloom_build, bloom_might_contain
    from incubator_flink_spark.streaming.source import replay_table

    docs = load(spark, SF, "documents")
    keyed_b = docs.select("doc_id", F.md5("text").alias("ck"))
    bl = keyed_b.where(F.col("doc_id") % 7 == 0).select("ck").distinct()
    words = bloom_build(bl, "ck", 512)

    stream = replay_table(spark, SF, "documents", replay_dir + "/bloom", ts_col="doc_id", n_files=3)
    keyed_s = stream.select("doc_id", F.md5("text").alias("ck"))
    kept_stream = keyed_s.where(
        ~bloom_might_contain(F.col("ck"), words, 512)
    ).unionByName(
        keyed_s.where(bloom_might_contain(F.col("ck"), words, 512)).join(
            F.broadcast(bl), "ck", "anti"
        )
    )
    got = set()

    def collect(bdf, _bid):
        got.update(r["doc_id"] for r in bdf.collect())

    run_to_completion(kept_stream, collect, mode="append")
    want = {r["doc_id"] for r in keyed_b.join(bl, "ck", "anti").collect()}
    assert got == want


def test_growing_dedup_stream_keep_first_across_batches(spark, replay_dir):
    """The reference grows with the stream: exact copies ingested in a
    LATER batch are dropped against earlier batches' survivors, in-batch
    copies keep the smallest id, and the final reference store is
    near-dup-free with keep-first semantics."""
    import os

    from incubator_flink_spark.streaming.sinks import growing_dedup_stream

    base = [r["text"] for r in load(spark, SF, "documents").limit(6).collect()]
    batches = [
        [(1, base[0]), (2, base[1]), (3, base[2])],
        [(11, base[3]), (12, base[0]), (13, base[1])],     # 12, 13 dup batch 1
        [(21, base[3]), (22, base[4]), (23, base[4])],     # 21 dups batch 2; 23 dups 22 in-batch
    ]
    src = replay_dir + "/grow_src"
    os.makedirs(src, exist_ok=True)
    schema = "doc_id LONG, text STRING"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    ref_dir = replay_dir + "/grow_ref"
    seen = {"matches": set(), "survivors": set()}

    def on_batch(survivors, matches, bid):
        seen["survivors"].update(r["doc_id"] for r in survivors.collect())
        seen["matches"].update((r["doc_id"], r["ref_id"]) for r in matches.collect())

    q = growing_dedup_stream(stream, ref_dir, on_batch, threshold=0.9)
    drain_stream(q)
    assert seen["survivors"] == {1, 2, 3, 11, 22}
    assert seen["matches"] == {(12, 1), (13, 2), (21, 11)}
    final = {r["doc_id"] for r in spark.read.parquet(ref_dir + "/b*").collect()}
    assert final == {1, 2, 3, 11, 22}


def test_checkpoint_resume_continues_stateful_agg(spark, replay_dir):
    """The savepoint-restore analog (reference: stop-with-savepoint +
    resume): a stateful windowed aggregation is stopped after consuming
    part of the input, then a NEW query restarts from the same
    checkpoint directory and consumes the rest — the resumed state picks
    up exactly where it left off and the final aggregate equals the
    batch result over all data, with no double counting."""
    import os
    import tempfile

    src = replay_dir + "/ckpt_src"
    os.makedirs(src, exist_ok=True)
    ckpt = tempfile.mkdtemp(prefix="ckpt_resume_")
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    ev = load(spark, SF, "events").select("event_id", "ts", "user_id", "value")
    parts = ev.randomSplit([0.5, 0.5], seed=7)
    state = {}

    def run_once(mode_files):
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            # no watermark: the random split is not time-ordered and the
            # test exercises RESUME, not late-data eviction
            stream.groupBy(F.window("ts", "3600 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("ws"), "cnt")
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(
                lambda bdf, bid: state.update({r["ws"]: r["cnt"] for r in bdf.collect()})
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        drain_stream(q)

    parts[0].coalesce(1).write.mode("append").parquet(src)
    run_once(1)
    partial = dict(state)
    parts[1].coalesce(1).write.mode("append").parquet(src)
    run_once(2)  # NEW query object, same checkpoint => resumes source offsets + state

    batch = (
        ev.groupBy(F.window("ts", "3600 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    expected = {r["ws"]: r["cnt"] for r in batch.collect()}
    assert state == expected
    # and the first run genuinely did partial work (resume was real)
    assert partial and partial != expected


def test_growing_dedup_stream_replay_is_idempotent(spark, replay_dir):
    """Replaying the whole stream against the SAME reference store (a
    fresh checkpoint replays every batch id) leaves the store unchanged:
    each batch overwrites its own directory and dedups against exactly
    the earlier-batch directories — the foreachBatch idempotence the
    retry semantics require."""
    import os

    from incubator_flink_spark.streaming.sinks import growing_dedup_stream

    base = [r["text"] for r in load(spark, SF, "documents").limit(4).collect()]
    batches = [
        [(1, base[0]), (2, base[1])],
        [(11, base[0]), (12, base[2])],  # 11 dups batch 1
    ]
    src = replay_dir + "/grow2_src"
    os.makedirs(src, exist_ok=True)
    schema = "doc_id LONG, text STRING"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    ref_dir = replay_dir + "/grow2_ref"

    def run():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        q = growing_dedup_stream(stream, ref_dir, lambda s, m, b: None, threshold=0.9)
        drain_stream(q)

    run()
    first = sorted(r["doc_id"] for r in spark.read.parquet(ref_dir + "/b*").collect())
    run()  # fresh checkpoint => every batch id replays (the retry case)
    second = sorted(r["doc_id"] for r in spark.read.parquet(ref_dir + "/b*").collect())
    assert first == second == [1, 2, 12]


def test_attribution_stream_equals_batch(spark, replay_dir):
    """Streaming last-touch attribution (O(1) keyed carry-forward state)
    over an event-time-ordered replay emits exactly the batch query's
    per-conversion attribution (the last-non-null window form)."""
    from incubator_flink_spark.streaming.source import replay_table
    from incubator_flink_spark.streaming.stateful import attribution_stream

    stream = replay_table(spark, SF, "events", replay_dir + "/attr_src", n_files=4)
    out = attribution_stream(stream, "user_id", "ts", "event_id", "event_type", "value")
    got = []
    import tempfile as _tf

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(
            lambda bdf, bid: got.extend(
                (r.user_id, r.ts, r.channel, r.value) for r in bdf.collect()
            )
        )
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # batch truth: the registered query's conversion-grain form
    from pyspark.sql import Window as W

    e = load(spark, SF, "events").where(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    enriched = e.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("touch_type"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("ts").cast("long")),
            ignorenulls=True,
        ).over(w).alias("touch_s"),
    )
    expected = [
        (r.user_id, r.ts, r.channel, r.value)
        for r in enriched.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            F.when(
                F.col("touch_type").isNotNull()
                & (F.col("ts").cast("long") - F.col("touch_s") <= 604800),
                F.col("touch_type"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "value",
        )
        .collect()
    ]
    assert sorted(got) == sorted(expected) and len(got) > 0


def test_gapfill_stream_matches_batch_on_closed_region(spark, replay_dir):
    """Streaming gap-fill (timer-driven synthetic gap rows) equals the
    batch resample on the watermark-closed region: per event_type, every
    fully-closed hour appears exactly once, gap hours carry the last
    average forward, and counts match the batch hourly aggregate."""
    from incubator_flink_spark.streaming.source import replay_table
    from incubator_flink_spark.streaming.stateful import gapfill_stream

    stream = (
        replay_table(spark, SF, "events", replay_dir + "/gapfill_src", n_files=4)
        .withWatermark("ts", "120 seconds")
    )
    out = gapfill_stream(stream, "event_type", "ts", "event_id", "value")
    got = {}
    import tempfile as _tf

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(
            lambda bdf, bid: got.update(
                {(r.event_type, r.hour): (r.n_events, round(r.filled_value, 6), r.is_gap)
                 for r in bdf.collect()}
            )
        )
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(got) > 0

    # batch truth in pandas with the SAME accumulation order (ts, event_id)
    import pandas as pd

    e = (
        load(spark, SF, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    final_wm_us = int(e["ts"].max().value // 1000) - 120_000_000
    bucket = 3_600_000_000
    expected = {}
    for etype, g in e.groupby("event_type"):
        hours = (g["ts"].astype("int64") // 1000) // bucket * bucket
        agg = {}
        for h, v in zip(hours, g["value"]):
            s, c = agg.get(h, (0.0, 0))
            agg[h] = (s + float(v), c + 1)
        if not agg:
            continue
        last = 0.0
        has_last = False
        h = min(agg)
        while h + bucket <= final_wm_us:
            if h in agg:
                s, c = agg[h]
                last, has_last = s / c, True
                expected[(etype, pd.Timestamp(h * 1000))] = (c, round(last, 6), 0)
            else:
                expected[(etype, pd.Timestamp(h * 1000))] = (
                    0, round(last, 6) if has_last else 0.0, 1)
            h += bucket
    assert got == expected


def test_gapfill_stream_timer_fires_for_silent_key(spark, replay_dir):
    """A key that stops sending data still emits its gap rows as OTHER
    keys advance the watermark — the per-key event-time timer re-armed
    at each unclosed bucket boundary (the reference's WindowOperator
    onEventTime firing), not input-piggybacked emission."""
    import os
    from datetime import datetime

    import pandas as pd

    from incubator_flink_spark.streaming.stateful import gapfill_stream

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    files = [
        [(1, t("2024-01-01 00:10:00"), "A", 10.0),
         (2, t("2024-01-01 00:20:00"), "B", 1.0)],  # A and B both start
        [(3, t("2024-01-01 05:00:00"), "B", 2.0)],  # only B; wm -> ~05:00
        [(4, t("2024-01-01 06:00:00"), "B", 3.0)],  # one more batch: timers fire
    ]
    src_dir = replay_dir + "/gapfill_silent_src"
    os.makedirs(src_dir, exist_ok=True)
    schema = "event_id BIGINT, ts TIMESTAMP, k STRING, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "120 seconds")
    )
    out = gapfill_stream(stream, "k", "ts", "event_id", "value")
    got = {}
    import tempfile as _tf

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: got.update(
            {(r.k, r.hour): (r.n_events, r.filled_value, r.is_gap) for r in bdf.collect()}
        ))
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_"))
        .start()
    )
    try:
        for rows in files:
            pdf = pd.DataFrame(rows, columns=["event_id", "ts", "k", "value"])
            spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(src_dir)
            q.processAllAvailable()
    finally:
        q.stop()
    # A sent nothing after 00:10 but must have emitted hour 00 (data) and
    # hours 01:00-03:00 as gaps carrying 10.0 forward (wm reached 04:58)
    a_rows = {h.hour: v for (k, h), v in got.items() if k == "A"}
    assert a_rows[0] == (1, 10.0, 0)
    for hh in (1, 2, 3):
        assert a_rows[hh] == (0, 10.0, 1), a_rows


def test_windowed_histogram_stream_matches_batch_and_quantiles(spark, replay_dir):
    """Streaming per-window histogram cells fold micro-batch-incrementally
    into exactly the batch cells, and derived quantiles are within one
    bin width of the exact order statistic."""
    import math

    from incubator_flink_spark.operators.sketch import histogram_quantile
    from incubator_flink_spark.streaming.sketches import windowed_histogram

    LO, HI, BINS = 0.0, 500.0, 50
    stream = replay_table(spark, SF, "events", replay_dir + "/hist", n_files=4)
    cells = windowed_histogram(stream, "ts", 7200, "value", LO, HI, BINS)
    state = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            state[(r.window_start, r.bin)] = r.cnt

    run_to_completion(cells, collect, mode="update")

    batch = windowed_histogram(load(spark, SF, "events"), "ts", 7200, "value", LO, HI, BINS)
    expected = {(r.window_start, r.bin): r.cnt for r in batch.collect()}
    assert state == expected and state

    some_window = sorted(expected)[0][0]
    one = spark.createDataFrame(
        [(b, c) for (w0, b), c in state.items() if w0 == some_window],
        "bin INT, cnt LONG",
    )
    qs = [0.5, 0.9, 0.99]
    got = {
        r["q"]: r["quantile_est"]
        for r in histogram_quantile(one, qs, LO, HI, BINS).collect()
    }
    vals = sorted(
        r["value"]
        for r in load(spark, SF, "events")
        .where(F.window("ts", "7200 seconds").start == F.lit(some_window))
        .select("value")
        .collect()
    )
    width = (HI - LO) / BINS
    for q in qs:
        exact = vals[math.ceil(q * len(vals)) - 1]
        if LO <= exact < HI:
            assert abs(got[q] - exact) <= width, (q, got[q], exact)


def test_streaming_mv_sink_matches_batch_recompute(spark, replay_dir):
    """foreachBatch MV maintenance (MaterializedViewSink): a signed CDC
    stream delta-merged into a standing count/sum MV per micro-batch
    ends exactly at the batch recompute over the full history —
    including eliminated groups (live count 0 leaves the view) — and a
    REPLAYED batch (foreachBatch's at-least-once crash semantics) is a
    no-op thanks to the committed-batch_id guard."""
    import tempfile as _tf

    from incubator_flink_spark.streaming.sinks import MaterializedViewSink, mv_sink

    dec = "decimal(30,8)"
    stream = replay_table(spark, SF, "events", replay_dir + "/mvsink", n_files=4)
    cdc = stream.select(
        F.col("user_id").alias("k"),
        F.when(F.col("event_type") == "error", -1).otherwise(1).alias("__sign"),
        F.col("value").cast(dec).alias("sum_value"),
    )
    path = replay_dir + "/mv_table"
    q = (
        mv_sink(cdc, path, ["k"], "live_rows", ["sum_value"])
        .trigger(availableNow=True)
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_mv_"))
        .start()
    )
    drain_stream(q)
    view = MaterializedViewSink.read(spark, path)
    got = {r["k"]: (r["live_rows"], r["sum_value"]) for r in view.collect()}

    # crash-replay simulation: re-applying the last committed batch (and
    # any earlier one) must be a no-op — the increment is guarded, not
    # blindly re-applied
    applied_id, _ = MaterializedViewSink.committed(path)
    sink = MaterializedViewSink(path, ["k"], "live_rows", ["sum_value"])
    replay = cdc_batch = spark.read.parquet(replay_dir + "/mvsink").select(
        F.col("user_id").alias("k"),
        F.when(F.col("event_type") == "error", -1).otherwise(1).alias("__sign"),
        F.col("value").cast(dec).alias("sum_value"),
    )
    sink(replay, applied_id)
    sink(cdc_batch, 0)
    after = {
        r["k"]: (r["live_rows"], r["sum_value"])
        for r in MaterializedViewSink.read(spark, path).collect()
    }
    assert after == got

    e = load(spark, SF, "events")
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    batch = (
        e.groupBy(F.col("user_id").alias("k"))
        .agg(
            F.sum((sign * F.col("value")).cast(dec)).alias("sum_value"),
            F.sum(sign).cast("bigint").alias("live_rows"),
        )
        .where(F.col("live_rows") > 0)
    )
    expected = {r["k"]: (r["live_rows"], r["sum_value"]) for r in batch.collect()}
    assert got == expected and got

    # GC grace period: a fresh commit keeps the immediately-previous
    # snapshot on disk (a concurrent reader resolving the old pointer
    # mid-swap can finish its scan) and removes anything older
    import os as _os

    _, cur_dir = MaterializedViewSink.committed(path)
    sink(replay.limit(0), applied_id + 1)
    _, new_dir = MaterializedViewSink.committed(path)
    vdirs = {d for d in _os.listdir(path) if d.startswith("v")}
    assert new_dir in vdirs and cur_dir in vdirs and len(vdirs) == 2
    sink(replay.limit(0), applied_id + 2)
    vdirs2 = {d for d in _os.listdir(path) if d.startswith("v")}
    assert cur_dir not in vdirs2 and len(vdirs2) == 2

def test_streaming_cep_group_pattern_matches_batch(spark, replay_dir):
    """GroupPattern through the STREAMING CEP executor
    (streaming/cep_stream.match_pattern_stream): the quantified
    sub-pattern ((click next view)+ consecutive, followedBy purchase)
    replayed under a watermark emits exactly the batch NFA's matches for
    every match that CLOSES mid-stream (a later same-key batch with the
    watermark past the match's last event triggers the emission — the
    reference's CepOperator has the same emit-on-watermark discipline);
    emitted rows are always a subset of the batch match set."""
    import random
    from datetime import datetime, timedelta

    from incubator_flink_spark.cep import Pattern
    from incubator_flink_spark.cep.nfa import find_matches
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    def make_pattern():
        pair = (
            Pattern.begin("c")
            .where(lambda e: e["event_type"] == "click")
            .next("v")
            .where(lambda e: e["event_type"] == "view")
        )
        return (
            Pattern.begin(pair)
            .one_or_more()
            .consecutive()
            .followed_by("p")
            .where(lambda e: e["event_type"] == "purchase")
            .within(600)
        )

    # deterministic dense 2-user traffic: pattern-friendly event mix,
    # one event every ~5s, so every mid-stream match is followed by
    # plenty of same-key batches with an advanced watermark
    rng = random.Random(77)
    epoch = datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        rows.append(
            (
                rng.randint(1, 2),
                i,
                rng.choice(["click", "view", "purchase", "click", "view"]),
                epoch + timedelta(seconds=5 * i + rng.randint(0, 2)),
            )
        )
    schema = "user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP"
    base = replay_dir + "/cepgrp"
    quarter = len(rows) // 4
    for b in range(4):
        spark.createDataFrame(rows[b * quarter : (b + 1) * quarter], schema).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{base}/__file={b:04d}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/__file=*")
        .withWatermark("ts", "30 seconds")
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "start_id": int(m["c"][0]["event_id"]),
            "n_pairs": len(m["c"]),
            "purchase_id": int(m["p"][0]["event_id"]),
        }

    out = match_pattern_stream(
        stream, ["user_id"], "ts", make_pattern(), select,
        "user_id BIGINT, start_id BIGINT, n_pairs BIGINT, purchase_id BIGINT",
        tiebreak="event_id",
    )
    got = set()

    def collect(bdf, _bid):
        got.update(
            (r.user_id, r.start_id, r.n_pairs, r.purchase_id) for r in bdf.collect()
        )

    run_to_completion(out, collect, mode="append")

    per_user = {}
    for uid, eid, et, ts in rows:
        per_user.setdefault(uid, []).append(
            {"ts": ts, "event_type": et, "event_id": eid}
        )
    all_matches = set()
    closed_midstream = set()
    # a match is guaranteed emittable once a LATER batch's watermark
    # passes its last event: require the last event to precede the final
    # file by more than the 30s watermark delay (+jitter margin)
    horizon = rows[3 * quarter][3] - timedelta(seconds=40)
    for uid, evs in per_user.items():
        evs.sort(key=lambda x: (x["ts"], x["event_id"]))
        for m in find_matches(make_pattern(), evs, ts_key="ts"):
            row = (uid, m["c"][0]["event_id"], len(m["c"]), m["p"][0]["event_id"])
            all_matches.add(row)
            if max(x["ts"] for v in m.values() for x in v) < horizon:
                closed_midstream.add(row)
    assert got <= all_matches  # soundness: never a non-batch match
    assert closed_midstream <= got  # completeness for mid-stream closures
    assert len(closed_midstream) > 5


def test_streaming_cep_nested_group_pattern_matches_batch(spark, replay_dir):
    """NESTED GroupPattern through the streaming CEP executor: the outer
    group's body itself contains a group — (((click next view)+ consec)
    next purchase){1,2} consec — replayed under a watermark; mid-stream
    closures equal the batch NFA (same harness discipline as the
    one-level group test above)."""
    import random
    from datetime import datetime, timedelta

    from incubator_flink_spark.cep import Pattern
    from incubator_flink_spark.cep.nfa import find_matches
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    def make_pattern():
        pair = (
            Pattern.begin("c")
            .where(lambda e: e["event_type"] == "click")
            .next("v")
            .where(lambda e: e["event_type"] == "view")
        )
        body = (
            Pattern.begin(pair)
            .one_or_more()
            .consecutive()
            .next("p")
            .where(lambda e: e["event_type"] == "purchase")
        )
        return Pattern.begin(body).times(1, 2).consecutive().within(600)

    rng = random.Random(177)
    epoch = datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        rows.append(
            (
                rng.randint(1, 2),
                i,
                rng.choice(["click", "view", "purchase", "click", "view"]),
                epoch + timedelta(seconds=5 * i + rng.randint(0, 2)),
            )
        )
    schema = "user_id BIGINT, event_id BIGINT, event_type STRING, ts TIMESTAMP"
    base = replay_dir + "/cepnested"
    quarter = len(rows) // 4
    for b in range(4):
        spark.createDataFrame(rows[b * quarter : (b + 1) * quarter], schema).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{base}/__file={b:04d}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/__file=*")
        .withWatermark("ts", "30 seconds")
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "start_id": int(m["c"][0]["event_id"]),
            "n_pairs": len(m["c"]),
            "n_buys": len(m["p"]),
            "last_buy": int(m["p"][-1]["event_id"]),
        }

    out = match_pattern_stream(
        stream, ["user_id"], "ts", make_pattern(), select,
        "user_id BIGINT, start_id BIGINT, n_pairs BIGINT, n_buys BIGINT, last_buy BIGINT",
        tiebreak="event_id",
    )
    got = set()

    def collect(bdf, _bid):
        got.update(
            (r.user_id, r.start_id, r.n_pairs, r.n_buys, r.last_buy)
            for r in bdf.collect()
        )

    run_to_completion(out, collect, mode="append")

    per_user = {}
    for uid, eid, et, ts in rows:
        per_user.setdefault(uid, []).append(
            {"ts": ts, "event_type": et, "event_id": eid}
        )
    all_matches = set()
    closed_midstream = set()
    horizon = rows[3 * quarter][3] - timedelta(seconds=40)
    for uid, evs in per_user.items():
        evs.sort(key=lambda x: (x["ts"], x["event_id"]))
        for m in find_matches(make_pattern(), evs, ts_key="ts"):
            row = (
                uid, m["c"][0]["event_id"], len(m["c"]),
                len(m["p"]), m["p"][-1]["event_id"],
            )
            all_matches.add(row)
            if max(x["ts"] for v in m.values() for x in v) < horizon:
                closed_midstream.add(row)
    assert got <= all_matches
    assert closed_midstream <= got
    assert len(closed_midstream) > 5
