"""Trigger / evictor / allowed-lateness operator tests (SURVEY.md §2.9
"Triggers", "Evictors", "Allowed lateness + late side output" rows) —
the reference's WindowOperatorTest-style harness scenarios: drive ordered
(and deliberately late) elements through the operator and assert the
fired records per kind."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.windows import tumble
from incubator_flink_spark.streaming.source import replay_table
from incubator_flink_spark.streaming.triggers import (
    early_firing_tumble_agg,
    tumble_agg_with_lateness,
)
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir():
    d = tempfile.mkdtemp(prefix="trig_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_to_completion(stream_df, collect, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda bdf, bid: collect(bdf, bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)


def batch_tumble_truth(spark, size_s):
    return {
        (r.window_start, r.window_end, r.event_type): (r.cnt, round(r.total, 6))
        for r in (
            tumble(load(spark, SF, "events"), "ts", size_s)
            .groupBy("window_start", "window_end", "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total"))
        ).collect()
    }


def test_early_firing_count_trigger_matches_batch_finals(spark, replay_dir):
    stream = replay_table(spark, SF, "events", replay_dir + "/early", n_files=4).withWatermark("ts", "2 minutes")
    out = early_firing_tumble_agg(stream, ["event_type"], "ts", "event_id", "value", 86400, every_n=3)
    finals, earlies = {}, []

    def collect(bdf, _bid):
        for r in bdf.collect():
            if r.fire_kind == "final":
                finals[(r.window_start, r.window_end, r.event_type)] = (r.cnt, round(r.total, 6))
            else:
                earlies.append(r)

    run_to_completion(out, collect)

    expected = batch_tumble_truth(spark, 86400)
    # final fires must exactly match batch truth on the watermark-closed
    # region; open tail windows never fire
    assert finals
    for k, v in finals.items():
        assert expected[k] == v
    # count trigger produced early partials (every 5th row), each a prefix
    # of its window's final aggregate
    assert earlies
    for r in earlies:
        assert r.cnt % 3 == 0
        k = (r.window_start, r.window_end, r.event_type)
        if k in finals:
            assert r.cnt <= finals[k][0]


def test_count_evictor_final_aggregates_last_n(spark, replay_dir):
    n = 3
    stream = replay_table(spark, SF, "events", replay_dir + "/evict", n_files=4).withWatermark("ts", "2 minutes")
    out = early_firing_tumble_agg(
        stream, ["event_type"], "ts", "event_id", "value", 86400, every_n=10**9, evict_last_n=n
    )
    finals = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            if r.fire_kind == "final":
                finals[(r.window_start, r.window_end, r.event_type)] = (r.cnt, round(r.total, 6))

    run_to_completion(out, collect)

    # ground truth: last N rows of each window by (ts, event_id)
    e = load(spark, SF, "events")
    from pyspark.sql import Window as W

    w = tumble(e, "ts", 86400)
    ranked = w.withColumn(
        "__rn",
        F.row_number().over(
            W.partitionBy("window_start", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ),
    ).where(F.col("__rn") <= n)
    expected = {
        (r.window_start, r.window_end, r.event_type): (r.cnt, round(r.total, 6))
        for r in ranked.groupBy("window_start", "window_end", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    assert finals
    for k, v in finals.items():
        assert expected[k] == v


def test_allowed_lateness_updates_and_side_output(spark, replay_dir, tmp_path):
    # Hand-built scenario (harness style): key A, 600s windows, watermark
    # delay 0 via far-future flusher rows on key B.
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    raw_schema = "k string, ts_s string, event_id long, value double"
    d = str(tmp_path / "late_src")
    base = "2024-01-01 00:"

    def write_file(i, rows):
        spark.createDataFrame(
            [(k, f"{base}{mm}:{ss}", eid, v) for (k, mm, ss, eid, v) in rows], schema=raw_schema
        ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "event_id", "value").coalesce(
            1
        ).write.mode(
            "append"
        ).parquet(
            d + f"/__file={i}"
        )

    # Window [00:00,10:00), lateness 1200s => purge horizon 30:00. The
    # watermark only advances BETWEEN micro-batches (computed from the
    # previous batch's data), so each phase gets its own file:
    write_file(0, [("A", "00", "10", 1, 1.0), ("A", "01", "00", 2, 2.0), ("A", "02", "00", 3, 3.0)])
    write_file(1, [("B", "20", "00", 90, 0.0)])  # data max -> 20:00 (wm still 02:00)
    write_file(2, [("B", "20", "01", 91, 0.0)])  # wm=20:00 -> A's timer fires final (cnt 3)
    write_file(3, [("A", "05", "00", 4, 4.0)])  # within lateness -> late_update (cnt 4)
    write_file(4, [("B", "59", "00", 92, 0.0)])  # data max -> 59:00
    write_file(5, [("B", "59", "30", 93, 0.0)])  # wm=59:00 -> A's purge timer fires
    write_file(6, [("A", "06", "00", 5, 5.0)])  # beyond lateness -> side output

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d + "/__file=*")
    out = tumble_agg_with_lateness(
        stream, ["k"], "ts", "event_id", "value", 600, lateness_s=1200, side_slack_s=3600
    )
    fired = []

    def collect(bdf, _bid):
        fired.extend(bdf.collect())

    run_to_completion(out, collect)

    a = [r for r in fired if r.k == "A"]
    kinds = [r.fire_kind for r in sorted(a, key=lambda r: (r.window_start, r.fire_kind != "final"))]
    finals = [r for r in a if r.fire_kind == "final"]
    updates = [r for r in a if r.fire_kind == "late_update"]
    dropped = [r for r in a if r.fire_kind == "late_dropped"]
    assert len(finals) == 1 and finals[0].cnt == 3 and round(finals[0].total, 6) == 6.0
    assert len(updates) == 1 and updates[0].cnt == 4 and round(updates[0].total, 6) == 10.0
    assert len(dropped) == 1 and round(dropped[0].total, 6) == 5.0 and dropped[0].cnt == 1
    assert kinds  # sanity


def test_streaming_over_rows_matches_batch(spark, replay_dir):
    from pyspark.sql import Window as W

    from incubator_flink_spark.streaming.stateful import streaming_over_rows

    stream = replay_table(spark, SF, "events", replay_dir + "/rows", n_files=4)
    out = streaming_over_rows(stream, ["user_id"], "ts", "event_id", "value", 5)
    got = {}

    def collect(bdf, _bid):
        for r in bdf.collect():
            got[r.id] = (round(r.sum_rows, 6), r.cnt_rows)

    run_to_completion(out, collect)

    e = load(spark, SF, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, W.currentRow)
    expected = {
        r.event_id: (round(r.s, 6), r.c)
        for r in e.select(
            "event_id",
            F.round(F.sum("value").over(w), 6).alias("s"),
            F.count(F.lit(1)).over(w).alias("c"),
        ).collect()
    }
    assert got == expected


# --- round-2: Delta/ContinuousEventTime/ProcessingTimeout triggers,
#     Time/Delta evictors (tumble_agg_triggered) ------------------------------

from datetime import datetime, timedelta

from incubator_flink_spark.streaming.triggers import (
    ContinuousEventTimeTrigger,
    CountEvictor,
    CountTrigger,
    DeltaEvictor,
    DeltaTrigger,
    ProcessingTimeoutTrigger,
    TimeEvictor,
    tumble_agg_triggered,
)

T0 = datetime(2024, 1, 1)


def _replay_frames(spark, out_dir, batches, schema="k STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE"):
    """Write each batch as its own file partition (sequentially, so file
    discovery order == batch order) and return the replay stream."""
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            out_dir + f"/__file={i}"
        )
    return (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir + "/__file=*")
    )


def _collect_fires(out):
    fires = []

    def collect(bdf, _bid):
        fires.extend(bdf.collect())

    run_to_completion(out, collect)
    return fires


def test_delta_trigger_fires_on_spikes(spark, replay_dir):
    rows = [
        ("a", T0 + timedelta(seconds=0), 0, 1.0),
        ("a", T0 + timedelta(seconds=10), 1, 1.2),
        ("a", T0 + timedelta(seconds=20), 2, 5.0),
        ("a", T0 + timedelta(seconds=30), 3, 5.1),
        ("a", T0 + timedelta(seconds=40), 4, 9.0),
    ]
    future = [("a", T0 + timedelta(seconds=7200), 5, 0.0)]
    stream = _replay_frames(spark, replay_dir + "/delta_trig", [rows, future]).withWatermark("ts", "1 second")
    out = tumble_agg_triggered(stream, ["k"], "ts", "event_id", "value", 600, trigger=DeltaTrigger(2.0))
    fires = _collect_fires(out)
    earlies = [(r.cnt, round(r.total, 6)) for r in fires if r.fire_kind == "early"]
    finals = [(r.cnt, round(r.total, 6)) for r in fires if r.fire_kind == "final" and r.cnt > 0]
    # delta(1,5)=4>2 fires at cnt 3 (1+1.2+5); delta(5,9)=4>2 at cnt 5
    assert earlies == [(3, 7.2), (5, 21.3)]
    assert finals == [(5, 21.3)]


def test_continuous_event_time_trigger(spark, replay_dir):
    stream = replay_table(spark, SF, "events", replay_dir + "/cont", n_files=4).withWatermark(
        "ts", "2 minutes"
    )
    out = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "value", 86400,
        trigger=ContinuousEventTimeTrigger(3600),
    )
    fires = _collect_fires(out)
    finals = {
        (r.event_type, r.window_start, r.window_end): (r.cnt, round(r.total, 6))
        for r in fires
        if r.fire_kind == "final"
    }
    truth = batch_tumble_truth(spark, 86400)
    for (k, ws, we), (cnt, total) in finals.items():
        assert truth[(ws, we, k)] == (cnt, total)
    earlies = [r for r in fires if r.fire_kind == "early"]
    assert earlies  # watermark advances across files -> periodic early fires
    # every early fire is a prefix of its window's final
    for r in earlies:
        key = (r.event_type, r.window_start, r.window_end)
        if key in finals:
            assert r.cnt <= finals[key][0]


def test_time_evictor(spark, replay_dir):
    rows = [
        ("a", T0 + timedelta(seconds=0), 0, 1.0),
        ("a", T0 + timedelta(seconds=100), 1, 2.0),
        ("a", T0 + timedelta(seconds=400), 2, 3.0),
        ("a", T0 + timedelta(seconds=500), 3, 4.0),
    ]
    future = [("a", T0 + timedelta(seconds=7200), 9, 0.0)]
    stream = _replay_frames(spark, replay_dir + "/time_ev", [rows, future]).withWatermark("ts", "1 second")
    out = tumble_agg_triggered(stream, ["k"], "ts", "event_id", "value", 600, evictor=TimeEvictor(150))
    fires = _collect_fires(out)
    finals = [(r.cnt, round(r.total, 6)) for r in fires if r.fire_kind == "final" and r.cnt > 0]
    # final keeps ts > 500-150 => rows at 400,500
    assert finals == [(2, 7.0)]


def test_delta_evictor_and_count_evictor(spark, replay_dir):
    rows = [
        ("a", T0 + timedelta(seconds=0), 0, 1.0),
        ("a", T0 + timedelta(seconds=10), 1, 10.0),
        ("a", T0 + timedelta(seconds=20), 2, 11.0),
        ("a", T0 + timedelta(seconds=30), 3, 12.0),
    ]
    future = [("a", T0 + timedelta(seconds=7200), 9, 0.0)]
    stream = _replay_frames(spark, replay_dir + "/delta_ev", [rows, future]).withWatermark("ts", "1 second")
    out = tumble_agg_triggered(stream, ["k"], "ts", "event_id", "value", 600, evictor=DeltaEvictor(5.0))
    finals = [
        (r.cnt, round(r.total, 6))
        for r in _collect_fires(out)
        if r.fire_kind == "final" and r.cnt > 0
    ]
    # keep |v - 12| < 5 => 10, 11, 12
    assert finals == [(3, 33.0)]

    stream2 = _replay_frames(spark, replay_dir + "/count_ev", [rows, future]).withWatermark("ts", "1 second")
    out2 = tumble_agg_triggered(stream2, ["k"], "ts", "event_id", "value", 600, evictor=CountEvictor(2))
    finals2 = [
        (r.cnt, round(r.total, 6))
        for r in _collect_fires(out2)
        if r.fire_kind == "final" and r.cnt > 0
    ]
    assert finals2 == [(2, 23.0)]  # last two: 11, 12


def test_processing_timeout_trigger(spark, replay_dir):
    # processing-time triggers are wall-clock-driven, so the query never
    # "drains" under availableNow (Spark keeps scheduling state-cleanup
    # batches while stateful processing-time timers exist) — poll until
    # both fire kinds are observed, then stop explicitly
    import time

    stream = replay_table(spark, SF, "events", replay_dir + "/ptt", n_files=3).withWatermark(
        "ts", "2 minutes"
    )
    out = tumble_agg_triggered(
        stream, ["event_type"], "ts", "event_id", "value", 86400,
        trigger=ProcessingTimeoutTrigger(0.001),
    )
    fires = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: fires.extend(bdf.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    deadline = time.time() + 240
    while time.time() < deadline:
        kinds = {r.fire_kind for r in fires}
        if {"early", "final"} <= kinds:
            break
        time.sleep(2)
    q.stop()
    truth = batch_tumble_truth(spark, 86400)
    finals = [r for r in fires if r.fire_kind == "final"]
    assert finals
    for r in finals:
        assert truth[(r.window_start, r.window_end, r.event_type)] == (r.cnt, round(r.total, 6))
    # the processing-time timeout fires open windows between micro-batches
    assert any(r.fire_kind == "early" for r in fires)


def test_purging_trigger_disjoint_chunks(spark, replay_dir):
    # PurgingTrigger(CountTrigger(2)) — FIRE becomes FIRE_AND_PURGE
    # (PurgingTrigger.java): fires aggregate DISJOINT chunks, the close
    # fire carries only the tail, and an exact-multiple pane (empty at
    # close) emits nothing — reference WindowOperator skips null contents.
    rows = [
        ("a", T0 + timedelta(seconds=0), 0, 1.0),
        ("a", T0 + timedelta(seconds=10), 1, 2.0),
        ("a", T0 + timedelta(seconds=20), 2, 4.0),
        ("a", T0 + timedelta(seconds=30), 3, 8.0),
        ("a", T0 + timedelta(seconds=40), 4, 16.0),
        # key b: exactly 2 rows -> one early fire, empty pane at close
        ("b", T0 + timedelta(seconds=0), 5, 3.0),
        ("b", T0 + timedelta(seconds=10), 6, 5.0),
    ]
    future = [("a", T0 + timedelta(seconds=7200), 9, 0.0)]
    stream = _replay_frames(spark, replay_dir + "/purging", [rows, future]).withWatermark(
        "ts", "1 second"
    )
    out = tumble_agg_triggered(
        stream, ["k"], "ts", "event_id", "value", 600,
        trigger=CountTrigger(2), purging=True,
    )
    fires = _collect_fires(out)
    a = [(r.fire_kind, r.cnt, round(r.total, 6)) for r in fires if r.k == "a"]
    b = [(r.fire_kind, r.cnt, round(r.total, 6)) for r in fires if r.k == "b"]
    # a: chunks (1+2), (4+8), tail 16 at close
    assert sorted(a) == [("early", 2, 3.0), ("early", 2, 12.0), ("final", 1, 16.0)]
    # b: one complete chunk, NO final fire for the purged-empty pane
    assert b == [("early", 2, 8.0)]
