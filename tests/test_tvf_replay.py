"""Streaming==batch replay for the window-TVF SQL-TEXT surface
(VERDICT-r8 #5): the same `TABLE(CUMULATE(...))` / `TABLE(SESSION(...))`
query texts that are driver-green batch-side (window_cumulate_tvf_sql /
window_session_tvf_sql) are executed through TableEnvironment.sql_query
over a STREAMING source replayed in micro-batches, and the streamed
result must equal the batch execution of the identical text.

Reference: StreamExecWindowTableFunction.java:49 — the TVF is one
operator serving both runtime modes; these tests prove the same parity
for the api/tvf.py rewrite."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.api.table import TableEnvironment
from incubator_flink_spark.catalog import load
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_root():
    import shutil

    d = tempfile.mkdtemp(prefix="tvf_replay_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ordered_files(spark, df, out_dir, n_files, ts_col="ts"):
    """Write df as n time-ordered files (replay fixture) and return a
    maxFilesPerTrigger=1 stream over them."""
    from pyspark.sql import Window as W

    total = df.count()
    per = (total + n_files - 1) // n_files
    ordered = df.withColumn("__rn", F.row_number().over(W.orderBy(ts_col, "event_id"))).withColumn(
        "__file", ((F.col("__rn") - 1) / per).cast("int")
    )
    ordered.drop("__rn").write.mode("overwrite").partitionBy("__file").parquet(out_dir)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir + "/__file=*")
    )


CUMULATE_TEXT = """
SELECT window_start, window_end, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total
FROM TABLE(CUMULATE(TABLE {src}, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '20' MINUTE))
GROUP BY window_start, window_end
"""


def test_cumulate_tvf_sql_streaming_matches_batch(spark, replay_root):
    env = TableEnvironment(spark)
    events = load(spark, SF, "events")
    events.createOrReplaceTempView("tvf_cu_batch")
    expected = {
        (r.window_start, r.window_end): (r.cnt, round(r.total, 6))
        for r in env.sql_query(CUMULATE_TEXT.format(src="tvf_cu_batch")).to_df().collect()
    }

    stream = _ordered_files(spark, events, os.path.join(replay_root, "cu"), n_files=4)
    stream.createOrReplaceTempView("tvf_cu_stream")
    out = env.sql_query(CUMULATE_TEXT.format(src="tvf_cu_stream")).to_df()
    assert out.isStreaming
    last = {}

    def collect(bdf, _bid):
        rows = bdf.collect()
        if rows:
            last.clear()
            last.update(
                {(r.window_start, r.window_end): (r.cnt, round(r.total, 6)) for r in rows}
            )

    q = (
        out.writeStream.outputMode("complete")
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)
    assert last == expected and len(expected) > 0


SESSION_TEXT = """
SELECT event_type, event_id, ts, value, window_start, window_end
FROM TABLE(SESSION(TABLE {src} PARTITION BY event_type, DESCRIPTOR(ts), INTERVAL '30' MINUTE))
"""


def test_session_tvf_sql_streaming_matches_batch(spark, replay_root):
    """Row-level SESSION TVF text on a stream: sessions merge across
    micro-batches in keyed state and fire with their final bounds once the
    watermark passes session_end — the emitted rows must equal the batch
    gaps-and-islands rewrite of the same text.  Two far-future flusher
    rows per key close every real session (watermark lags one batch)."""
    env = TableEnvironment(spark)
    events = load(spark, SF, "events").select("event_type", "event_id", "ts", "value")
    flush_ts = "2025-06-01 00:00:00"
    kinds = [r.event_type for r in events.select("event_type").distinct().collect()]
    flushers = spark.createDataFrame(
        [(k, -1 - i, flush_ts, 0.0) for i, k in enumerate(kinds)]
        + [(k, -100 - i, "2025-06-02 00:00:00", 0.0) for i, k in enumerate(kinds)],
        "event_type string, event_id long, ts string, value double",
    ).select("event_type", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    fixture = events.unionByName(flushers)

    fixture.createOrReplaceTempView("tvf_se_batch")
    expected = {
        (r.event_type, r.event_id, r.ts, r.window_start, r.window_end)
        for r in env.sql_query(SESSION_TEXT.format(src="tvf_se_batch")).to_df().collect()
        if r.ts.year < 2025  # exclude the flusher sessions themselves
    }

    stream = _ordered_files(spark, fixture, os.path.join(replay_root, "se"), n_files=5)
    stream.withWatermark("ts", "0 seconds").createOrReplaceTempView("tvf_se_stream")
    out = env.sql_query(SESSION_TEXT.format(src="tvf_se_stream")).to_df()
    assert out.isStreaming
    got = []

    def collect(bdf, _bid):
        got.extend(bdf.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)
    streamed = {
        (r.event_type, r.event_id, r.ts, r.window_start, r.window_end)
        for r in got
        if r.ts.year < 2025
    }
    assert streamed == expected and len(expected) > 0


def test_session_rows_streaming_nullable_payload(spark, replay_root):
    """Nullable long and timestamp PAYLOAD columns must survive the JSON
    state round-trip (ADVICE r9: json null -> NaN -> astype('int64')
    crashed in-operator, and NaT silently encoded as INT64_MIN).  Nulls in
    the payload must come back as nulls, non-nulls exactly."""
    from incubator_flink_spark.streaming.windows import session_rows_streaming

    rows = [
        ("a", 1, "2024-01-01 00:00:00", 10, "2024-03-01 00:00:00"),
        ("a", 2, "2024-01-01 00:05:00", None, None),
        ("a", 3, "2024-01-01 02:00:00", None, "2024-03-02 00:00:00"),
        ("b", 4, "2024-01-01 00:01:00", 7, None),
        # two flusher rows per key: watermark lags one batch
        ("a", -1, "2025-06-01 00:00:00", 0, None),
        ("a", -2, "2025-06-02 00:00:00", 0, None),
        ("b", -3, "2025-06-01 00:00:00", 0, None),
        ("b", -4, "2025-06-02 00:00:00", 0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts string, val long, extra_ts string"
    ).select(
        "event_type",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "val",
        F.col("extra_ts").cast("timestamp").alias("extra_ts"),
    )
    stream = _ordered_files(spark, df, os.path.join(replay_root, "nullable"), n_files=4)
    out = session_rows_streaming(
        stream.withWatermark("ts", "0 seconds"), ["event_type"], "ts", gap_s=1800
    )
    got = []

    def collect(bdf, _bid):
        got.extend(bdf.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)
    real = {r.event_id: r for r in got if r.ts.year < 2025}
    assert set(real) == {1, 2, 3, 4}
    assert real[1].val == 10 and str(real[1].extra_ts) == "2024-03-01 00:00:00"
    assert real[2].val is None and real[2].extra_ts is None
    assert real[3].val is None and str(real[3].extra_ts) == "2024-03-02 00:00:00"
    assert real[4].val == 7 and real[4].extra_ts is None
    # rows 1+2 merged into one session (5-min gap < 30-min), row 3 alone
    assert real[1].window_start == real[2].window_start
    assert real[1].window_end == real[2].window_end
    assert real[3].window_start != real[1].window_start
