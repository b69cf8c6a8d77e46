"""Async I/O, lookup join, and side-output tests (SURVEY.md §2.9:
AsyncWaitOperator, StreamExecLookupJoin, OutputTag)."""

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.async_io import async_map
from incubator_flink_spark.streaming.lookup import lookup_join_per_batch, side_outputs
from incubator_flink_spark.streaming.source import replay_table
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


def test_async_map_ordered_preserves_order(spark):
    df = spark.range(0, 200).select(F.col("id"))

    def slow_double(row):
        time.sleep(0.001 * (row["id"] % 3))  # jittered latency
        return {"id": row["id"], "doubled": row["id"] * 2}

    out = async_map(df.coalesce(1), slow_double, "id BIGINT, doubled BIGINT", capacity=8, ordered=True)
    rows = out.collect()
    assert [r.id for r in rows] == list(range(200))
    assert all(r.doubled == r.id * 2 for r in rows)


def test_async_map_unordered_completes_all(spark):
    df = spark.range(0, 100)

    def fn(row):
        return {"id": row["id"], "neg": -row["id"]}

    out = async_map(df, fn, "id BIGINT, neg BIGINT", capacity=4, ordered=False)
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_async_map_timeout_fails_record(spark):
    df = spark.range(0, 3).coalesce(1)

    def hang(row):
        time.sleep(5)
        return {"id": row["id"]}

    out = async_map(df, hang, "id BIGINT", capacity=2, timeout_s=0.2, ordered=True)
    with pytest.raises(Exception):
        out.collect()


def test_lookup_join_per_batch_refresh(spark):
    stream = replay_table(spark, SF, "events", tempfile.mkdtemp(), n_files=3)
    calls = []
    results = []

    def dim_loader(s):
        calls.append(1)  # loader re-invoked per batch (refreshable dim)
        return load(s, SF, "customer").select(F.col("c_custkey").alias("user_id"), "c_mktsegment")

    def sink(df, bid):
        results.append(df.count())

    writer = lookup_join_per_batch(stream, dim_loader, ["user_id"], "left", sink)
    q = writer.trigger(availableNow=True).option("checkpointLocation", tempfile.mkdtemp()).start()
    drain_stream(q)
    assert len(calls) >= 2  # dim re-loaded each micro-batch
    assert sum(results) == load(spark, SF, "events").count()


def test_side_outputs_partition_completely(spark):
    e = load(spark, SF, "events")
    outs = side_outputs(
        e,
        {
            "errors": F.col("event_type") == "error",
            "purchases": F.col("event_type") == "purchase",
        },
    )
    n = e.count()
    n_err = outs["errors"].count()
    n_pur = outs["purchases"].count()
    n_main = outs["__main"].count()
    assert n_err + n_pur + n_main == n
    assert outs["errors"].where(F.col("event_type") != "error").count() == 0
    assert outs["__main"].where(F.col("event_type").isin("error", "purchase")).count() == 0
