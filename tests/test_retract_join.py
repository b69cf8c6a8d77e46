"""Retract-emitting streaming join tests (reference
StreamingJoinOperator retract semantics, Javadoc pseudo-code at
lines 136-190)."""

import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from incubator_flink_spark.streaming.changelog import DELETE, INSERT, ROWKIND
from incubator_flink_spark.streaming.retract_join import retracting_join_stream
from tests.conftest import drain_stream


def t(s):
    return datetime.fromisoformat(s)


SCHEMA = "__rowkind STRING, k BIGINT, side STRING, id BIGINT, v DOUBLE, ts TIMESTAMP"


def run_join(spark, files):
    base = tempfile.mkdtemp(prefix="rjoin_")
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(f"{base}/__file={i}")
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(base + "/__file=*")
    out = retracting_join_stream(stream, ["k"], "side", "id", "v")
    emitted = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda b, i: emitted.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    drain_stream(q)
    return emitted


def net_state(emitted):
    """Fold +I/-D output into the final joined set."""
    s = set()
    for r in emitted:
        pair = (r.k, r.left_id, r.right_id)
        if r[ROWKIND] == INSERT:
            s.add(pair)
        else:
            s.discard(pair)
    return s


def test_insert_insert_emits_matches(spark):
    emitted = run_join(
        spark,
        [
            [(INSERT, 1, "left", 10, 1.0, t("2024-01-01 00:00:00"))],
            [(INSERT, 1, "right", 20, 2.0, t("2024-01-01 00:00:01"))],
            [(INSERT, 1, "right", 21, 3.0, t("2024-01-01 00:00:02"))],
        ],
    )
    assert net_state(emitted) == {(1, 10, 20), (1, 10, 21)}
    assert all(r[ROWKIND] == INSERT for r in emitted)


def test_delete_retracts_prior_matches(spark):
    emitted = run_join(
        spark,
        [
            [
                (INSERT, 1, "left", 10, 1.0, t("2024-01-01 00:00:00")),
                (INSERT, 1, "right", 20, 2.0, t("2024-01-01 00:00:01")),
            ],
            [(DELETE, 1, "right", 20, 2.0, t("2024-01-01 00:00:02"))],
        ],
    )
    kinds = [r[ROWKIND] for r in emitted]
    assert kinds.count(INSERT) == 1 and kinds.count(DELETE) == 1
    assert net_state(emitted) == set()


def test_matches_batch_join_under_inserts(spark):
    # pure-insert streams: folded output == batch inner join
    left = [(INSERT, k, "left", 100 + i, float(i), t(f"2024-01-01 00:00:{i:02d}")) for i, k in enumerate([1, 1, 2, 3])]
    right = [(INSERT, k, "right", 200 + i, float(i), t(f"2024-01-01 00:01:{i:02d}")) for i, k in enumerate([1, 2, 2, 4])]
    emitted = run_join(spark, [left, right])
    got = net_state(emitted)
    ldf = spark.createDataFrame(left, SCHEMA).select("k", F.col("id").alias("lid"))
    rdf = spark.createDataFrame(right, SCHEMA).select(F.col("k").alias("rk"), F.col("id").alias("rid"))
    expected = {
        (r.k, r.lid, r.rid) for r in ldf.join(rdf, ldf.k == rdf.rk).collect()
    }
    assert got == expected and len(expected) == 4  # k=1: 1x1, k=2: 1x2... = 1+2+0+0
