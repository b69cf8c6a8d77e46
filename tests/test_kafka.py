"""Kafka wire-format layer (sources/kafka.py) — broker-less e2e over
synthesized kafka-shaped frames, mirroring how tests/test_cdc.py proves
the debezium path without a database.  Reference:
flink-connector-kafka table/DynamicKafkaDeserializationSchema.java +
UpsertKafkaDynamicTableFactory.java."""

from pyspark.sql import functions as F

from incubator_flink_spark.sources.kafka import (
    parse_kafka,
    parse_upsert_kafka,
    upsert_kafka_frames,
)
from incubator_flink_spark.streaming.changelog import (
    DELETE,
    INSERT,
    ROWKIND,
    UPDATE_AFTER,
    UPDATE_BEFORE,
    changelog_normalize,
)


def _frames(spark, rows):
    """rows: list of (key_json|None, value_json|None, offset)."""
    df = spark.createDataFrame(rows, "k STRING, v STRING, offset BIGINT")
    return df.select(
        F.encode(F.col("k"), "UTF-8").alias("key"),
        F.encode(F.col("v"), "UTF-8").alias("value"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        "offset",
    )


def test_parse_kafka_json_with_key_prefix_and_metadata(spark):
    frames = _frames(
        spark,
        [('{"id":1}', '{"id":10,"name":"a"}', 5), ('{"id":2}', '{"id":20,"name":"b"}', 6)],
    )
    out = parse_kafka(
        frames,
        "json",
        "id BIGINT, name STRING",
        key_format="json",
        key_schema="id BIGINT",
        key_prefix="k_",
        metadata=("topic", "offset"),
    )
    assert out.columns == ["k_id", "id", "name", "topic", "offset"]
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, 10, "a", "t", 5), (2, 20, "b", "t", 6)]


def test_parse_kafka_csv_and_raw(spark):
    frames = _frames(spark, [(None, "7,x", 0), (None, "8,y", 1)])
    csv = parse_kafka(frames, "csv", "n BIGINT, s STRING")
    assert sorted(map(tuple, csv.collect())) == [(7, "x"), (8, "y")]
    raw = parse_kafka(frames, "raw")
    assert sorted(r.raw for r in raw.collect()) == ["7,x", "8,y"]


def test_upsert_kafka_null_value_is_delete_tombstone(spark):
    frames = _frames(
        spark,
        [
            ('{"id":1}', '{"v":1.0}', 0),
            ('{"id":2}', '{"v":2.0}', 1),
            ('{"id":1}', '{"v":1.5}', 2),  # upsert
            ('{"id":2}', None, 3),  # tombstone
        ],
    )
    rows = parse_upsert_kafka(frames, "json", "id BIGINT", "json", "v DOUBLE")
    kinds = {(r.id, r.offset): r[ROWKIND] for r in rows.collect()}
    assert kinds == {(1, 0): UPDATE_AFTER, (2, 1): UPDATE_AFTER, (1, 2): UPDATE_AFTER, (2, 3): DELETE}
    state = changelog_normalize(rows, ["id"], "offset", "offset")
    assert [(r.id, r.v) for r in state.orderBy("id").collect()] == [(1, 1.5)]


def test_upsert_serializer_roundtrip(spark):
    """changelog rows → upsert frames → decode → normalize reproduces the
    upsert view of the changelog; -U rows are never written and -D rows
    become null-value tombstones."""
    log = spark.createDataFrame(
        [
            (INSERT, 1, 10.0, 0),
            (INSERT, 2, 20.0, 1),
            (UPDATE_BEFORE, 1, 10.0, 2),
            (UPDATE_AFTER, 1, 11.0, 3),
            (DELETE, 2, 20.0, 4),
        ],
        f"{ROWKIND} STRING, id BIGINT, v DOUBLE, seq BIGINT",
    )
    frames = upsert_kafka_frames(log, ["id"], topic="t", carry=("seq",))
    # -U dropped: 4 frames; the -D frame is a tombstone
    assert frames.count() == 4
    assert frames.where(F.col("value").isNull()).count() == 1
    wire = frames.withColumnRenamed("seq", "offset").withColumn("partition", F.lit(0))
    rows = parse_upsert_kafka(wire, "json", "id BIGINT", "json", "id BIGINT, v DOUBLE", key_prefix="k_")
    state = changelog_normalize(rows, ["k_id"], "offset", "offset")
    assert [(r.k_id, r.v) for r in state.orderBy("k_id").collect()] == [(1, 11.0)]
