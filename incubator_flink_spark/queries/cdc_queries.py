"""Driver-checkable CDC coverage: a deterministic debezium-JSON changelog
is synthesized from the ``orders`` table (create for every row, update
doubling the price for keys %5==0, delete for keys %7==0), serialized to
raw JSON envelope strings, parsed back with sources/cdc.parse_debezium,
and materialized with changelog_normalize.  The oracle derives the same
final state directly from ``orders`` — so a hash match proves the whole
serialize → parse → rowkind-tag → normalize pipeline (reference:
flink-formats/flink-json/.../debezium/DebeziumJsonDeserializationSchema.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register
from incubator_flink_spark.sources.cdc import parse_debezium
from incubator_flink_spark.streaming.changelog import changelog_normalize

_PAY_T = "struct<id:bigint,cust:bigint,price:double>"

CDC_DEBEZIUM_ORACLE = """
SELECT o_orderkey AS id, o_custkey AS cust,
       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS price
FROM orders
WHERE o_orderkey % 7 <> 0
ORDER BY id
"""


@register("cdc_debezium_normalize", CDC_DEBEZIUM_ORACLE)
def cdc_debezium_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    key = F.col("o_orderkey")
    payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), F.col("o_totalprice").alias("price")
    )
    upd_payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), (F.col("o_totalprice") * 2).alias("price")
    )
    null_pay = F.lit(None).cast(_PAY_T)

    def env(before, after, op, seq):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                (key * 10 + seq).alias("ts_ms"),
            )
        )

    empty = F.array().cast("array<string>")
    envelopes = F.concat(
        F.array(env(null_pay, payload, "c", 1)),
        F.when(key % 5 == 0, F.array(env(payload, upd_payload, "u", 2))).otherwise(empty),
        F.when(key % 7 == 0, F.array(env(upd_payload, null_pay, "d", 3))).otherwise(empty),
    )
    raw = o.select(F.explode(envelopes).alias("value"))
    rows = parse_debezium(raw, "value", "id BIGINT, cust BIGINT, price DOUBLE")
    return changelog_normalize(rows, ["id"], "ts_ms", "ts_ms").drop("ts_ms").orderBy("id")


@register("kafka_upsert_normalize", CDC_DEBEZIUM_ORACLE)
def kafka_upsert_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-kafka ingestion without a broker: the same deterministic
    changelog as cdc_debezium_normalize is serialized to kafka-shaped
    frames (key BINARY = JSON primary key, value BINARY = JSON row or a
    null tombstone for deletes, offset = deterministic sequence), decoded
    with sources/kafka.parse_upsert_kafka (null value → -D, else +U),
    and materialized with changelog_normalize ordered by offset.  The
    shared oracle derives the final state straight from orders, so a
    hash match proves the whole encode → wire schema → upsert-decode →
    normalize pipeline (reference UpsertKafkaDynamicTableFactory +
    DynamicKafkaDeserializationSchema)."""
    from incubator_flink_spark.sources.kafka import parse_upsert_kafka

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    key = F.col("o_orderkey")
    key_bytes = F.encode(F.to_json(F.struct(key.alias("id"))), "UTF-8")
    val = F.struct(F.col("o_custkey").alias("cust"), F.col("o_totalprice").alias("price"))
    upd = F.struct(F.col("o_custkey").alias("cust"), (F.col("o_totalprice") * 2).alias("price"))

    def frame(value: F.Column, seq: int) -> F.Column:
        return F.struct(
            key_bytes.alias("key"),
            value.alias("value"),
            F.lit("orders").alias("topic"),
            F.lit(0).alias("partition"),
            (key * 10 + seq).alias("offset"),
        )

    tombstone = F.lit(None).cast("binary")
    empty = F.array().cast(
        "array<struct<key:binary,value:binary,topic:string,partition:int,offset:bigint>>"
    )
    frames = F.concat(
        F.array(frame(F.encode(F.to_json(val), "UTF-8"), 1)),
        F.when(key % 5 == 0, F.array(frame(F.encode(F.to_json(upd), "UTF-8"), 2))).otherwise(empty),
        F.when(key % 7 == 0, F.array(frame(tombstone, 3))).otherwise(empty),
    )
    raw = o.select(F.explode(frames).alias("f")).select("f.*")
    rows = parse_upsert_kafka(
        raw, "json", "id BIGINT", "json", "cust BIGINT, price DOUBLE", metadata=("offset",)
    )
    return (
        changelog_normalize(rows, ["id"], "offset", "offset")
        .drop("offset")
        .orderBy("id")
    )


@register("cdc_canal_normalize", CDC_DEBEZIUM_ORACLE)
def cdc_canal_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same deterministic changelog as cdc_debezium_normalize, but
    serialized as canal-JSON batch envelopes (data[]/old[]/type) and
    parsed with sources/cdc.parse_canal — the oracle (final state from
    orders) is shared, so a hash match proves canal's batch + sparse-old
    decode path end-to-end (reference CanalJsonDeserializationSchema)."""
    from incubator_flink_spark.sources.cdc import parse_canal
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    key = F.col("o_orderkey")
    payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), F.col("o_totalprice").alias("price")
    )
    upd_payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), (F.col("o_totalprice") * 2).alias("price")
    )
    # canal UPDATE carries a SPARSE old row (changed fields only): price
    sparse_old = F.struct(
        F.lit(None).cast("bigint").alias("id"),
        F.lit(None).cast("bigint").alias("cust"),
        F.col("o_totalprice").alias("price"),
    )

    def env(data, old, typ, seq):
        return F.to_json(
            F.struct(
                F.array(data).alias("data"),
                old.alias("old"),
                F.lit(typ).alias("type"),
                (key * 10 + seq).alias("ts"),
            )
        )

    null_old = F.lit(None).cast(f"array<{_PAY_T}>")
    empty = F.array().cast("array<string>")
    envelopes = F.concat(
        F.array(env(payload, null_old, "INSERT", 1)),
        F.when(key % 5 == 0, F.array(env(upd_payload, F.array(sparse_old), "UPDATE", 2))).otherwise(empty),
        F.when(key % 7 == 0, F.array(env(upd_payload, null_old, "DELETE", 3))).otherwise(empty),
    )
    raw = o.select(F.explode(envelopes).alias("value"))
    rows = parse_canal(raw, "value", "id BIGINT, cust BIGINT, price DOUBLE")
    return changelog_normalize(rows, ["id"], "ts_ms", "ts_ms").drop("ts_ms").orderBy("id")


@register("cdc_maxwell_normalize", CDC_DEBEZIUM_ORACLE)
def cdc_maxwell_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same changelog serialized as maxwell-JSON (type/data/old, sparse
    old) through sources/cdc.parse_maxwell; shared oracle (reference
    MaxwellJsonDeserializationSchema)."""
    from incubator_flink_spark.sources.cdc import parse_maxwell
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    key = F.col("o_orderkey")
    payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), F.col("o_totalprice").alias("price")
    )
    upd_payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), (F.col("o_totalprice") * 2).alias("price")
    )
    sparse_old = F.struct(
        F.lit(None).cast("bigint").alias("id"),
        F.lit(None).cast("bigint").alias("cust"),
        F.col("o_totalprice").alias("price"),
    )
    null_old = F.lit(None).cast(_PAY_T)

    def env(data, old, typ, seq):
        return F.to_json(
            F.struct(
                F.lit(typ).alias("type"),
                data.alias("data"),
                old.alias("old"),
                (key * 10 + seq).alias("ts"),
            )
        )

    empty = F.array().cast("array<string>")
    envelopes = F.concat(
        F.array(env(payload, null_old, "insert", 1)),
        F.when(key % 5 == 0, F.array(env(upd_payload, sparse_old, "update", 2))).otherwise(empty),
        F.when(key % 7 == 0, F.array(env(upd_payload, null_old, "delete", 3))).otherwise(empty),
    )
    raw = o.select(F.explode(envelopes).alias("value"))
    rows = parse_maxwell(raw, "value", "id BIGINT, cust BIGINT, price DOUBLE")
    return changelog_normalize(rows, ["id"], "ts_ms", "ts_ms").drop("ts_ms").orderBy("id")


@register("cdc_ogg_normalize", CDC_DEBEZIUM_ORACLE)
def cdc_ogg_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogg-json ingestion under the driver gate (round 10; reference
    flink-formats/flink-json/.../ogg/OggJsonDeserializationSchema.java):
    before/after envelopes with op_type I/U/D and a microsecond op_ts
    STRING — parse_ogg (which parses op_ts to a timestamp), materialize
    ordered by op_ts, shared oracle."""
    from incubator_flink_spark.sources.cdc import parse_ogg

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    key = F.col("o_orderkey")
    payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), F.col("o_totalprice").alias("price")
    )
    upd_payload = F.struct(
        key.alias("id"), F.col("o_custkey").alias("cust"), (F.col("o_totalprice") * 2).alias("price")
    )
    null_pay = F.lit(None).cast(_PAY_T)

    def ts_str(seq: int):
        return F.date_format(F.timestamp_micros(key * 10 + seq), "yyyy-MM-dd HH:mm:ss.SSSSSS")

    def env(before, after, op, seq):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op_type"),
                ts_str(seq).alias("op_ts"),
            )
        )

    empty = F.array().cast("array<string>")
    envelopes = F.concat(
        F.array(env(null_pay, payload, "I", 1)),
        F.when(key % 5 == 0, F.array(env(payload, upd_payload, "U", 2))).otherwise(empty),
        F.when(key % 7 == 0, F.array(env(upd_payload, null_pay, "D", 3))).otherwise(empty),
    )
    raw = o.select(F.explode(envelopes).alias("value"))
    rows = parse_ogg(raw, "value", "id BIGINT, cust BIGINT, price DOUBLE")
    return changelog_normalize(rows, ["id"], "op_ts", "op_ts").drop("op_ts").orderBy("id")
