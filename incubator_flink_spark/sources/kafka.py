"""Kafka wire-format layer: broker-less decode/encode of kafka-shaped
frames (key/value BINARY + topic/partition/offset/timestamp — exactly the
columns Spark's ``format("kafka")`` reader produces), so the same code
runs unchanged against a real broker.

Reference:
- flink-connectors/flink-connector-kafka/src/main/java/org/apache/flink/
  streaming/connectors/kafka/table/KafkaDynamicTableFactory.java:1
  (key format + value format + metadata wiring)
- .../table/DynamicKafkaDeserializationSchema.java:1 (projection:
  key fields ++ value fields ++ requested metadata columns; key fields
  may carry a prefix to avoid collisions)
- .../table/UpsertKafkaDynamicTableFactory.java:1 (upsert mode: a null
  value is a DELETE tombstone for the key; any non-null value is an
  UPDATE_AFTER; UPDATE_BEFORE rows are never written)

No broker exists in this sandbox, and none is needed to prove the
format layer: tests and the registered query synthesize kafka-shaped
frames from testdata the same way cdc_queries round-trips debezium
envelopes without a database.  All decode/encode is pure Catalyst
(``decode``/``encode`` + ``from_json``/``from_csv``/``to_json``) — no
Python UDFs, so the hot path stays in whole-stage codegen and scales
with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_flink_spark.streaming.changelog import (
    DELETE,
    ROWKIND,
    UPDATE_AFTER,
    drop_update_before,
)

#: metadata columns of Spark's kafka source, in its column order
KAFKA_METADATA = ("topic", "partition", "offset", "timestamp", "timestampType")


def _payload_schema(schema: T.StructType | str) -> T.StructType:
    return T.StructType.fromDDL(schema) if isinstance(schema, str) else schema


def _ddl(payload: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in payload.fields)


def _decoded_fields(
    col: Column, fmt: str, schema: T.StructType | str | None, prefix: str = ""
) -> list[Column]:
    """Decode one kafka byte column with a format, yielding its projected
    fields (DynamicKafkaDeserializationSchema: formats contribute their
    physical fields to the produced row)."""
    text = F.decode(col, "UTF-8")
    if fmt == "raw":
        return [text.alias(f"{prefix}raw")]
    payload = _payload_schema(schema)
    if fmt == "json":
        st = F.from_json(text, payload)
    elif fmt == "csv":
        st = F.from_csv(text, _ddl(payload))
    else:
        raise ValueError(f"unsupported kafka format: {fmt!r} (json|csv|raw)")
    return [st.getField(f.name).alias(prefix + f.name) for f in payload.fields]


def parse_kafka(
    df: DataFrame,
    value_format: str,
    value_schema: T.StructType | str | None = None,
    key_format: str | None = None,
    key_schema: T.StructType | str | None = None,
    key_prefix: str = "",
    metadata: tuple[str, ...] = (),
) -> DataFrame:
    """Kafka frames → rows: key-format fields (optional, with
    ``key_prefix`` = the reference's ``key.fields-prefix``), value-format
    fields, then requested metadata columns — the projection of
    DynamicKafkaDeserializationSchema for an append-mode kafka table."""
    cols: list[Column] = []
    if key_format is not None:
        cols += _decoded_fields(F.col("key"), key_format, key_schema, key_prefix)
    cols += _decoded_fields(F.col("value"), value_format, value_schema)
    cols += [F.col(m) for m in metadata]
    return df.select(*cols)


def parse_upsert_kafka(
    df: DataFrame,
    key_format: str,
    key_schema: T.StructType | str | None,
    value_format: str,
    value_schema: T.StructType | str | None,
    key_prefix: str = "",
    metadata: tuple[str, ...] = ("offset",),
) -> DataFrame:
    """Upsert-kafka frames → ``__rowkind``-tagged changelog rows:
    a null value is a DELETE tombstone for the key (value fields null),
    any non-null value is an UPDATE_AFTER — the changelog contract of
    UpsertKafkaDynamicTableFactory's decoding side.  Feed the result to
    ``streaming.changelog.changelog_normalize`` (ordering by the
    ``offset`` metadata = the reference's per-partition record order) to
    materialize current state."""
    kind = F.when(F.col("value").isNull(), F.lit(DELETE)).otherwise(F.lit(UPDATE_AFTER))
    cols: list[Column] = [kind.alias(ROWKIND)]
    cols += _decoded_fields(F.col("key"), key_format, key_schema, key_prefix)
    cols += _decoded_fields(F.col("value"), value_format, value_schema)
    cols += [F.col(m) for m in metadata]
    return df.select(*cols)


def upsert_kafka_frames(
    df: DataFrame,
    key_cols: list[str],
    topic: str = "topic",
    op_col: str = ROWKIND,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Changelog rows → kafka-writable upsert frames (the serializer side
    of UpsertKafkaDynamicTableFactory): key = JSON of the key columns;
    value = JSON of all data columns, except DELETE rows which produce a
    null-value tombstone.  UPDATE_BEFORE rows are dropped (never
    written).  ``carry`` names passthrough columns (e.g. a synthetic
    offset for broker-less tests); a real sink would drop them."""
    data_cols = [c for c in df.columns if c != op_col and c not in carry]
    key = F.encode(F.to_json(F.struct(*[F.col(c) for c in key_cols])), "UTF-8")
    value = (
        F.when(F.col(op_col) == DELETE, F.lit(None).cast("binary"))
        .otherwise(F.encode(F.to_json(F.struct(*[F.col(c) for c in data_cols])), "UTF-8"))
    )
    return drop_update_before(df, op_col).select(
        key.alias("key"),
        value.alias("value"),
        F.lit(topic).alias("topic"),
        *[F.col(c) for c in carry],
    )
