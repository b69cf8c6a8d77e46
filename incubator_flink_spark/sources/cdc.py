"""CDC ingestion formats: debezium / canal / maxwell JSON envelopes →
``__rowkind``-tagged changelog rows feeding streaming/changelog.py
(changelog_normalize, retract_aggregate).

Reference:
- flink-formats/flink-json/src/main/java/org/apache/flink/formats/json/
  debezium/DebeziumJsonDeserializationSchema.java:1 (op c/r → +I, u →
  -U/+U pair, d → -D)
- .../canal/CanalJsonDeserializationSchema.java (type INSERT/UPDATE/DELETE
  over a data[] batch with old[] sparse before-images)
- .../maxwell/MaxwellJsonDeserializationSchema.java (type insert/update/
  delete with sparse `old`)

All parsers are pure Catalyst: ``from_json`` on a typed envelope schema,
a per-op array of (rowkind, payload) structs, one ``explode`` — no Python
UDFs, so the hot path stays in whole-stage codegen and scales with the
scan.

Divergence (documented): canal/maxwell ``old`` carries only the CHANGED
fields; the before-image is reconstructed as ``coalesce(old.f, data.f)``
per field, so a field explicitly changed FROM NULL is indistinguishable
from an unchanged field (a JSON-typed-parse limitation; the reference
reads the raw JSON node presence instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_flink_spark.streaming.changelog import (
    DELETE,
    INSERT,
    ROWKIND,
    UPDATE_AFTER,
    UPDATE_BEFORE,
)


def _payload_schema(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        parsed = T.StructType.fromDDL(schema)
    else:
        parsed = schema
    return parsed


def _tagged(kind: str, payload: Column) -> Column:
    return F.struct(F.lit(kind).alias("kind"), payload.alias("payload"))


def parse_debezium(df: DataFrame, json_col: str, schema: T.StructType | str) -> DataFrame:
    """Debezium JSON → changelog rows.

    Envelope: {"before": row|null, "after": row|null, "op": "c|r|u|d",
    "ts_ms": epoch-millis}.  Output columns: __rowkind, ts_ms, payload
    fields.  op c/r → +I(after); u → -U(before) then +U(after); d →
    -D(before) — DebeziumJsonDeserializationSchema.deserialize."""
    payload = _payload_schema(schema)
    env = T.StructType(
        [
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    e = df.select(F.from_json(F.col(json_col), env).alias("e"))
    rows = (
        F.when(
            F.col("e.op").isin("c", "r"),
            F.array(_tagged(INSERT, F.col("e.after"))),
        )
        .when(
            F.col("e.op") == "u",
            F.array(_tagged(UPDATE_BEFORE, F.col("e.before")), _tagged(UPDATE_AFTER, F.col("e.after"))),
        )
        .when(F.col("e.op") == "d", F.array(_tagged(DELETE, F.col("e.before"))))
        .otherwise(F.array())
    )
    x = e.select(F.col("e.ts_ms").alias("ts_ms"), F.explode(rows).alias("r"))
    return x.select(
        F.col("r.kind").alias(ROWKIND),
        "ts_ms",
        *[F.col(f"r.payload.{f.name}").alias(f.name) for f in payload.fields],
    )


def _overlay(old: Column, data: Column, payload: T.StructType) -> Column:
    """Before-image: old's fields where present (non-null), else data's."""
    return F.struct(
        *[F.coalesce(old.getField(f.name), data.getField(f.name)).alias(f.name) for f in payload.fields]
    )


def parse_canal(df: DataFrame, json_col: str, schema: T.StructType | str) -> DataFrame:
    """Canal JSON → changelog rows.

    Envelope: {"data": [row...], "old": [sparse-row...]|null,
    "type": "INSERT|UPDATE|DELETE", "ts": epoch-millis}.  UPDATE emits a
    -U (data overlaid with old[i]) / +U (data[i]) pair per element —
    CanalJsonDeserializationSchema.deserialize."""
    payload = _payload_schema(schema)
    env = T.StructType(
        [
            T.StructField("data", T.ArrayType(payload)),
            T.StructField("old", T.ArrayType(payload)),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
        ]
    )
    e = df.select(F.from_json(F.col(json_col), env).alias("e"))
    # zip data with (possibly null) old by position
    zipped = F.arrays_zip(
        F.col("e.data").alias("data"),
        F.coalesce(F.col("e.old"), F.array_repeat(F.lit(None).cast(payload), F.size("e.data"))).alias(
            "old"
        ),
    )
    x = e.select(F.col("e.type").alias("t"), F.col("e.ts").alias("ts_ms"), F.explode(zipped).alias("z"))
    data_c, old_c = F.col("z.data"), F.col("z.old")
    rows = (
        F.when(F.col("t") == "INSERT", F.array(_tagged(INSERT, data_c)))
        .when(
            F.col("t") == "UPDATE",
            F.array(
                _tagged(UPDATE_BEFORE, _overlay(old_c, data_c, payload)),
                _tagged(UPDATE_AFTER, data_c),
            ),
        )
        .when(F.col("t") == "DELETE", F.array(_tagged(DELETE, data_c)))
        .otherwise(F.array())
    )
    y = x.select("ts_ms", F.explode(rows).alias("r"))
    return y.select(
        F.col("r.kind").alias(ROWKIND),
        "ts_ms",
        *[F.col(f"r.payload.{f.name}").alias(f.name) for f in payload.fields],
    )


def parse_maxwell(df: DataFrame, json_col: str, schema: T.StructType | str) -> DataFrame:
    """Maxwell JSON → changelog rows.

    Envelope: {"type": "insert|update|delete", "data": row,
    "old": sparse-row|null, "ts": epoch-seconds}.  update emits
    -U (data overlaid with old) / +U (data) —
    MaxwellJsonDeserializationSchema.deserialize."""
    payload = _payload_schema(schema)
    env = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("data", payload),
            T.StructField("old", payload),
            T.StructField("ts", T.LongType()),
        ]
    )
    e = df.select(F.from_json(F.col(json_col), env).alias("e"))
    data_c, old_c = F.col("e.data"), F.col("e.old")
    rows = (
        F.when(F.col("e.type") == "insert", F.array(_tagged(INSERT, data_c)))
        .when(
            F.col("e.type") == "update",
            F.array(
                _tagged(UPDATE_BEFORE, _overlay(old_c, data_c, payload)),
                _tagged(UPDATE_AFTER, data_c),
            ),
        )
        .when(F.col("e.type") == "delete", F.array(_tagged(DELETE, data_c)))
        .otherwise(F.array())
    )
    x = e.select(F.col("e.ts").alias("ts_ms"), F.explode(rows).alias("r"))
    return x.select(
        F.col("r.kind").alias(ROWKIND),
        "ts_ms",
        *[F.col(f"r.payload.{f.name}").alias(f.name) for f in payload.fields],
    )


def parse_ogg(df: DataFrame, json_col: str, schema: T.StructType | str) -> DataFrame:
    """Oracle GoldenGate (ogg-json) → changelog rows.

    Envelope: {"before": row|null, "after": row|null, "op_type":
    "I|U|D", "op_ts": "yyyy-MM-dd HH:mm:ss.SSSSSS"}.  I → +I(after);
    U → -U(before), +U(after); D → -D(before) — the fourth CDC format of
    the reference's flink-json module
    (OggJsonDeserializationSchema.deserialize).  Output carries op_ts
    parsed to a timestamp alongside the payload fields."""
    payload = _payload_schema(schema)
    env = T.StructType(
        [
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("op_type", T.StringType()),
            T.StructField("op_ts", T.StringType()),
        ]
    )
    e = df.select(F.from_json(F.col(json_col), env).alias("e"))
    rows = (
        F.when(F.col("e.op_type") == "I", F.array(_tagged(INSERT, F.col("e.after"))))
        .when(
            F.col("e.op_type") == "U",
            F.array(
                _tagged(UPDATE_BEFORE, F.col("e.before")),
                _tagged(UPDATE_AFTER, F.col("e.after")),
            ),
        )
        .when(F.col("e.op_type") == "D", F.array(_tagged(DELETE, F.col("e.before"))))
        .otherwise(F.array())
    )
    x = e.select(
        F.to_timestamp(F.col("e.op_ts")).alias("op_ts"), F.explode(rows).alias("r")
    )
    return x.select(
        F.col("r.kind").alias(ROWKIND),
        "op_ts",
        *[F.col(f"r.payload.{f.name}").alias(f.name) for f in payload.fields],
    )
