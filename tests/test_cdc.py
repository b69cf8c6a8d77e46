"""CDC format ingestion tests: raw envelope files → __rowkind changelog
rows → changelog_normalize / retract_aggregate (reference:
flink-formats/flink-json debezium/canal/maxwell deserialization schemas)."""

import json

from incubator_flink_spark.sources.cdc import parse_canal, parse_debezium, parse_maxwell
from incubator_flink_spark.streaming.changelog import retract_aggregate

SCHEMA = "id BIGINT, name STRING, qty BIGINT"

DEBEZIUM = [
    {"before": None, "after": {"id": 1, "name": "a", "qty": 5}, "op": "c", "ts_ms": 1},
    {"before": None, "after": {"id": 2, "name": "b", "qty": 3}, "op": "c", "ts_ms": 2},
    {"before": {"id": 1, "name": "a", "qty": 5}, "after": {"id": 1, "name": "a", "qty": 9}, "op": "u", "ts_ms": 3},
    {"before": {"id": 2, "name": "b", "qty": 3}, "after": None, "op": "d", "ts_ms": 4},
    {"before": None, "after": {"id": 3, "name": "c", "qty": 7}, "op": "r", "ts_ms": 5},
]


def _raw_file(spark, tmp_path, envelopes, name):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(e) for e in envelopes))
    return spark.read.text(str(p))


def test_debezium_to_current_state(spark, tmp_path):
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    raw = _raw_file(spark, tmp_path, DEBEZIUM, "dbz.jsonl")
    rows = parse_debezium(raw, "value", SCHEMA)
    kinds = [(r["__rowkind"], r.id, r.qty) for r in rows.orderBy("ts_ms", "__rowkind").collect()]
    assert kinds == [
        ("+I", 1, 5),
        ("+I", 2, 3),
        ("+U", 1, 9),  # -U sorts before +U at ts 3? no: ordered by (ts, kind): '+U' < '-U' lexically
        ("-U", 1, 5),
        ("-D", 2, 3),
        ("+I", 3, 7),
    ]
    state = changelog_normalize(rows, ["id"], "ts_ms", "ts_ms").orderBy("id")
    assert [(r.id, r.name, r.qty) for r in state.collect()] == [(1, "a", 9), (3, "c", 7)]


def test_debezium_retract_aggregate(spark, tmp_path):
    from pyspark.sql import functions as F

    raw = _raw_file(spark, tmp_path, DEBEZIUM, "dbz2.jsonl")
    rows = parse_debezium(raw, "value", SCHEMA).withColumn("g", F.lit(1))
    agg = retract_aggregate(rows, ["g"], "qty").collect()
    assert len(agg) == 1
    assert agg[0].sum_value == 16.0  # +5 +3 -5 +9 -3 +7
    assert agg[0].live_rows == 2  # rows 1 and 3 alive


def test_canal_batch_update_with_sparse_old(spark, tmp_path):
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    canal = [
        {
            "data": [{"id": 1, "name": "a", "qty": 5}, {"id": 2, "name": "b", "qty": 3}],
            "old": None,
            "type": "INSERT",
            "ts": 1,
        },
        {
            # sparse old: only qty changed for id=1
            "data": [{"id": 1, "name": "a", "qty": 9}],
            "old": [{"qty": 5}],
            "type": "UPDATE",
            "ts": 2,
        },
        {"data": [{"id": 2, "name": "b", "qty": 3}], "old": None, "type": "DELETE", "ts": 3},
    ]
    raw = _raw_file(spark, tmp_path, canal, "canal.jsonl")
    rows = parse_canal(raw, "value", SCHEMA)
    got = [(r["__rowkind"], r.id, r.qty) for r in rows.orderBy("ts_ms", "id", "__rowkind").collect()]
    assert ("-U", 1, 5) in got and ("+U", 1, 9) in got and ("-D", 2, 3) in got
    state = changelog_normalize(rows, ["id"], "ts_ms", "ts_ms").collect()
    assert [(r.id, r.qty) for r in state] == [(1, 9)]


def test_maxwell_update_and_delete(spark, tmp_path):
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    maxwell = [
        {"type": "insert", "data": {"id": 1, "name": "a", "qty": 5}, "old": None, "ts": 1},
        {"type": "insert", "data": {"id": 2, "name": "b", "qty": 3}, "old": None, "ts": 2},
        {"type": "update", "data": {"id": 1, "name": "a", "qty": 9}, "old": {"qty": 5}, "ts": 3},
        {"type": "delete", "data": {"id": 2, "name": "b", "qty": 3}, "old": None, "ts": 4},
    ]
    raw = _raw_file(spark, tmp_path, maxwell, "maxwell.jsonl")
    rows = parse_maxwell(raw, "value", SCHEMA)
    got = [(r["__rowkind"], r.id, r.qty) for r in rows.orderBy("ts_ms", "__rowkind").collect()]
    assert got == [
        ("+I", 1, 5),
        ("+I", 2, 3),
        ("+U", 1, 9),
        ("-U", 1, 5),
        ("-D", 2, 3),
    ]
    state = changelog_normalize(rows, ["id"], "ts_ms", "ts_ms").collect()
    assert [(r.id, r.qty) for r in state] == [(1, 9)]


def test_ogg_update_and_delete(spark, tmp_path):
    from incubator_flink_spark.sources.cdc import parse_ogg
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    ogg = [
        {"before": None, "after": {"id": 1, "name": "a", "qty": 5}, "op_type": "I",
         "op_ts": "2024-01-01 00:00:01.000000"},
        {"before": None, "after": {"id": 2, "name": "b", "qty": 3}, "op_type": "I",
         "op_ts": "2024-01-01 00:00:02.000000"},
        {"before": {"id": 1, "name": "a", "qty": 5}, "after": {"id": 1, "name": "a", "qty": 9},
         "op_type": "U", "op_ts": "2024-01-01 00:00:03.000000"},
        {"before": {"id": 2, "name": "b", "qty": 3}, "after": None, "op_type": "D",
         "op_ts": "2024-01-01 00:00:04.000000"},
    ]
    raw = _raw_file(spark, tmp_path, ogg, "ogg.jsonl")
    rows = parse_ogg(raw, "value", SCHEMA)
    got = [(r["__rowkind"], r.id, r.qty) for r in rows.orderBy("op_ts", "__rowkind").collect()]
    assert got == [
        ("+I", 1, 5),
        ("+I", 2, 3),
        ("+U", 1, 9),
        ("-U", 1, 5),
        ("-D", 2, 3),
    ]
    state = changelog_normalize(rows, ["id"], "op_ts", "op_ts").collect()
    assert [(r.id, r.qty) for r in state] == [(1, 9)]
