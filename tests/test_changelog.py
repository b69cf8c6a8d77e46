"""Changelog/retract semantics tests on the users_cdc inline fixture
(FIXTURES.md §4, mirroring the reference's ChangelogSourceITCase)."""

from datetime import datetime

from pyspark.sql import functions as F

from incubator_flink_spark.streaming.changelog import (
    DELETE,
    INSERT,
    ROWKIND,
    UPDATE_AFTER,
    UPDATE_BEFORE,
    changelog_normalize,
    drop_update_before,
    retract_aggregate,
    snapshot_diff,
)


def ts(s):
    return datetime.fromisoformat(s)


CDC_SCHEMA = "__rowkind STRING, user_id BIGINT, name STRING, balance DOUBLE, ts TIMESTAMP, seq BIGINT"


def cdc_fixture(spark):
    rows = [
        (INSERT, 1, "alice", 100.0, ts("2024-01-01 00:00:00"), 1),
        (INSERT, 2, "bob", 50.0, ts("2024-01-01 00:00:01"), 2),
        (UPDATE_BEFORE, 1, "alice", 100.0, ts("2024-01-01 00:00:02"), 3),
        (UPDATE_AFTER, 1, "alice", 150.0, ts("2024-01-01 00:00:02"), 4),
        (INSERT, 3, "carol", 75.0, ts("2024-01-01 00:00:03"), 5),
        (DELETE, 2, "bob", 50.0, ts("2024-01-01 00:00:04"), 6),
        (UPDATE_BEFORE, 3, "carol", 75.0, ts("2024-01-01 00:00:05"), 7),
        (UPDATE_AFTER, 3, "carol", 80.0, ts("2024-01-01 00:00:05"), 8),
    ]
    return spark.createDataFrame(rows, CDC_SCHEMA)


def test_changelog_normalize_materializes_current_state(spark):
    cdc = cdc_fixture(spark)
    out = {r.user_id: (r.name, r.balance) for r in changelog_normalize(cdc, ["user_id"], "ts", "seq").collect()}
    assert out == {1: ("alice", 150.0), 3: ("carol", 80.0)}  # bob deleted


def test_retract_aggregate_signed_sums(spark):
    cdc = cdc_fixture(spark)
    out = {r.name: (r.sum_value, r.live_rows) for r in retract_aggregate(cdc, ["name"], "balance").collect()}
    # alice: +100 -100 +150 = 150 (1 live); bob: +50 -50 = 0 rows → dropped
    assert out == {"alice": (150.0, 1), "carol": (80.0, 1)}


def test_drop_update_before(spark):
    cdc = cdc_fixture(spark)
    kinds = {r[ROWKIND] for r in drop_update_before(cdc).collect()}
    assert UPDATE_BEFORE not in kinds and INSERT in kinds


def test_snapshot_diff_roundtrip(spark):
    old = spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", 50.0), (3, "carol", 75.0)], "user_id BIGINT, name STRING, balance DOUBLE"
    )
    new = spark.createDataFrame(
        [(1, "alice", 150.0), (3, "carol", 75.0), (4, "dave", 10.0)], "user_id BIGINT, name STRING, balance DOUBLE"
    )
    diff = snapshot_diff(old, new, ["user_id"]).collect()
    by_kind = {}
    for r in diff:
        by_kind.setdefault(r[ROWKIND], []).append(r.user_id)
    assert sorted(by_kind[INSERT]) == [4]
    assert sorted(by_kind[DELETE]) == [2]
    assert by_kind[UPDATE_BEFORE] == [1] and by_kind[UPDATE_AFTER] == [1]
    # applying the diff to old reproduces new: old minus (-U,-D) plus (+I,+U)
    retracted = {(r.user_id) for r in diff if r[ROWKIND] in (UPDATE_BEFORE, DELETE)}
    kept = [(r.user_id, r.name, r.balance) for r in old.collect() if r.user_id not in retracted]
    added = [(r.user_id, r.name, r.balance) for r in diff if r[ROWKIND] in (INSERT, UPDATE_AFTER)]
    assert sorted(kept + added) == sorted((r.user_id, r.name, r.balance) for r in new.collect())


def test_retract_aggregate_streaming_consistency(spark):
    # the same expression works per-microbatch: folding batch-by-batch
    # partial CDC prefixes matches the full-batch result on the prefix
    cdc = cdc_fixture(spark)
    full = {r.name: r.sum_value for r in retract_aggregate(cdc, ["name"], "balance").collect()}
    prefix = cdc.where(F.col("seq") <= 6)
    part = {r.name: r.sum_value for r in retract_aggregate(prefix, ["name"], "balance").collect()}
    assert part["alice"] == 150.0 and "bob" not in part
    assert full["carol"] == 80.0
