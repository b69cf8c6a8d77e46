"""SCD2 construction (operators/scd.py) — invariants tying the built
versioned table to the AS OF join family it exists to serve."""

from datetime import datetime

from pyspark.sql import functions as F

from incubator_flink_spark.operators.asof import asof_join
from incubator_flink_spark.operators.scd import scd2_build


def ts(s):
    return datetime.fromisoformat(s)


def history(spark):
    rows = [
        # user 1: a -> a -> b -> b -> a  (3 versions after compression)
        (1, ts("2024-01-01 00:00:00"), 1, "a"),
        (1, ts("2024-01-02 00:00:00"), 2, "a"),
        (1, ts("2024-01-03 00:00:00"), 3, "b"),
        (1, ts("2024-01-04 00:00:00"), 4, "b"),
        (1, ts("2024-01-05 00:00:00"), 5, "a"),
        # user 2: single row, always current
        (2, ts("2024-01-02 12:00:00"), 6, "c"),
    ]
    return spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, event_id LONG, attr STRING")


def test_change_compression_and_intervals(spark):
    dim = scd2_build(history(spark), "user_id", "ts", "event_id", ["attr"])
    rows = {(r["user_id"], r["version"]): r for r in dim.collect()}
    assert len(rows) == 4  # 3 versions for user 1, 1 for user 2
    v1 = rows[(1, 1)]
    assert (v1["attr"], v1["n_rows"], v1["is_current"]) == ("a", 2, 0)
    assert v1["valid_to"] == ts("2024-01-03 00:00:00")  # abuts version 2
    v3 = rows[(1, 3)]
    assert (v3["attr"], v3["valid_to"], v3["is_current"]) == ("a", None, 1)
    # Intervals tile the key's timeline: valid_to of version k == valid_from of k+1.
    assert rows[(1, 2)]["valid_from"] == v1["valid_to"]
    assert rows[(1, 2)]["valid_to"] == v3["valid_from"]


def test_asof_probe_of_dim_equals_asof_over_history(spark):
    """Probing the compressed dimension AS OF t must give the same
    attribute as probing the raw history — compression is lossless for
    temporal-join purposes."""
    h = history(spark)
    dim = scd2_build(h, "user_id", "ts", "event_id", ["attr"])
    probes = spark.createDataFrame(
        [
            (101, 1, ts("2024-01-02 06:00:00")),
            (102, 1, ts("2024-01-04 23:00:00")),
            (103, 1, ts("2024-01-05 00:00:00")),
            (104, 2, ts("2024-01-03 00:00:00")),
        ],
        "probe_id LONG, user_id LONG, pts TIMESTAMP",
    )
    via_dim = asof_join(
        probes, dim.select("user_id", F.col("valid_from").alias("vts"), "attr"),
        keys=["user_id"], probe_ts="pts", build_ts="vts", payload={"attr": "attr"},
    )
    via_hist = asof_join(
        probes, h.select("user_id", F.col("ts").alias("hts"), "attr"),
        keys=["user_id"], probe_ts="pts", build_ts="hts", payload={"attr": "attr"},
    )
    a = {r["probe_id"]: r["attr"] for r in via_dim.collect()}
    b = {r["probe_id"]: r["attr"] for r in via_hist.collect()}
    assert a == b == {101: "a", 102: "b", 103: "a", 104: "c"}
