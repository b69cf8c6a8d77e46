"""Incremental materialized-view maintenance (operators/mv.py) — the
batch form of the reference's dynamic-table semantics
(FlinkChangelogModeInferenceProgram.scala:40, GroupAggFunction.java:43).

Property under test: delta merge / affected-group refresh produce
EXACTLY what a full recompute over the post-change fact produces,
including group elimination (count -> 0 leaves the view) and
key-moving updates (-U in the old group, +U in the new).
"""

import random

from pyspark.sql import functions as F

from incubator_flink_spark.operators.mv import mv_affected_refresh, mv_delta_merge

DEC = "decimal(30,8)"


def _recompute(fact):
    return fact.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("v").cast(DEC)).alias("sum_v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_merge_matches_recompute_randomized(spark):
    rng = random.Random(7)
    base = [(i, rng.randrange(8), round(rng.uniform(-50, 50), 2)) for i in range(400)]
    fact = spark.createDataFrame(base, "id LONG, k LONG, v DOUBLE")
    mv0 = _recompute(fact)

    # Changelog: delete ids %7==0, revise ids %7==1 moving them to key
    # (k+1)%8 with doubled value, insert 60 fresh rows.
    by_id = {i: (k, v) for i, k, v in base}
    deletes = [i for i in by_id if i % 7 == 0]
    revs = [i for i in by_id if i % 7 == 1]
    inserts = [(1000 + j, rng.randrange(8), round(rng.uniform(-50, 50), 2)) for j in range(60)]

    delta_rows = []
    for i in deletes:
        k, v = by_id[i]
        delta_rows.append((k, -1, v))
    for i in revs:
        k, v = by_id[i]
        delta_rows.append((k, -1, v))
        delta_rows.append(((k + 1) % 8, 1, v * 2))
    for _, k, v in inserts:
        delta_rows.append((k, 1, v))
    delta = spark.createDataFrame(delta_rows, "k LONG, __sign INT, v DOUBLE").select(
        "k", "__sign", F.col("v").cast(DEC).alias("sum_v")
    )

    merged = mv_delta_merge(mv0, delta, ["k"], "cnt", ["sum_v"])

    final_rows = [
        (i, ((k + 1) % 8, v * 2) if i % 7 == 1 else (k, v))
        for i, (k, v) in by_id.items()
        if i % 7 != 0
    ]
    final = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in final_rows] + list(inserts), "id LONG, k LONG, v DOUBLE"
    )
    assert _rows(merged) == _rows(_recompute(final))


def test_delta_merge_group_elimination(spark):
    fact = spark.createDataFrame([(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0)], "id LONG, k LONG, v DOUBLE")
    mv0 = _recompute(fact)
    # Retract both k=10 rows: the group must leave the view entirely.
    delta = spark.createDataFrame(
        [(10, -1, 5.0), (10, -1, 7.0)], "k LONG, __sign INT, v DOUBLE"
    ).select("k", "__sign", F.col("v").cast(DEC).alias("sum_v"))
    merged = mv_delta_merge(mv0, delta, ["k"], "cnt", ["sum_v"])
    assert [r["k"] for r in merged.collect()] == [20]


def test_affected_refresh_retracts_extremum(spark):
    fact = spark.createDataFrame(
        [(1, "a", 9.0), (2, "a", 3.0), (3, "b", 4.0), (4, "c", 2.0)],
        "id LONG, k STRING, v DOUBLE",
    )
    mv0 = fact.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"), F.max("v").alias("max_v")
    )
    # Delete the id=1 row: group a's standing max (9.0) must be retracted
    # down to 3.0; groups b/c are untouched and must carry over from mv0.
    final = fact.where(F.col("id") != 1).select("k", "v")
    delta_keys = spark.createDataFrame([("a",)], "k STRING")
    out = mv_affected_refresh(
        mv0,
        final,
        delta_keys,
        ["k"],
        [F.count(F.lit(1)).cast("bigint").alias("cnt"), F.max("v").alias("max_v")],
    )
    got = {r["k"]: (r["cnt"], r["max_v"]) for r in out.collect()}
    assert got == {"a": (1, 3.0), "b": (1, 4.0), "c": (1, 2.0)}
