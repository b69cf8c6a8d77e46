"""SQL semantics edge tests mirroring the reference's null-variant
fixtures (TestData.nullData3 — FIXTURES.md §3) and empty-input behavior,
plus the skew-salting join utility."""

from pyspark.sql import functions as F

from incubator_flink_spark.operators.skew import salted_join

T3_SCHEMA = "a INT, b BIGINT, c STRING"
NULL_T3 = [
    (1, 1, "Hi"),
    (2, 2, "Hello"),
    (None, 2, "Hello world"),
    (3, None, "I am fine."),
    (None, None, None),
    (4, 3, "Luke Skywalker"),
]


def test_null_keys_group_together(spark):
    df = spark.createDataFrame(NULL_T3, T3_SCHEMA)
    groups = {r.b: r.cnt for r in df.groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert groups[None] == 2  # NULL is a grouping value (SQL semantics)
    assert groups[2] == 2


def test_null_keys_do_not_join(spark):
    df = spark.createDataFrame(NULL_T3, T3_SCHEMA)
    other = spark.createDataFrame([(None, "x"), (2, "y")], "a INT, tag STRING")
    joined = df.join(other, "a").collect()
    assert {r.tag for r in joined} == {"y"}  # NULL = NULL is not true


def test_null_safe_equal_joins(spark):
    df = spark.createDataFrame(NULL_T3, T3_SCHEMA)
    other = spark.createDataFrame([(None, "x"), (2, "y")], "d INT, tag STRING")
    joined = df.join(other, df.a.eqNullSafe(other.d)).collect()
    assert {r.tag for r in joined} == {"x", "y"}  # <=> matches NULLs


def test_nulls_excluded_from_aggs_but_counted_by_star(spark):
    df = spark.createDataFrame(NULL_T3, T3_SCHEMA)
    row = df.agg(
        F.count(F.lit(1)).alias("star"),
        F.count("a").alias("non_null_a"),
        F.sum("b").alias("sum_b"),
        F.avg("b").alias("avg_b"),
    ).first()
    assert row.star == 6 and row.non_null_a == 4
    assert row.sum_b == 8 and row.avg_b == 2.0  # 4 non-null b values


def test_empty_input_aggregate(spark):
    df = spark.createDataFrame([], T3_SCHEMA)
    row = df.agg(F.count(F.lit(1)).alias("c"), F.sum("b").alias("s")).first()
    assert row.c == 0 and row.s is None  # global agg on empty: one row
    assert df.groupBy("a").count().count() == 0  # grouped agg on empty: none


def test_salted_join_equals_plain_join(spark):
    # heavy skew: 10k rows on one key
    probe = spark.range(10000).select(F.lit(1).alias("k"), F.col("id")).union(
        spark.range(100).select(F.lit(2).alias("k"), F.col("id"))
    )
    build = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k INT, label STRING")
    plain = probe.join(build, "k").groupBy("k", "label").count()
    salted = salted_join(probe, build, "k", salt=8).groupBy("k", "label").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
