"""Bucketed (co-located) tables — the 100TB fact-fact join strategy.

The reference's DataSet optimizer chooses ship strategies to co-partition
join inputs (flink-optimizer dataproperties); Spark's equivalent for
*persistent* co-location is hive-style bucketing: writing both fact
tables bucketed+sorted on the join key lets SortMergeJoin run with ZERO
exchanges — at 100TB that removes the dominant shuffle from every
fact-fact join on that key.

``create_bucketed``/``bucketed_join`` wrap saveAsTable(bucketBy/sortBy)
and the downstream join; tests/test_bucketed.py asserts the no-exchange
plan via the plan auditor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans SortMergeJoin with no Exchange on either
    side (verify with plans.audit_plan: exchanges == 0)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on, how)
