"""Streaming sources (reference: FLIP-27 FileSource, datagen/rate tables —
SURVEY.md §2.1).

``replay_table`` turns a batch parquet table into an ordered file-replay
stream: rows are split into N time-ordered parquet files and read with
``readStream`` + ``maxFilesPerTrigger=1``, reproducing the reference
ITCase pattern of feeding elements in event-time order with periodic
watermark advancement."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load


def replay_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    out_dir: str,
    ts_col: str = "ts",
    n_files: int = 5,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Materialize `table` as n_files time-ordered parquet files under
    out_dir and return a file-source stream over them."""
    df = load(spark, sf_dir, table)
    total = df.count()
    per = (total + n_files - 1) // n_files
    from pyspark.sql import Window as W

    # keyless window is fine HERE: this is a test-fixture generator that
    # materializes a small replay directory, not a production operator —
    # at scale the time-ordered split would be repartitionByRange(ts)
    # (operators/rank.py is the distributed construction)
    ordered = df.withColumn("__rn", F.row_number().over(W.orderBy(ts_col))).withColumn(
        "__file", ((F.col("__rn") - 1) / per).cast("int")
    )
    ordered.write.mode("overwrite").partitionBy("__file").parquet(out_dir)
    schema = df.schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(out_dir + "/__file=*")
        .drop("__rn")
    )


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """The reference's datagen table equivalent."""
    return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
