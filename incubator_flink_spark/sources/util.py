"""Utility tables (reference: DataGenTableSourceFactory, PrintTableSinkFactory,
BlackHoleTableSinkFactory — SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def datagen(
    spark: SparkSession, rows_per_second: int = 100, streaming: bool = True, n_rows: int = 1000
) -> DataFrame:
    """Datagen table: streaming → rate source; batch → range with a
    synthetic timestamp/value (deterministic)."""
    if streaming:
        return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return spark.range(n_rows).select(
        F.col("id"),
        F.timestamp_micros(F.lit(1704067200000000) + F.col("id") * 1_000_000).alias("timestamp"),
        (F.col("id") % 100).cast("double").alias("value"),
    )


def console_sink(df: DataFrame, **options):
    """Print sink: batch show() / streaming console format."""
    if df.isStreaming:
        return df.writeStream.format("console").options(**options)
    df.show(int(options.get("numRows", 20)), truncate=False)
    return None


def blackhole(df: DataFrame):
    """Blackhole sink: full evaluation, zero output — the benchmarking
    sink (noop datasource)."""
    if df.isStreaming:
        return df.writeStream.format("noop")
    df.write.mode("overwrite").format("noop").save()
    return None
