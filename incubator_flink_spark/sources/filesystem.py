"""Filesystem table connector (reference: FileSystemTableFactory.java —
partitioned directories, format plugins; SURVEY.md §2.1).

Partitioned writes use ``partitionBy`` (hive-style dirs, the same layout
the reference's filesystem sink produces); reads prune partitions from
the directory structure automatically. Streaming reads/writes use the
same paths through readStream/writeStream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BUILTIN_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    streaming: bool = False,
    **options,
) -> DataFrame:
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "false" if schema else "true")
    reader = spark.readStream if streaming else spark.read
    reader = reader.format(fmt).options(**options)
    if schema:
        reader = reader.schema(schema)
    if fmt == "avro" and not _has_avro(spark):
        # dependency-free fallback: pure-Python OCF decode (public Avro
        # spec), distributed per-file via mapInPandas — see
        # sources/avro_format.py for the scale contract
        if streaming:
            raise RuntimeError(
                "avro streaming reads require the spark-avro package; "
                "the pure-Python fallback is batch-only"
            )
        from incubator_flink_spark.sources.avro_format import read_avro

        return read_avro(spark, path)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "avro" and not _has_avro(df.sparkSession):
        from incubator_flink_spark.sources.avro_format import write_avro

        if partition_by:
            raise RuntimeError(
                "avro partitioned writes require the spark-avro package; "
                "the pure-Python fallback writes one container per task"
            )
        write_avro(df, path, codec=options.get("codec", "deflate"))
        return
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def _has_avro(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent")
    except Exception as e:  # noqa: BLE001
        return "Failed to find" not in str(e) and "data source" not in str(e).lower()
    return True
