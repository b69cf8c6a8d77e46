"""Table loading for the driver-generated parquet testdata.

Mirrors the reference's filesystem table connector
(flink-table/flink-table-runtime/.../filesystem/FileSystemTableFactory.java)
in spirit: a table is a directory/file of parquet, read through Spark's
vectorized scan so Catalyst can push filters and prune columns down to
the footer level.  At 100TB these would be partitioned directories; the
reader code path is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spread(df: DataFrame) -> DataFrame:
    """Ensure a scan feeds at least cluster-parallelism partitions.

    A small table stored as one parquet file scans as ONE split, which
    serializes any expensive per-row derivation (shingling, hashing,
    vector math) on a single core. Round-robin repartition to the default
    parallelism when the scan is narrower than the cluster; at 100TB the
    scan already has thousands of splits and this is a no-op (no shuffle
    is added on the big-data path)."""
    if df.isStreaming:  # partition introspection is undefined on streams
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    # Probe the partition count through queryExecution().toRdd() instead
    # of df.rdd: the Python-facing df.rdd additionally builds the
    # Row-deserializer RDD pipeline, costing 80-300ms of DRIVER time per
    # call (profiled; spread() runs in ~40 operator paths, several times
    # per query) vs ~10ms for the JVM-side probe.  Same partition count.
    if df._jdf.queryExecution().toRdd().getNumPartitions() < target:
        return df.repartition(target)
    return df


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one table. Plain parquet scan — vectorized, prunable.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as int64 nanos (legacy conf, runtime-
    settable) and convert to a microsecond TimestampType — the same
    coercion DuckDB applies, so oracle comparisons line up. The testdata
    is micro-aligned (no sub-microsecond components), so the conversion
    is lossless.
    """
    # Event-time semantics must not depend on the host/session timezone
    # (the driver supplies its own SparkSession): pin UTC so timestamp
    # rendering, date_trunc, year() etc. match the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        # nanos-encoded files surface ts as int64 under the legacy conf;
        # micros files read directly — but as TIMESTAMP_NTZ (parquet
        # isAdjustedToUTC=false), which unix_micros & co. reject.  The
        # session timezone is pinned UTC above, so casting NTZ→TIMESTAMP
        # is value-identical and gives every operator one ts type.
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` queries and the
    DataFrame API see the same catalog (the reference's
    GenericInMemoryCatalog equivalent)."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
