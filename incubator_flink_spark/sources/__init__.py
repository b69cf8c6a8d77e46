"""Sources, sinks, and formats (SURVEY.md §2.1).

The reference's connector matrix (filesystem tables with csv/json/avro/
parquet/orc formats, datagen/print/blackhole utility tables, Kafka/JDBC)
maps to Spark's built-in DataSource framework; this module provides the
table-style entry points so DDL-ish configuration round-trips:

    read_table(spark, path, fmt, schema=..., **options)
    write_table(df, path, fmt, partition_by=[...], mode=...)

Formats csv/json/parquet/orc are first-class (vectorized where Spark
supports it); avro requires the spark-avro package and raises a clear
error when absent. Kafka/JDBC take the same ``format(...)`` path and are
exercised only where infrastructure exists (none in this container —
connector plumbing is identical, options differ).
"""

from incubator_flink_spark.sources.filesystem import read_table, write_table
from incubator_flink_spark.sources.util import blackhole, console_sink, datagen

__all__ = ["read_table", "write_table", "datagen", "console_sink", "blackhole"]
