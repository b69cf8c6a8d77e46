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

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register


def _workdir(prefix: str) -> str:
    """mkdtemp + atexit cleanup: the returned DataFrames read the written
    artifacts lazily, so the dir must outlive the query call; cleaning at
    interpreter exit keeps /tmp stable across repeated driver/check runs
    (same hygiene as queries/streaming_gate.py)."""
    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


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
    out = os.path.join(_workdir("avro_rt_"), "documents_avro")
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

    from incubator_flink_spark.sources.jdbc import DERBY_DRIVER, read_jdbc, write_jdbc

    url = f"jdbc:derby:{_workdir('jdbc_rt_')}/db;create=true"
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


# --------------------------------------------------------------------------
# CSV format round trip (round 10): write -> read(schema) -> aggregate
# --------------------------------------------------------------------------

CSV_ROUNDTRIP_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("csv_roundtrip_agg", CSV_ROUNDTRIP_ORACLE)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV format round trip (reference flink-formats/flink-csv
    CsvRowDataSerDeSchema; the Flink `csv.field-delimiter` option maps to
    Spark's `sep` — sources/ddl.format_options): orders is written as
    pipe-delimited CSV with header, read back under an EXPLICIT declared
    schema (no inference — the reference's CSV format is always typed by
    the DDL schema), and aggregated.  Doubles round-trip exactly through
    Java's shortest-round-trip decimal repr; floor-cents keeps the sums
    engine-exact."""

    from incubator_flink_spark.sources.filesystem import read_table, write_table

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    d = load(spark, sf_dir, "orders").select(*cols)
    out = os.path.join(_workdir("csv_rt_"), "orders_csv")
    write_table(d, out, "csv", mode="overwrite", sep="|")
    back = read_table(
        spark, out, "csv",
        schema="o_orderkey long, o_custkey long, o_totalprice double, o_orderpriority string",
        sep="|",
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("price_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# ORC format round trip (round 10) — timestamps included
# --------------------------------------------------------------------------

ORC_ROUNDTRIP_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS val_cents,
       MIN(ts) AS min_ts,
       MAX(ts) AS max_ts
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("orc_roundtrip_agg", ORC_ROUNDTRIP_ORACLE)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC format round trip (reference flink-formats/flink-orc
    OrcFileFormatFactory): events — including microsecond TIMESTAMPs —
    written to ORC and read back must aggregate identically to the
    original parquet (the oracle)."""

    from incubator_flink_spark.sources.filesystem import read_table, write_table

    d = load(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    out = os.path.join(_workdir("orc_rt_"), "events_orc")
    write_table(d, out, "orc", mode="overwrite")
    back = read_table(spark, out, "orc")
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).cast("bigint").alias("val_cents"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Bucketed co-located join (round 10): exchange-free SMJ, value-gated
# --------------------------------------------------------------------------

BUCKETED_JOIN_AGG_ORACLE = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("bucketed_join_agg", BUCKETED_JOIN_AGG_ORACLE)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join (sources/bucketed.py; the
    reference DataSet optimizer's co-partition ship strategy —
    flink-optimizer dataproperties): orders and customer are persisted
    bucketed+sorted on the join key (8 buckets) and joined WITHOUT any
    exchange (tests/test_bucketed.py pins the zero-Exchange SMJ plan);
    this entry value-gates the same path — the co-located join's
    aggregate must equal the plain join oracle."""
    from incubator_flink_spark.sources.bucketed import bucketed_join, create_bucketed

    # a previous PROCESS may have left the managed tables' warehouse dirs
    # behind without this session knowing the tables — saveAsTable then
    # fails LOCATION_ALREADY_EXISTS; drop both name and location first
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "", 1)
    for t in ("__gate_bkt_orders", "__gate_bkt_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    create_bucketed(orders, "__gate_bkt_orders", "custkey", 8)
    create_bucketed(cust, "__gate_bkt_cust", "custkey", 8)
    joined = bucketed_join(spark, "__gate_bkt_orders", "__gate_bkt_cust", "custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("price_cents"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# upsert-kafka DDL SINK round trip (round 10): INSERT with duplicate keys
# -> deterministic last-write-wins -> read-back state
# --------------------------------------------------------------------------

# Values are fixed-width integral doubles (100000..199999 / 300000..),
# so the sink's stable (key, value, timestamp) offset order makes the
# within-one-INSERT upsert winner the NUMERIC max — which the oracle can
# state in closed form.
UPSERT_KAFKA_SINK_ORACLE = """
WITH src AS (
  SELECT o_orderkey % 50 AS id,
         100000 + (o_orderkey % 100000) AS v
  FROM orders
),
w1 AS (SELECT id, MAX(v) AS v FROM src GROUP BY id)
SELECT id,
       CAST(CASE WHEN id % 3 = 0 THEN 300000 + id ELSE v END AS DOUBLE) AS v
FROM w1
ORDER BY id
"""


@register("upsert_kafka_ddl_sink_roundtrip", UPSERT_KAFKA_SINK_ORACLE)
def upsert_kafka_ddl_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upsert-kafka DDL SINK (sources/ddl.write_kafka_frames; reference
    UpsertKafkaDynamicTableFactory serializer) under the driver gate: one
    INSERT writes MANY rows per primary key (orders keyed by
    o_orderkey % 50), a second INSERT upserts a third of the keys, and
    the read-back materialized state must equal the closed-form
    last-write-wins oracle.  This pins the round-10 deterministic offset
    assignment end to end: with partition-scoped offsets the winner of
    the duplicate-key INSERT would depend on upstream partitioning and
    the hash gate would flake."""

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    fp = os.path.join(_workdir("uk_gate_"), "frames")
    env.execute_sql(f"""
        CREATE TABLE uk_gate_rt (
          id BIGINT, v DOUBLE,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector'='upsert-kafka','topic'='gate',
                'key.format'='json','value.format'='json',
                'frames-path'='{fp}')
    """)
    load(spark, sf_dir, "orders").createOrReplaceTempView("__uk_gate_orders")
    env.execute_sql(
        "INSERT INTO uk_gate_rt "
        "SELECT o_orderkey % 50 AS id, "
        "CAST(100000 + (o_orderkey % 100000) AS DOUBLE) AS v "
        "FROM __uk_gate_orders"
    )
    env.execute_sql(
        "INSERT INTO uk_gate_rt "
        "SELECT id, CAST(300000 + id AS DOUBLE) FROM "
        "(SELECT DISTINCT o_orderkey % 50 AS id FROM __uk_gate_orders) "
        "WHERE id % 3 = 0"
    )
    return env.sql_query("SELECT id, v FROM uk_gate_rt ORDER BY id").to_df()
