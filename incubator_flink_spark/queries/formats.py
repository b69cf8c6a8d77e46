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


# --------------------------------------------------------------------------
# JSON format round trip (round 10)
# --------------------------------------------------------------------------

JSON_ROUNDTRIP_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("json_roundtrip_agg", JSON_ROUNDTRIP_ORACLE)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines format round trip (reference flink-formats/flink-json
    JsonRowDataSerDeSchema): documents — including full free text with
    quotes/escapes — written as JSON lines and read back under a
    declared schema must aggregate identically to the parquet (the
    oracle).  Escaping correctness is the point: a broken escape would
    shift rows and break the count/min hash."""
    from incubator_flink_spark.sources.filesystem import read_table, write_table

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    out = os.path.join(_workdir("json_rt_"), "documents_json")
    write_table(d, out, "json", mode="overwrite")
    back = read_table(
        spark, out, "json", schema="doc_id long, text string, lang string, n_chars long"
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Table-aggregate function (UDTAF) — flat_aggregate under the gate
# --------------------------------------------------------------------------

UDTAF_TOP2_ORACLE = """
WITH ranked AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(FLOOR(value * 100) AS BIGINT) DESC, event_id) AS rnk
  FROM events
)
SELECT event_type, CAST(rnk AS INTEGER) AS rank, event_id, cents
FROM ranked
WHERE rnk <= 2
ORDER BY event_type, rank
"""


@register("udtaf_top2_flat_aggregate", UDTAF_TOP2_ORACLE)
def udtaf_top2_flat_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableAggregateFunction (UDTAF) through the Table API's
    flat_aggregate (reference Table.flatAggregate:1292 + the docs' Top2
    emitValue example): a per-group pandas transform emits the top-2
    rows per event_type — the canonical UDTAF — and must equal the
    closed-form rank oracle."""
    import pandas as pd

    from incubator_flink_spark.api.table import Table

    events = load(spark, sf_dir, "events").select(
        "event_type", "event_id", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values(["cents", "event_id"], ascending=[False, True]).head(2)
        p = p.reset_index(drop=True)
        p["rank"] = (p.index + 1).astype("int32")
        return p[["event_type", "rank", "event_id", "cents"]]

    t = Table(events).flat_aggregate(
        ["event_type"], top2, "event_type string, rank int, event_id long, cents long"
    )
    return t.to_df().orderBy("event_type", "rank")


# --------------------------------------------------------------------------
# pandas GROUPED_AGG UDAF (round 10)
# --------------------------------------------------------------------------

PANDAS_UDAF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS BIGINT) AS weighted_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("pandas_udaf_weighted_sum", PANDAS_UDAF_ORACLE)
def pandas_udaf_weighted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized GROUPED_AGG pandas UDAF (reference: Python
    AggregateFunction, pyflink general user-defined aggregate functions;
    Spark-side: Arrow-batched pandas_udf with PandasUDFType.GROUPED_AGG)
    computing a quantity-weighted price sum per returnflag over lineitem
    — integer-cents arithmetic keeps the UDAF bit-equal to the SQL
    oracle."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def weighted_cents(price_cents, qty):
        return int((price_cents * qty).sum())

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def long_sum(qty):
        # grouped-agg pandas UDFs cannot mix with non-pandas aggregates in
        # one agg() (INVALID_PANDAS_UDF_PLACEMENT) — both columns go
        # through the Arrow-batched path
        return int(qty.sum())

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            weighted_cents("price_cents", "qty").alias("weighted_cents"),
            long_sum("qty").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# KeyedProcessFunction (DataStream API) under the gate (round 10)
# --------------------------------------------------------------------------

KEYED_PROCESS_ORACLE = """
SELECT user_id, event_id,
       MAX(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS run_max_cents
FROM events
ORDER BY user_id, event_id
"""


@register("keyed_process_running_max", KEYED_PROCESS_ORACLE)
def keyed_process_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyedProcessFunction through the DataStream facade
    (api/datastream.KeyedStream.process; reference KeyedProcessFunction /
    ProcessFunction docs — per-key state evolved in element order): each
    user's events are processed in (ts, event_id) order carrying a
    running-max register; every element emits (event_id, register).  The
    oracle is the closed-form running window MAX."""
    import pandas as pd

    from incubator_flink_spark.api.datastream import StreamExecutionEnvironment

    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def running_max(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        p["run_max_cents"] = p["cents"].cummax()
        return p[["user_id", "event_id", "run_max_cents"]]

    env = StreamExecutionEnvironment(spark)
    out = (
        env.from_dataframe(events)
        .key_by("user_id")
        .process(running_max, "user_id long, event_id long, run_max_cents long")
    )
    return out.to_df().orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# KeyedCoProcessFunction over connected streams (round 10, cont.)
# --------------------------------------------------------------------------

COPROCESS_ORACLE = """
WITH ctrl AS (
  SELECT DISTINCT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS cts,
         (day(date_trunc('day', ts)) % 5) + 1 AS mult
  FROM events WHERE day(ts) % 3 = 0
),
d AS (
  SELECT event_type, event_id, ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
u AS (
  SELECT event_type, cts AS ts, CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS BIGINT) AS cents, mult, 0 AS prio FROM ctrl
  UNION ALL
  SELECT event_type, ts, event_id, cents, CAST(NULL AS BIGINT) AS mult, 1 FROM d
),
f AS (
  SELECT *, LAST_VALUE(mult IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY ts, prio, event_id
    ROWS UNBOUNDED PRECEDING) AS cur
  FROM u
)
SELECT event_type, event_id,
       CAST(cents * COALESCE(cur, 1) AS BIGINT) AS scaled_cents
FROM f WHERE prio = 1
ORDER BY event_type, event_id
"""


@register("coprocess_rate_switch", COPROCESS_ORACLE)
def coprocess_rate_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyedCoProcessFunction through the DataStream facade
    (api/datastream.ConnectedStreams.key_by().process(); reference
    DataStream.connect + CoProcessFunction — two streams dispatched into
    one keyed function that evolves shared per-key state): a sparse
    control stream (one multiplier change per event_type on every third
    calendar day) connects with the event stream; per key, the merged
    rows fold in (ts, control-first, event_id) order, each data row
    emitting its cents scaled by the multiplier register (default 1
    before the first control).  The oracle is the closed-form as-of
    semantics via LAST_VALUE IGNORE NULLS over the tagged union."""
    import pandas as pd

    from incubator_flink_spark.api.datastream import StreamExecutionEnvironment

    events = load(spark, sf_dir, "events")
    data = events.select(
        "event_type", "event_id", "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    ctrl = (
        events.where(F.dayofmonth("ts") % 3 == 0)
        .select("event_type", F.date_trunc("day", F.col("ts")).alias("ts"))
        .distinct()
        .withColumn("mult", (F.dayofmonth("ts") % 5 + 1).cast("bigint"))
    )

    def co_fold(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.copy()
        # control rows (right side) sort before data rows at equal ts
        p["__prio"] = (p["__side"] == "left").astype(int)
        p = p.sort_values(["ts", "__prio", "event_id"]).reset_index(drop=True)
        p["__cur"] = p["mult"].ffill().fillna(1)
        out = p[p["__side"] == "left"]
        return pd.DataFrame(
            {
                "event_type": out["event_type"],
                "event_id": out["event_id"].astype("int64"),
                "scaled_cents": (out["cents"] * out["__cur"]).astype("int64"),
            }
        )

    env = StreamExecutionEnvironment(spark)
    out = (
        env.from_dataframe(data)
        .connect(env.from_dataframe(ctrl))
        .key_by("event_type")
        .process(co_fold, "event_type string, event_id long, scaled_cents long")
    )
    return out.to_df().orderBy("event_type", "event_id")


# --------------------------------------------------------------------------
# Async I/O UNORDERED mode (round 10, cont.)
# --------------------------------------------------------------------------

ASYNC_UNORDERED_ORACLE = """
SELECT e.event_id, r.r_name AS region_name
FROM events e
JOIN region r ON e.user_id % 5 = r.r_regionkey
ORDER BY e.event_id
"""


@register("async_unordered_enrich", ASYNC_UNORDERED_ORACLE)
def async_unordered_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async I/O enrichment in UNORDERED mode (operators/async_io
    .async_map ordered=False; reference AsyncDataStream.unorderedWait /
    AsyncWaitOperator.java:78 — completions emit as they finish, order
    within a batch is not preserved): each event row looks up
    user_id % 5 against the 5-row region dimension through the thread
    pool; unordered completion is a SET guarantee, so the gate pins the
    result with a total ORDER BY and must still equal the plain
    broadcast-join oracle row-for-row."""
    from incubator_flink_spark.operators.async_io import async_map

    region = {
        int(r.r_regionkey): r.r_name
        for r in load(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
    }

    def lookup(row: dict) -> dict:
        return {
            "event_id": int(row["event_id"]),
            "region_name": region[int(row["user_id"]) % 5],
        }

    events = load(spark, sf_dir, "events").select("event_id", "user_id")
    out = async_map(
        events, lookup, "event_id long, region_name string", capacity=8, ordered=False
    )
    return out.orderBy("event_id")


# --------------------------------------------------------------------------
# text format round trip (round 10, cont.)
# --------------------------------------------------------------------------

TEXT_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("text_roundtrip_agg", TEXT_ROUNDTRIP_ORACLE)
def text_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited text format round trip (reference
    flink-formats/../RawFormatSerializationSchema + the filesystem
    connector's 'raw'/'testcsv' single-column line formats): orders is
    serialized to one pipe-joined line per row through the `text` format
    of sources/filesystem, read back as `value: string` lines, re-parsed
    with split(), and aggregated.  Integer cents are encoded as integers
    in the line so the parse is exact (no double round trip through
    decimal text)."""
    from incubator_flink_spark.sources.filesystem import read_table, write_table

    d = load(spark, sf_dir, "orders").select(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint"),
        ).alias("value")
    )
    out = os.path.join(_workdir("text_rt_"), "orders_text")
    write_table(d, out, "text", mode="overwrite")
    back = read_table(spark, out, "text")
    parts = F.split(F.col("value"), "\\|")
    parsed = back.select(
        parts.getItem(0).cast("bigint").alias("o_orderkey"),
        parts.getItem(1).alias("o_orderstatus"),
        parts.getItem(2).cast("bigint").alias("price_cents"),
    )
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            F.sum("price_cents").cast("bigint").alias("price_cents"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# DataStream bounded sources: sequence + collection (round 10, cont.)
# --------------------------------------------------------------------------

SEQUENCE_SOURCE_ORACLE = """
SELECT v % 7 AS bucket,
       COUNT(*) AS n,
       CAST(SUM(v) AS BIGINT) AS total,
       CAST(MIN(v) AS BIGINT) AS lo,
       CAST(MAX(v) AS BIGINT) AS hi
FROM range(1, 200001) t(v)
GROUP BY 1 ORDER BY 1
"""


@register("datastream_sequence_agg", SEQUENCE_SOURCE_ORACLE)
def datastream_sequence_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sequence source through the DataStream facade
    (api/datastream.StreamExecutionEnvironment.from_sequence; reference
    StreamExecutionEnvironment.fromSequence / NumberSequenceSource):
    generate 1..200000 distributed (spark.range — no driver-side
    materialization), key by value % 7, reduce to count/sum/min/max.
    The oracle regenerates the same sequence with DuckDB's range()."""
    from incubator_flink_spark.api.datastream import StreamExecutionEnvironment

    env = StreamExecutionEnvironment(spark)
    ds = env.from_sequence(1, 200000).select(
        F.col("value"), (F.col("value") % 7).alias("bucket")
    )
    return (
        ds.key_by("bucket")
        .reduce(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").cast("bigint").alias("total"),
            F.min("value").cast("bigint").alias("lo"),
            F.max("value").cast("bigint").alias("hi"),
        )
        .to_df()
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# DropUpdateBefore + ChangelogNormalize under the gate (round 10, cont.)
# --------------------------------------------------------------------------

DROP_UPDATE_BEFORE_ORACLE = """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice * 100) AS BIGINT)
         + CASE WHEN o_orderkey % 3 = 0 THEN 1000 ELSE 0 END AS price_cents
FROM orders
WHERE o_orderkey % 7 <> 0
ORDER BY o_orderkey
"""


@register("drop_update_before_normalize", DROP_UPDATE_BEFORE_ORACLE)
def drop_update_before_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DropUpdateBefore -> ChangelogNormalize materialization
    (streaming/changelog.py; reference StreamExecDropUpdateBefore +
    StreamExecChangelogNormalize.java:61): a synthetic changelog over
    orders — +I for every key at seq 0; keys % 3 == 0 take a -U/+U pair
    (price bumped 1000 cents) at seq 1/2; keys % 7 == 0 take a -D at
    seq 3 — is normalized to current state: -U rows dropped, latest row
    per key wins, deleted keys vanish.  The oracle is the closed-form
    final state."""
    from incubator_flink_spark.streaming.changelog import (
        DELETE,
        INSERT,
        ROWKIND,
        UPDATE_AFTER,
        UPDATE_BEFORE,
        changelog_normalize,
    )

    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents")
    )
    ins = base.select(
        "o_orderkey", "price_cents", F.lit(0).alias("seq"), F.lit(INSERT).alias(ROWKIND)
    )
    upd = base.where(F.col("o_orderkey") % 3 == 0)
    ub = upd.select(
        "o_orderkey", "price_cents", F.lit(1).alias("seq"), F.lit(UPDATE_BEFORE).alias(ROWKIND)
    )
    ua = upd.select(
        "o_orderkey",
        (F.col("price_cents") + 1000).alias("price_cents"),
        F.lit(2).alias("seq"),
        F.lit(UPDATE_AFTER).alias(ROWKIND),
    )
    dels = base.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "price_cents", F.lit(3).alias("seq"), F.lit(DELETE).alias(ROWKIND)
    )
    changelog = ins.unionByName(ub).unionByName(ua).unionByName(dels)
    normalized = changelog_normalize(changelog, ["o_orderkey"], ts_col="seq", tiebreak="seq")
    return normalized.select("o_orderkey", "price_cents").orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Legacy (pre-TVF) group-window SQL grammar under the gate (round 10, cont.)
# --------------------------------------------------------------------------

LEGACY_GROUP_WINDOW_ORACLE = """
WITH t AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT event_type,
         CAST(to_timestamp(FLOOR(epoch(ts) / 43200) * 43200 - j.j * 43200) AS TIMESTAMP) AS ws,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events CROSS JOIN (VALUES (0), (1)) j(j)
  GROUP BY 1, 2
)
SELECT 'tumble' AS kind, event_type, ws AS window_start,
       ws + INTERVAL 1 DAY AS window_end,
       ws + INTERVAL 1 DAY - INTERVAL 1 MILLISECOND AS rowtime,
       n, cents
FROM t
UNION ALL
SELECT 'hop', event_type, ws, ws + INTERVAL 1 DAY,
       ws + INTERVAL 1 DAY - INTERVAL 1 MILLISECOND, n, cents
FROM h
ORDER BY kind, event_type, window_start
"""


@register("legacy_group_window_sql", LEGACY_GROUP_WINDOW_ORACLE)
def legacy_group_window_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy (pre-TVF) group-window SQL grammar (reference docs' group
    window aggregation; planner LogicalWindowAggregate + the TUMBLE_OLD/
    HOP_OLD auxiliary operators in FlinkSqlOperatorTable): the verbatim
    ``GROUP BY TUMBLE(ts, INTERVAL '1' DAY)`` and ``GROUP BY HOP(ts,
    INTERVAL '12' HOUR, INTERVAL '1' DAY)`` texts — with TUMBLE_START/
    _END/_ROWTIME and HOP_START auxiliaries — run through
    TableEnvironment.sql_query (api/tvf.rewrite_legacy_group_windows maps
    them onto Spark's native window() grouping).  Flink's rowtime
    attribute is window_end - 1ms; the oracle reproduces both window
    assignments in closed form (legacy HOP argument order: slide, size)."""
    from incubator_flink_spark.api.table import TableEnvironment

    t_env = TableEnvironment(spark)
    load(spark, sf_dir, "events").select(
        "event_type", "ts", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    ).createOrReplaceTempView("legacy_gw_events")
    tumble_sql = """
        SELECT 'tumble' AS kind, event_type,
               TUMBLE_START(ts, INTERVAL '1' DAY) AS window_start,
               TUMBLE_END(ts, INTERVAL '1' DAY) AS window_end,
               TUMBLE_ROWTIME(ts, INTERVAL '1' DAY) AS rowtime,
               COUNT(*) AS n, SUM(cents) AS cents
        FROM legacy_gw_events
        GROUP BY event_type, TUMBLE(ts, INTERVAL '1' DAY)
    """
    hop_sql = """
        SELECT 'hop' AS kind, event_type,
               HOP_START(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY) AS window_start,
               HOP_END(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY) AS window_end,
               HOP_ROWTIME(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY) AS rowtime,
               COUNT(*) AS n, SUM(cents) AS cents
        FROM legacy_gw_events
        GROUP BY event_type, HOP(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY)
    """
    out = t_env.sql_query(tumble_sql).to_df().unionByName(t_env.sql_query(hop_sql).to_df())
    return out.orderBy("kind", "event_type", "window_start")


# --------------------------------------------------------------------------
# datagen connector (bounded, deterministic) under the gate (round 10, cont.)
# --------------------------------------------------------------------------

DATAGEN_BOUNDED_ORACLE = """
SELECT CAST(v % 100 AS DOUBLE) AS value,
       COUNT(*) AS n,
       CAST(MIN(v) AS BIGINT) AS first_id,
       CAST(MAX(v) AS BIGINT) AS last_id,
       CAST(to_timestamp(1704067200 + MAX(v)) AS TIMESTAMP) AS last_ts
FROM range(0, 100000) t(v)
GROUP BY 1 ORDER BY 1
"""


@register("datagen_bounded_agg", DATAGEN_BOUNDED_ORACLE)
def datagen_bounded_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded datagen connector (sources/util.datagen streaming=False;
    reference flink-connectors/flink-connector-datagen DataGenTableSource
    with sequence-kind fields — the deterministic generator form): 100k
    generated (id, timestamp, value) rows aggregated per value bucket.
    The oracle regenerates the same sequence arithmetic with DuckDB's
    range() — id maps to epoch seconds from 2024-01-01, value = id % 100."""
    from incubator_flink_spark.sources.util import datagen

    d = datagen(spark, streaming=False, n_rows=100000)
    return (
        d.groupBy("value")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").cast("bigint").alias("first_id"),
            F.max("id").cast("bigint").alias("last_id"),
            F.max("timestamp").alias("last_ts"),
        )
        .orderBy("value")
    )


# --------------------------------------------------------------------------
# CTAS (CREATE TABLE AS SELECT) under the gate (round 10, cont.)
# --------------------------------------------------------------------------

CTAS_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("ctas_roundtrip_agg", CTAS_ROUNDTRIP_ORACLE)
def ctas_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS through the full executeSql lifecycle (FLIP-218; reference
    CreateTableASOperation: derive schema from the query, create the
    connector table, sink the result): a filtered projection of orders is
    materialized by ``CREATE TABLE ... WITH (filesystem/parquet) AS
    SELECT``, then aggregated from the CREATED table — proving schema
    derivation, the connector write, and the registered read are exact
    inverses."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    load(spark, sf_dir, "orders").createOrReplaceTempView("ctas_gate_orders")
    path = os.path.join(_workdir("ctas_rt_"), "t")
    env.execute_sql(f"""
        CREATE TABLE ctas_gate_t WITH (
          'connector' = 'filesystem', 'path' = '{path}', 'format' = 'parquet'
        ) AS SELECT o_orderkey, o_orderstatus,
                    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
             FROM ctas_gate_orders WHERE o_orderkey % 2 = 0
    """)
    return (
        env.sql_query("""
            SELECT o_orderstatus, COUNT(*) AS n_orders,
                   SUM(price_cents) AS price_cents
            FROM ctas_gate_t GROUP BY o_orderstatus ORDER BY o_orderstatus
        """)
        .to_df()
    )


# --------------------------------------------------------------------------
# Declared-schema evolution (ADD/CHANGE COLUMNS) under the gate (round 10)
# --------------------------------------------------------------------------

SCHEMA_EVOLUTION_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_orderkey AS INTEGER)) AS BIGINT) AS key_sum,
       CAST(COUNT(CASE WHEN FALSE THEN 1 END) AS BIGINT) AS n_region,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("schema_evolution_agg", SCHEMA_EVOLUTION_ORACLE)
def schema_evolution_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-schema-over-data evolution (FLIP-273 ALTER TABLE column
    DDL; reference SqlAddReplaceColumns/SqlChangeColumn via
    SqlToOperationConverter): orders lands as parquet, the DDL table's
    declared schema then EVOLVES — a column added after the files exist
    (scans as typed NULLs) and o_orderkey retyped BIGINT -> INT (the
    conform read insert-casts; a reader schema would fail with
    PARQUET_COLUMN_DATA_TYPE_MISMATCH) — and the aggregate over the
    evolved table must match the oracle computed from the original data
    with the same cast.  Files at rest are never rewritten."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    path = os.path.join(_workdir("schema_ev_"), "t")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.parquet(path)
    env.execute_sql(f"""
        CREATE TABLE schema_ev_t (
          o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
        ) WITH (
          'connector' = 'filesystem', 'path' = '{path}', 'format' = 'parquet'
        )
    """)
    env.execute_sql("ALTER TABLE schema_ev_t ADD COLUMNS (region STRING)")
    env.execute_sql("ALTER TABLE schema_ev_t CHANGE COLUMN o_orderkey o_orderkey INT")
    return (
        env.sql_query("""
            SELECT o_orderstatus,
                   COUNT(*) AS n_orders,
                   SUM(o_orderkey) AS key_sum,
                   COUNT(region) AS n_region,
                   SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS price_cents
            FROM schema_ev_t GROUP BY o_orderstatus ORDER BY o_orderstatus
        """)
        .to_df()
        .select(
            "o_orderstatus",
            "n_orders",
            F.col("key_sum").cast("bigint").alias("key_sum"),
            F.col("n_region").cast("bigint").alias("n_region"),
            F.col("price_cents").cast("bigint").alias("price_cents"),
        )
    )
