"""JDBC table connector: scan source, lookup snapshot, append/upsert sink
(reference: flink-connectors/flink-connector-jdbc
JdbcDynamicTableFactory.java — scan + lookup + sink in one factory;
JdbcRowDataInputFormat parallel reads via NumericBetweenParametersProvider;
JdbcOutputFormat / TableJdbcUpsertOutputFormat upsert writes).

Spark-first mapping:

- **Scan** delegates to Spark's built-in JDBC relation, which pushes
  filters and projections into the database (``PushedFilters`` in the
  plan) and parallelizes with ``partitionColumn``/``numPartitions`` —
  the same stride-partitioning the reference's
  ``NumericBetweenParametersProvider`` computes (scan.partition.column /
  scan.partition.num options of the reference map 1:1).
- **Lookup** is a snapshot loader for
  ``streaming.lookup.lookup_join_per_batch``: re-read the dimension each
  micro-batch and broadcast — FOR SYSTEM_TIME AS OF proc-time semantics
  for small/medium dims, no per-row round-trips.
- **Sink** append mode delegates to Spark's JDBC writer (batched
  INSERTs, ``batchsize`` option = reference's sink.buffer-flush rows).
  Upsert mode is read-merge-stage-swap per micro-batch (keep-last by
  key, distributed end-to-end: the merge is written to a stage table by
  the executors, then swapped in with one DROP+RENAME transaction), the
  portable equivalent of the reference's TableJdbcUpsertOutputFormat; at
  scale prefer a dialect-native MERGE executed through
  :func:`jdbc_execute`.

Tested end-to-end against embedded Apache Derby (bundled with Spark).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """Scan a JDBC table. With ``partition_column`` + bounds the scan is
    split into ``num_partitions`` stride ranges read in parallel
    (reference: JdbcRowDataInputFormat + NumericBetweenParametersProvider).
    ``table`` may be a table name or a ``(subquery) alias`` pushdown."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.options(**options).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "append",
    **options,
) -> None:
    """Append/overwrite rows (reference JdbcOutputFormat batched INSERT;
    ``batchsize`` option = sink.buffer-flush.max-rows)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        writer = writer.option("driver", driver)
    writer.options(**options).mode(mode).save()


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    driver: str | None = None,
    rename_sql: str | None = None,
    **options,
) -> None:
    """Upsert ``df`` into ``table`` on ``keys`` (reference
    TableJdbcUpsertOutputFormat): new keys insert, existing keys take the
    incoming row. Portable read-merge-overwrite implementation — one
    snapshot read + one write per call; rows within ``df`` that share a
    key resolve to an arbitrary-but-single row (callers wanting
    keep-last should pre-dedup with an ordering column, as the upsert
    parquet sink does).

    The stage-table swap uses a per-dialect rename spelling (Derby/MySQL
    ``RENAME TABLE``, else ``ALTER TABLE ... RENAME TO``; override with
    ``rename_sql`` = a ``{src}``/``{dst}`` template).  On dialects whose
    DDL is transactional (Derby, Postgres) the DROP+RENAME pair is
    atomic; on implicit-commit-DDL dialects (Oracle, MySQL) there is an
    unavoidable window between the statements — for those, prefer a
    dialect-native MERGE via ``jdbc_execute``."""
    spark = df.sparkSession
    try:
        current = read_jdbc(spark, url, table, driver=driver, **options)
    except Exception:  # table absent: plain write  # noqa: BLE001
        write_jdbc(df, url, table, driver=driver, mode="overwrite", **options)
        return
    merged = (
        df.withColumn("__src", F.lit(1))
        .unionByName(current.withColumn("__src", F.lit(0)))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(F.col("__src").desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__src", "__rn")
    )
    # Stage-and-swap: the merged plan still reads `table`, so overwriting it
    # in place would drop the relation mid-read.  Write the merge to a stage
    # table (fully distributed — executors stream straight into JDBC batch
    # inserts, nothing is collected to the driver), then swap it in with a
    # single DROP+RENAME transaction (Derby DDL is transactional; other
    # dialects get an equally small swap window).
    stage = f"{table}__stage"
    write_jdbc(merged, url, stage, driver=driver, mode="overwrite", **options)
    jdbc_execute(
        spark,
        url,
        f"DROP TABLE {table}",
        _rename_stmt(url, stage, table, rename_sql),
    )


#: per-dialect table-rename spellings (everything else gets the widely
#: supported ALTER TABLE ... RENAME TO form)
_RENAME_SQL = {
    "jdbc:derby": "RENAME TABLE {src} TO {dst}",
    "jdbc:mysql": "RENAME TABLE {src} TO {dst}",
}


def _rename_stmt(url: str, src: str, dst: str, template: str | None = None) -> str:
    if template:
        return template.format(src=src, dst=dst)
    for prefix, tpl in _RENAME_SQL.items():
        if url.startswith(prefix):
            return tpl.format(src=src, dst=dst)
    return f"ALTER TABLE {src} RENAME TO {dst}"


def jdbc_lookup_loader(
    url: str, table: str, driver: str | None = None, **options
) -> Callable[[SparkSession], DataFrame]:
    """Dimension loader for ``lookup_join_per_batch``: each micro-batch
    re-reads the JDBC table (proc-time AS OF snapshot, reference
    JdbcRowDataLookupFunction with cache TTL=one batch)."""

    def load(spark: SparkSession) -> DataFrame:
        return read_jdbc(spark, url, table, driver=driver, **options)

    return load


def jdbc_execute(spark: SparkSession, url: str, *statements: str) -> None:
    """Run raw DDL/DML through the JVM's DriverManager (reference
    JdbcCatalog DDL path; also the hook for dialect-native MERGE).

    All statements run in ONE transaction (commit at the end, rollback on
    error) — on transactional-DDL dialects like Derby this makes the
    upsert stage-table swap atomic for concurrent readers."""
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        try:
            stmt = conn.createStatement()
            for sql in statements:
                stmt.execute(sql)
            stmt.close()
            conn.commit()
        except Exception:
            conn.rollback()
            raise
    finally:
        conn.close()
