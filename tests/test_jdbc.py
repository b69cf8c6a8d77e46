"""JDBC connector end-to-end against embedded Apache Derby (bundled in
Spark's jars). Covers SURVEY.md §2.1 JDBC scan/lookup/sink (reference
flink-connector-jdbc JdbcDynamicTableFactory: scan + lookup + upsert
sink) with a REAL database, not just the options path."""

import tempfile

from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.sources.jdbc import (
    DERBY_DRIVER,
    jdbc_execute,
    jdbc_lookup_loader,
    jdbc_upsert,
    read_jdbc,
    write_jdbc,
)
from incubator_flink_spark.streaming.lookup import lookup_join_per_batch
from incubator_flink_spark.streaming.source import replay_table
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


def _url() -> str:
    return f"jdbc:derby:{tempfile.mkdtemp()}/db;create=true"


def test_jdbc_roundtrip_and_pushdown(spark):
    url = _url()
    nation = load(spark, SF, "nation")
    write_jdbc(nation, url, "nation", driver=DERBY_DRIVER, mode="overwrite")
    back = read_jdbc(spark, url, "nation", driver=DERBY_DRIVER)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    # filter + projection push INTO the database scan
    plan = (
        back.where(F.col("n_regionkey") == 2)
        .select("n_nationkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "EqualTo(n_regionkey,2)" in plan
    assert "n_name" not in plan.split("ReadSchema")[-1]


def test_jdbc_partitioned_parallel_scan(spark):
    url = _url()
    cust = load(spark, SF, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    write_jdbc(cust, url, "customer", driver=DERBY_DRIVER, mode="overwrite")
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    par = read_jdbc(
        spark,
        url,
        "customer",
        driver=DERBY_DRIVER,
        partition_column="c_custkey",
        lower_bound=lo,
        upper_bound=hi + 1,
        num_partitions=4,
    )
    # stride-partitioned scan reads in parallel and loses no rows
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == cust.count()
    assert par.agg(F.sum("c_custkey")).first()[0] == cust.agg(F.sum("c_custkey")).first()[0]


def test_jdbc_upsert_keeps_incoming(spark):
    url = _url()
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, name STRING, v DOUBLE"
    )
    jdbc_upsert(base, url, "t", keys=["k"], driver=DERBY_DRIVER)
    delta = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k INT, name STRING, v DOUBLE"
    )
    jdbc_upsert(delta, url, "t", keys=["k"], driver=DERBY_DRIVER)
    got = {r.k: (r.v) for r in read_jdbc(spark, url, "t", driver=DERBY_DRIVER).collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0, 4: 40.0}


def test_jdbc_upsert_stage_swap_concurrent_read(spark):
    """The upsert must stay distributed (no driver materialization): the
    merge lands in a stage table and swaps in via one DROP+RENAME
    transaction.  A reader plan created BEFORE the swap must still
    resolve afterwards, and the stage table must be gone."""
    import pytest

    url = _url()
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k INT, name STRING, v DOUBLE"
    )
    jdbc_upsert(base, url, "tswap", keys=["k"], driver=DERBY_DRIVER)
    pre_swap_reader = read_jdbc(spark, url, "tswap", driver=DERBY_DRIVER)
    delta = spark.createDataFrame([(2, "b2", 21.0), (3, "c", 30.0)], "k INT, name STRING, v DOUBLE")
    jdbc_upsert(delta, url, "tswap", keys=["k"], driver=DERBY_DRIVER)
    # the pre-swap plan re-resolves against the swapped-in table
    assert {r.k: r.v for r in pre_swap_reader.collect()} == {1: 10.0, 2: 21.0, 3: 30.0}
    # stage table was renamed away, not left behind
    with pytest.raises(Exception, match="(?i)tswap__stage"):
        read_jdbc(spark, url, "tswap__stage", driver=DERBY_DRIVER).collect()


def test_jdbc_execute_ddl_and_scan(spark):
    url = _url()
    jdbc_execute(
        spark,
        url,
        "CREATE TABLE dim (id INT PRIMARY KEY, label VARCHAR(32))",
        "INSERT INTO dim VALUES (1, 'one'), (2, 'two')",
    )
    got = read_jdbc(spark, url, "dim", driver=DERBY_DRIVER)
    assert sorted((r.ID, r.LABEL) for r in got.collect()) == [(1, "one"), (2, "two")]


def test_jdbc_lookup_join_stream(spark):
    url = _url()
    dim = load(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_nationkey")
    )
    write_jdbc(dim, url, "cust_dim", driver=DERBY_DRIVER, mode="overwrite")
    stream = replay_table(spark, SF, "events", tempfile.mkdtemp(), n_files=2)
    results = []

    def sink(df, bid):
        results.append(df.where(F.col("c_nationkey").isNotNull()).count())

    writer = lookup_join_per_batch(
        stream,
        jdbc_lookup_loader(url, "cust_dim", driver=DERBY_DRIVER),
        ["user_id"],
        "left",
        sink,
    )
    q = writer.trigger(availableNow=True).option("checkpointLocation", tempfile.mkdtemp()).start()
    drain_stream(q)
    events = load(spark, SF, "events")
    expect = events.join(dim, "user_id", "inner").count()
    assert sum(results) == expect
