"""Source/sink/format round-trip tests (SURVEY.md §2.1: filesystem
connector with csv/json/parquet/orc formats, partitioned layout,
datagen/blackhole utility tables)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.sources import blackhole, datagen, read_table, write_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_format_roundtrip(spark, fmt):
    src = load(spark, SF, "nation")
    path = tempfile.mkdtemp(prefix=f"rt_{fmt}_")
    write_table(src, path, fmt)
    schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
    back = read_table(spark, path, fmt, schema=schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in src.collect())


def test_partitioned_write_and_pruning(spark):
    src = load(spark, SF, "customer")
    path = tempfile.mkdtemp(prefix="part_")
    write_table(src, path, "parquet", partition_by=["c_nationkey"])
    back = read_table(spark, path, "parquet")
    assert back.count() == src.count()
    # partition pruning: filter on the partition column reads a subset of dirs
    one = back.where(F.col("c_nationkey") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == src.where(F.col("c_nationkey") == 3).count()


def test_streaming_file_source_roundtrip(spark):
    src = load(spark, SF, "nation")
    path = tempfile.mkdtemp(prefix="streamsrc_")
    write_table(src, path, "json")
    stream = read_table(
        spark, path, "json", schema="n_nationkey INT, n_name STRING, n_regionkey INT", streaming=True
    )
    assert stream.isStreaming
    rows = []
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    assert len(rows) == 25


def test_datagen_and_blackhole(spark):
    batch = datagen(spark, streaming=False, n_rows=50)
    assert batch.count() == 50 and batch.columns == ["id", "timestamp", "value"]
    blackhole(batch)  # must fully evaluate without error
    stream = datagen(spark, rows_per_second=10, streaming=True)
    assert stream.isStreaming


def test_avro_gate_is_consistent_between_probe_and_io(spark, tmp_path):
    """The avro format is env-gated on the spark-avro jar: when the probe
    says the jar is absent, read_table/write_table must fail fast with the
    clear RuntimeError (not Spark's opaque ClassNotFound stack); when it
    says present, a round-trip must actually work. Either way the gate and
    reality agree."""
    import pytest

    from incubator_flink_spark.sources.filesystem import _has_avro, read_table, write_table

    df = spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s")
    path = str(tmp_path / "avro_tbl")
    if _has_avro(spark):
        write_table(df, path, fmt="avro")
        assert read_table(spark, path, fmt="avro").count() == 5
    else:
        with pytest.raises(RuntimeError, match="spark-avro package"):
            write_table(df, path, fmt="avro")
        with pytest.raises(RuntimeError, match="spark-avro package"):
            read_table(spark, path, fmt="avro")


def test_dynamic_partition_pruning_on_partitioned_fact(spark):
    """Dynamic partition pruning: a hive-partitioned fact joined to a
    selectively-filtered dim must plan a dynamicpruning subquery on the
    partition column, so only the matching partition directories are
    scanned — THE scan-reduction mechanism for dim-filtered fact joins
    at scale (the reference's equivalent is source partition pushdown
    through the planner's PartitionPruner)."""
    o = load(spark, SF, "orders").withColumn("o_year", F.year("o_orderdate"))
    path = tempfile.mkdtemp(prefix="dpp_")
    write_table(o, path, "parquet", partition_by=["o_year"])
    fact = read_table(spark, path, "parquet")

    dim = (
        o.select(F.col("o_year").alias("y")).distinct()
        .withColumn("flag", F.col("y") % 2 == 0)
    )
    # one selective dim filter; join on the partition column
    j = fact.join(F.broadcast(dim.where("flag")), fact.o_year == dim.y)
    plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
    physical = j._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan or "dynamicpruning" in physical
    expected = o.join(dim.where("flag"), o.o_year == dim.y).count()
    assert j.count() == expected


def test_static_partition_pruning_reaches_scan(spark):
    """A literal filter on the partition column must appear in the scan's
    PartitionFilters (directory-level pruning, no data files of other
    partitions touched)."""
    src = load(spark, SF, "customer")
    path = tempfile.mkdtemp(prefix="spp_")
    write_table(src, path, "parquet", partition_by=["c_nationkey"])
    one = read_table(spark, path, "parquet").where(F.col("c_nationkey") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "c_nationkey" in m.group(1)
