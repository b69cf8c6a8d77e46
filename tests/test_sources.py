"""Source/sink/format round-trip tests (SURVEY.md §2.1: filesystem
connector with csv/json/parquet/orc formats, partitioned layout,
datagen/blackhole utility tables)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.sources import blackhole, datagen, read_table, write_table
from tests.conftest import drain_stream

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
    drain_stream(q)
    assert len(rows) == 25


def test_datagen_and_blackhole(spark):
    batch = datagen(spark, streaming=False, n_rows=50)
    assert batch.count() == 50 and batch.columns == ["id", "timestamp", "value"]
    blackhole(batch)  # must fully evaluate without error
    stream = datagen(spark, rows_per_second=10, streaming=True)
    assert stream.isStreaming


def test_avro_gate_is_consistent_between_probe_and_io(spark, tmp_path):
    """The avro format works with OR without the spark-avro jar: with
    the jar the native source handles it; without, the pure-Python OCF
    fallback (sources/avro_format.py) round-trips the same call — the
    format is never a dead end (r8: the old fail-fast gate became a
    working fallback)."""
    from incubator_flink_spark.sources.filesystem import read_table, write_table

    df = spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s")
    path = str(tmp_path / "avro_tbl")
    write_table(df, path, fmt="avro")
    back = read_table(spark, path, fmt="avro")
    assert sorted(map(tuple, back.select("id", "s").collect())) == sorted(
        map(tuple, df.collect())
    )


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


# --- pure-Python Avro fallback (sources/avro_format.py) ----------------


def test_avro_container_roundtrip_all_types():
    """Spec-level round-trip: every supported schema node (primitives,
    nullable unions, enum, fixed, array, map, nested record, logical
    timestamp-micros/date) through both the null and deflate codecs."""
    import datetime

    from incubator_flink_spark.sources.avro_format import decode_container, encode_container

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "ns", "type": ["null", "string"]},
            {"name": "en", "type": {"type": "enum", "name": "e", "symbols": ["A", "B", "C"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "fx8", "size": 4}},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "mp", "type": {"type": "map", "values": "double"}},
            {"name": "rec", "type": {"type": "record", "name": "inner",
                                     "fields": [{"name": "x", "type": "long"}]}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        ],
    }
    rows = [
        {
            "b": i % 2 == 0, "i": i - 5, "l": i * 10**12, "f": float(i),
            "d": i * 0.25, "s": f"s{i}", "by": bytes([i, i + 1]),
            "ns": None if i % 3 == 0 else f"n{i}",
            "en": ["A", "B", "C"][i % 3], "fx": bytes([i, 0, 1, 2]),
            "arr": list(range(i % 4)), "mp": {f"k{j}": j * 0.5 for j in range(i % 3)},
            "rec": {"x": i * 7},
            "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i, microseconds=i),
            "dt": datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
        }
        for i in range(20)
    ]
    for codec in ("null", "deflate"):
        blob = encode_container(schema, rows, codec=codec, block_rows=7)
        got_schema, got = decode_container(blob)
        assert got_schema == schema
        assert got == rows, codec


def test_avro_spark_roundtrip_distributed(spark, tmp_path):
    """Distributed write -> distributed read through the mapInPandas
    paths: values, nulls, timestamps, arrays and maps survive exactly;
    the read parallelizes per container file (one per write task)."""
    import glob

    from pyspark.sql import functions as F

    from incubator_flink_spark.sources.avro_format import read_avro, write_avro

    df = (
        spark.range(0, 500, 1, 4)
        .select(
            F.col("id"),
            (F.col("id") * 0.25).alias("price"),
            F.concat(F.lit("name_"), F.col("id")).alias("name"),
            F.when(F.col("id") % 3 == 0, F.col("id") % 7).alias("nullable_mod"),
            F.to_timestamp(F.lit("2024-03-01 12:30:45.123456")).alias("ts"),
            F.array(F.col("id"), F.col("id") + 1).alias("pair"),
            F.create_map(F.lit("k"), F.col("id") % 5).alias("m"),
        )
    )
    out = str(tmp_path / "avro_rt")
    write_avro(df, out)
    assert len(glob.glob(out + "/*.avro")) == 4  # one container per task
    back = read_avro(spark, out)
    assert back.schema == df.schema or [f.name for f in back.schema.fields] == [
        f.name for f in df.schema.fields
    ]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_avro_filesystem_fallback_path(spark, tmp_path):
    """read_table/write_table with fmt='avro' work WITHOUT the
    spark-avro jar through the pure-Python fallback (when the jar is
    present they use it natively — either way the format is usable)."""
    from pyspark.sql import functions as F

    from incubator_flink_spark.sources.filesystem import read_table, write_table

    df = spark.range(50).select("id", (F.col("id") % 3).alias("g"))
    path = str(tmp_path / "avro_tbl2")
    write_table(df, path, fmt="avro")
    back = read_table(spark, path, fmt="avro")
    assert sorted(map(tuple, back.select("id", "g").collect())) == sorted(
        map(tuple, df.collect())
    )
