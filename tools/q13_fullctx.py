"""Run the FULL bench extras sequence (fast knobs, bench order) up to and
beyond nexmark_q13 exactly as bench.py does, timing q13 each pass, with an
event log so the slow stage can be attributed.  Usage:
  python tools/q13_fullctx.py [stop_after]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

EVDIR = "/tmp/spark-events-q13"
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)
os.environ["SPARK_GRAFT_EVENTLOG"] = EVDIR  # only read below, not by session.py

from incubator_flink_spark.session import _local_dir
from pyspark.sql import SparkSession

builder = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .appName("q13fullctx")
    .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", EVDIR)
)
ld = _local_dir()
if ld:
    builder = builder.config("spark.local.dir", ld)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("WARN")

import bench  # noqa: E402  (for the EXTRA list)
from incubator_flink_spark.queries import REGISTRY  # noqa: E402

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


t_start = time.time()
os.environ["SPARK_GRAFT_BENCH_FAST"] = "1"
for name in bench.EXTRA:
    noop(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
print(f"warmup done {time.time()-t_start:.1f}s", flush=True)
for name in bench.EXTRA:
    spark.catalog.clearCache()
    t0 = time.time()
    if name == "nexmark_q13":
        spark.sparkContext.setJobDescription("Q13MEASURED")
    noop(REGISTRY[name].fn(spark, SF))
    spark.sparkContext.setJobDescription(None)
    dt = time.time() - t0
    if dt > 1.5 or name == "nexmark_q13":
        print(f"{name}: {dt:.3f}", flush=True)
    if name == "nexmark_q13":
        # a couple of immediate repeats in the same context
        for i in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"Q13REPEAT{i}")
            noop(REGISTRY["nexmark_q13"].fn(spark, SF))
            spark.sparkContext.setJobDescription(None)
            print(f"  q13 repeat{i}: {time.time()-t0:.3f}", flush=True)
del os.environ["SPARK_GRAFT_BENCH_FAST"]
print(f"total {time.time()-t_start:.1f}s", flush=True)
spark.stop()
